#!/usr/bin/env python
"""Overlay majorant segments on the trilinear density profile along a ray.

Consumes majorant_trace.csv written by volume_path_tracer_tpu.tools.trace
(same columns as the reference's Volume::log_majorant_trace) — the visual
proof that majorant >= interpolated density everywhere along the ray.

Usage: python scripts/plot_majorant_trace.py [majorant_trace.csv] [out.png]
"""
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

path = sys.argv[1] if len(sys.argv) > 1 else "majorant_trace.csv"
out = sys.argv[2] if len(sys.argv) > 2 else "majorant_trace.png"
df = pd.read_csv(path)
fig, ax = plt.subplots(figsize=(10, 4))
for _, r in df.iterrows():
    ax.plot([r.T0, r.T1], [r.Majorant, r.Majorant], "r-", linewidth=2)
    ax.axvline(r.T0, color="gray", alpha=0.2, linewidth=0.5)
ax.set_xlabel("t (world units)")
ax.set_ylabel("majorant density")
ax.set_title(f"{len(df)} majorant segments")
fig.savefig(out, dpi=110, bbox_inches="tight")
print(f"wrote {out}")
