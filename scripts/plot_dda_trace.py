#!/usr/bin/env python
"""Plot the voxel-level DDA dump (dda_trace.csv): density value, brick
majorant, traversal cell size and active flag along a ray.

Usage: python scripts/plot_dda_trace.py [dda_trace.csv] [out.png]
"""
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

path = sys.argv[1] if len(sys.argv) > 1 else "dda_trace.csv"
out = sys.argv[2] if len(sys.argv) > 2 else "dda_trace.png"
df = pd.read_csv(path)
fig, axes = plt.subplots(3, 1, figsize=(10, 7), sharex=True)
axes[0].step(df["T"], df["Value"], where="post", label="density")
axes[0].step(df["T"], df["Maximum"], where="post", label="brick majorant", color="r")
axes[0].legend(); axes[0].set_ylabel("density")
axes[1].step(df["T"], df["Dim"], where="post"); axes[1].set_ylabel("cell dim")
axes[2].step(df["T"], df["Active"], where="post"); axes[2].set_ylabel("active")
axes[2].set_xlabel("t (voxel units)")
fig.savefig(out, dpi=110, bbox_inches="tight")
print(f"wrote {out}")
