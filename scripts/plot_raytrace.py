#!/usr/bin/env python
"""Replay a path-event CSV (log.csv from tools.trace.write_path_events_csv)
as a 3D scatter of collision points, scatter events and the camera ray —
the analog of the reference's scripts/plot_raytrace.py for its Logger stream.

Usage: python scripts/plot_raytrace.py [log.csv] [out.png]
"""
import csv
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

path = sys.argv[1] if len(sys.argv) > 1 else "log.csv"
out = sys.argv[2] if len(sys.argv) > 2 else "raytrace.png"
pts, scats, rays = [], [], []
for row in csv.reader(open(path)):
    if not row:
        continue
    kind, vals = row[0], [float(v) for v in row[1:]]
    if kind == "sampled_point":
        pts.append(vals[:3])
    elif kind == "scatter":
        scats.append(vals[:3])
    elif kind == "new_ray":
        rays.append((vals[:3], vals[3:6]))
fig = plt.figure(figsize=(8, 7))
ax = fig.add_subplot(111, projection="3d")
if pts:
    p = np.array(pts); ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=8, label="collisions")
if scats:
    s = np.array(scats); ax.scatter(s[:, 0], s[:, 1], s[:, 2], s=60, marker="*", color="lime", label="scatters")
for o, d in rays:
    o, d = np.array(o), np.array(d)
    seg = np.stack([o, o + d * 50.0])
    ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "k--", alpha=0.5)
ax.legend()
fig.savefig(out, dpi=110, bbox_inches="tight")
print(f"wrote {out}")
