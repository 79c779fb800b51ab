"""Multi-process scaling harness run (VERDICT r2 item 8; BASELINE.json config 5).

Launches examples/multihost_render.py at 1/2/4 OS processes over a localhost
jax.distributed coordinator (CPU backend, 2 virtual devices per process) and
records total rays/s per topology. Real multi-chip hardware is unavailable in
this environment; this demonstrates the scaling HARNESS — process bring-up,
global mesh construction, cross-process collectives, film gather — executes
at every topology. On a 2-physical-core host the absolute numbers are
CPU-contended and NOT a chip-scaling measurement (all topologies share the
same two cores); the meaningful assertions are that every topology completes
and produces the same image statistics.

Usage: python scripts/multiproc_scaling.py [--size 128] [--waves 2]
Writes MULTIHOST.md at the repo root.
"""
from __future__ import annotations

import argparse
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_topology(n_procs: int, dev_per_proc: int, size: int, waves: int):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_per_proc}"
    env["PYTHONPATH"] = REPO

    procs = []
    t0 = time.perf_counter()
    for pid in range(n_procs):
        cmd = [
            sys.executable, os.path.join(REPO, "examples", "multihost_render.py"),
            "--size", str(size), "--waves", str(waves), "--cpu",
        ]
        if n_procs > 1:
            cmd += ["--coordinator", coord, "--num-processes", str(n_procs),
                    "--process-id", str(pid)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        ))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    wall = time.perf_counter() - t0
    for p in procs:
        assert p.returncode == 0, outs[procs.index(p)][-2000:]
    out0 = outs[0]
    # Recompute rays/s from the printed render time (the example's M-rays/s
    # print has too few digits at CPU-scale throughputs).
    m = re.search(r"rays in ([\d.]+)s", out0)
    mw = re.search(r"mean w ([\d.]+)", out0)
    mi = re.search(r"([\d.]+) iters/s/device", out0)
    assert m, out0[-2000:]
    render_s = float(m.group(1))
    rays = size * size * waves
    ips = float(mi.group(1)) if mi else None
    return rays / render_s, float(mw.group(1)) if mw else None, wall, ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--waves", type=int, default=2)
    args = ap.parse_args()

    rows = []
    for n_procs in (1, 2, 4):
        rays, mean_w, wall, ips = run_topology(n_procs, 2, args.size, args.waves)
        rows.append((n_procs, 2, n_procs * 2, rays, mean_w, wall, ips))
        print(f"{n_procs} proc x 2 dev: {rays:,.0f} rays/s, "
              f"{ips} iters/s/device, mean_w={mean_w}, wall {wall:.0f}s",
              flush=True)

    mws = {r[4] for r in rows}
    assert len(mws) == 1, f"film statistics differ across topologies: {mws}"

    with open(os.path.join(REPO, "MULTIHOST.md"), "w") as f:
        f.write(
            "# Multi-process scaling harness (virtual, CPU)\n\n"
            f"`examples/multihost_render.py` at {args.size}x{args.size}, "
            f"{args.waves} waves, 2 virtual CPU devices per process, localhost\n"
            "`jax.distributed` coordinator. Real multi-chip hardware is not\n"
            "available in this environment (single tunneled TPU chip); this\n"
            "demonstrates the BASELINE.json config-5 scaling harness executes at\n"
            "every topology: process bring-up, global ('rays','spp') mesh,\n"
            "cross-process film gather, identical film statistics. The host has\n"
            "2 physical cores shared by all topologies, so rays/s here measures\n"
            "CPU contention, not chip scaling. The per-DEVICE wavefront\n"
            "iterations/s column is the contention-honest work-rate metric\n"
            "(VERDICT r3 item 3): each device's while-loop trips over its own\n"
            "pixel shard — duplicated or skipped work would show up directly,\n"
            "and on real multi-chip hardware a >=85%-scaling run keeps it\n"
            "near-constant across topologies. The structural communication\n"
            "plan (forward communication-free over 'rays'; only the expected\n"
            "psums anywhere) is asserted on compiled HLO by\n"
            "tests/test_sharding.py::TestCollectiveStructure.\n\n"
            "| processes | devices/proc | global devices | rays/s total | iters/s/device | film mean w | wall s |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for n, d, g, rays, mw, wall, ips in rows:
            f.write(f"| {n} | {d} | {g} | {rays:,.0f} | {ips} | {mw} | {wall:.0f} |\n")
    print("wrote MULTIHOST.md", flush=True)


if __name__ == "__main__":
    main()
