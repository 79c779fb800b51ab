"""Benchmark: camera-ray throughput on the flagship wdas_cloud-like config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.json): rays/s/chip on the wdas_cloud configuration
at 256x256 @ 16 spp — "rays" counts camera rays (pixel samples); each ray's
full transport (multiple scattering, NEE shadow rays) is included in the cost.
The reference publishes no numbers and its C++ build/assets are unavailable
(BASELINE.md), so vs_baseline is the ratio against the first recorded run of
this benchmark on this hardware (BENCH_BASELINE.json, written on first run):
1.0 on the first round, >1.0 when later rounds get faster.

Primary scene: the reference's wdas_cloud.json parameters (sigma_s=0.15,
g=0.4, distant+infinite lights, max_depth=100) on a procedural 77^3 fog
sphere standing in for the absent wdas_cloud.nvdb asset.

`python bench.py --full` additionally measures (results -> BENCH_EXTRA.json):
  - big_cloud: a 512^3, ~12%-occupancy procedural cumulus (production-scale
    HBM-resident grid), packed-rows vs raw-gather paths;
  - fire: the reference fire.json transport (sigma_t=2.9, g=0.7, emissive
    blackbody, deep paths) on the procedural plume;
  - train: forward+backward (replay-VJP) throughput of an inverse-rendering
    step on the flagship scene.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _common_setup():
    import jax

    # Persistent compilation cache: the staged-compaction render program is
    # large (one while_loop per compaction stage); caching keeps repeat runs
    # of this benchmark from paying the multi-minute cold compile when the
    # host is under load.
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _wdas_params(max_iters=4096):
    from volume_path_tracer_tpu.render.integrator import IntegratorParams

    # scenes/wdas_cloud.json transport parameters
    return IntegratorParams(
        sigma_a=0.0, sigma_s=0.15, hg_g=0.4, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=100, max_iters=max_iters,
    )


def _fire_params(max_iters=8192):
    from volume_path_tracer_tpu.render.integrator import IntegratorParams

    # scenes/fire.json transport parameters (max_depth 10^6, sigma_t=2.9)
    return IntegratorParams(
        sigma_a=2.0, sigma_s=0.9, hg_g=0.7, le_scale=4e-8,
        temperature_offset=300.0, temperature_scale=43.0,
        infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=10.0,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=20.0,
        distant_inv_direction=(0.5, 1.0, 0.0),
        max_depth=1_000_000, max_iters=max_iters,
    )


def _camera(W, H, pos, look=(0.0, 0.0, 0.0), vfov=35.0, ratio=0.1):
    from volume_path_tracer_tpu.models.camera import Camera
    from volume_path_tracer_tpu.utils.config import CameraParameters

    return Camera.from_parameters(
        CameraParameters(pos, look, (0.0, 1.0, 0.0), vfov, ratio), (W, H)
    )


def _render_throughput(medium, camera, params, W, H, spp, bb=None, seed=10,
                       waves_per_batch=None):
    """Returns rays/s over `spp` samples/pixel (compile excluded).

    Waves are batched into one flat ray batch of waves_per_batch * W * H
    lanes per jitted call (per-lane RNG streams keep every wave's draws
    identical to the one-wave-at-a-time path): larger wavefronts amortize
    the loop's fixed per-iteration overheads, and the compaction stages pool
    the alive tails of all batched waves.
    """
    import jax
    import jax.numpy as jnp

    from volume_path_tracer_tpu.render.integrator import trace_rays
    from volume_path_tracer_tpu.utils import rng as vrng

    npix = W * H
    if waves_per_batch is None:
        # Cap the batch near 1M lanes (state ~100 MB at 1M).
        waves_per_batch = max(1, min(spp, (1 << 20) // npix))
        while spp % waves_per_batch:
            waves_per_batch -= 1
    k = waves_per_batch
    ys, xs = np.mgrid[0:H, 0:W]
    raster1 = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    raster = jnp.asarray(np.tile(raster1, (k, 1)))
    pids = jnp.asarray(np.tile(np.arange(npix, dtype=np.int32), k))

    def batch_fn(medium_, camera_, raster_, pids_, seed_wave0):
        waves = seed_wave0[1] + jnp.arange(k, dtype=jnp.uint32)
        stream = jnp.repeat(vrng.mix_stream(seed_wave0[0], waves), npix)
        u_jit = vrng.counter_uniforms(pids_, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera_.generate_rays(raster_, u_jit * 0.5)
        L, iters, n_capped = trace_rays(medium_, params, bb, o_w, d_w, pids_, stream)
        return camera_.imaging_ratio * jnp.sum(L.reshape(k, npix, 3), 0), iters, n_capped

    batch_jit = jax.jit(batch_fn)
    out, _, _ = batch_jit(medium, camera, raster, pids, jnp.asarray([seed, 1000], jnp.uint32))
    jax.block_until_ready(out)

    # Best-of-3 passes: the axon-tunneled TPU's dispatch path is hosted, so a
    # transiently loaded host (e.g. a concurrent compile) can inflate a single
    # pass by orders of magnitude; the best pass is the hardware number.
    best_dt, acc, ncap_total = None, None, 0
    for rep in range(3):
        t0 = time.perf_counter()
        acc = None
        ncap_total = 0
        for w0 in range(1, spp + 1, k):
            L, _, ncap = batch_jit(medium, camera, raster, pids, jnp.asarray([seed, w0], jnp.uint32))
            acc = L if acc is None else acc + L
            ncap_total += int(ncap)
        jax.block_until_ready(acc)
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    assert bool(np.isfinite(np.asarray(acc)).all()), "non-finite radiance"
    return npix * spp / best_dt, ncap_total


def bench_primary():
    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.medium import Medium

    medium = Medium.from_grids(fog_sphere(radius=30.0, falloff=6.0))
    camera = _camera(256, 256, (110.0, 0.0, 0.0))
    rays_per_s, _ = _render_throughput(medium, camera, _wdas_params(), 256, 256, 16)
    return rays_per_s


def _big_cloud_cached(n=512):
    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
    from volume_path_tracer_tpu.grids.procedural import big_cloud

    cache = os.path.join(_REPO, ".jax_cache", f"big_cloud_{n}.npy")
    if os.path.exists(cache):
        data = np.load(cache)
        h = n // 2
        return dense_grid_from_array(data, origin_ijk=(-h, -h, -h), voxel_size=1.0)
    g = big_cloud(n=n)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.save(cache, np.asarray(g.data))
    return g


def bench_full():
    import jax
    import jax.numpy as jnp

    from volume_path_tracer_tpu.grids.procedural import fire_plume
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

    out = {}

    # --- big_cloud 512^3, packed vs raw gather paths ---
    grid = _big_cloud_cached(512)
    cam = _camera(256, 256, (900.0, 0.0, 0.0), vfov=40.0)
    for packed in (True, False):
        med = Medium.from_grids(grid, pack=packed)
        rays, _ = _render_throughput(med, cam, _wdas_params(), 256, 256, 8)
        out[f"big_cloud_512_{'packed' if packed else 'raw'}_rays_per_s"] = round(rays, 1)
        del med

    # --- fire config (emissive, deep paths) ---
    dens, temp = fire_plume(height=96, radius=28.0)
    med = Medium.from_grids(dens, temp)
    bb = jnp.asarray(blackbody_xyz_table())
    cam = _camera(256, 256, (170.0, 48.0, 0.0), look=(0.0, 48.0, 0.0), vfov=37.0)
    rays, ncap = _render_throughput(med, cam, _fire_params(), 256, 256, 8, bb=bb)
    out["fire_rays_per_s"] = round(rays, 1)
    out["fire_capped_lanes"] = ncap

    # --- forward+backward (replay VJP) train-step throughput ---
    import optax

    from volume_path_tracer_tpu.diff.inverse import (
        OptimizableGrids, make_train_step, param_from_density,
    )
    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.medium import Medium as _M

    base = _M.from_grids(fog_sphere(radius=30.0, falloff=6.0), pack=False)
    camera = _camera(128, 128, (110.0, 0.0, 0.0))
    params = _wdas_params(max_iters=1024)
    k = 2
    optimizer = optax.adam(1e-2)
    grids = OptimizableGrids(log_density=param_from_density(base.density.data))
    opt_state = optimizer.init(grids)
    step = make_train_step(
        base, params, camera, None, optimizer, n_iters=1024,
        samples_per_step=k, use_prb=True, pack=True,
    )
    ys, xs = np.mgrid[0:128, 0:128]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(128 * 128, dtype=jnp.int32)
    target = jnp.zeros((128 * 128, 3), jnp.float32)
    g2, s2, loss = step(grids, opt_state, raster, pids, target, jnp.asarray([3, 1], jnp.uint32))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    reps = 3
    for it in range(reps):
        g2, s2, loss = step(g2, s2, raster, pids, target, jnp.asarray([3, it + 2], jnp.uint32))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / reps
    out["train_fwd_bwd_rays_per_s"] = round(128 * 128 * k / dt, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run big-grid/fire/backward benches -> BENCH_EXTRA.json")
    args = ap.parse_args()

    _common_setup()
    rays_per_s = bench_primary()

    base_path = os.path.join(_REPO, "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        base = json.load(open(base_path))["rays_per_s"]
    else:
        json.dump(
            {"rays_per_s": rays_per_s, "note": "first recorded run, this hardware"},
            open(base_path, "w"),
        )
        base = rays_per_s

    if args.full:
        extra = bench_full()
        extra["primary_rays_per_s"] = round(rays_per_s, 1)
        import jax

        extra["device"] = str(jax.devices()[0])
        with open(os.path.join(_REPO, "BENCH_EXTRA.json"), "w") as f:
            json.dump(extra, f, indent=1)
        print(json.dumps(extra), flush=True)

    print(
        json.dumps(
            {
                "metric": "wdas_cloud-like 256x256@16spp camera-ray throughput",
                "value": round(rays_per_s, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_s / base, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
