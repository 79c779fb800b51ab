"""Benchmark: camera-ray throughput on the flagship wdas_cloud-like config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.json): rays/s/chip on the wdas_cloud configuration
at 256x256 @ 16 spp — "rays" counts camera rays (pixel samples); each ray's
full transport (multiple scattering, NEE shadow rays) is included in the cost.
The reference publishes no numbers and its C++ build/assets are unavailable
(BASELINE.md), so vs_baseline is the ratio against the first recorded run of
this benchmark on this hardware (BENCH_BASELINE.json, written on first run):
1.0 on the first round, >1.0 when later rounds get faster.

Scene: the reference's wdas_cloud.json parameters (sigma_s=0.15, g=0.4,
distant+infinite lights, max_depth=100) applied to a procedural 96^3 fog
sphere standing in for the absent wdas_cloud.nvdb asset.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the staged-compaction render program is
    # large (one while_loop per compaction stage); caching keeps repeat runs
    # of this benchmark from paying the multi-minute cold compile when the
    # host is under load.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.camera import Camera
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
    from volume_path_tracer_tpu.utils import rng as vrng
    from volume_path_tracer_tpu.utils.config import CameraParameters

    W = H = 256
    SPP = 16
    N_GRID_RADIUS = 30.0

    medium = Medium.from_grids(fog_sphere(radius=N_GRID_RADIUS, falloff=6.0))
    camera = Camera.from_parameters(
        CameraParameters(
            position=(110.0, 0.0, 0.0),
            look=(0.0, 0.0, 0.0),
            up=(0.0, 1.0, 0.0),
            vfov_deg=35.0,
            imaging_ratio=0.1,
        ),
        (W, H),
    )
    # wdas_cloud.json transport parameters (scenes/wdas_cloud.json)
    params = IntegratorParams(
        sigma_a=0.0,
        sigma_s=0.15,
        hg_g=0.4,
        le_scale=0.0,
        temperature_offset=300.0,
        temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603),
        infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883),
        distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=100,
        max_iters=4096,
    )

    ys, xs = np.mgrid[0:H, 0:W]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(W * H, dtype=jnp.int32)

    def wave_fn(medium_, camera_, raster_, pids_, seed_wave):
        stream = vrng.mix_stream(seed_wave[0], seed_wave[1])
        u_jit = vrng.counter_uniforms(pids_, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera_.generate_rays(raster_, u_jit * 0.5)
        L, iters, n_capped = trace_rays(medium_, params, None, o_w, d_w, pids_, stream)
        return camera_.imaging_ratio * L, iters, n_capped

    wave_jit = jax.jit(wave_fn)

    # Warmup / compile.
    sw = jnp.asarray([10, 0], jnp.uint32)
    out, _, _ = wave_jit(medium, camera, raster, pids, sw)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    acc = None
    for wave in range(1, SPP + 1):
        sw = jnp.asarray([10, wave], jnp.uint32)
        L, _, _ = wave_jit(medium, camera, raster, pids, sw)
        acc = L if acc is None else acc + L
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    n_rays = W * H * SPP
    rays_per_s = n_rays / dt
    assert bool(jnp.isfinite(acc).all()), "non-finite radiance in benchmark render"

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        base = json.load(open(base_path))["rays_per_s"]
    else:
        json.dump(
            {"rays_per_s": rays_per_s, "note": "first recorded run, this hardware"},
            open(base_path, "w"),
        )
        base = rays_per_s

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
