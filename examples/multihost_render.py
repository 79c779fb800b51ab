"""Multi-host render/training launcher (BASELINE.json config 5).

Run the same script on every host of a pod slice:

    python examples/multihost_render.py --coordinator HOST0:8476 \
        --num-processes N --process-id I [--train]

On a single host it degrades to an all-local-devices mesh (no distributed
init). Renders a 1024x1024 wdas_cloud-like scene sharded over every device,
reports rays/s, and optionally runs joint density optimization steps with the
grid-gradient all-reduce crossing hosts.
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--spp-axis", type=int, default=1)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from volume_path_tracer_tpu.parallel import multihost

    multihost.initialize(args.coordinator, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.camera import Camera
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.parallel.shard import render_wave_sharded
    from volume_path_tracer_tpu.render.integrator import IntegratorParams
    from volume_path_tracer_tpu.utils.config import CameraParameters

    mesh = multihost.global_mesh(spp=args.spp_axis)
    if jax.process_index() == 0:
        print(f"[multihost] {jax.process_count()} processes, mesh {dict(mesh.shape)}")

    W = H = args.size
    medium = multihost.replicate(mesh, Medium.from_grids(fog_sphere(radius=40.0, falloff=8.0)))
    camera = Camera.from_parameters(
        CameraParameters((150.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                         35.0, 0.1),
        (W, H),
    )
    params = IntegratorParams(
        sigma_a=0.0, sigma_s=0.15, hg_g=0.4, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.766, 0.2717),
        max_depth=100, max_iters=4096,
    )

    raster, pids, npix = multihost.make_global_ray_batch(mesh, W, H)

    # warmup
    contrib = render_wave_sharded(
        mesh, medium, params, camera, None, raster, pids, 10, 0, True
    )
    jax.block_until_ready(contrib)

    t0 = time.perf_counter()
    film = None
    for w in range(1, args.waves + 1):
        contrib = render_wave_sharded(
            mesh, medium, params, camera, None, raster, pids, 10, w, True
        )
        film = contrib if film is None else film + contrib
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    spp_per_wave = mesh.shape["spp"]
    rays = npix * args.waves * spp_per_wave
    if jax.process_index() == 0:
        n_dev = mesh.devices.size
        print(
            f"[multihost] {rays/1e6:.1f}M rays in {dt:.2f}s: "
            f"{rays/dt/1e6:.2f}M rays/s total, "
            f"{rays/dt/n_dev/1e6:.3f}M rays/s/chip over {n_dev} chips"
        )
        out = multihost.gather_film_to_host(film)
        if out is not None:
            out = out[:npix].reshape(H, W, 4)
            print(f"[multihost] film shape {out.shape}, mean w {out[..., 3].mean():.1f}")

    if args.train:
        import optax

        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids, make_train_step, param_from_density,
        )

        opt = optax.adam(0.02)
        base = Medium.from_grids(fog_sphere(radius=40.0, falloff=8.0), pack=False)
        grids = OptimizableGrids(log_density=param_from_density(base.density.data))
        step = make_train_step(
            base, params, camera, None, opt, n_iters=256, mesh=mesh,
            samples_per_step=2,
        )
        state = opt.init(grids)
        target = jnp.zeros((raster.shape[0], 3), jnp.float32)
        t0 = time.perf_counter()
        for it in range(3):
            sw = jnp.asarray([10, it + 1], jnp.uint32)
            grids, state, loss = step(grids, state, raster, pids, target, sw)
        jax.block_until_ready(loss)
        if jax.process_index() == 0:
            print(f"[multihost] 3 train steps in {time.perf_counter()-t0:.2f}s, "
                  f"loss {float(loss):.5f}")


if __name__ == "__main__":
    main()
