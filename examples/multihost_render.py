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
import os as _os
import sys as _sys

# runnable without installation: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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
    ap.add_argument("--train-size", type=int, default=32,
                    help="training image edge (pixels)")
    ap.add_argument("--train-steps", type=int, default=10)
    ap.add_argument("--checkpoint", default=None, metavar="NPZ",
                    help="training checkpoint (grids + optimizer state)")
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
    contrib, _, _, _ = render_wave_sharded(
        mesh, medium, params, camera, None, raster, pids, 10, 0, True,
        return_lane_iters=True,
    )
    jax.block_until_ready(contrib)

    t0 = time.perf_counter()
    film = None
    iters_tot = None
    lane_tot = None
    for w in range(1, args.waves + 1):
        contrib, _, iters, lane_iters = render_wave_sharded(
            mesh, medium, params, camera, None, raster, pids, 10, w, True,
            return_lane_iters=True,
        )
        film = contrib if film is None else film + contrib
        iters_tot = iters if iters_tot is None else iters_tot + iters
        lane_tot = lane_iters if lane_tot is None else lane_tot + lane_iters
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    spp_per_wave = mesh.shape["spp"]
    rays = npix * args.waves * spp_per_wave
    if jax.process_index() == 0:
        n_dev = mesh.devices.size
        # Two work metrics (MULTIHOST.md): lane-iterations/wave is a PURE
        # COUNT, identical across mesh topologies by construction (each
        # lane's path length is fixed by its counter-keyed draws) — the
        # contention-free evidence that no work is duplicated or skipped.
        # The rays/s and iters/s columns are wall-clock rates: on a
        # shared-core host they measure CPU contention, not chip scaling.
        it_tot = int(iters_tot)
        lane_it = int(lane_tot)
        print(
            f"[multihost] {rays/1e6:.1f}M rays in {dt:.2f}s: "
            f"{rays/dt/1e6:.2f}M rays/s total, "
            f"{rays/dt/n_dev/1e6:.3f}M rays/s/chip over {n_dev} chips, "
            f"{it_tot} device-iterations, "
            f"{lane_it // args.waves} lane-iterations/wave (topology-invariant), "
            f"{it_tot/dt/n_dev:.1f} iters/s/device (contention-bound)"
        )
    # gather_film_to_host runs an XLA all-gather when the film is cross-host
    # sharded: EVERY process must call it (a process-0-only call deadlocks
    # the collective and trips the jax.distributed shutdown barrier).
    out = multihost.gather_film_to_host(film)
    if jax.process_index() == 0 and out is not None:
        out = out[:npix].reshape(H, W, 4)
        print(f"[multihost] film shape {out.shape}, mean w {out[..., 3].mean():.1f}")

    if args.train:
        # Joint density/temperature optimization toward a REAL rendered
        # target (BASELINE.json config 5): the target medium is an emissive
        # plume; the optimization starts from a flattened density and a
        # cooled temperature field and recovers both. Optimizer state is
        # checkpointed every step and training resumes from --checkpoint.
        import dataclasses

        import optax

        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids,
            load_train_checkpoint,
            make_train_step,
            param_from_density,
            save_train_checkpoint,
        )
        from volume_path_tracer_tpu.grids.procedural import fire_plume
        from volume_path_tracer_tpu.render.integrator import trace_rays
        from volume_path_tracer_tpu.utils import rng as vrng
        from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

        Wt = Ht = args.train_size
        dens_g, temp_raw = fire_plume(height=40, radius=10.0)
        # Normalize the plume temperature to a smooth [0, 10] field: with
        # offset 1100 K / scale 20 K the emission spans ~25x (not the 10^4x
        # a raw fire core produces), keeping the Monte-Carlo loss floor well
        # below the optimization signal at few samples/step.
        tmax = float(np.asarray(temp_raw.data).max())
        temp_g = dataclasses.replace(
            temp_raw, data=jnp.asarray(temp_raw.data) / tmax * 10.0
        )
        target_med = Medium.from_grids(dens_g, temp_g, pack=False)
        tparams = dataclasses.replace(
            params, sigma_a=0.8, sigma_s=0.2, hg_g=0.6, le_scale=4e-7,
            temperature_offset=1100.0, temperature_scale=20.0,
            infinite_xyz=(1.0, 1.0, 1.0), infinite_multiplier=0.2,
            distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=3.0,
            max_iters=1024,
        )
        tcam = Camera.from_parameters(
            CameraParameters((0.0, 20.0, -70.0), (0.0, 20.0, 0.0),
                             (0.0, 1.0, 0.0), 40.0, 1.0),
            (Wt, Ht),
        )
        bb = jnp.asarray(blackbody_xyz_table())

        ys, xs = np.mgrid[0:Ht, 0:Wt]
        t_raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
        )
        t_pids = jnp.arange(Wt * Ht, dtype=jnp.int32)

        # Target pixels: converged mean over several waves of the target
        # medium (a real image, not zeros).
        target_px = 0
        n_tw = 6
        for w in range(n_tw):
            stream = vrng.mix_stream(77, 100 + w)
            u = vrng.counter_uniforms(t_pids, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = tcam.generate_rays(t_raster, u * 0.5)
            L, _, _ = trace_rays(
                target_med, tparams, bb, o_w, d_w, t_pids, stream
            )
            target_px = target_px + L
        target_px = tcam.imaging_ratio * target_px / n_tw

        # Start point: flattened density, cooled temperature.
        start_dens = jnp.asarray(dens_g.data) * 0.4 + 0.05
        start_temp = jnp.asarray(temp_g.data) * 0.6
        base = Medium.from_grids(
            dataclasses.replace(dens_g, data=start_dens),
            dataclasses.replace(temp_g, data=start_temp),
            pack=False,
        )
        grids = OptimizableGrids(
            log_density=param_from_density(start_dens),
            temperature=start_temp,
        )
        opt = optax.adam(0.03)
        state = opt.init(grids)
        start_step = 0
        if args.checkpoint:
            ck = load_train_checkpoint(args.checkpoint, grids, state)
            if ck is not None:
                grids, state, start_step = ck
                if jax.process_index() == 0:
                    print(f"[multihost] resumed training at step {start_step}")

        step = make_train_step(
            base, tparams, tcam, bb, opt, n_iters=512,
            mesh=mesh if mesh.devices.size > 1 else None,
            samples_per_step=8, use_prb=True,
        )
        if mesh.devices.size > 1:
            pad = (-t_pids.shape[0]) % mesh.shape["rays"]
            if pad:
                # Training pads duplicate pixel 0 (raster, pid AND target):
                # every padded lane contributes a VALID loss term for pixel 0
                # (slightly up-weighting it) instead of a bogus ray-vs-zero
                # residual. (The film path pads with the out-of-image
                # sentinel `npix` instead — shard.pad_ray_batch — because
                # film lanes are sliced off, not summed into a loss.)
                t_raster = jnp.concatenate(
                    [t_raster, jnp.tile(t_raster[:1], (pad, 1))]
                )
                t_pids = jnp.concatenate(
                    [t_pids, jnp.zeros((pad,), jnp.int32)]
                )
                target_px = jnp.concatenate(
                    [target_px, jnp.tile(target_px[:1], (pad, 1))]
                )

        t0 = time.perf_counter()
        losses = []
        for it in range(start_step, start_step + args.train_steps):
            sw = jnp.asarray([77, it + 1], jnp.uint32)
            grids, state, loss = step(
                grids, state, t_raster, t_pids, target_px, sw
            )
            losses.append(float(loss))
            if jax.process_index() == 0:
                print(f"[train] step {it}: loss {losses[-1]:.6f}", flush=True)
                if args.checkpoint:
                    save_train_checkpoint(args.checkpoint, grids, state, it + 1)
        jax.block_until_ready(loss)
        if jax.process_index() == 0:
            print(
                f"[multihost] {len(losses)} joint density+temperature steps in "
                f"{time.perf_counter()-t0:.2f}s; loss {losses[0]:.5f} -> "
                f"{losses[-1]:.5f}"
            )


if __name__ == "__main__":
    main()
