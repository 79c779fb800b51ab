"""Inverse rendering demo: recover grids from rendered targets.

BASELINE.json config 4 ("recover the wdas_cloud density grid from target
images via pixel gradients"), on a procedural stand-in volume. Renders target
images of a blob from several viewpoints, then optimizes a flat initial
density to match, reporting loss + voxel correlation and saving before/after
renders.

    python examples/inverse_rendering.py [--cpu] [--steps 60] [--out DIR]

`--joint` switches to the north star's JOINT density+temperature mode
(BASELINE.json config 5): an emissive plume (blackbody emission through the
spectral LUT, worker.cpp:152-157) whose temperature field was flattened to
the background value; density and temperature are co-optimized and the
loss / temperature-error curve is written to <out>/joint_recovery.json.

    python examples/inverse_rendering.py --joint [--steps 80]
"""
from __future__ import annotations

import argparse
import os as _os
import sys as _sys

# runnable without installation: put the repo root on sys.path
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=24, help="image width/height")
    ap.add_argument("--grid", type=int, default=12, help="density grid size")
    ap.add_argument("--joint", action="store_true",
                    help="joint density+temperature recovery (emissive scene)")
    ap.add_argument("--out", default="/tmp/vpt_inverse")
    args = ap.parse_args()
    if args.joint:
        return joint_main(args)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from volume_path_tracer_tpu.diff.inverse import (
        OptimizableGrids, density_from_param, make_train_step, param_from_density,
    )
    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
    from volume_path_tracer_tpu.io.png import write_png
    from volume_path_tracer_tpu.models.camera import Camera
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
    from volume_path_tracer_tpu.utils import rng as vrng
    from volume_path_tracer_tpu.utils.color import film_to_srgb_u8
    from volume_path_tracer_tpu.utils.config import CameraParameters

    os.makedirs(args.out, exist_ok=True)
    n = args.grid
    i = np.arange(n) - (n - 1) / 2
    x, y, z = np.meshgrid(i, i, i, indexing="ij")
    target_rho = (np.exp(-(x**2 + 1.5 * y**2 + z**2) / (n / 1.6)) * 0.9).astype(
        np.float32
    )
    med_target = Medium.from_grids(dense_grid_from_array(target_rho), pack=False)

    W = H = args.size
    dist = n * 2.6
    params = IntegratorParams(
        sigma_a=0.3, sigma_s=0.0, hg_g=0.0, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(1.0, 1.0, 1.0), infinite_multiplier=1.0,
        distant_xyz=(0.0, 0.0, 0.0), distant_multiplier=0.0,
        distant_inv_direction=(0.0, 1.0, 0.0), max_depth=50, max_iters=256,
    )
    views = [(dist, 0.0, 0.0), (0.0, 0.0, dist), (0.0, dist * 1.0, 0.1)]
    cams = [
        Camera.from_parameters(
            CameraParameters(p, (0.0, 0.0, 0.0),
                             (0.0, 1.0, 0.0) if abs(p[1]) < 1 else (1.0, 0.0, 0.0),
                             40.0, 1.0),
            (W, H),
        )
        for p in views
    ]

    ys, xs = np.mgrid[0:H, 0:W]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(W * H, dtype=jnp.int32)

    def render_target(cam, medium, seed=11, waves=24):
        acc = 0
        for w in range(waves):
            stream = vrng.mix_stream(seed, 500 + w)
            u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = cam.generate_rays(raster, u * 0.5)
            L, _, _ = trace_rays(medium, params, None, o_w, d_w, pids, stream)
            acc = acc + L
        return acc / waves

    print("[inverse] rendering targets...")
    targets = [render_target(c, med_target) for c in cams]
    for vi, t in enumerate(targets):
        film = jnp.concatenate([t, jnp.ones((t.shape[0], 1))], -1).reshape(H, W, 4)
        write_png(f"{args.out}/target_v{vi}.png", np.asarray(film_to_srgb_u8(film)))

    start = np.full((n, n, n), 0.25, np.float32)
    base_med = Medium.from_grids(dense_grid_from_array(start), pack=False)
    grids = OptimizableGrids(log_density=param_from_density(jnp.asarray(start)))
    optimizer = optax.adam(0.08)
    opt_state = optimizer.init(grids)
    steps = [
        make_train_step(base_med, params, c, None, optimizer, n_iters=192,
                        samples_per_step=8)
        for c in cams
    ]

    t0 = time.time()
    first_loss = None
    for it in range(args.steps):
        for vi, (stepf, tgt) in enumerate(zip(steps, targets)):
            sw = jnp.asarray([11, it * len(cams) + vi + 1], jnp.uint32)
            grids, opt_state, loss = stepf(grids, opt_state, raster, pids, tgt, sw)
        if first_loss is None:
            first_loss = float(loss)
        if (it + 1) % 10 == 0 or it == 0:
            rec = np.asarray(density_from_param(grids.log_density))
            corr = np.corrcoef(rec.reshape(-1), target_rho.reshape(-1))[0, 1]
            print(f"[inverse] step {it+1:3d} loss={float(loss):.5f} vox_corr={corr:.3f}")

    rec = np.asarray(density_from_param(grids.log_density))
    med_rec = Medium.from_grids(dense_grid_from_array(rec), pack=False)
    for vi, cam in enumerate(cams):
        t = render_target(cam, med_rec, seed=77)
        film = jnp.concatenate([t, jnp.ones((t.shape[0], 1))], -1).reshape(H, W, 4)
        write_png(f"{args.out}/recovered_v{vi}.png", np.asarray(film_to_srgb_u8(film)))
    corr = np.corrcoef(rec.reshape(-1), target_rho.reshape(-1))[0, 1]
    print(
        f"[inverse] done in {time.time()-t0:.0f}s: loss {first_loss:.5f} -> "
        f"{float(loss):.5f}, voxel corr {corr:.3f}; images in {args.out}/"
    )


def joint_main(args):
    """Joint density+temperature recovery on an emissive plume.

    The target scene emits blackbody radiation (temperature grid sampled at
    its own transform, worker.cpp:153-157); the optimization starts from the
    true density (free to drift) and a FLAT background temperature, and must
    reconstruct the hot core from pixel gradients alone — the inverse of the
    reference's emission term, through the spectral LUT's slope.
    """
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from volume_path_tracer_tpu.diff.inverse import (
        OptimizableGrids, make_train_step, param_from_density,
    )
    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
    from volume_path_tracer_tpu.io.png import write_png
    from volume_path_tracer_tpu.models.camera import Camera
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
    from volume_path_tracer_tpu.utils import rng as vrng
    from volume_path_tracer_tpu.utils.color import film_to_srgb_u8
    from volume_path_tracer_tpu.utils.config import CameraParameters
    from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

    os.makedirs(args.out, exist_ok=True)
    n = args.grid
    i = np.arange(n) - (n - 1) / 2
    x, y, z = np.meshgrid(i, i, i, indexing="ij")
    r2 = x**2 + y**2 + z**2
    rho_true = (np.exp(-r2 / (n / 1.2)) * 0.8).astype(np.float32)
    # hot core on a warm background, NARROW contrast (T_K 1.1-1.3 kK):
    # blackbody radiance is exponential in T, and a wide contrast makes the
    # per-sample radiance span decades — the MC noise floor then swamps the
    # optimization signal at example-sized batches
    temp_true = (20.0 + 5.0 * np.exp(-r2 / (n / 1.6))).astype(np.float32)
    med_true = Medium.from_grids(
        dense_grid_from_array(rho_true), dense_grid_from_array(temp_true),
        pack=False,
    )
    bb = jnp.asarray(blackbody_xyz_table())
    params = IntegratorParams(
        sigma_a=0.4, sigma_s=0.0, hg_g=0.0, le_scale=5e-4,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(1.0, 1.0, 1.0), infinite_multiplier=0.2,
        distant_xyz=(0.0, 0.0, 0.0), distant_multiplier=0.0,
        distant_inv_direction=(0.0, 1.0, 0.0), max_depth=50, max_iters=256,
    )
    W = H = args.size
    camera = Camera.from_parameters(
        CameraParameters((n * 2.6, 0.0, 0.0), (0.0, 0.0, 0.0),
                         (0.0, 1.0, 0.0), 42.0, 1.0),
        (W, H),
    )
    ys, xs = np.mgrid[0:H, 0:W]
    raster = jnp.asarray(
        np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(W * H, dtype=jnp.int32)

    print("[joint] rendering emissive targets...")
    target_px = 0
    for w in range(16):
        stream = vrng.mix_stream(11, 500 + w)
        u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera.generate_rays(raster, u * 0.5)
        L, _, _ = trace_rays(med_true, params, bb, o_w, d_w, pids, stream)
        target_px = target_px + L
    target_px = target_px / 16
    film = jnp.concatenate(
        [target_px, jnp.ones((target_px.shape[0], 1))], -1).reshape(H, W, 4)
    write_png(f"{args.out}/joint_target.png", np.asarray(film_to_srgb_u8(film)))

    temp0 = np.full((n, n, n), 20.0, np.float32)
    base_med = Medium.from_grids(
        dense_grid_from_array(rho_true), dense_grid_from_array(temp0),
        pack=False,
    )
    grids = OptimizableGrids(
        log_density=param_from_density(jnp.asarray(rho_true)),
        temperature=jnp.asarray(temp0),
    )
    # Per-parameter learning rates (density starts at truth; temperature
    # must travel) + the dual-buffer loss (unbiased MSE gradient — the
    # plain k-sample MSE's Var/k term biases emissive optimization).
    label = OptimizableGrids(log_density="dens", temperature="temp")
    optimizer = optax.multi_transform(
        {"dens": optax.adam(0.02), "temp": optax.adam(0.3)}, label)
    opt_state = optimizer.init(grids)
    step = make_train_step(base_med, params, camera, bb, optimizer,
                           n_iters=256, samples_per_step=4, dual_buffer=True)

    t0 = time.time()
    curve = []
    # Error metrics weight by density: emission is p_a * bb(T) with
    # p_a ~ rho (worker.cpp:148-157), so zero-density voxels emit nothing
    # and their temperature is unconstrained by any image.
    wgt = rho_true / rho_true.sum()

    def werr(t):
        return float((wgt * np.abs(t - temp_true)).sum())

    err0 = werr(temp0)
    for it in range(args.steps):
        sw = jnp.asarray([11, it + 1], jnp.uint32)
        grids, opt_state, loss = step(grids, opt_state, raster, pids, target_px, sw)
        rec = np.asarray(grids.temperature)
        err = werr(rec)
        corr = float(np.corrcoef(rec.reshape(-1), temp_true.reshape(-1))[0, 1])
        curve.append({"step": it + 1, "loss": float(loss),
                      "temp_mae": round(err, 4), "temp_corr": round(corr, 4)})
        if (it + 1) % 10 == 0 or it == 0:
            print(f"[joint] step {it+1:3d} loss={float(loss):.5f} "
                  f"T_mae={err:.3f} (init {err0:.3f}) T_corr={corr:.3f}")

    med_rec = Medium.from_grids(
        dense_grid_from_array(
            np.asarray(jax.nn.softplus(grids.log_density))),
        dense_grid_from_array(np.asarray(grids.temperature)), pack=False,
    )
    rec_px = 0
    for w in range(16):
        stream = vrng.mix_stream(77, 500 + w)
        u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera.generate_rays(raster, u * 0.5)
        L, _, _ = trace_rays(med_rec, params, bb, o_w, d_w, pids, stream)
        rec_px = rec_px + L
    film = jnp.concatenate(
        [rec_px / 16, jnp.ones((W * H, 1))], -1).reshape(H, W, 4)
    write_png(f"{args.out}/joint_recovered.png", np.asarray(film_to_srgb_u8(film)))

    summary = {
        "scene": "emissive plume, joint density+temperature",
        "grid": n, "image": [W, H], "steps": args.steps,
        "temp_mae_init": round(err0, 4),
        "temp_mae_final": curve[-1]["temp_mae"],
        "temp_corr_final": curve[-1]["temp_corr"],
        "loss_first": curve[0]["loss"], "loss_last": curve[-1]["loss"],
        "wall_s": round(time.time() - t0, 1),
        "curve": curve,
    }
    with open(f"{args.out}/joint_recovery.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[joint] done in {summary['wall_s']}s: T_mae {err0:.3f} -> "
          f"{summary['temp_mae_final']:.3f}, T_corr {summary['temp_corr_final']:.3f}; "
          f"artifacts in {args.out}/")


if __name__ == "__main__":
    main()
