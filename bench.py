"""Benchmark: camera-ray throughput on the flagship wdas_cloud-like config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.json): rays/s/chip on the wdas_cloud configuration
at 256x256 @ 16 spp — "rays" counts camera rays (pixel samples); each ray's
full transport (multiple scattering, NEE shadow rays) is included in the cost.
The reference publishes no numbers and its C++ build/assets are unavailable
(BASELINE.md), so vs_baseline is the ratio against the first recorded run of
this benchmark on this hardware (BENCH_BASELINE.json, written on first run).

Scene (pinned since round 1): the reference's wdas_cloud.json transport
parameters (sigma_s=0.15, g=0.4, distant+infinite lights, max_depth=100) on a
procedural 77^3 fog sphere (fog_sphere(radius=30, falloff=6)) standing in for
the absent wdas_cloud.nvdb asset. (Round-1's docstring said "96^3"; the
generator was always 77^3 — the scene has never changed.)

Timing methodology (recorded in the JSON): one 65,536-lane wave per jitted
call; 1 warmup pass (compile + first-execution effects), then `reps` timed
passes of all 16 waves; every timed region ends in a forced device->host
transfer of a checksum. On this host `jax.block_until_ready` via the axon
tunnel can return before the computation finishes (measured: 16-wave passes
"completing" in 3 ms, a physical impossibility at ~300 sequential loop
iterations per wave), so only transfer-forced timings are trusted. Best pass
is reported as the hardware number; all passes are recorded.

`python bench.py --full` additionally measures (results -> BENCH_EXTRA.json):
  - big_cloud: a 512^3, ~12%-occupancy procedural cumulus (production-scale
    HBM-resident grid), packed-rows vs raw-gather paths;
  - fire: the reference fire.json transport (sigma_t=2.9, g=0.7, emissive
    blackbody, deep paths) on the procedural plume, with a max_iters sweep
    quantifying truncation (capped lanes);
  - train: forward+backward (replay-VJP) throughput of an inverse-rendering
    step on the flagship scene.

`python bench.py --verify` renders the flagship wave with BOTH the XLA
wavefront loop (render/integrator.trace_rays) and the Pallas megakernel
(render/megakernel.trace_rays_fused) on the real chip, asserts mean
agreement, records both timings -> BENCH_VERIFY.json.
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

    # Persistent compilation cache: keeps repeat runs of this benchmark from
    # paying the multi-minute cold compile when the host is under load.
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _wdas_params(max_iters=4096):
    from volume_path_tracer_tpu.render.integrator import IntegratorParams, _SUPER_TAU

    # scenes/wdas_cloud.json transport parameters. VPT_BENCH_SUPER_TAU lets
    # the exact driver command A/B the superbrick-opportunism threshold
    # (VERDICT r4 item 3) without editing the pinned scene.
    tau = float(os.environ.get("VPT_BENCH_SUPER_TAU", _SUPER_TAU))
    return IntegratorParams(
        sigma_a=0.0, sigma_s=0.15, hg_g=0.4, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=100, max_iters=max_iters, super_tau=tau,
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


def _make_wave_fn(tracer, params, bb=None):
    import jax
    import jax.numpy as jnp

    from volume_path_tracer_tpu.utils import rng as vrng

    def wave_fn(medium_, camera_, raster_, pids_, seed_wave):
        stream = vrng.mix_stream(seed_wave[0], seed_wave[1])
        stream = jnp.broadcast_to(stream, pids_.shape)
        u_jit = vrng.counter_uniforms(pids_, stream, jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera_.generate_rays(raster_, u_jit * 0.5)
        L, iters, n_capped = tracer(medium_, params, bb, o_w, d_w, pids_, stream)
        return camera_.imaging_ratio * L, iters, n_capped

    return jax.jit(wave_fn)


def _render_throughput(medium, camera, params, W, H, spp, bb=None, seed=10,
                       tracer=None, reps=3):
    """Returns (rays/s best-pass, n_capped, all pass times).

    One W*H-lane wave per jitted call (the round-1 shape: measured fastest on
    this hardware; the round-2 16-wave/1M-lane batching was 2x slower). Every
    timed pass ends in a forced host transfer (see module docstring).
    """
    import jax.numpy as jnp

    if tracer is None:
        from volume_path_tracer_tpu.render.integrator import trace_rays as tracer

    npix = W * H
    ys, xs = np.mgrid[0:H, 0:W]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(npix, dtype=jnp.int32)
    wave_jit = _make_wave_fn(tracer, params, bb)

    # Warmup: compile + one full unmeasured pass (the first post-compile pass
    # consistently runs ~2x slower than steady state on this host).
    acc = None
    for w in range(1, spp + 1):
        L, _, ncap = wave_jit(medium, camera, raster, pids, jnp.asarray([seed, w], jnp.uint32))
        acc = L if acc is None else acc + L
    _ = float(acc.sum())

    times = []
    ncap_dev = None
    for rep in range(reps):
        t0 = time.perf_counter()
        acc = None
        ncap_dev = None
        for w in range(1, spp + 1):
            L, _, ncap = wave_jit(
                medium, camera, raster, pids, jnp.asarray([seed, w], jnp.uint32)
            )
            acc = L if acc is None else acc + L
            # Accumulate ON DEVICE: a host int() here would block per wave and
            # serialize dispatch (adds one tunnel RTT per wave to the timing).
            ncap_dev = ncap if ncap_dev is None else ncap_dev + ncap
        chk = float(acc.sum())  # force completion inside the timed region
        times.append(time.perf_counter() - t0)
        assert np.isfinite(chk), "non-finite radiance"
    best = min(times)
    return npix * spp / best, int(ncap_dev), [round(t, 4) for t in times]


def bench_primary():
    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.render.megakernel import trace_rays_fused

    # Production path: the Pallas megakernel (head-to-head vs the XLA loop
    # in PERF.md section 4; --verify cross-checks the two on this chip).
    medium = Medium.from_grids(fog_sphere(radius=30.0, falloff=6.0))
    camera = _camera(256, 256, (110.0, 0.0, 0.0))
    # Best of 5 with the full spread recorded: round-4's driver number sat
    # 1.9% below the builder's own artifact on the same scene, within the
    # observed host variance — 5 passes + recorded times make the driver
    # number self-interpreting (VERDICT r4 weak 1).
    rays_per_s, _, times = _render_throughput(
        medium, camera, _wdas_params(), 256, 256, 16, tracer=trace_rays_fused,
        reps=5,
    )
    return rays_per_s, times


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

    from volume_path_tracer_tpu.render.megakernel import trace_rays_fused

    # --- big_cloud 512^3, packed vs raw gather paths ---
    # (the fused megakernel needs the packed rows; the raw path measures the
    # generic-gather fallback through the XLA loop)
    grid = _big_cloud_cached(512)
    cam = _camera(256, 256, (900.0, 0.0, 0.0), vfov=40.0)
    for packed in (True, False):
        med = Medium.from_grids(grid, pack=packed)
        rays, _, _ = _render_throughput(
            med, cam, _wdas_params(), 256, 256, 8, reps=2,
            tracer=trace_rays_fused if packed else None,
        )
        out[f"big_cloud_512_{'packed' if packed else 'raw'}_rays_per_s"] = round(rays, 1)
        del med

    # --- fire config (emissive, deep paths): max_iters truncation sweep ---
    # The pinned scene's temperature grid has a deliberate half-voxel shift
    # (it exercises the reference's own-transform sampling, worker.cpp:153),
    # which keeps it on the XLA loop per the production path selection
    # (megakernel.use_fused_path: misaligned temperature -> 8-wide rows ->
    # XLA wins that configuration; PERF.md section 4c).
    dens, temp = fire_plume(height=96, radius=28.0)
    med = Medium.from_grids(dens, temp)
    bb = jnp.asarray(blackbody_xyz_table())
    cam = _camera(256, 256, (170.0, 48.0, 0.0), look=(0.0, 48.0, 0.0), vfov=37.0)
    sweep = {}
    for mi in (2048, 4096, 8192):
        rays, ncap, _ = _render_throughput(
            med, cam, _fire_params(max_iters=mi), 256, 256, 8, bb=bb, reps=2,
        )
        sweep[str(mi)] = {"rays_per_s": round(rays, 1), "capped_lanes": ncap}
    out["fire_max_iters_sweep"] = sweep
    out["fire_rays_per_s"] = sweep["8192"]["rays_per_s"]
    out["fire_capped_lanes"] = sweep["8192"]["capped_lanes"]

    # Same transport with an ALIGNMENT-COMPATIBLE temperature grid (the
    # common case for co-simulated .nvdb exports): the temperature corners
    # fold into 16-wide fused rows and the Pallas megakernel is the
    # production path (and measured winner) — the emissive fused number.
    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array

    temp_al = dense_grid_from_array(
        np.asarray(temp.data), origin_ijk=temp.origin_ijk,
        voxel_size=temp.voxel_size, world_offset=(0.0, 0.0, 0.0),
    )
    med_al = Medium.from_grids(dens, temp_al)
    assert med_al.density_rows.shape[1] == 16
    rays, ncap, _ = _render_throughput(
        med_al, cam, _fire_params(max_iters=8192), 256, 256, 8, bb=bb,
        reps=2, tracer=trace_rays_fused,
    )
    out["fire_aligned_fused_rays_per_s"] = round(rays, 1)

    # --- fire_lowscattering.json transport (the reference's third scene:
    # sigma_s=0.09 -> near-single-scattering emissive paths) on the same
    # plume; same per-scene path selection as the fire rows. ---
    import dataclasses

    low = dataclasses.replace(
        _fire_params(max_iters=4096), sigma_s=0.09, max_depth=1_000_000
    )
    rays, ncap, _ = _render_throughput(med, cam, low, 256, 256, 8, bb=bb, reps=2)
    out["fire_lowscattering_rays_per_s"] = round(rays, 1)
    out["fire_lowscattering_capped_lanes"] = ncap

    # --- forward+backward (replay VJP) train-step throughput ---
    import optax

    from volume_path_tracer_tpu.diff.inverse import (
        OptimizableGrids, make_train_step, param_from_density,
    )
    from volume_path_tracer_tpu.grids.procedural import fog_sphere
    from volume_path_tracer_tpu.models.medium import Medium as _M

    base = _M.from_grids(fog_sphere(radius=30.0, falloff=6.0), pack=False)
    camera = _camera(128, 128, (110.0, 0.0, 0.0))
    # 8 samples/pixel/step: the scatter-wall replay is latency-bound below
    # ~32k lanes, so wider steps are nearly free (PERF.md section 4b), and a
    # real optimization wants the lower-variance loss anyway.
    k = 8
    optimizer = optax.adam(1e-2)
    grids = OptimizableGrids(log_density=param_from_density(base.density.data))
    opt_state = optimizer.init(grids)
    step = make_train_step(
        base, _wdas_params(max_iters=1024), camera, None, optimizer, n_iters=1024,
        samples_per_step=k, use_prb=True, pack=True,
    )
    ys, xs = np.mgrid[0:128, 0:128]
    raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
    pids = jnp.arange(128 * 128, dtype=jnp.int32)
    target = jnp.zeros((128 * 128, 3), jnp.float32)
    g2, s2, loss = step(grids, opt_state, raster, pids, target, jnp.asarray([3, 1], jnp.uint32))
    _ = float(loss)  # warmup: compile + first-execution effects
    # Chained-step methodology: a real optimization loop does NOT read the
    # loss back every step, so the timed region chains CH steps on device
    # (grids/opt_state stay resident) and forces ONE transfer at the end —
    # per-step numbers are free of the ~22 ms tunnel round-trip that a
    # per-step float(loss) would add. Best of 3 chains.
    CH = 4
    best = None
    for rep in range(3):
        gg, ss = g2, s2
        t0 = time.perf_counter()
        for i in range(CH):
            gg, ss, loss = step(
                gg, ss, raster, pids, target,
                jnp.asarray([3, 2 + rep * CH + i], jnp.uint32),
            )
        _ = float(loss)  # force completion of the whole chain
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["train_fwd_bwd_rays_per_s"] = round(128 * 128 * k * CH / best, 1)
    out["train_method"] = (
        f"{k} spp/step, best-of-3 chains of {CH} device-resident steps, "
        "one forced transfer per chain"
    )

    # --- JOINT density+temperature train step (emissive medium) ---
    # The temperature gradient adds a second corner-row scatter per replay
    # iteration (through the same payload compaction); this is the
    # BASELINE config-5 joint-optimization shape (worker.cpp:152-157).
    import dataclasses as _dc

    dens_j, temp_j = fire_plume(height=96, radius=28.0)
    base_j = Medium.from_grids(dens_j, temp_j, pack=False)
    em_params = _dc.replace(
        _fire_params(max_iters=1024), max_depth=10_000
    )
    cam_j = _camera(128, 128, (170.0, 48.0, 0.0), look=(0.0, 48.0, 0.0),
                    vfov=37.0)
    grids_j = OptimizableGrids(
        log_density=param_from_density(base_j.density.data),
        temperature=base_j.temperature.data,
    )
    opt_j = optax.adam(1e-2)
    st_j = opt_j.init(grids_j)
    step_j = make_train_step(
        base_j, em_params, cam_j, bb, opt_j, n_iters=1024,
        samples_per_step=k, use_prb=True, pack=True, dual_buffer=True,
    )
    g2, s2, loss = step_j(grids_j, st_j, raster, pids, target,
                          jnp.asarray([5, 1], jnp.uint32))
    _ = float(loss)
    best = None
    for rep in range(3):
        gg, ss = g2, s2
        t0 = time.perf_counter()
        for i in range(CH):
            gg, ss, loss = step_j(
                gg, ss, raster, pids, target,
                jnp.asarray([5, 2 + rep * CH + i], jnp.uint32),
            )
        _ = float(loss)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["train_joint_emissive_rays_per_s"] = round(128 * 128 * k * CH / best, 1)
    return out


def bench_render1024():
    """BASELINE config-5 production shape on one chip (VERDICT r4 item 4):
    a full 1024x1024 CLI render — checkpointing, preview PNG and pixel
    chunking on — timed end-to-end through the real driver, with peak HBM.
    Merges results into BENCH_EXTRA.json."""
    import tempfile

    import jax

    from volume_path_tracer_tpu import cli

    waves = 64
    d = tempfile.mkdtemp(prefix="vpt1024_")
    scene = {
        "seed": 10, "output_size": [1024, 1024], "tile_size": [8, 8],
        "num_waves": waves, "num_workers": 1,
        "camera_parameters": {
            "position": [110.0, 0.0, 0.0], "look": [0.0, 0.0, 0.0],
            "up": [0.0, 1.0, 0.0], "vfov_deg": 35.0, "imaging_ratio": 0.1,
        },
        "worker_parameters": {
            "single_pixel": {"enabled": False, "coord": [0, 0]},
            "infinite_light": {"xyz": [4.382, 3.509, 17.603], "multiplier": 0.14},
            "distant_light": {"xyz": [0.95047, 1.0, 1.08883],
                              "inv_direction": [0.5826, 0.766, 0.2717],
                              "multiplier": 50.0},
            "use_jitter": True, "max_depth": 100,
        },
        "volume_path": "unused.nvdb",
        "volume_parameters": {
            "sigma_a": 0.0, "sigma_s": 0.15, "henyey_greenstein_g": 0.4,
            "le_scale": 0.0, "temperature_offset": 300.0,
            "temperature_scale": 40.0,
        },
    }
    sp = os.path.join(d, "scene1024.json")
    with open(sp, "w") as f:
        json.dump(scene, f)
    out_png = os.path.join(d, "out.png")

    def run_once():
        ck = os.path.join(d, "ck.npz")
        if os.path.exists(ck):
            os.remove(ck)  # a stale checkpoint would resume and skip waves
        t0 = time.perf_counter()
        # In-process CLI (same code path as the console entry point):
        # 65536-pixel chunks per wave — the bench wave shape — with
        # checkpoint + preview on.
        cli.main([
            sp, out_png, "--procedural", "sphere", "--max-iters", "4096",
            "--chunk-pixels", "65536",
            "--checkpoint", ck,
            "--preview", os.path.join(d, "preview.png"),
        ])
        return time.perf_counter() - t0

    wall = run_once()  # cold: includes compile
    warm = run_once()  # steady state: compiles cached in-process
    assert os.path.exists(out_png) and os.path.getsize(out_png) > 1000
    stats = jax.local_devices()[0].memory_stats() or {}
    rays = 1024 * 1024 * waves
    peak = stats.get("peak_bytes_in_use")
    rec = {
        "render_1024_wall_s": round(wall, 2),
        "render_1024_rays_per_s": round(rays / wall, 1),
        "render_1024_warm_wall_s": round(warm, 2),
        "render_1024_warm_rays_per_s": round(rays / warm, 1),
        "render_1024_waves": waves,
        # None: the axon PJRT backend does not expose memory_stats
        "render_1024_peak_hbm_mb": round(peak / 1e6, 1) if peak else None,
        "render_1024_method": (
            "in-process CLI (vpt-tpu scene.json out.png --procedural sphere "
            "--chunk-pixels 65536 --checkpoint --preview), end-to-end wall "
            "clock incl compile+PNG+checkpoints"
        ),
    }
    path = os.path.join(_REPO, "BENCH_EXTRA.json")
    extra = json.load(open(path)) if os.path.exists(path) else {}
    extra.update(rec)
    with open(path, "w") as f:
        json.dump(extra, f, indent=1)
    print(json.dumps(rec), flush=True)


def _verify_scene(out, tag, medium, camera, params, bb=None):
    """One XLA-vs-fused cross-check: timings, lane agreement, error tails."""
    import jax.numpy as jnp

    from volume_path_tracer_tpu.render.integrator import trace_rays
    from volume_path_tracer_tpu.render.megakernel import trace_rays_fused

    images = {}
    lane_images = {}
    sample_lo = sample_hi = None
    for name, tracer in (("xla", trace_rays), ("fused", trace_rays_fused)):
        rays, _, times = _render_throughput(
            medium, camera, params, 256, 256, 4, bb=bb, tracer=tracer, reps=2
        )
        wave_jit = _make_wave_fn(tracer, params, bb)
        ys, xs = np.mgrid[0:256, 0:256]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(256 * 256, dtype=jnp.int32)
        # Lane agreement compares ONE wave draw-for-draw; the mean-bias gate
        # compares 8-wave averages (a knife-edge event flip re-rolls a lane's
        # sample, so the single-wave mean difference is Monte-Carlo noise
        # that shrinks with spp — at 1 spp it can exceed the 1e-3 gate).
        acc = None
        for w in range(1, 9):
            L, _, _ = wave_jit(
                medium, camera, raster, pids, jnp.asarray([10, w], jnp.uint32)
            )
            if w == 1:
                lane_images[name] = np.asarray(L)
            if name == "xla":
                # Pool the per-sample radiance range over all 8 XLA waves
                # (524k samples) — the per-lane bound's reference support.
                lo_w, hi_w = jnp.min(L, axis=0), jnp.max(L, axis=0)
                sample_lo = lo_w if sample_lo is None else jnp.minimum(sample_lo, lo_w)
                sample_hi = hi_w if sample_hi is None else jnp.maximum(sample_hi, hi_w)
            acc = L if acc is None else acc + L
        images[name] = np.asarray(acc) / 8.0
        out[f"{tag}{name}_rays_per_s"] = round(rays, 1)
        out[f"{tag}{name}_pass_times_s"] = times
    a, b = lane_images["xla"], lane_images["fused"]
    # Bitwise equality is the wrong metric on hardware: XLA and Mosaic lower
    # log1p/sin/cos with ulp-level differences, so nearly every multi-bounce
    # lane differs in the last bits. Lane agreement = isclose; knife-edge
    # event flips (a branch decided by one ulp) leave a small disagreeing
    # remainder whose error DISTRIBUTION is recorded below: a flipped event
    # re-rolls one Monte Carlo sample, so disagreeing lanes are bounded by
    # the per-sample radiance range, and the mean stays unbiased (asserted).
    lane_bitwise = float(np.mean(np.all(a == b, axis=-1)))
    close_mask = np.isclose(a, b, rtol=1e-3, atol=1e-4).all(-1)
    lane_close = float(np.mean(close_mask))
    am, bm = images["xla"], images["fused"]
    rel_mean = abs(am.mean() - bm.mean()) / max(abs(am.mean()), 1e-9)
    out[f"{tag}lane_bitwise_fraction"] = round(lane_bitwise, 4)
    out[f"{tag}lane_close_fraction"] = round(lane_close, 4)
    out[f"{tag}mean_rel_diff"] = round(float(rel_mean), 6)
    # Error tails over the DISAGREEING lanes (VERDICT r3 item 4).
    scale = max(float(np.abs(a).mean()), 1e-9)
    diff = np.abs(a - b).max(-1)
    bad = diff[~close_mask]
    if bad.size:
        out[f"{tag}disagree_p50_rel"] = round(float(np.percentile(bad, 50)) / scale, 4)
        out[f"{tag}disagree_p99_rel"] = round(float(np.percentile(bad, 99)) / scale, 4)
        out[f"{tag}disagree_max_abs"] = round(float(bad.max()), 4)
        # Per-lane bound (VERDICT r4 weak 4): a disagreeing lane is a
        # knife-edge event flip that re-rolled ONE Monte Carlo sample, so its
        # radiance must still be a legal per-sample radiance for this scene —
        # within the per-channel range the XLA renders themselves realize.
        # The range pools ALL 8 XLA waves (524k samples): against a single
        # wave's 65k samples, 1 of ~2500 re-rolled lanes legitimately lands
        # past the empirical max (measured: by ~1.1 in XYZ; zero violations
        # against the pool). This closes the "re-rolled sample" argument
        # with an assert instead of prose.
        lo, hi = np.asarray(sample_lo), np.asarray(sample_hi)
        slack = 1e-5 + 1e-3 * (hi - lo)
        bad_vals = b[~close_mask]
        in_range = bool(
            ((bad_vals >= lo - slack) & (bad_vals <= hi + slack)).all()
        )
        out[f"{tag}disagree_within_sample_range"] = in_range
        out[f"{tag}sample_range_lo"] = [round(float(v), 4) for v in lo]
        out[f"{tag}sample_range_hi"] = [round(float(v), 4) for v in hi]
        assert in_range, f"{tag} disagreeing lane outside per-sample range"
    assert rel_mean < 1e-3, f"{tag} mean mismatch: {rel_mean}"
    assert lane_close > 0.95, f"{tag} lane agreement too low: {lane_close}"
    return out


def bench_verify():
    """XLA loop vs Pallas megakernel on the real chip: agreement + timings.

    Covers the flagship scattering scene AND an emissive scene (fire
    transport, aligned temperature grid -> 16-wide fused rows, the
    megakernel's emissive configuration).
    """
    import jax.numpy as jnp

    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
    from volume_path_tracer_tpu.grids.procedural import fire_plume, fog_sphere
    from volume_path_tracer_tpu.models.medium import Medium
    from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

    out = {}
    medium = Medium.from_grids(fog_sphere(radius=30.0, falloff=6.0))
    camera = _camera(256, 256, (110.0, 0.0, 0.0))
    _verify_scene(out, "", medium, camera, _wdas_params())

    dens, temp = fire_plume(height=96, radius=28.0)
    temp_al = dense_grid_from_array(
        np.asarray(temp.data), origin_ijk=temp.origin_ijk,
        voxel_size=temp.voxel_size, world_offset=(0.0, 0.0, 0.0),
    )
    med_fire = Medium.from_grids(dens, temp_al)
    assert med_fire.density_rows.shape[1] == 16
    cam_fire = _camera(256, 256, (170.0, 48.0, 0.0), look=(0.0, 48.0, 0.0), vfov=37.0)
    bb = jnp.asarray(blackbody_xyz_table())
    _verify_scene(out, "fire_", med_fire, cam_fire, _fire_params(max_iters=4096), bb=bb)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run big-grid/fire/backward benches -> BENCH_EXTRA.json")
    ap.add_argument("--verify", action="store_true",
                    help="XLA vs Pallas megakernel agreement+timing -> BENCH_VERIFY.json")
    ap.add_argument("--render1024", action="store_true",
                    help="full 1024x1024 CLI render, end-to-end -> BENCH_EXTRA.json")
    args = ap.parse_args()

    _common_setup()

    if args.render1024:
        bench_render1024()
        return

    if args.verify:
        v = bench_verify()
        import jax

        v["device"] = str(jax.devices()[0])
        with open(os.path.join(_REPO, "BENCH_VERIFY.json"), "w") as f:
            json.dump(v, f, indent=1)
        print(json.dumps(v), flush=True)
        return

    rays_per_s, times = bench_primary()

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
        # Merge over the existing file: --render1024 contributes its keys
        # separately and a --full refresh must not clobber them.
        path = os.path.join(_REPO, "BENCH_EXTRA.json")
        old = json.load(open(path)) if os.path.exists(path) else {}
        old.update(extra)
        extra = old
        with open(path, "w") as f:
            json.dump(extra, f, indent=1)
        print(json.dumps(extra), flush=True)

    # Cross-round series (the self-interpreting progress record): vs_baseline
    # divides by the FIRST-ever run on this hardware (an early unoptimized
    # build) and reads inflated; prev_rounds carries each round's recorded
    # best so the current number stands against real history.
    prev_rounds = {}
    import glob

    for p in sorted(glob.glob(os.path.join(_REPO, "BENCH_r[0-9][0-9].json"))):
        try:
            rec = json.load(open(p))
            v = (rec.get("parsed") or {}).get("value")
            if v:
                prev_rounds[f"r{int(rec['n']):02d}"] = v
        except (ValueError, KeyError, OSError):
            pass

    print(
        json.dumps(
            {
                "metric": "wdas_cloud-like 256x256@16spp camera-ray throughput",
                "value": round(rays_per_s, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_s / base, 4),
                "method": (
                    "best of 5 transfer-forced passes, 65536-lane waves; "
                    "observed host spread ~2% (pass_times_s records all passes)"
                ),
                "pass_times_s": times,
                "prev_rounds": prev_rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
