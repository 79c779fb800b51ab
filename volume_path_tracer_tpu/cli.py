"""Command-line renderer: the TPU-native equivalent of the reference's `vpt`.

Usage (mirrors /root/reference/src/main.cpp:26-30):

    python -m volume_path_tracer_tpu.cli <scene.json> <out.png> [options]

Differences from the reference driver, by design (SURVEY.md section 2.1 item 8):
the raylib GUI becomes a terminal progress line (same percent/ETA format) plus
an optional live preview PNG refreshed at wave boundaries; ^C stops gracefully
at the next wave and SAVES (the reference loses the image on ^C); wave-boundary
checkpoints make renders resumable.

Volume loading: reads the scene's .nvdb via the built-in NanoVDB parser
(grids/nvdb.py). `--procedural {donut,sphere,plume}` substitutes an asset-free
volume (the reference's generate_donut debug path, volume_grids.cpp:35-37).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .utils import logging as vlog


def _load_medium(cfg, procedural: str | None):
    from .models.medium import Medium

    if procedural:
        from .grids import procedural as proc

        if procedural == "donut":
            return Medium.from_grids(proc.generate_donut())
        if procedural == "sphere":
            return Medium.from_grids(proc.fog_sphere(radius=24.0, falloff=4.0))
        if procedural == "plume":
            d, t = proc.fire_plume()
            return Medium.from_grids(d, t)
        vlog.fatal(f"unknown procedural volume {procedural!r}")

    if not os.path.exists(cfg.volume_path):
        # The reference fatals on a missing/unreadable volume file
        # (volume_grids.cpp:52 via vptFATAL).
        vlog.fatal(
            f"volume file {cfg.volume_path!r} not found "
            f"(use --procedural for an asset-free volume)"
        )
    from .grids.nvdb import read_nvdb_medium

    return read_nvdb_medium(cfg.volume_path)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="vpt-tpu", description="TPU-native volumetric path tracer"
    )
    ap.add_argument("config", help="scene JSON (reference schema)")
    ap.add_argument("output", help="output PNG path")
    ap.add_argument("--waves", type=int, default=None, help="override num_waves")
    ap.add_argument(
        "--procedural", choices=["donut", "sphere", "plume"], default=None,
        help="use a procedural volume instead of the scene's .nvdb",
    )
    ap.add_argument("--preview", default=None, metavar="PNG",
                    help="write a live preview PNG at each wave boundary")
    ap.add_argument("--live", action="store_true",
                    help="paint a live ANSI preview of the film in the "
                         "terminal at each wave boundary (the raylib-window "
                         "equivalent for headless TPU hosts)")
    ap.add_argument("--checkpoint", default=None, metavar="NPZ",
                    help="wave-boundary checkpoint file (resumes if present)")
    ap.add_argument("--checkpoint-every-s", type=float, default=60.0,
                    help="minimum seconds between checkpoint writes "
                         "(always written when stopping)")
    ap.add_argument("--chunk-pixels", type=int, default=None,
                    help="render each wave in pixel chunks of this size")
    ap.add_argument("--max-iters", type=int, default=8192,
                    help="wavefront iteration cap per wave")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="shard rays over N devices (default: all if >1)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the render to DIR")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from .render.renderer import Scene, render_wave_image
    from .render.waves import (
        ProgressTracker,
        StopController,
        load_checkpoint,
        save_checkpoint,
    )
    from .utils.color import film_to_srgb_u8
    from .utils.config import ConfigError, read_configuration
    from .io.png import write_png

    try:
        cfg = read_configuration(args.config)
    except ConfigError as e:
        # vptFATAL on configuration errors (configuration.cpp:18).
        vlog.fatal(str(e))
    medium = _load_medium(cfg, args.procedural)
    scene = Scene.from_config(cfg, medium, max_iters=args.max_iters)
    num_waves = args.waves if args.waves is not None else cfg.num_waves

    n_dev = len(jax.devices())
    mesh = None
    if (args.mesh or n_dev) > 1 and args.mesh != 1:
        if args.mesh is not None and args.mesh > n_dev:
            vlog.fatal(
                f"--mesh {args.mesh} exceeds the {n_dev} visible device(s) "
                f"(hint: XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"exposes N virtual CPU devices)"
            )
        from .parallel.shard import make_mesh

        mesh = make_mesh(args.mesh or n_dev)
        vlog.info(f"sharding rays over {dict(mesh.shape)}")

    start_wave = 0
    film = jnp.zeros((scene.height, scene.width, 4), jnp.float32)
    if args.checkpoint:
        ck = load_checkpoint(args.checkpoint)
        if ck is not None:
            f0, w0, s0 = ck
            if s0 == scene.seed and f0.shape == film.shape:
                film, start_wave = jnp.asarray(f0), w0
                vlog.info(f"resumed from wave {w0}")
            else:
                vlog.warn("checkpoint mismatch - starting fresh")

    tracker = ProgressTracker(num_waves)
    tracker.advance(start_wave)

    def save_final(film_now):
        img = np.asarray(film_to_srgb_u8(film_now))
        write_png(args.output, img)
        print(flush=True)
        vlog.info(f"saved {args.output}")

    import time as _time

    live = None
    if args.live:
        from .io.term import TermPreview

        live = TermPreview()
        if not live.enabled:
            vlog.warn("--live requires a TTY; disabled")
            live = None

    if args.profile:
        jax.profiler.start_trace(args.profile)
    npix_img = scene.width * scene.height

    # Mid-wave feedback (the reference GUI repaints at 5 FPS *during* a wave,
    # main.cpp:101-132): when --chunk-pixels splits a wave, repaint the live
    # preview / progress line at chunk boundaries with the partial film.
    # Throttle timestamps are taken AFTER the work: tonemap + PNG encode of
    # a large film can exceed the interval itself, and a before-work stamp
    # then degenerates to encoding at EVERY chunk — measured 25x slower
    # end-to-end on a 1024x1024 render (PERF.md). Preview PNG writes get a
    # longer interval than the cheap terminal repaint for the same reason.
    _last_paint = [0.0]
    _last_preview = [0.0]
    _PREVIEW_EVERY_S = 2.0

    def _write_preview(img):
        if args.preview and _time.monotonic() - _last_preview[0] >= _PREVIEW_EVERY_S:
            write_png(args.preview, img, atomic=True)
            _last_preview[0] = _time.monotonic()

    def _live_draw(film_now, status):
        # Tonemap AND downsample to the terminal's cell grid on device, then
        # transfer ~30 kB — the full-resolution film transfer alone measures
        # ~150 ms at 1024x1024 through the TPU tunnel (term.geometry docs).
        out_h, out_w = live.geometry(scene.height, scene.width)
        small = jax.image.resize(
            film_to_srgb_u8(film_now).astype(jnp.float32),
            (out_h, out_w, 3), "linear",
        )
        live.draw(
            np.asarray(jnp.clip(small, 0, 255).astype(jnp.uint8)), status
        )

    chunk_cb = None
    if args.chunk_pixels and (live is not None or args.preview):

        def chunk_cb(done, total, film_now):
            now = _time.monotonic()
            if now - _last_paint[0] < 0.2:  # 5 FPS cap, like the reference
                return
            status = f"[vpt] {tracker.format()} (wave {done * 100 // total}%)"
            # Tonemap only when something consumes the pixels: the tonemap +
            # device->host transfer of a large film costs ~50 ms, which at
            # 5 Hz is a measurable tax on a render that only prints status.
            preview_due = (
                args.preview
                and now - _last_preview[0] >= _PREVIEW_EVERY_S
            )
            if preview_due:
                img = np.asarray(film_to_srgb_u8(film_now))
                if live is not None:
                    live.draw(img, status)
                else:
                    print(f"\r{status}   ", end="", flush=True)
                _write_preview(img)
            elif live is not None:
                _live_draw(film_now, status)
            else:
                print(f"\r{status}   ", end="", flush=True)
            _last_paint[0] = _time.monotonic()

    _last_ckpt = [_time.monotonic()]
    # Truncated-lane counts accumulate ON DEVICE across waves and are read
    # once at the end: a per-wave int() costs one tunnel round-trip (~22 ms)
    # — the same pitfall bench.py's methodology documents for float(loss).
    ncap_total = None
    with StopController() as stop:
        w = start_wave
        while w < num_waves:
            w += 1
            t_wave = _time.perf_counter()
            if mesh is not None:
                film, ncap_w = _render_wave_sharded(scene, mesh, w, film)
            else:
                film, ncap_w = render_wave_image(
                    scene, w, film, args.chunk_pixels, chunk_callback=chunk_cb,
                    return_ncap=True,
                )
            ncap_total = ncap_w if ncap_total is None else ncap_total + ncap_w
            jax.block_until_ready(film)
            dt_wave = _time.perf_counter() - t_wave
            tracker.advance(1)
            # Per-wave throughput (SURVEY.md section 5 tracing bullet): one
            # wave = one camera ray per pixel.
            status = (
                f"[vpt] {tracker.format()} "
                f"({npix_img / dt_wave / 1e6:.2f} M rays/s)"
            )
            stopping = stop.stop_at_next_wave or w == num_waves
            if live is not None:
                _live_draw(film, status)
            else:
                print(f"\r{status}   ", end="", flush=True)
            # Gate the TONEMAP on the preview throttle, not just the PNG
            # write: tonemap + device->host film transfer measures ~150 ms
            # at 1024x1024 through the tunnel — paying it every wave while
            # _write_preview throttles the encode away was ~18% of the
            # whole render (scratch/r5_cli1024_ab.py).
            if (
                args.preview
                and not stopping
                and _time.monotonic() - _last_preview[0] >= _PREVIEW_EVERY_S
            ):
                _write_preview(np.asarray(film_to_srgb_u8(film)))
            if args.checkpoint and (
                stopping
                or _time.monotonic() - _last_ckpt[0] >= args.checkpoint_every_s
            ):
                # Wave boundaries are consistent snapshots; time-throttled
                # because a compressed multi-MB film checkpoint per wave
                # dominates fast renders. Always saved when stopping.
                save_checkpoint(args.checkpoint, np.asarray(film), w, scene.seed)
                _last_ckpt[0] = _time.monotonic()
            if stop.stop_at_next_wave:
                print(flush=True)
                vlog.info(f"stopped at wave boundary {w}")
                break
    if args.profile:
        jax.profiler.stop_trace()
        print(flush=True)
        vlog.info(f"profiler trace written to {args.profile}")

    ncap = int(ncap_total) if ncap_total is not None else 0
    if ncap:
        print(flush=True)
        vlog.warn(
            f"{ncap} rays (all waves) truncated at the iteration cap "
            f"(max_iters={scene.params.max_iters}) - raise --max-iters "
            f"to eliminate the bias"
        )
    save_final(film)
    return 0


def _bb(scene):
    from .render.renderer import _bb_table_for

    return _bb_table_for(scene.medium, scene.params)


import functools as _functools


@_functools.lru_cache(maxsize=4)
def _padded_batch_device(width: int, height: int, n_align: int):
    """Device-resident padded (coords, pids, npix): uploaded once per image
    shape and reused every wave (same tunnel-hygiene rationale as
    renderer._pixel_coords_device)."""
    import jax.numpy as jnp

    from .parallel.shard import pad_ray_batch

    coords, pids, npix = pad_ray_batch(width, height, n_align)
    return jnp.asarray(coords), jnp.asarray(pids), npix


def _render_wave_sharded(scene, mesh, wave, film):
    from .parallel.shard import render_wave_sharded

    H, W = scene.height, scene.width
    coords, pids, npix = _padded_batch_device(W, H, mesh.shape["rays"])
    contrib, n_capped, _ = render_wave_sharded(
        mesh, scene.medium, scene.params, scene.camera, _bb(scene),
        coords, pids, scene.seed, wave, scene.use_jitter,
    )
    return film + contrib[:npix].reshape(H, W, 4), n_capped


if __name__ == "__main__":
    sys.exit(main())
