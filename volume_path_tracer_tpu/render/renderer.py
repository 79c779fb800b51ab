"""Scene assembly and per-wave rendering.

Replaces the reference's main.cpp driver + worker/tile machinery with the
TPU-native execution model (SURVEY.md section 7.1):

  - a *wave* is one full sample-per-pixel pass over the image, rendered as a
    (optionally chunked) batch of rays in a single jitted wavefront call —
    the analog of the reference's tile x wave job grid where every (tile,
    wave) job adds exactly one sample to each of its pixels
    (tile_provider.cpp:27-67, worker.cpp:109-205);
  - the film keeps the reference's (XYZ sum, sample count) accumulator layout
    (worker.cpp:203-204) so every wave boundary is a valid snapshot;
  - per-(pixel, wave) RNG streams keyed on global coordinates preserve the
    reference's scheduling-independent determinism (random.hpp:93-95).

Jitter parity: half-a-pixel uniform jitter on top of the +0.5 pixel center
(worker.cpp:121-122, camera.hpp:15).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera
from ..models.medium import Medium
from ..utils import rng as vrng
from ..utils.config import Configuration
from ..utils.spectral import blackbody_xyz_table
from .integrator import IntegratorParams, trace_rays, trace_rays_diff


@dataclasses.dataclass(frozen=True)
class Scene:
    """Everything needed to render: medium (pytree) + static camera/params."""

    medium: Medium
    camera: Camera
    params: IntegratorParams
    width: int
    height: int
    seed: int
    num_waves: int
    use_jitter: bool
    single_pixel: Optional[Tuple[int, int]] = None

    @staticmethod
    def from_config(cfg: Configuration, medium: Medium, max_iters: int = 8192) -> "Scene":
        wp = cfg.worker_parameters
        return Scene(
            medium=medium,
            camera=Camera.from_parameters(cfg.camera_parameters, cfg.output_size),
            params=IntegratorParams.from_config(
                cfg.volume_parameters, wp, max_iters=max_iters
            ),
            width=cfg.output_size[0],
            height=cfg.output_size[1],
            seed=cfg.seed,
            num_waves=cfg.num_waves,
            use_jitter=wp.use_jitter,
            single_pixel=tuple(wp.single_pixel.coord) if wp.single_pixel.enabled else None,
        )


def pixel_coords(width: int, height: int) -> np.ndarray:
    """Row-major [H*W, 2] (x, y) integer pixel coordinates."""
    ys, xs = np.mgrid[0:height, 0:width]
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.int32)


@functools.lru_cache(maxsize=4)
def _pixel_coords_device(width: int, height: int):
    """Device-resident (coords [H*W, 2], pids [H*W]) — uploaded once per
    image shape, reused every wave (an 8 MB host->device transfer per wave
    at 1024x1024 measured ~95 ms through the tunnel; see render_wave_image).
    """
    return (
        jnp.asarray(pixel_coords(width, height)),
        jnp.arange(width * height, dtype=jnp.int32),
    )


def _bb_table_for(medium: Medium, params: IntegratorParams):
    from .integrator import emission_enabled

    if emission_enabled(medium, params):
        # Size the LUT to cover the scene's hottest reachable temperature
        # (trilinear interpolation never exceeds the max corner value), so
        # the reference's T >= 49,900 K exact-integration fallback
        # (precompute_blackbody.cpp:25-36) is subsumed by table coverage.
        from ..utils.spectral import breakpoints_for_max_temp

        t_max = (
            float(jnp.max(medium.temperature.data)) * params.temperature_scale
            + params.temperature_offset
        )
        return jnp.asarray(blackbody_xyz_table(breakpoints_for_max_temp(t_max)))
    return None


@functools.partial(
    jax.jit,
    static_argnames=("params", "use_jitter", "imaging_ratio"),
)
def render_rays_wave(
    medium: Medium,
    params: IntegratorParams,
    camera: Camera,
    bb_table,
    raster_xy: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    seed,
    wave,
    use_jitter: bool,
    imaging_ratio: float,
):
    """Render one wave for a batch of pixels.

    Returns ([N, 4] film contribution (imaging_ratio * XYZ, weight 1), iters,
    n_capped — lanes truncated at the iteration cap, see finalize_radiance).
    """
    stream = vrng.mix_stream(seed, wave)
    # Jitter draws: a dedicated counter stream (iteration -1 cannot collide
    # with loop iterations, use a distinct salt offset instead: iteration 2^31-1).
    u_jit = vrng.counter_uniforms(pixel_ids, stream, jnp.int32(2**31 - 1), 2)
    jitter = u_jit * (0.5 if use_jitter else 0.0)  # worker.cpp:121-122
    o_w, d_w = camera.generate_rays(raster_xy, jitter)
    # Production path selection (static at trace time, single-sourced in
    # megakernel.use_fused_path): the Pallas megakernel on TPU for packed
    # media at kernel-tileable batch sizes, the XLA loop otherwise. Results
    # are statistically identical either way (bench.py --verify cross-checks
    # on hardware).
    from .megakernel import use_fused_path

    if use_fused_path(medium, params, pixel_ids.shape[0]):
        from .megakernel import trace_rays_fused as _tracer
    else:
        _tracer = trace_rays
    L, iters, n_capped = _tracer(
        medium, params, bb_table, o_w, d_w, pixel_ids, stream
    )
    contrib = jnp.concatenate(
        [imaging_ratio * L, jnp.ones((L.shape[0], 1), jnp.float32)], axis=-1
    )
    return contrib, iters, n_capped


def render_wave_image(
    scene: Scene,
    wave: int,
    film: Optional[jnp.ndarray] = None,
    chunk_pixels: Optional[int] = None,
    chunk_callback=None,
    return_ncap: bool = False,
) -> jnp.ndarray:
    """Accumulate one full wave into the film [H, W, 4]; returns the new film.

    return_ncap=True returns (film, n_capped_device_scalar) and skips the
    host-side truncation warning: reading the scalar here costs one tunnel
    round-trip (~22 ms) per wave, so latency-sensitive drivers accumulate
    it on device and read/warn once at the end (see cli.main).

    chunk_callback(pixels_done, pixels_total, film [H, W, 4]) is invoked after
    each pixel chunk when the wave is chunked — the mid-wave feedback hook
    (the reference GUI repaints at 5 FPS *during* a wave, main.cpp:101-132;
    the partial film is a valid estimate because un-rendered pixels still
    carry their previous waves' weight). Reading the film in the callback
    forces a device sync per chunk, so the default (None) stays sync-free.
    """
    H, W = scene.height, scene.width
    if film is None:
        film = jnp.zeros((H, W, 4), jnp.float32)
    bb = _bb_table_for(scene.medium, scene.params)

    if scene.single_pixel is not None:
        # Single-pixel debug mode (configuration.hpp:35-38, worker.cpp:113-119).
        x, y = scene.single_pixel
        raster = jnp.asarray([[x, y]], jnp.int32)
        pids = jnp.asarray([y * W + x], jnp.int32)
        contrib, _, sp_ncap = render_rays_wave(
            scene.medium, scene.params, scene.camera, bb, raster, pids,
            scene.seed, wave, scene.use_jitter, scene.camera.imaging_ratio,
        )
        film = film.at[y, x].add(contrib[0])
        return (film, sp_ncap) if return_ncap else film

    n = W * H
    chunk = chunk_pixels or n
    out = film.reshape(-1, 4)
    # Device-cached coords, sliced on device per chunk: per-chunk
    # jnp.asarray(coords[s:e]) uploads re-staged 0.5 MB through the tunnel
    # each time, measured ~95 ms/wave at 1024x1024 with 65536-pixel chunks
    # (scratch/r5_cli1024_ab.py: 427 -> 333 ms/wave device-staged).
    coords_dev, pids_dev = _pixel_coords_device(W, H)
    # Capped-lane counts accumulate ON DEVICE across chunks and are read once
    # per wave: a host int() inside the loop would serialize chunk dispatch at
    # one tunnel round-trip each (the pitfall bench.py's methodology notes).
    ncap_dev = None
    for start in range(0, n, chunk):
        end = min(start + chunk, n)
        raster = coords_dev[start:end]
        pids = pids_dev[start:end]
        contrib, _, n_capped = render_rays_wave(
            scene.medium, scene.params, scene.camera, bb, raster, pids,
            scene.seed, wave, scene.use_jitter, scene.camera.imaging_ratio,
        )
        out = out.at[start:end].add(contrib)
        ncap_dev = n_capped if ncap_dev is None else ncap_dev + n_capped
        if chunk_callback is not None and end < n:
            chunk_callback(end, n, out.reshape(H, W, 4))
    if return_ncap:
        return out.reshape(H, W, 4), ncap_dev
    ncap = int(ncap_dev)
    if ncap:
        from ..utils import logging as vlog

        vlog.warn(
            f"wave {wave}: {ncap} rays truncated at the "
            f"iteration cap (max_iters={scene.params.max_iters}) - "
            f"raise --max-iters to eliminate the bias"
        )
    return out.reshape(H, W, 4)


def render(
    scene: Scene,
    num_waves: Optional[int] = None,
    chunk_pixels: Optional[int] = None,
    wave_callback=None,
) -> jnp.ndarray:
    """Render `num_waves` (default: scene config) waves; returns film [H,W,4].

    wave_callback(wave_index, film) is invoked after each wave (progress /
    preview / checkpointing hook); returning False stops after this wave —
    the stop_at_next_wave semantics of the reference (tile_provider.cpp:107).
    """
    waves = num_waves if num_waves is not None else scene.num_waves
    film = jnp.zeros((scene.height, scene.width, 4), jnp.float32)
    # Truncation counts accumulate on device and are read once at the end —
    # a per-wave host read costs one tunnel round-trip (~22 ms; see
    # render_wave_image's return_ncap note).
    ncap_total = None
    for w in range(1, waves + 1):  # waves are 1-indexed (tile_provider.cpp:28)
        film, ncap_w = render_wave_image(
            scene, w, film, chunk_pixels, return_ncap=True
        )
        ncap_total = ncap_w if ncap_total is None else ncap_total + ncap_w
        if wave_callback is not None:
            if wave_callback(w, film) is False:
                break
    ncap = int(ncap_total)
    if ncap:
        from ..utils import logging as vlog

        vlog.warn(
            f"{ncap} rays (all waves) truncated at the iteration cap "
            f"(max_iters={scene.params.max_iters}) - raise max_iters to "
            f"eliminate the bias"
        )
    return film


def render_radiance_diff(
    scene: Scene,
    wave: int,
    n_iters: int,
    raster_xy: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    medium: Optional[Medium] = None,
) -> jnp.ndarray:
    """Differentiable per-ray radiance for a pixel batch (bounded scan).

    `medium` overrides the scene's medium so callers can close over optimizable
    grid leaves (inverse rendering).
    """
    med = medium if medium is not None else scene.medium
    bb = _bb_table_for(med, scene.params)
    stream = vrng.mix_stream(scene.seed, wave)
    u_jit = vrng.counter_uniforms(pixel_ids, stream, jnp.int32(2**31 - 1), 2)
    jitter = u_jit * (0.5 if scene.use_jitter else 0.0)
    o_w, d_w = scene.camera.generate_rays(raster_xy, jitter)
    return trace_rays_diff(
        med, scene.params, bb, o_w, d_w, pixel_ids, stream, n_iters
    )
