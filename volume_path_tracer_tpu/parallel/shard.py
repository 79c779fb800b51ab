"""Multi-chip rendering: ray/sample sharding over a jax.sharding.Mesh.

The reference's only parallelism is N CPU threads pulling (tile, wave) jobs
from an atomic queue into a shared film (/root/reference/src/tile_provider.cpp,
main.cpp:63-87). The TPU-native equivalent (SURVEY.md section 2.3):

  - 'rays' mesh axis: pixels sharded across chips (data parallelism over
    disjoint film shards — the analog of tile ownership);
  - 'spp' mesh axis: samples-per-pixel parallelism — different chips render
    different waves of the same pixels simultaneously and psum their film
    contributions (useful when the image is small relative to the pod);
  - grids are replicated; forward rendering needs no other communication;
  - the backward pass (inverse rendering) psums density/temperature-gradient
    shards over both axes — see diff/inverse.py.

Determinism is preserved under any mesh shape: every random draw is keyed on
the global pixel id and global wave index (utils/rng.py), so an N-way sharded
render equals the 1-device render bitwise for the same seed.

Multi-host: the same code runs under jax.distributed.initialize(); the mesh
spans all processes' devices and jax.make_array_from_process_local_data
assembles the global ray batch (helpers in parallel/multihost.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.camera import Camera
from ..models.medium import Medium
from ..render.integrator import IntegratorParams, trace_rays
from ..utils import rng as vrng


def make_mesh(n_devices: Optional[int] = None, spp: int = 1, devices=None) -> Mesh:
    """Build a ('rays', 'spp') mesh over the first n_devices devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    assert n % spp == 0, (n, spp)
    arr = np.array(devs[:n]).reshape(n // spp, spp)
    return Mesh(arr, ("rays", "spp"))


def pad_ray_batch(width: int, height: int, n_align: int):
    """Row-major pixel (coords, ids, npix) padded to a multiple of n_align.

    Padding lanes reuse a dummy coordinate and the out-of-image pixel id
    `npix`; their contributions are sliced off by the caller ([:npix]).
    """
    npix = width * height
    pad = (-npix) % n_align
    ys, xs = np.mgrid[0:height, 0:width]
    raster = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pids = np.arange(npix, dtype=np.int32)
    if pad:
        raster = np.concatenate([raster, np.zeros((pad, 2), np.int32)])
        pids = np.concatenate([pids, np.full((pad,), npix, np.int32)])
    return raster, pids, npix


def render_wave_sharded(
    mesh: Mesh,
    medium: Medium,
    params: IntegratorParams,
    camera: Camera,
    bb_table,
    raster_xy: jnp.ndarray,  # [N, 2] global pixel coords, N % rays_axis == 0
    pixel_ids: jnp.ndarray,  # [N] global pixel ids
    seed,
    wave,
    use_jitter: bool,
    return_lane_iters: bool = False,
):
    """One sharded wave: returns (film contribution [N, 4], n_capped [],
    iters []), plus the global lane-iteration count when return_lane_iters.

    Each ('rays', 'spp') device renders its pixel shard at global wave index
    wave * spp_size + spp_index, then contributions are psum'd over 'spp' —
    one call therefore adds spp_size samples to every pixel. n_capped is the
    global (all-shards) count of rays truncated at the iteration cap; iters
    is the all-shards SUM of wavefront loop iterations (ladder-dependent).
    lane_iters is the all-shards sum of per-lane alive iterations — a pure
    work count that is identical across mesh topologies by construction
    (each lane's path length is fixed by its counter-keyed draws), the
    contention-free scaling metric MULTIHOST.md reports.
    """
    spp_size = mesh.shape["spp"]
    seed_wave = jnp.asarray([seed, wave], jnp.uint32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("rays", None), P("rays"), P()),
        out_specs=(P("rays", None), P(), P()) + ((P(),) if return_lane_iters else ()),
        check_vma=False,
    )
    def shard_fn(medium_, camera_, raster, pids, seed_wave_):
        spp_idx = jax.lax.axis_index("spp")
        global_wave = seed_wave_[1] * spp_size + spp_idx.astype(jnp.uint32)
        stream = vrng.mix_stream(seed_wave_[0], global_wave)
        u_jit = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
        jitter = u_jit * (0.5 if use_jitter else 0.0)
        o_w, d_w = camera_.generate_rays(raster, jitter)
        # Same path selection as the single-chip renderer, single-sourced in
        # megakernel.use_fused_path: the Pallas megakernel inside shard_map
        # for packed media on TPU, the XLA loop otherwise. All conditions are
        # static; pad_ray_batch already aligns shard sizes.
        from ..render.megakernel import use_fused_path

        if use_fused_path(medium_, params, pids.shape[0]):
            from ..render.megakernel import trace_rays_fused as _tracer
        else:
            _tracer = trace_rays
        res = _tracer(
            medium_, params, bb_table, o_w, d_w, pids, stream,
            return_lane_iters=return_lane_iters,
        )
        L, iters, ncap = res[:3]
        contrib = jnp.concatenate(
            [camera_.imaging_ratio * L, jnp.ones((L.shape[0], 1), jnp.float32)],
            axis=-1,
        )
        outs = (
            jax.lax.psum(contrib, "spp"),
            jax.lax.psum(ncap, ("rays", "spp")),
            jax.lax.psum(iters, ("rays", "spp")),
        )
        if return_lane_iters:
            outs = outs + (jax.lax.psum(res[3], ("rays", "spp")),)
        return outs

    return shard_fn(medium, camera, raster_xy, pixel_ids, seed_wave)


def render_film_sharded(
    mesh: Mesh,
    medium: Medium,
    params: IntegratorParams,
    camera: Camera,
    bb_table,
    width: int,
    height: int,
    seed: int,
    num_waves: int,
    use_jitter: bool = True,
    wave_callback=None,
):
    """Full sharded progressive render; returns film [H, W, 4] (replicated).

    Waves advance in strides of the 'spp' axis size: each sharded call adds
    spp_size samples per pixel. Pixel count is padded to the 'rays' axis.
    """
    n_rays_axis = mesh.shape["rays"]
    spp_size = mesh.shape["spp"]
    raster, pids, npix = pad_ray_batch(width, height, n_rays_axis)

    ray_sharding = NamedSharding(mesh, P("rays"))
    raster_j = jax.device_put(jnp.asarray(raster), NamedSharding(mesh, P("rays", None)))
    pids_j = jax.device_put(jnp.asarray(pids), ray_sharding)

    film_flat = jnp.zeros((raster.shape[0], 4), jnp.float32)
    jit_render = jax.jit(
        render_wave_sharded,
        static_argnames=("mesh", "params", "use_jitter"),
    )
    for w0 in range(0, num_waves, spp_size):
        wave = 1 + w0 // spp_size
        contrib, _, _ = jit_render(
            mesh, medium, params, camera, bb_table, raster_j, pids_j,
            seed, wave, use_jitter,
        )
        film_flat = film_flat + contrib
        if wave_callback is not None:
            film = film_flat[:npix].reshape(height, width, 4)
            if wave_callback(w0 + spp_size, film) is False:
                break
    return film_flat[:npix].reshape(height, width, 4)
