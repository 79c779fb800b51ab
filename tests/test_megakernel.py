"""Pallas megakernel (render/megakernel.py) vs the XLA integrator.

Runs the fused kernel in interpreter mode on CPU (same kernel code Mosaic
compiles on TPU). The megakernel consumes the identical PCG4D draw sequence
as trace_rays, so lanes match bitwise except where transcendental rounding
differences flip a knife-edge event decision — the assertion is therefore
(a) a high lane-exact fraction and (b) statistical agreement of the means.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from volume_path_tracer_tpu.grids.procedural import fog_sphere
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
from volume_path_tracer_tpu.render.megakernel import trace_rays_fused
from volume_path_tracer_tpu.utils import rng as vrng


@pytest.mark.slow
def test_fused_matches_xla_integrator():
    med = Medium.from_grids(fog_sphere(radius=12.0, falloff=3.0))
    params = IntegratorParams(
        sigma_a=0.0, sigma_s=0.15, hg_g=0.4, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=100, max_iters=512,
    )
    N = 2048
    rng = np.random.default_rng(0)
    o = jnp.asarray(
        np.stack(
            [np.full(N, -40.0), rng.uniform(-14, 14, N), rng.uniform(-14, 14, N)],
            -1,
        ).astype(np.float32)
    )
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (N, 3))
    pids = jnp.arange(N, dtype=jnp.int32)
    stream = vrng.mix_stream(3, 1)

    L_ref, _, nc_ref = trace_rays(med, params, None, o, d, pids, stream)
    L_f, _, nc_f = trace_rays_fused(
        med, params, None, o, d, pids, stream, block_lanes=1024, interpret=True
    )
    L_ref, L_f = np.asarray(L_ref), np.asarray(L_f)
    assert int(nc_f) == 0
    lane_exact = np.isclose(L_ref, L_f, rtol=1e-4, atol=1e-5).all(-1).mean()
    assert lane_exact > 0.95, lane_exact
    rel = np.abs(L_f.mean(0) - L_ref.mean(0)) / (np.abs(L_ref.mean(0)) + 1e-9)
    assert (rel < 0.05).all(), rel


@pytest.mark.slow
def test_fused_emissive_matches_xla_integrator():
    # fire.json transport: blackbody emission via the temperature grid's own
    # transform, sampled in the fetch fusion (LUT lerp included).
    from volume_path_tracer_tpu.grids.procedural import fire_plume
    from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

    dens, temp = fire_plume(height=40, radius=10.0)
    med = Medium.from_grids(dens, temp)
    bb = jnp.asarray(blackbody_xyz_table())
    params = IntegratorParams(
        sigma_a=2.0, sigma_s=0.9, hg_g=0.7, le_scale=4e-8,
        temperature_offset=300.0, temperature_scale=43.0,
        infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=10.0,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=20.0,
        distant_inv_direction=(0.5, 1.0, 0.0),
        max_depth=1_000_000, max_iters=2048,
    )
    N = 2048
    rng = np.random.default_rng(0)
    o = jnp.asarray(
        np.stack(
            [np.full(N, -40.0), rng.uniform(5, 35, N), rng.uniform(-10, 10, N)],
            -1,
        ).astype(np.float32)
    )
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (N, 3))
    pids = jnp.arange(N, dtype=jnp.int32)
    stream = vrng.mix_stream(3, 1)
    L_ref, _, _ = trace_rays(med, params, bb, o, d, pids, stream)
    L_f, _, nc_f = trace_rays_fused(
        med, params, bb, o, d, pids, stream, block_lanes=1024, interpret=True
    )
    L_ref, L_f = np.asarray(L_ref), np.asarray(L_f)
    assert int(nc_f) == 0
    lane_exact = np.isclose(L_ref, L_f, rtol=1e-4, atol=1e-5).all(-1).mean()
    assert lane_exact > 0.95, lane_exact


@pytest.mark.slow
def test_hybrid_tail_matches_xla_integrator():
    # N > 2048 engages the hybrid plan: fused stages while wide, XLA step
    # stages below 2048 (identical per-lane counter draws across the
    # handoff). Means and lanes must agree with the pure XLA path.
    med = Medium.from_grids(fog_sphere(radius=10.0, falloff=3.0))
    params = IntegratorParams(
        sigma_a=0.3, sigma_s=0.1, hg_g=0.2, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603), infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=50, max_iters=384,
    )
    N = 4096
    rng = np.random.default_rng(2)
    o = jnp.asarray(
        np.stack(
            [np.full(N, -40.0), rng.uniform(-12, 12, N), rng.uniform(-12, 12, N)],
            -1,
        ).astype(np.float32)
    )
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (N, 3))
    pids = jnp.arange(N, dtype=jnp.int32)
    stream = vrng.mix_stream(9, 4)

    L_ref, _, nc_ref = trace_rays(med, params, None, o, d, pids, stream)
    L_f, _, nc_f = trace_rays_fused(
        med, params, None, o, d, pids, stream, block_lanes=1024, interpret=True
    )
    L_ref, L_f = np.asarray(L_ref), np.asarray(L_f)
    assert int(nc_f) == int(nc_ref)
    lane_exact = np.isclose(L_ref, L_f, rtol=1e-4, atol=1e-5).all(-1).mean()
    assert lane_exact > 0.95, lane_exact
    rel = np.abs(L_f.mean(0) - L_ref.mean(0)) / (np.abs(L_ref.mean(0)) + 1e-9)
    assert (rel < 0.05).all(), rel


def test_fused_emissive_16wide_matches_xla_integrator():
    """The 16-WIDE fused configuration (aligned temperature folded into
    columns 8..15, selected in production by use_fused_path) cross-checked in
    interpret mode on CPU — previously only bench --verify covered it on
    hardware, so a Mosaic/interpret regression in the wide temperature dot
    would escape CI (ADVICE r4 item 4)."""
    from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
    from volume_path_tracer_tpu.grids.procedural import fire_plume
    from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

    dens, temp = fire_plume(height=40, radius=10.0)
    # re-frame the temperature grid as alignment-compatible (world_offset 0)
    temp_al = dense_grid_from_array(
        np.asarray(temp.data), origin_ijk=temp.origin_ijk,
        voxel_size=temp.voxel_size, world_offset=(0.0, 0.0, 0.0),
    )
    med = Medium.from_grids(dens, temp_al)
    assert med.density_rows.shape[1] == 16  # the wide-row configuration
    bb = jnp.asarray(blackbody_xyz_table())
    params = IntegratorParams(
        sigma_a=2.0, sigma_s=0.9, hg_g=0.7, le_scale=4e-8,
        temperature_offset=300.0, temperature_scale=43.0,
        infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=10.0,
        distant_xyz=(0.95047, 1.0, 1.08883), distant_multiplier=20.0,
        distant_inv_direction=(0.5, 1.0, 0.0),
        max_depth=1_000_000, max_iters=2048,
    )
    N = 2048
    rng = np.random.default_rng(1)
    o = jnp.asarray(
        np.stack(
            [np.full(N, -40.0), rng.uniform(5, 35, N), rng.uniform(-10, 10, N)],
            -1,
        ).astype(np.float32)
    )
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (N, 3))
    pids = jnp.arange(N, dtype=jnp.int32)
    stream = vrng.mix_stream(3, 1)
    L_ref, _, _ = trace_rays(med, params, bb, o, d, pids, stream)
    L_f, _, nc_f = trace_rays_fused(
        med, params, bb, o, d, pids, stream, block_lanes=1024, interpret=True
    )
    L_ref, L_f = np.asarray(L_ref), np.asarray(L_f)
    assert int(nc_f) == 0
    lane_exact = np.isclose(L_ref, L_f, rtol=1e-4, atol=1e-5).all(-1).mean()
    assert lane_exact > 0.95, lane_exact
