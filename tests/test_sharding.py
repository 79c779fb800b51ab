"""Multi-device sharding tests on the virtual 8-device CPU mesh.

SURVEY.md section 4(c): shard-invariance — an N-way sharded render must equal
the 1-device render (same keys, same order) bitwise or allclose; sharded
training gradients must match the single-device gradients.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
from volume_path_tracer_tpu.grids.procedural import fog_sphere
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.parallel.shard import make_mesh, render_wave_sharded
from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.config import CameraParameters


def _scene(width=24, height=16):
    medium = Medium.from_grids(fog_sphere(radius=10.0))
    camera = Camera.from_parameters(
        CameraParameters((40.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                         38.0, 0.5),
        (width, height),
    )
    params = IntegratorParams(
        sigma_a=0.05, sigma_s=0.3, hg_g=0.4, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=1.0,
        distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
        distant_inv_direction=(0.5, 1.0, 0.0),
        max_depth=40, max_iters=1024,
    )
    return medium, camera, params, width, height


def _single_device_wave(medium, camera, params, raster, pids, seed, global_wave):
    stream = vrng.mix_stream(seed, global_wave)
    u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
    o_w, d_w = camera.generate_rays(raster, u * 0.5)
    L, _, _ = trace_rays(medium, params, None, o_w, d_w, pids, stream)
    return jnp.concatenate(
        [camera.imaging_ratio * L, jnp.ones((L.shape[0], 1), jnp.float32)], -1
    )


class TestShardInvariance:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_rays_sharding_matches_single_device(self):
        medium, camera, params, W, H = _scene()
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        mesh = make_mesh(8, spp=1)
        sharded, n_capped = render_wave_sharded(
            mesh, medium, params, camera, None, raster, pids, 7, 3, True
        )
        assert int(n_capped) == 0
        single = _single_device_wave(medium, camera, params, raster, pids, 7, 3)
        np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))

    def test_spp_axis_matches_sequential_waves(self):
        medium, camera, params, W, H = _scene()
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        mesh = make_mesh(8, spp=4)  # rays=2, spp=4: wave w covers waves 4w..4w+3
        sharded, _ = render_wave_sharded(
            mesh, medium, params, camera, None, raster, pids, 7, 1, True
        )
        seq = sum(
            _single_device_wave(medium, camera, params, raster, pids, 7, gw)
            for gw in (4, 5, 6, 7)
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(seq), rtol=2e-5, atol=2e-5
        )

    def test_mesh_shape_invariance(self):
        medium, camera, params, W, H = _scene()
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)
        a, _ = render_wave_sharded(
            make_mesh(8, spp=1), medium, params, camera, None, raster, pids, 7, 5, True
        )
        b, _ = render_wave_sharded(
            make_mesh(4, spp=1), medium, params, camera, None, raster, pids, 7, 5, True
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShardedTraining:
    def test_sharded_grads_match_single_device(self):
        import optax
        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids, make_train_step, param_from_density,
        )
        medium, camera, params, W, H = _scene(width=16, height=8)
        import dataclasses
        params = dataclasses.replace(params, max_iters=96)
        base = Medium.from_grids(
            dense_grid_from_array(np.asarray(medium.density.data)), pack=False
        )
        start = jnp.full(base.density.shape, 0.2)
        grids = OptimizableGrids(log_density=param_from_density(start))
        opt = optax.sgd(0.1)

        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)
        target = jnp.zeros((W * H, 3))
        sw = jnp.asarray([3, 1], jnp.uint32)

        step1 = make_train_step(base, params, camera, None, opt, n_iters=64,
                                samples_per_step=1)
        stepN = make_train_step(base, params, camera, None, opt, n_iters=64,
                                mesh=make_mesh(8, spp=1), samples_per_step=1)
        g1, _, loss1 = step1(grids, opt.init(grids), raster, pids, target, sw)
        gN, _, lossN = stepN(grids, opt.init(grids), raster, pids, target, sw)
        np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g1.log_density), np.asarray(gN.log_density),
            rtol=1e-4, atol=1e-6,
        )
