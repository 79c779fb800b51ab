"""Multi-device sharding tests on the virtual 8-device CPU mesh.

SURVEY.md section 4(c): shard-invariance — an N-way sharded render must equal
the 1-device render (same keys, same order) bitwise or allclose; sharded
training gradients must match the single-device gradients.
"""
import numpy as np

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
        sharded, n_capped, _ = render_wave_sharded(
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
        sharded, _, _ = render_wave_sharded(
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
        a, _, _ = render_wave_sharded(
            make_mesh(8, spp=1), medium, params, camera, None, raster, pids, 7, 5, True
        )
        b, _, _ = render_wave_sharded(
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


class TestCollectiveStructure:
    """Structural proof of the communication plan (VERDICT r3 item 3).

    Wall-clock scaling cannot be measured honestly on this 2-core host
    (MULTIHOST.md), so instead the COMPILED programs are inspected: the
    forward pass must be communication-free across the 'rays' axis (pixel
    shards are disjoint film regions, SURVEY.md section 2.3), and the only
    collectives anywhere must be the expected psums (all-reduces) — 'spp'
    film accumulation, the global capped-lane count, and the training
    grid-gradient/loss reductions. Any all-gather / all-to-all /
    collective-permute / reduce-scatter is a sharding bug by definition.
    """

    FORBIDDEN = ("all-gather", "all-to-all", "collective-permute",
                 "reduce-scatter")

    @staticmethod
    def _collective_census(hlo_text):
        import re

        counts = {}
        # HLO op names appear as e.g. '%all-reduce.12 =' / 'all-reduce-start'
        for kind in ("all-reduce",) + TestCollectiveStructure.FORBIDDEN:
            counts[kind] = len(
                re.findall(rf"= \S* ?{kind}[-.( ]", hlo_text)
            ) or len(re.findall(rf"{kind}(?:-start)?[.(]", hlo_text))
        return counts

    def _compiled_hlo(self, fn, *args, **static):
        jitted = jax.jit(fn, **static)
        return jitted.lower(*args).compile().as_text()

    def test_forward_rays_sharding_has_no_collectives(self):
        """Pure ray-sharded forward: ZERO collectives in the optimized HLO."""
        import functools
        from jax.sharding import PartitionSpec as P

        medium, camera, params, W, H = _scene()
        mesh = make_mesh(8, spp=1)
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P("rays", None), P("rays")),
            out_specs=P("rays", None), check_vma=False,
        )
        def fwd(medium_, camera_, raster_, pids_):
            stream = vrng.mix_stream(7, 3)
            stream = jnp.broadcast_to(stream, pids_.shape)
            u = vrng.counter_uniforms(pids_, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = camera_.generate_rays(raster_, u * 0.5)
            L, _, _ = trace_rays(medium_, params, None, o_w, d_w, pids_, stream)
            return L

        hlo = self._compiled_hlo(fwd, medium, camera, raster, pids)
        census = self._collective_census(hlo)
        assert all(v == 0 for v in census.values()), census

    def test_wave_sharded_collectives_are_the_expected_psums(self):
        """render_wave_sharded (rays=4 x spp=2): only all-reduces, and only
        the film-over-'spp' + global-ncap psums (XLA may fuse them)."""
        medium, camera, params, W, H = _scene()
        mesh = make_mesh(8, spp=2)
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        hlo = self._compiled_hlo(
            render_wave_sharded,
            mesh, medium, params, camera, None, raster, pids, 7, 3, True,
            static_argnames=("mesh", "params", "use_jitter"),
        )
        census = self._collective_census(hlo)
        for kind in self.FORBIDDEN:
            assert census[kind] == 0, census
        assert 1 <= census["all-reduce"] <= 3, census

    def test_train_step_collectives_are_grad_and_loss_psums(self):
        import dataclasses

        import optax

        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids, make_train_step, param_from_density,
        )

        medium, camera, params, W, H = _scene(width=16, height=8)
        params = dataclasses.replace(params, max_iters=64)
        base = Medium.from_grids(
            dense_grid_from_array(np.asarray(medium.density.data)), pack=False
        )
        grids = OptimizableGrids(
            log_density=param_from_density(jnp.full(base.density.shape, 0.2))
        )
        opt = optax.sgd(0.1)
        step = make_train_step(base, params, camera, None, opt, n_iters=48,
                               mesh=make_mesh(8, spp=2), samples_per_step=1)
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)
        target = jnp.zeros((W * H, 3))
        sw = jnp.asarray([3, 1], jnp.uint32)

        hlo = (
            step.lower(grids, opt.init(grids), raster, pids, target, sw)
            .compile().as_text()
        )
        census = self._collective_census(hlo)
        for kind in self.FORBIDDEN:
            assert census[kind] == 0, census
        # grid-gradient psum + (sq, n) loss psum; XLA may fuse or split.
        assert 1 <= census["all-reduce"] <= 4, census


def test_padding_sentinel_is_npix_in_both_batch_builders():
    """shard.pad_ray_batch and multihost.make_global_ray_batch must pad pixel
    ids with the same OUT-OF-IMAGE sentinel `npix` — a real pixel's id in the
    padding would double-count under any future pid-keyed film scatter."""
    from volume_path_tracer_tpu.parallel import multihost
    from volume_path_tracer_tpu.parallel.shard import pad_ray_batch

    W, H = 5, 3  # 15 pixels: pads on both the 8-way axis and n_align=8
    _, pids_a, npix = pad_ray_batch(W, H, n_align=8)
    assert npix == 15 and list(pids_a[npix:]) == [npix]
    mesh = make_mesh(8, spp=2)
    _, pids_g, npix_g = multihost.make_global_ray_batch(mesh, W, H)
    assert npix_g == npix
    assert list(np.asarray(pids_g)[npix:]) == [npix]


def test_lane_iterations_topology_invariant():
    """Lane-iterations (sum of per-lane alive iterations) is a pure work
    count: every lane's path length is fixed by its counter-keyed draws, so
    the count must be IDENTICAL on a single device, an 8x1 mesh, and a 4x2
    mesh — duplicated or skipped work would show directly (MULTIHOST.md's
    contention-free scaling metric)."""
    from volume_path_tracer_tpu.parallel.shard import pad_ray_batch
    from volume_path_tracer_tpu.utils import rng as vrng

    medium, camera, params, W, H = _scene()
    raster_np, pids_np, npix = pad_ray_batch(W, H, 8)
    counts = {}
    for name, mesh in (("8x1", make_mesh(8, spp=1)), ("4x2", make_mesh(8, spp=2))):
        raster = jax.device_put(jnp.asarray(raster_np))
        pids = jax.device_put(jnp.asarray(pids_np))
        _, _, _, lane_it = render_wave_sharded(
            mesh, medium, params, camera, None, raster, pids, 7, 2, True,
            return_lane_iters=True,
        )
        counts[name] = int(lane_it)
    # single-device reference, per global wave of each spp layout
    def single(global_wave):
        stream = vrng.mix_stream(7, global_wave)
        u = vrng.counter_uniforms(jnp.asarray(pids_np), stream,
                                  jnp.int32(2**31 - 1), 2)
        o_w, d_w = camera.generate_rays(jnp.asarray(raster_np), u * 0.5)
        _, _, _, lane_it = trace_rays(
            medium, params, None, o_w, d_w, jnp.asarray(pids_np), stream,
            return_lane_iters=True,
        )
        return int(lane_it)

    assert counts["8x1"] == single(2), counts
    assert counts["4x2"] == single(4) + single(5), counts
