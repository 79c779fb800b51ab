"""Differentiability: finite-difference validation + inverse rendering.

BASELINE.json config 4: pixel gradients w.r.t. density/temperature voxels.
The delta-tracking estimator's gradient is stochastic; we validate that the
*averaged* reverse-mode gradient matches central finite differences of the
*averaged* loss (same random streams on both FD sides, which correlates the
noise away), then that end-to-end inverse rendering actually recovers a
density field.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render.integrator import IntegratorParams, trace_rays_diff
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.config import CameraParameters
from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table


def _params(**kw):
    d = dict(
        sigma_a=0.4, sigma_s=0.0, hg_g=0.0, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(1.0, 1.0, 1.0), infinite_multiplier=1.0,
        distant_xyz=(0.0, 0.0, 0.0), distant_multiplier=0.0,
        distant_inv_direction=(0.0, 1.0, 0.0),
        max_depth=50, max_iters=512,
    )
    d.update(kw)
    return IntegratorParams(**d)


def _mean_radiance(data, temp_data, params, n_rays, n_iters=192, bb=None, seed=1):
    from volume_path_tracer_tpu.grids.majorant import build_majorants
    g = dense_grid_from_array(jnp.asarray(data))
    t = dense_grid_from_array(jnp.asarray(temp_data)) if temp_data is not None else None
    med = Medium(
        density=g,
        # Gradient mode: bloat the majorant so p_null > 0 everywhere (the
        # score-function estimator is degenerate at p_null == 0).
        majorants=build_majorants(g, bloat=0.2),
        temperature=t,
        density_rows=None,
        temperature_rows=None,
    )
    o = jnp.broadcast_to(jnp.asarray([-3.0, 3.0, 3.0]), (n_rays, 3))
    dirs = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_rays, 3))
    pids = jnp.arange(n_rays, dtype=jnp.int32)
    L = trace_rays_diff(
        med, params, bb, o, dirs, pids, vrng.mix_stream(seed, 1), n_iters
    )
    return jnp.mean(L[:, 1])  # Y channel


class TestFiniteDifference:
    def test_density_gradient_absorption(self):
        # Absorption-only: gradient flows purely through the score factors.
        n = 6
        rho = np.full((n, n, n), 0.6, np.float32)
        params = _params()
        n_rays = 60_000
        f = jax.jit(lambda d: _mean_radiance(d, None, params, n_rays))
        g = jax.jit(jax.grad(lambda d: _mean_radiance(d, None, params, n_rays)))(
            jnp.asarray(rho)
        )
        # FD on the voxel the chord passes through (3,3,3)
        eps = 0.05
        dp = rho.copy(); dp[3, 3, 3] += eps
        dm = rho.copy(); dm[3, 3, 3] -= eps
        fd = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (2 * eps)
        ad = float(g[3, 3, 3])
        assert fd < 0 and ad < 0, (fd, ad)  # more density -> less light
        np.testing.assert_allclose(ad, fd, rtol=0.2)

    def test_density_gradient_emission(self):
        n = 6
        rho = np.full((n, n, n), 0.5, np.float32)
        temp = np.full((n, n, n), 12.0, np.float32)
        bb = jnp.asarray(blackbody_xyz_table())
        params = _params(sigma_a=0.5, le_scale=5e-3, infinite_multiplier=0.2)
        n_rays = 60_000
        f = jax.jit(lambda d: _mean_radiance(d, temp, params, n_rays, bb=bb))
        g = jax.jit(jax.grad(lambda d: _mean_radiance(d, temp, params, n_rays, bb=bb)))(
            jnp.asarray(rho)
        )
        eps = 0.05
        dp = rho.copy(); dp[3, 3, 3] += eps
        dm = rho.copy(); dm[3, 3, 3] -= eps
        fd = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (2 * eps)
        ad = float(g[3, 3, 3])
        np.testing.assert_allclose(ad, fd, rtol=0.25)

    def test_temperature_gradient(self):
        n = 6
        rho = np.full((n, n, n), 0.5, np.float32)
        temp = np.full((n, n, n), 12.0, np.float32)
        bb = jnp.asarray(blackbody_xyz_table())
        params = _params(sigma_a=0.5, le_scale=5e-3, infinite_multiplier=0.0)
        n_rays = 30_000

        def mean_L(tdata):
            return _mean_radiance(jnp.asarray(rho), tdata, params, n_rays, bb=bb)

        g = jax.jit(jax.grad(mean_L))(jnp.asarray(temp))
        eps = 0.5
        tp = temp.copy(); tp[3, 3, 3] += eps
        tm = temp.copy(); tm[3, 3, 3] -= eps
        f = jax.jit(mean_L)
        fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * eps)
        ad = float(g[3, 3, 3])
        assert ad > 0 and fd > 0  # hotter -> brighter
        np.testing.assert_allclose(ad, fd, rtol=0.2)


class TestInverseRendering:
    def test_recover_density_blob(self):
        # Recover a blob from rendered targets (single view, scattering-free).
        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids, make_train_step, param_from_density,
        )
        n = 10
        i = np.arange(n) - (n - 1) / 2
        x, y, z = np.meshgrid(i, i, i, indexing="ij")
        target_rho = np.exp(-(x**2 + y**2 + z**2) / 8.0).astype(np.float32) * 0.8
        g_target = dense_grid_from_array(target_rho)
        med_target = Medium.from_grids(g_target, pack=False)

        W = H = 20
        camera = Camera.from_parameters(
            CameraParameters((26.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                             40.0, 1.0),
            (W, H),
        )
        params = _params(sigma_a=0.35, max_iters=256)

        from volume_path_tracer_tpu.render.integrator import trace_rays
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        # target pixels, averaged over several waves
        target_px = 0
        n_target_waves = 8
        for w in range(n_target_waves):
            stream = vrng.mix_stream(9, 100 + w)
            u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = camera.generate_rays(raster, u * 0.5)
            L, _, _ = trace_rays(med_target, params, None, o_w, d_w, pids, stream)
            target_px = target_px + L
        target_px = target_px / n_target_waves

        start = np.full((n, n, n), 0.3, np.float32)
        base_med = Medium.from_grids(dense_grid_from_array(start), pack=False)
        grids = OptimizableGrids(
            log_density=param_from_density(jnp.asarray(start)), temperature=None
        )
        optimizer = optax.adam(0.08)
        opt_state = optimizer.init(grids)
        step = make_train_step(base_med, params, camera, None, optimizer,
                               n_iters=160, use_jitter=True, samples_per_step=8)
        losses = []
        for it in range(25):
            sw = jnp.asarray([9, it + 1], jnp.uint32)
            grids, opt_state, loss = step(grids, opt_state, raster, pids, target_px, sw)
            losses.append(float(loss))
        # Each loss is a single-wave stochastic estimate; compare window
        # means so one noisy wave can't flip the verdict.
        head = float(np.mean(losses[:5]))
        tail = float(np.mean(losses[-5:]))
        assert tail < head * 0.5, losses
        from volume_path_tracer_tpu.diff.inverse import density_from_param
        rec = np.asarray(density_from_param(grids.log_density))
        # A single view constrains line integrals along the view axis, not
        # individual voxels: the projected density (the observable) must match
        # well; per-voxel correlation is necessarily weaker.
        proj_corr = np.corrcoef(
            rec.sum(axis=0).reshape(-1), target_rho.sum(axis=0).reshape(-1)
        )[0, 1]
        assert proj_corr > 0.55, proj_corr
        vox_corr = np.corrcoef(rec.reshape(-1), target_rho.reshape(-1))[0, 1]
        assert vox_corr > 0.3, vox_corr


class TestJointDensityTemperature:
    def test_joint_recovery_sharded(self):
        """Joint density+temperature optimization on the 8-device mesh — the
        north star's config-5 capability (BASELINE.json): recover a perturbed
        emission temperature while density is simultaneously free, with the
        temperature-gradient psum exercised through the sharded train step.
        Ref: worker.cpp:152-157 (the emission whose inverse this closes).
        """
        from volume_path_tracer_tpu.diff.inverse import (
            OptimizableGrids, make_train_step, param_from_density,
        )
        from volume_path_tracer_tpu.parallel.shard import make_mesh
        from volume_path_tracer_tpu.render.integrator import trace_rays

        n = 8
        i = np.arange(n) - (n - 1) / 2
        x, y, z = np.meshgrid(i, i, i, indexing="ij")
        r2 = x**2 + y**2 + z**2
        rho_true = (np.exp(-r2 / 6.0) * 0.8).astype(np.float32)
        # plume-like temperature: hot core on a warm background, NARROW
        # contrast (T_K 1.1-1.3 kK): blackbody radiance is exponential in T,
        # so a wide contrast makes per-sample radiance span decades and the
        # MSE noise floor swamps the optimization signal at test-sized
        # batches
        temp_true = (20.0 + 5.0 * np.exp(-r2 / 5.0)).astype(np.float32)
        med_true = Medium.from_grids(
            dense_grid_from_array(rho_true), dense_grid_from_array(temp_true),
            pack=False,
        )
        bb = jnp.asarray(blackbody_xyz_table())
        params = _params(
            sigma_a=0.4, le_scale=5e-4, infinite_multiplier=0.2, max_iters=192
        )

        W = H = 16
        camera = Camera.from_parameters(
            CameraParameters((21.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                             42.0, 1.0),
            (W, H),
        )
        ys, xs = np.mgrid[0:H, 0:W]
        raster = jnp.asarray(
            np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32))
        pids = jnp.arange(W * H, dtype=jnp.int32)

        target_px = 0
        for w in range(8):
            stream = vrng.mix_stream(9, 100 + w)
            u = vrng.counter_uniforms(pids, stream, jnp.int32(2**31 - 1), 2)
            o_w, d_w = camera.generate_rays(raster, u * 0.5)
            L, _, _ = trace_rays(med_true, params, bb, o_w, d_w, pids, stream)
            target_px = target_px + L
        target_px = target_px / 8

        # start: true density, flat (background) temperature — both optimized
        temp0 = np.full((n, n, n), 20.0, np.float32)
        base_med = Medium.from_grids(
            dense_grid_from_array(rho_true), dense_grid_from_array(temp0),
            pack=False,
        )
        grids = OptimizableGrids(
            log_density=param_from_density(jnp.asarray(rho_true)),
            temperature=jnp.asarray(temp0),
        )
        # Per-parameter learning rates: density starts at truth (small lr
        # keeps it from chasing Monte-Carlo noise); temperature must travel.
        label = OptimizableGrids(log_density="dens", temperature="temp")
        optimizer = optax.multi_transform(
            {"dens": optax.adam(0.02), "temp": optax.adam(0.3)}, label)
        opt_state = optimizer.init(grids)
        # dual_buffer: the plain k-sample MSE's Var/k term biases emissive
        # optimization (blackbody variance grows steeply with T); the
        # dual-buffer loss is an unbiased gradient of the true MSE.
        step = make_train_step(
            base_med, params, camera, bb, optimizer, n_iters=192,
            use_jitter=True, mesh=make_mesh(8, spp=2), samples_per_step=4,
            dual_buffer=True,
        )

        # The observable is DENSITY-WEIGHTED temperature: emission is
        # p_a * bb(T) with p_a ~ rho (worker.cpp:148-157), so voxels with
        # rho ~ 0 emit nothing and their temperature is unconstrained by any
        # image — error metrics must weight by density.
        wgt = rho_true / rho_true.sum()

        def werr(t):
            return float((wgt * np.abs(t - temp_true)).sum())

        err0 = werr(temp0)
        losses = []
        for it in range(12):
            sw = jnp.asarray([9, it + 1], jnp.uint32)
            grids, opt_state, loss = step(
                grids, opt_state, raster, pids, target_px, sw)
            losses.append(float(loss))
        assert np.isfinite(losses).all(), losses
        head, tail = np.mean(losses[:3]), np.mean(losses[-3:])
        assert tail < head * 0.5, losses
        rec = np.asarray(grids.temperature)
        err = werr(rec)
        assert err < err0 * 0.6, (err, err0)
        # the recovered field must be plume-SHAPED where it is observable
        w = wgt.reshape(-1)
        a, b = rec.reshape(-1), temp_true.reshape(-1)
        am, bm = (w * a).sum(), (w * b).sum()
        wcorr = ((w * (a - am) * (b - bm)).sum()
                 / np.sqrt((w * (a - am) ** 2).sum()
                           * (w * (b - bm) ** 2).sum()))
        assert wcorr > 0.5, wcorr
