"""Integrator correctness: analytic oracles + independent NumPy reference.

Strategy (SURVEY.md section 4): delta tracking is stochastic, so correctness
tests compare *converged means* against
  (a) closed-form solutions on constant-density boxes (transmittance law,
      emission integral), and
  (b) an independent sequential NumPy implementation of the reference
      algorithm (tests/reference_impl.py) on small heterogeneous volumes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from volume_path_tracer_tpu.grids.grid import dense_grid_from_array
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render import integrator
from volume_path_tracer_tpu.render.integrator import (
    IntegratorParams,
    trace_rays,
    trace_rays_diff,
)
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table

from reference_impl import ReferencePathTracer


def constant_box_medium(n=16, rho=0.8, voxel=1.0):
    data = np.full((n, n, n), rho, np.float32)
    g = dense_grid_from_array(data, origin_ijk=(0, 0, 0), voxel_size=voxel)
    return Medium.from_grids(g)


def base_params(**kw):
    d = dict(
        sigma_a=0.5,
        sigma_s=0.0,
        hg_g=0.0,
        le_scale=0.0,
        temperature_offset=300.0,
        temperature_scale=40.0,
        infinite_xyz=(1.0, 1.0, 1.0),
        infinite_multiplier=1.0,
        distant_xyz=(0.0, 0.0, 0.0),
        distant_multiplier=0.0,
        distant_inv_direction=(0.0, 1.0, 0.0),
        max_depth=100,
        max_iters=4096,
    )
    d.update(kw)
    return IntegratorParams(**d)


def run_batch(med, params, o, d, n_rays, seed=0, bb=None):
    o = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (n_rays, 3))
    d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (n_rays, 3))
    pids = jnp.arange(n_rays, dtype=jnp.int32)
    L, iters, _ = trace_rays(med, params, bb, o, d, pids, vrng.mix_stream(seed, 1))
    return np.asarray(L), int(iters)


class TestAnalytic:
    def test_pure_absorption_transmittance(self):
        # Constant box, absorption only: E[L] = exp(-sigma_a*rho*len) * L_inf.
        # Ray crosses the full 16-voxel box; interpolation ramps at entry/exit
        # faces are avoided by aiming through the box center: the trilinear
        # field is constant except within the outermost voxel — account for it
        # by integrating the exact trilinear profile along the chord.
        rho, sa, n = 0.8, 0.11, 16
        med = constant_box_medium(n=n, rho=rho)
        params = base_params(sigma_a=sa, sigma_s=0.0)
        o = [-5.0, n / 2, n / 2]
        d = [1.0, 0.0, 0.0]
        # Exact optical depth of the trilinear-interpolated constant-box field
        # along the traversed chord. Voxel centers sit at integer coords
        # 0..n-1 with background 0, so the field ramps 0->rho on [-1,0], is
        # constant rho on [0,n-1], and ramps rho->0 on [n-1,n]. The index-bbox
        # clip limits traversal to [0,n]: the entry ramp is excluded, the exit
        # ramp included -> tau = sa * rho * ((n-1) + 1/2).
        tau = sa * rho * (n - 0.5)
        expect = np.exp(-tau)
        L, _ = run_batch(med, params, o, d, 200_000)
        mean = L[:, 0].mean()
        se = L[:, 0].std() / np.sqrt(L.shape[0])
        assert abs(mean - expect) < max(4 * se, 2e-3), (mean, expect, se)

    def test_emission_plus_absorption(self):
        # Constant box with constant temperature, absorption only:
        # E[L] = (1 - T) * Le + T * L_inf  (expected-value emission estimator)
        rho, sa, n = 0.5, 0.2, 16
        data = np.full((n, n, n), rho, np.float32)
        g = dense_grid_from_array(data)
        # temperature grid: constant adim value 10 -> T_K = 10*40+300 = 700
        tg = dense_grid_from_array(np.full((n, n, n), 10.0, np.float32))
        med = Medium.from_grids(g, tg)
        le_scale = 1e-2
        params = base_params(sigma_a=sa, le_scale=le_scale)
        bb = jnp.asarray(blackbody_xyz_table())
        from volume_path_tracer_tpu.utils.spectral import blackbody_radiation_xyz
        Le = np.asarray(blackbody_radiation_xyz(bb, jnp.float32(700.0))) * le_scale
        tau = sa * rho * (n - 0.5)
        T = np.exp(-tau)
        # Temperature grid's trilinear field also ramps at the faces, but the
        # emission integral weights by local absorption; the ramp regions are
        # thin (1 voxel each of 16) -> tolerance absorbs the difference.
        expect = (1 - T) * Le + T * np.array([1.0, 1.0, 1.0])
        L, _ = run_batch(
            med, params, [-5.0, n / 2, n / 2], [1.0, 0.0, 0.0], 100_000, bb=bb
        )
        mean = L.mean(axis=0)
        se = L.std(axis=0) / np.sqrt(L.shape[0])
        np.testing.assert_allclose(mean, expect, atol=float(4 * se.max() + 2e-2 * expect.max()))

    def test_miss_gets_infinite_light(self):
        med = constant_box_medium()
        params = base_params(infinite_xyz=(0.3, 0.5, 0.7), infinite_multiplier=2.0)
        L, _ = run_batch(med, params, [-5.0, 100.0, 100.0], [1.0, 0.0, 0.0], 8)
        np.testing.assert_allclose(L, np.array([0.6, 1.0, 1.4])[None, :].repeat(8, 0), rtol=1e-6)

    def test_zero_density_box_transparent(self):
        med = Medium.from_grids(
            dense_grid_from_array(np.zeros((8, 8, 8), np.float32))
        )
        params = base_params()
        L, iters = run_batch(med, params, [-3.0, 4.0, 4.0], [1.0, 0.0, 0.0], 16)
        np.testing.assert_allclose(L, 1.0, rtol=1e-6)
        assert iters <= 4  # superbrick skipping: near-constant iteration count


class TestAgainstNumpyReference:
    """Converged-mean comparison against the sequential literal implementation."""

    def _compare(self, density, params, o, d, n_jax, n_ref, seed=0,
                 temperature=None, bb=None, bb_lookup=None, atol_sigma=4.0):
        g = dense_grid_from_array(density)
        tg = dense_grid_from_array(temperature) if temperature is not None else None
        med = Medium.from_grids(g, tg)
        L, _ = run_batch(med, params, o, d, n_jax, seed=seed, bb=bb)
        ours = L.mean(axis=0)
        ours_se = L.std(axis=0) / np.sqrt(L.shape[0])

        ref = ReferencePathTracer(
            density, (0, 0, 0), 1.0, (0, 0, 0),
            params.sigma_a, params.sigma_s, params.hg_g, params.max_depth,
            np.array(params.infinite_xyz) * params.infinite_multiplier,
            np.array(params.distant_xyz) * params.distant_multiplier,
            params.distant_inv_direction,
            temperature=(temperature, (0, 0, 0), 1.0, (0, 0, 0))
            if temperature is not None else None,
            le_scale=params.le_scale,
            temp_offset=params.temperature_offset,
            temp_scale=params.temperature_scale,
            bb_lookup=bb_lookup,
        )
        rng = np.random.default_rng(seed + 1)
        samples = np.array([ref.trace(o, d, rng) for _ in range(n_ref)])
        theirs = samples.mean(axis=0)
        theirs_se = samples.std(axis=0) / np.sqrt(n_ref)
        tol = atol_sigma * np.sqrt(ours_se**2 + theirs_se**2) + 1e-3
        np.testing.assert_allclose(ours, theirs, atol=float(tol.max())), (ours, theirs)
        return ours, theirs

    def test_heterogeneous_absorption(self):
        rs = np.random.default_rng(5)
        density = (rs.random((12, 12, 12)) * 0.8).astype(np.float32)
        params = base_params(sigma_a=0.4, infinite_multiplier=1.5)
        self._compare(density, params, [-4.0, 6.0, 6.0], [1.0, 0.0, 0.0],
                      100_000, 4000)

    def test_scattering_with_nee(self):
        rs = np.random.default_rng(6)
        density = (rs.random((10, 10, 10)) * 0.9).astype(np.float32)
        params = base_params(
            sigma_a=0.1, sigma_s=0.5, hg_g=0.4,
            distant_xyz=(0.9, 1.0, 1.1), distant_multiplier=3.0,
            distant_inv_direction=(0.5, 1.0, 0.0),
            infinite_xyz=(0.25, 0.25, 0.5), infinite_multiplier=1.0,
            max_depth=60,
        )
        self._compare(density, params, [-4.0, 5.0, 5.0], [1.0, 0.05, 0.02] / np.linalg.norm([1.0, 0.05, 0.02]),
                      150_000, 4000)

    def test_emissive_fire_like(self):
        rs = np.random.default_rng(7)
        density = (rs.random((10, 10, 10))).astype(np.float32)
        temp = (rs.random((10, 10, 10)) * 20.0).astype(np.float32)
        bb = jnp.asarray(blackbody_xyz_table())
        from volume_path_tracer_tpu.utils.spectral import blackbody_radiation_xyz

        def bb_lookup(T):
            return np.asarray(blackbody_radiation_xyz(bb, jnp.float32(T)))

        params = base_params(
            sigma_a=1.0, sigma_s=0.3, hg_g=0.7, le_scale=1e-3,
            temperature_offset=300.0, temperature_scale=43.0,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=2.0,
            distant_inv_direction=(0.5, 1.0, 0.0),
            max_depth=40,
        )
        self._compare(density, params, [-4.0, 5.0, 5.0], [1.0, 0.0, 0.0],
                      60_000, 1500, temperature=temp, bb=bb, bb_lookup=bb_lookup)


class TestDiffForwardConsistency:
    def test_scan_matches_while(self):
        # The bounded-scan (differentiable) driver must agree with the
        # while_loop driver in value when the bound covers all paths.
        rs = np.random.default_rng(8)
        density = (rs.random((10, 10, 10)) * 0.5).astype(np.float32)
        med = Medium.from_grids(dense_grid_from_array(density))
        params = base_params(sigma_a=0.3, sigma_s=0.2, hg_g=0.2,
                             distant_xyz=(1.0, 1.0, 1.0), distant_multiplier=1.0,
                             max_iters=1024)
        n = 4096
        o = jnp.broadcast_to(jnp.asarray([-4.0, 5.0, 5.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        pids = jnp.arange(n, dtype=jnp.int32)
        stream = vrng.mix_stream(3, 1)
        L1, _, _ = trace_rays(med, params, None, o, d, pids, stream)
        L2 = trace_rays_diff(med, params, None, o, d, pids, stream, 1024)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L2), atol=1e-5)


class TestIterationCapPolicy:
    """VERDICT r1 item 5: truncation-cap accounting.

    A lane still mid-volume when the wavefront loop hits max_iters must be
    truncated (keep accumulated radiance, NO infinite light — it has not
    escaped), and the capped count must be surfaced.
    """

    def test_fire_like_deep_paths_zero_capped(self):
        # fire.json-style config: max_depth=10^6 (scenes/fire.json:18) with
        # absorption-dominated transport; max_iters must comfortably cover
        # every path.
        med = constant_box_medium(n=16, rho=0.6)
        params = base_params(
            sigma_a=2.0, sigma_s=0.09, hg_g=0.7, max_depth=1_000_000,
            max_iters=4096,
        )
        n = 512
        o = jnp.broadcast_to(jnp.asarray([-20.0, 8.2, 8.3]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        pids = jnp.arange(n, dtype=jnp.int32)
        L, _, ncap = trace_rays(med, params, None, o, d, pids, vrng.mix_stream(3, 1))
        assert int(ncap) == 0
        assert np.isfinite(np.asarray(L)).all()

    def test_capped_lanes_truncated_without_infinite_light(self):
        # Scattering-only box with an absurd 1-iteration cap: every lane that
        # enters the medium is still mid-volume -> truncated with L == 0
        # (scattering emits nothing directly), NOT given the infinite light.
        med = constant_box_medium(n=16, rho=50.0)
        params = base_params(
            sigma_a=0.0, sigma_s=5.0, max_depth=1000, max_iters=2,
            infinite_xyz=(7.0, 7.0, 7.0),
        )
        n = 256
        o = jnp.broadcast_to(jnp.asarray([-20.0, 8.2, 8.3]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        pids = jnp.arange(n, dtype=jnp.int32)
        L, _, ncap = trace_rays(med, params, None, o, d, pids, vrng.mix_stream(5, 1))
        ncap = int(ncap)
        assert ncap >= 0.9 * n  # nearly all lanes truncated mid-volume
        # Every non-truncated lane scattered straight out of the box and
        # legitimately collected L_inf; every truncated lane has exactly 0.
        L = np.asarray(L)
        assert np.count_nonzero(L.sum(-1)) == n - ncap
        np.testing.assert_allclose(L[L.sum(-1) > 0], 7.0, rtol=1e-6)


class TestCompaction:
    """Unit tests for the batched-lane compaction helpers (round 3).

    compact_lanes must be bitwise equivalent to per-array fancy indexing,
    and alive_first_perm to a stable argsort of the done flags — the render
    results' bitwise invariance under compaction depends on both.
    """

    def test_alive_first_perm_matches_stable_argsort(self):
        rng = np.random.default_rng(0)
        for n in (8, 127, 1024):
            done = jnp.asarray(rng.uniform(size=n) < 0.6)
            ref = np.argsort(np.asarray(done).astype(np.int32), kind="stable")
            got = np.asarray(integrator.alive_first_perm(done))
            np.testing.assert_array_equal(got, ref)

    def test_compact_lanes_bitwise_equals_fancy_indexing(self):
        rng = np.random.default_rng(1)
        n, k = 512, 200
        tree = {
            "f": jnp.asarray(rng.standard_normal(n).astype(np.float32)),
            "v3": jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
            "i": jnp.asarray(rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int64).astype(np.int32)),
            "u": jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)),
            "b": jnp.asarray(rng.uniform(size=n) < 0.5),
        }
        keep = jnp.asarray(rng.permutation(n)[:k].astype(np.int32))
        out = integrator.compact_lanes(keep, tree)
        for key, leaf in tree.items():
            expect = np.asarray(leaf)[np.asarray(keep)]
            got = np.asarray(out[key])
            assert got.dtype == expect.dtype, key
            np.testing.assert_array_equal(got, expect, err_msg=key)
