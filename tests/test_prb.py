"""Path-replay backprop (diff/prb.py) validation.

The replay VJP computes the gradient of the *same* estimator as reverse-mode
AD of the bounded-scan path (trace_rays_diff): attached trilinear density /
temperature samples, score-function factors for discrete events, attached
ratio-tracking weights, detached majorants. So the sharpest test available is
direct equality with `jax.grad` of trace_rays_diff — far tighter than finite
differences. We check it per estimator component:

  - absorption-only (score factors only)         — worker.cpp:148-150,159-163
  - emission (density + temperature gradients)   — worker.cpp:152-157
  - scattering + NEE (the double shadow walk)    — worker.cpp:52-90
  - packed fast-gather layout (forward uses the fused rows AD cannot)

plus the internal accounting invariant: the replayed accumulation gL_acc must
reproduce <g, L_forward> lane-for-lane (the suffix bookkeeping is exact).
"""
import numpy as np

import jax
import jax.numpy as jnp

from volume_path_tracer_tpu.diff.prb import replay_grads, trace_rays_prb
from volume_path_tracer_tpu.grids.grid import dense_grid_from_array, pack_corner_rows
from volume_path_tracer_tpu.grids.majorant import build_majorants
from volume_path_tracer_tpu.models.medium import Medium, pack_fused_rows
from volume_path_tracer_tpu.render.integrator import (
    IntegratorParams,
    trace_rays,
    trace_rays_diff,
)
from volume_path_tracer_tpu.utils import rng as vrng
from volume_path_tracer_tpu.utils.spectral import blackbody_xyz_table


def make_med(data, temp=None, bloat=0.2, pack=False):
    g = dense_grid_from_array(jnp.asarray(data))
    t = dense_grid_from_array(jnp.asarray(temp)) if temp is not None else None
    maj = build_majorants(g, bloat=bloat)
    return Medium(
        density=g,
        majorants=maj,
        temperature=t,
        density_rows=pack_fused_rows(g.data, maj) if pack else None,
        temperature_rows=(
            pack_corner_rows(t.data) if (pack and t is not None) else None
        ),
    )


def _params(**kw):
    d = dict(
        sigma_a=0.4, sigma_s=0.0, hg_g=0.0, le_scale=0.0,
        temperature_offset=300.0, temperature_scale=40.0,
        infinite_xyz=(1.0, 1.0, 1.0), infinite_multiplier=1.0,
        distant_xyz=(0.0, 0.0, 0.0), distant_multiplier=0.0,
        distant_inv_direction=(0.0, 1.0, 0.0),
        max_depth=50, max_iters=192,
    )
    d.update(kw)
    return IntegratorParams(**d)


def _rays(n_rays):
    o = jnp.broadcast_to(jnp.asarray([-3.0, 3.0, 3.0]), (n_rays, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_rays, 3))
    pids = jnp.arange(n_rays, dtype=jnp.int32)
    return o, d, pids


def _grad_pair(params, rho, temp=None, bb=None, n_rays=2048, stream=None,
               pack_prb=False):
    """(AD grads, PRB grads) of mean Y radiance for the same ray batch."""
    stream = vrng.mix_stream(7, 2) if stream is None else stream
    o, d, pids = _rays(n_rays)
    argnums = (0,) if temp is None else (0, 1)

    def f_ad(dat, tdat=None):
        med = make_med(dat, tdat, pack=False)
        L = trace_rays_diff(med, params, bb, o, d, pids, stream, params.max_iters)
        return jnp.mean(L[:, 1])

    def f_prb(dat, tdat=None):
        med = make_med(dat, tdat, pack=pack_prb)
        L = trace_rays_prb(med, params, bb, o, d, pids, stream)
        return jnp.mean(L[:, 1])

    args = (jnp.asarray(rho),) if temp is None else (
        jnp.asarray(rho), jnp.asarray(temp)
    )
    ga = jax.jit(jax.grad(f_ad, argnums=argnums))(*args)
    gp = jax.jit(jax.grad(f_prb, argnums=argnums))(*args)
    return ga, gp


def _assert_match(a, p, rtol=1e-4):
    a, p = np.asarray(a), np.asarray(p)
    scale = np.abs(a).max()
    assert scale > 0, "degenerate test: zero gradient"
    np.testing.assert_allclose(p, a, atol=rtol * scale, rtol=0)


class TestReplayMatchesAD:
    def test_absorption_score_factors(self):
        rho = np.full((6, 6, 6), 0.6, np.float32)
        ga, gp = _grad_pair(_params(), rho)
        _assert_match(ga[0], gp[0])

    def test_emission_density_and_temperature(self):
        rho = np.full((6, 6, 6), 0.5, np.float32)
        temp = np.full((6, 6, 6), 12.0, np.float32)
        bb = jnp.asarray(blackbody_xyz_table())
        p = _params(sigma_a=0.5, le_scale=5e-3, infinite_multiplier=0.2)
        ga, gp = _grad_pair(p, rho, temp, bb=bb)
        _assert_match(ga[0], gp[0])
        _assert_match(ga[1], gp[1])

    def test_nee_shadow_double_walk(self):
        rho = np.full((6, 6, 6), 0.5, np.float32)
        p = _params(
            sigma_a=0.1, sigma_s=0.6, hg_g=0.4, infinite_multiplier=0.3,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
            distant_inv_direction=(0.3, 0.8, 0.2), max_depth=40, max_iters=256,
        )
        ga, gp = _grad_pair(p, rho)
        _assert_match(ga[0], gp[0])

    def test_packed_forward_layout(self):
        # PRB's forward/replay run on the fused fast-gather rows (which the AD
        # path cannot differentiate through); gradients must still match the
        # unpacked AD oracle.
        rho = np.full((6, 6, 6), 0.5, np.float32)
        temp = np.full((6, 6, 6), 12.0, np.float32)
        bb = jnp.asarray(blackbody_xyz_table())
        p = _params(
            sigma_a=0.3, sigma_s=0.5, hg_g=0.4, le_scale=4e-3,
            infinite_multiplier=0.3,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
            distant_inv_direction=(0.3, 0.8, 0.2), max_depth=40, max_iters=256,
        )
        ga, gp = _grad_pair(p, rho, temp, bb=bb, pack_prb=True)
        _assert_match(ga[0], gp[0])
        _assert_match(ga[1], gp[1])


class TestReplayInternals:
    def test_forward_value_unchanged(self):
        # trace_rays_prb's primal must be bitwise the production trace_rays.
        rho = np.full((6, 6, 6), 0.5, np.float32)
        med = make_med(rho)
        p = _params(
            sigma_a=0.1, sigma_s=0.6, hg_g=0.4, infinite_multiplier=0.3,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
            distant_inv_direction=(0.3, 0.8, 0.2), max_iters=256,
        )
        o, d, pids = _rays(1024)
        stream = vrng.mix_stream(7, 2)
        L_ref, _, _ = trace_rays(med, p, None, o, d, pids, stream)
        L_prb = trace_rays_prb(med, p, None, o, d, pids, stream)
        np.testing.assert_array_equal(np.asarray(L_ref), np.asarray(L_prb))

    def test_accounting_invariant(self):
        # The replay's accumulated <g, L> must reproduce <g, L_forward>
        # lane-for-lane: proves the suffix bookkeeping (and therefore every
        # score factor's multiplier) is exact, including through the NEE
        # double walk and truncation parity.
        rho = np.full((6, 6, 6), 0.5, np.float32)
        med = make_med(rho)
        p = _params(
            sigma_a=0.1, sigma_s=0.6, hg_g=0.4, infinite_multiplier=0.3,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
            distant_inv_direction=(0.3, 0.8, 0.2), max_iters=256,
        )
        n_rays = 2048
        o, d, pids = _rays(n_rays)
        stream = vrng.mix_stream(7, 2)
        L_fwd, _, _ = trace_rays(med, p, None, o, d, pids, stream)
        gv = jnp.tile(jnp.asarray([[0.3, 1.0, 0.2]]), (n_rays, 1))
        _, _, acc, tot = replay_grads(
            med, p, None, o, d, pids, stream, L_fwd, gv, with_check=True
        )
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(tot), atol=1e-5, rtol=1e-5
        )

    def test_truncation_parity(self):
        # With a tiny iteration cap, forward truncates lanes mid-volume; the
        # replay must reproduce exactly the truncated estimator's gradient.
        rho = np.full((6, 6, 6), 0.8, np.float32)
        p = _params(sigma_a=0.2, sigma_s=0.4, hg_g=0.0, max_iters=12)
        ga, gp = _grad_pair(p, rho, n_rays=2048)
        _assert_match(ga[0], gp[0])


class TestSavedWalkResiduals:
    """Round-4 saved-walk machinery (_trace_rays_record + the saved replay).

    The forward records one float per NEE shadow walk; the replay consumes
    it instead of re-walking (PRE) each shadow ray. These tests pin the
    residual encoding and prove the saved path computes the SAME gradient
    as the residual-free PRE+GRAD fallback.
    """

    def _scene(self):
        import numpy as np

        rng = np.random.default_rng(5)
        rho = (rng.uniform(0.0, 1.2, (9, 9, 9)) ** 2).astype(np.float32)
        med = make_med(rho, pack=True)
        p = _params(
            sigma_a=0.1, sigma_s=0.5, hg_g=0.3,
            distant_xyz=(0.95, 1.0, 1.09), distant_multiplier=5.0,
            distant_inv_direction=(0.3, 1.0, 0.2),
            max_iters=256,
        )
        o, d, pids = _rays(64)
        stream = jnp.uint32(11)
        return med, p, o, d, pids, stream

    def test_record_forward_is_bitwise_the_production_forward(self):
        from volume_path_tracer_tpu.diff.prb import _trace_rays_record

        med, p, o, d, pids, stream = self._scene()
        L_ref, _, _ = trace_rays(med, p, None, o, d, pids, stream)
        L_rec, tf = _trace_rays_record(med, p, None, o, d, pids, stream, 8)
        np.testing.assert_array_equal(np.asarray(L_ref), np.asarray(L_rec))
        tfn = np.asarray(tf)
        # Residual encoding: positives are transmittances in (0, 1] * RR
        # boosts (bounded by 1/0.25 per boost, so finite); negatives are
        # integer draw counters within the cap; at least one walk recorded.
        assert (tfn != 0).any()
        neg = -tfn[tfn < 0]
        np.testing.assert_array_equal(neg, np.round(neg))
        assert (neg <= p.max_iters).all()
        assert np.isfinite(tfn).all()

    def test_saved_replay_equals_pre_grad_fallback(self):
        from volume_path_tracer_tpu.diff.prb import _trace_rays_record

        med, p, o, d, pids, stream = self._scene()
        L, tf = _trace_rays_record(med, p, None, o, d, pids, stream, 8)
        g_vec = jnp.ones((64, 3), jnp.float32)
        dd_saved, _ = replay_grads(
            med, p, None, o, d, pids, stream, L, g_vec, tf=tf
        )
        dd_fallback, _ = replay_grads(
            med, p, None, o, d, pids, stream, L, g_vec, tf=None
        )
        np.testing.assert_allclose(
            np.asarray(dd_saved), np.asarray(dd_fallback),
            rtol=2e-4, atol=1e-6,
        )

    def test_slot_overflow_falls_back_per_walk(self):
        """K=1 residual slot: every walk past the first replays PRE+GRAD;
        the gradient must still match the all-fallback replay."""
        from volume_path_tracer_tpu.diff.prb import _trace_rays_record

        med, p, o, d, pids, stream = self._scene()
        L, tf1 = _trace_rays_record(med, p, None, o, d, pids, stream, 1)
        g_vec = jnp.ones((64, 3), jnp.float32)
        dd_k1, _ = replay_grads(
            med, p, None, o, d, pids, stream, L, g_vec, tf=tf1
        )
        dd_fb, _ = replay_grads(
            med, p, None, o, d, pids, stream, L, g_vec, tf=None
        )
        np.testing.assert_allclose(
            np.asarray(dd_k1), np.asarray(dd_fb), rtol=2e-4, atol=1e-6
        )


class TestCompactScatterFitting:
    """compact_scatter_fitting must add exactly the nz-masked payload rows
    whenever payload_fits says so; payload_fits must be False (so the replay
    routes to direct_scatter) whenever the two-level capacity would drop
    entries."""

    def _direct(self, table, rows, vals, nz):
        return table.at[rows].add(jnp.where(nz[:, None], vals, 0.0))

    def _run(self, K, p_nz, seed=0, R=512, expect_fits=None, atol=1e-6):
        from volume_path_tracer_tpu.diff.prb import (
            compact_scatter_fitting, payload_fits,
        )

        rng = np.random.default_rng(seed)
        rows = jnp.asarray(rng.integers(0, R, K, dtype=np.int32))
        vals = jnp.asarray(rng.standard_normal((K, 8)).astype(np.float32))
        nz = jnp.asarray(rng.random(K) < p_nz)
        fits = bool(payload_fits(nz))
        if expect_fits is not None:
            assert fits == expect_fits, (fits, expect_fits)
        if not fits:
            return
        table = jnp.zeros((R, 8), jnp.float32)
        got = compact_scatter_fitting(table, rows, vals, nz)
        want = self._direct(table, rows, vals, nz)
        # Only scatter-add ORDER differs between the two -> fp tolerance.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=atol)

    def test_sparse_payload_fits_and_is_exact(self):
        # ~30% occupancy: level-1 leftovers tiny, level 2 absorbs them.
        self._run(K=8192, p_nz=0.3, expect_fits=True)

    def test_moderate_payload_fits_via_level2(self):
        self._run(K=8192, p_nz=0.5)

    def test_dense_payload_reports_misfit(self):
        self._run(K=8192, p_nz=0.9, expect_fits=False)

    def test_aliased_rows(self):
        # All payload rows target 3 table rows: heavy scatter aliasing —
        # ~2700 standard normals summed per cell in data-dependent order, so
        # the tolerance is the fp-reassociation envelope, not 1e-6.
        self._run(K=8192, p_nz=0.3, R=3, atol=1e-4)

    def test_small_and_ragged_widths_fit_trivially(self):
        # below _COMPACT_MIN_WIDTH / not a superblock multiple: the direct
        # path inside compact_scatter_fitting, exact at ANY occupancy
        self._run(K=640, p_nz=0.95, expect_fits=True)
        self._run(K=4100, p_nz=0.95, expect_fits=True)

    def test_empty_and_capacity_boundary(self):
        from volume_path_tracer_tpu.diff.prb import (
            compact_scatter_fitting, payload_fits,
        )

        K = 4096
        rows = jnp.zeros((K,), jnp.int32)
        vals = jnp.ones((K, 8), jnp.float32)
        # all-False: fits, nothing added
        nz0 = jnp.zeros((K,), bool)
        assert bool(payload_fits(nz0))
        out = compact_scatter_fitting(jnp.zeros((4, 8)), rows, vals, nz0)
        assert float(jnp.abs(out).max()) == 0.0
        # exactly the full two-level capacity per superblock: the strided
        # block of entry k is k % 32 (K=4096 -> B=32); fill blocks 0..15
        # (superblock 0) so each holds cap1 + cap2/16 nonzero entries ->
        # leftovers exactly fill cap2: still fits, still exact
        from volume_path_tracer_tpu.diff.prb import _SCATTER_CAP1, _SCATTER_CAP2

        B = 32
        blk = jnp.arange(K) % B
        slot = jnp.arange(K) // B
        per_blk = _SCATTER_CAP1 + _SCATTER_CAP2 // 16
        nz1 = (blk < 16) & (slot < per_blk)
        assert bool(payload_fits(nz1))
        out = compact_scatter_fitting(jnp.zeros((4, 8)), rows, vals, nz1)
        np.testing.assert_allclose(np.asarray(out)[0], float(jnp.sum(nz1)))
        # one more leftover in superblock 0 -> misfit
        nz2 = nz1 | ((blk == 0) & (slot == per_blk))
        assert not bool(payload_fits(nz2))
