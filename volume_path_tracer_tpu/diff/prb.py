"""Path-replay backpropagation (PRB): the custom-VJP gradient path.

The naive reverse-mode route (diff/inverse.py's bounded `lax.scan` over the
wavefront step + `jax.checkpoint`) stores or recomputes per-iteration state —
memory and time grow with the iteration bound, and the packed fast-gather
layout must be abandoned because its corner rows are 8x the grid.

This module replaces that with a hand-written VJP in the style of path replay
backpropagation (the standard trick for differentiating path-traced light
transport in O(1) memory): because every random draw is a pure function of
(pixel id, stream, per-lane draw counter) — utils/rng.py — a lane's entire
path can be *replayed* exactly. The backward pass is therefore just a second
wavefront loop:

  - forward (fwd): the production `trace_rays` while_loop, packed gathers and
    all; the only residual saved is the per-lane radiance L_total.
  - backward (bwd): replay each lane's path with the same draws, maintaining
    the scalar suffix <g, L_total - L_accumulated>. At each replayed event,
    scatter-add the analytic derivative into the gradient grids:

      * emission (worker.cpp:152-157): d(p_a * le_scale * bb(T)) w.r.t. the
        8 density corners (through p_a = sigma_a*rho/sigma_maj) and the 8
        temperature corners (through the blackbody LUT slope).
      * discrete event choice (worker.cpp:159-163): the score-function factor
        d p_e / p_e times the suffix radiance collected at or after the event
        (matching AD of the attached/detached ratio p_e / stop_grad(p_e)).
      * NEE ratio tracking (worker.cpp:68-71): each shadow collision's factor
        sigma_n / sigma_maj. The shadow contribution (phase * T_final * Li)
        is only known when the walk completes, so shadow rays are walked
        TWICE in the replay: a PRE walk (identical to the forward shadow
        walk) establishes T_final, then the lane's draw counter is reset to
        the shadow start and a GRAD walk revisits the same collisions
        scattering -phase * <g,Li> * sigma_t * T_final / sigma_n per corner.

    Majorants and event *selections* stay detached (detached-majorant
    differentiable delta tracking), exactly like the AD estimator, so PRB
    gradients match `jax.grad` of trace_rays_diff to float precision — that
    equality is tested in tests/test_prb.py.

Truncation parity: a forward lane only draws counters 0..max_iters-1; the
replay retires any lane whose counter reaches params.max_iters without adding
anything, mirroring the forward truncation policy (integrator.py
finalize_radiance).

Gradients are provided for the density and temperature grids only; ray
origins/directions and the blackbody table get zero cotangents (grid recovery
is the inverse-rendering capability mandated by BASELINE.json config 4).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.medium import Medium
from ..render.integrator import (
    IntegratorParams,
    _TINY,
    clip_ray,
    emission_enabled,
    make_traversal,
    sample_temperature_kelvin,
    trace_rays,
)
from ..ops.phase import henyey_greenstein, sample_henyey_greenstein
from ..utils import rng as vrng
from ..utils.spectral import blackbody_radiation_xyz_value_grad

# Replay lane modes.
RCAM = 0  # camera delta tracking (same events as the forward CAM mode)
RPRE = 1  # shadow ray, first walk: reproduce forward, establish T_final
RGRAD = 2  # shadow ray, second walk: scatter ratio-tracking gradients
RDONE = 3

_CORNER_OFFSETS = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
        [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
    ],
    dtype=np.int32,
)


class ReplayState(NamedTuple):
    """SoA replay wavefront state; [N] or [N, 3] per field."""

    o: jnp.ndarray
    d: jnp.ndarray
    t: jnp.ndarray
    t_exit: jnp.ndarray
    sig_seg: jnp.ndarray
    t_seg: jnp.ndarray
    gL_acc: jnp.ndarray  # <g, L accumulated so far> (scalar per lane)
    depth: jnp.ndarray
    mode: jnp.ndarray
    pend_o: jnp.ndarray
    pend_d: jnp.ndarray
    T_ray: jnp.ndarray  # transmittance of the current shadow walk
    T_fin: jnp.ndarray  # PRE walk's final transmittance (for the GRAD walk)
    phase_val: jnp.ndarray
    sh_ctr0: jnp.ndarray  # draw counter at shadow start (GRAD walk reset)
    sh_t0: jnp.ndarray  # shadow ray clip entry
    sh_t1: jnp.ndarray  # shadow ray clip exit
    ctr: jnp.ndarray  # per-lane draw counter (replays forward counters)


def _corner_scatter_indices(shape, i0):
    """Flat indices + validity of the 8 trilinear corners of base voxel i0.

    Matches gather_voxels' bounds semantics (grids/grid.py): out-of-array
    corners carry the background 0 and receive no gradient.
    """
    X, Y, Z = shape
    corners = i0[:, None, :] + jnp.asarray(_CORNER_OFFSETS)  # [N, 8, 3]
    ci, cj, ck = corners[..., 0], corners[..., 1], corners[..., 2]
    valid = (ci >= 0) & (ci < X) & (cj >= 0) & (cj < Y) & (ck >= 0) & (ck < Z)
    flat = (
        jnp.clip(ci, 0, X - 1) * Y + jnp.clip(cj, 0, Y - 1)
    ) * Z + jnp.clip(ck, 0, Z - 1)
    return flat, valid


def fold_corner_rows(rows: jnp.ndarray, shape) -> jnp.ndarray:
    """Fold a corner-row-layout gradient table back into the [X,Y,Z] grid.

    Row r = base coord b (covering -1..dim-1 per axis, see
    grids/grid.corner_row_index); column c holds the contribution to voxel
    b + _CORNER_OFFSETS[c]. Voxel v therefore sums table[(v - off_c) + 1, c]
    over the 8 corners — 8 shifted dense slices, one pass. Out-of-grid
    corner positions are never read, matching the per-corner validity
    masking of a flat scatter.
    """
    X, Y, Z = shape
    t4 = rows.reshape(X + 1, Y + 1, Z + 1, 8)
    out = None
    for c, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
        sl = t4[
            1 - dx : 1 - dx + X, 1 - dy : 1 - dy + Y, 1 - dz : 1 - dz + Z, c
        ]
        out = sl if out is None else out + sl
    return out


def _make_replay_step(medium: Medium, params: IntegratorParams, bb_table):
    """One backward-replay iteration: returns step(st, u, gL_tot, g_vec,
    gd_rows, gt_rows) with gradients accumulated in corner-row layout."""
    dgrid = medium.density
    O = jnp.asarray(dgrid.origin_ijk, dtype=jnp.float32)
    shape_f = jnp.asarray(dgrid.shape, dtype=jnp.float32)
    bbox_lo, bbox_hi = O, O + shape_f

    sigma_a, sigma_s = params.sigma_a, params.sigma_s
    sigma_t = params.sigma_t
    hg_g = params.hg_g
    emission_on = emission_enabled(medium, params)
    nee_on = params.nee_enabled

    wi_np = jnp.asarray(params.distant_inv_direction, dtype=jnp.float32)
    wi = wi_np / jnp.linalg.norm(wi_np)
    Li = jnp.asarray(params.distant_xyz, dtype=jnp.float32) * params.distant_multiplier
    L_inf = (
        jnp.asarray(params.infinite_xyz, dtype=jnp.float32)
        * params.infinite_multiplier
    )

    traverse = make_traversal(medium, params)

    def step(st: ReplayState, u, gL_tot, g_vec, gd_rows, gt_rows):
        # Truncation parity: forward lanes stop drawing at max_iters.
        trunc = (st.mode != RDONE) & (st.ctr >= params.max_iters)
        mode0 = jnp.where(trunc, RDONE, st.mode)
        active = mode0 != RDONE
        in_cam = mode0 == RCAM
        in_pre = mode0 == RPRE
        in_grad = mode0 == RGRAD

        gLi = jnp.sum(g_vec * Li, axis=-1)
        gLinf = jnp.sum(g_vec * L_inf, axis=-1)

        tr = traverse(
            st.o, st.d, st.t, st.t_exit, st.sig_seg, st.t_seg, active, u[:, 0]
        )
        rho, sig, sigma_maj = tr.rho, tr.sig, tr.sigma_maj
        p_col = tr.p_col
        real_col, zero_col = tr.real_col, tr.zero_col

        # =========== CAMERA-mode collision: emission + event ===========
        cam_col = in_cam & real_col
        p_a = sigma_a * rho / sig
        p_s = sigma_s * rho / sig
        p_n = jnp.maximum(1.0 - p_a - p_s, 0.0)

        gL_acc = st.gL_acc
        demis = jnp.zeros_like(rho)  # density-corner emission weight
        tw = None  # temperature-corner emission weight
        tp_local = None
        if emission_on:
            temp_k, tp_local = sample_temperature_kelvin(medium, params, p_col)
            bb_val, bb_grad = blackbody_radiation_xyz_value_grad(bb_table, temp_k)
            gbb = jnp.sum(g_vec * bb_val, axis=-1)
            gbbg = jnp.sum(g_vec * bb_grad, axis=-1)
            gL_acc = gL_acc + jnp.where(
                cam_col, p_a * params.le_scale * gbb, 0.0
            )
            # d emission / d rho_corner = (sigma_a / sigma_maj) * w * le * bb
            demis = jnp.where(cam_col, (sigma_a / sig) * params.le_scale * gbb, 0.0)
            # d emission / d T_corner = p_a * le * bb'(T) * temp_scale * w
            tw = jnp.where(
                cam_col,
                p_a * params.le_scale * gbbg * params.temperature_scale,
                0.0,
            )

        event = vrng.sample_discrete3(p_n, p_a, p_s, u[:, 1])
        is_null = event == 0
        is_abs = event == 1
        is_scat = event == 2
        cam_null = cam_col & is_null
        cam_abs = cam_col & is_abs
        cam_scat = cam_col & is_scat

        # Score-function factor: AD of ratio_e = p_e_safe / stop_grad(p_e_safe)
        # contributes (d p_e / p_e_safe) * (suffix radiance after this event).
        dpn = jnp.where(1.0 - p_a - p_s > 0.0, -(sigma_a + sigma_s), 0.0)
        coef = jnp.where(is_null, dpn, jnp.where(is_abs, sigma_a, sigma_s))
        p_e = jnp.where(is_null, p_n, jnp.where(is_abs, p_a, p_s))
        gsuffix = gL_tot - gL_acc  # emission at this collision already in acc
        score_w = jnp.where(
            cam_col & (p_e > _TINY),
            (coef / sig) / jnp.maximum(p_e, _TINY) * gsuffix,
            0.0,
        )

        new_dir = sample_henyey_greenstein(st.d, u[:, 2], u[:, 3], hg_g)
        phase_new = henyey_greenstein(jnp.sum(st.d * wi, axis=-1), hg_g)
        depth_new = jnp.where(cam_scat, st.depth + 2, st.depth)
        pend_o_new = jnp.where(cam_scat[:, None], p_col, st.pend_o)
        pend_d_new = jnp.where(cam_scat[:, None], new_dir, st.pend_d)
        phase_val_new = jnp.where(cam_scat, phase_new, st.phase_val)

        # =========== shadow walks (PRE reproduces forward; GRAD scatters) ====
        shw_col_pre = in_pre & real_col
        shw_col_grad = in_grad & real_col
        shw_col = shw_col_pre | shw_col_grad
        sigma_n = jnp.maximum(0.0, sigma_maj - sigma_t * rho)
        T_after = st.T_ray * (sigma_n / sig)
        rr = T_after <= 0.05
        rr_kill = rr & (u[:, 1] < 0.75)
        T_after = jnp.where(rr_kill, 0.0, jnp.where(rr, T_after / 0.25, T_after))
        T_ray_new = jnp.where(shw_col, T_after, st.T_ray)
        shw_dead = shw_col & (T_ray_new <= 0.0)

        pre_finish = (in_pre & tr.exited) | (shw_col_pre & shw_dead)
        grad_finish = (in_grad & tr.exited) | (shw_col_grad & shw_dead)

        # GRAD-walk collision: d contrib / d rho_corner
        #   = -phase * <g, Li> * sigma_t * (T_final / sigma_n) * w
        # (zero when sigma_n clamps to 0: max(0, .) has zero slope there).
        shadow_w = jnp.where(
            shw_col_grad & (sigma_n > 0.0),
            -st.phase_val * gLi * sigma_t * st.T_fin / jnp.maximum(sigma_n, _TINY),
            0.0,
        )

        # PRE completion: the forward added the shadow contribution here.
        gL_acc = gL_acc + jnp.where(pre_finish, st.phase_val * T_ray_new * gLi, 0.0)
        T_fin_new = jnp.where(pre_finish, T_ray_new, st.T_fin)
        go_grad = pre_finish & (T_fin_new > 0.0)
        pre_resume = pre_finish & (~go_grad)  # zero contribution: no GRAD walk

        # =========== resume / retire (mirrors integrator.make_step) =========
        shadow_done = grad_finish | pre_resume
        if nee_on:
            start_shadow = cam_scat
            resume = shadow_done
        else:
            start_shadow = jnp.zeros_like(cam_scat)
            resume = shadow_done | cam_scat

        new_o = jnp.where(start_shadow[:, None], p_col, pend_o_new)
        new_d = jnp.where(start_shadow[:, None], wi, pend_d_new)
        t0n, t1n, hitn = clip_ray(new_o, new_d, bbox_lo, bbox_hi)

        depth_ok = depth_new < params.max_depth
        resume_ok = resume & hitn & depth_ok
        resume_escape = resume & ((~hitn) | (~depth_ok))

        start_shadow_ok = start_shadow & hitn
        shadow_miss = start_shadow & (~hitn)
        gL_acc = gL_acc + jnp.where(shadow_miss, phase_val_new * gLi, 0.0)
        t0p, t1p, hitp = clip_ray(pend_o_new, pend_d_new, bbox_lo, bbox_hi)
        miss_resume_ok = shadow_miss & hitp & depth_ok
        miss_resume_escape = shadow_miss & ((~hitp) | (~depth_ok))

        cam_exit = in_cam & tr.exited
        becomes_done_inf = cam_exit | resume_escape | miss_resume_escape
        gL_acc = gL_acc + jnp.where(becomes_done_inf, gLinf, 0.0)
        becomes_done_term = cam_abs

        mode_new = mode0
        mode_new = jnp.where(becomes_done_inf | becomes_done_term, RDONE, mode_new)
        mode_new = jnp.where(start_shadow_ok, RPRE, mode_new)
        mode_new = jnp.where(resume_ok | miss_resume_ok, RCAM, mode_new)
        mode_new = jnp.where(go_grad, RGRAD, mode_new)

        # ---- next-walk ray state ----
        o_new = jnp.where(start_shadow_ok[:, None], new_o, st.o)
        d_new = jnp.where(start_shadow_ok[:, None], new_d, st.d)
        t_new = jnp.where(start_shadow_ok, t0n, st.t)
        t_exit_new = jnp.where(start_shadow_ok, t1n, st.t_exit)

        o_new = jnp.where(resume_ok[:, None], pend_o_new, o_new)
        d_new = jnp.where(resume_ok[:, None], pend_d_new, d_new)
        t_res = jnp.where(resume & (~start_shadow), t0n, t0p)
        t_exit_res = jnp.where(resume & (~start_shadow), t1n, t1p)
        t_new = jnp.where(resume_ok, t_res, t_new)
        t_exit_new = jnp.where(resume_ok, t_exit_res, t_exit_new)
        o_new = jnp.where(miss_resume_ok[:, None], pend_o_new, o_new)
        d_new = jnp.where(miss_resume_ok[:, None], pend_d_new, d_new)
        t_new = jnp.where(miss_resume_ok, t0p, t_new)
        t_exit_new = jnp.where(miss_resume_ok, t1p, t_exit_new)

        # GRAD walk restarts the saved shadow ray with replayed counters.
        o_new = jnp.where(go_grad[:, None], pend_o_new, o_new)
        d_new = jnp.where(go_grad[:, None], wi[None, :], d_new)
        t_new = jnp.where(go_grad, st.sh_t0, t_new)
        t_exit_new = jnp.where(go_grad, st.sh_t1, t_exit_new)

        plain_adv = cam_null | zero_col | (shw_col & ~(pre_finish | grad_finish))
        t_new = jnp.where(plain_adv, tr.t_cand, t_new)
        t_new = jnp.where(tr.fetch, tr.t_next, t_new)

        new_ray = start_shadow_ok | resume_ok | miss_resume_ok | go_grad
        sig_seg_new = jnp.where(tr.fetch, tr.sig_seg_f, st.sig_seg)
        sig_seg_new = jnp.where(new_ray, 0.0, sig_seg_new)
        t_seg_new = jnp.where(tr.fetch, tr.t_seg_f, st.t_seg)
        t_seg_new = jnp.where(new_ray, t_new, t_seg_new)

        T_ray_out = jnp.where(start_shadow_ok | go_grad, 1.0, T_ray_new)

        sh_ctr0_new = jnp.where(start_shadow_ok, st.ctr, st.sh_ctr0)
        sh_t0_new = jnp.where(start_shadow_ok, t0n, st.sh_t0)
        sh_t1_new = jnp.where(start_shadow_ok, t1n, st.sh_t1)
        ctr_new = jnp.where(go_grad, st.sh_ctr0, st.ctr) + 1

        # =========== gradient scatter-adds ===========
        # Row scatter into the CORNER-ROW layout: one [8]-row add per lane
        # instead of 8 element adds — TPU scatters pay per ROW like gathers
        # (PERF.md section 4: 12x), and replay_grads folds the row table back
        # into the [X,Y,Z] grid once at the end. Out-of-grid corners write
        # into row/column combinations the fold never reads, reproducing the
        # old per-corner validity masking exactly.
        X, Y, Z = dgrid.shape
        i0 = jnp.floor(tr.lp).astype(jnp.int32)
        f = tr.lp - i0.astype(tr.lp.dtype)
        from ..grids.grid import corner_row_index, trilinear_weights

        w8 = trilinear_weights(f)
        row8, rvalid = corner_row_index((X, Y, Z), i0)
        dweight = demis + score_w + shadow_w  # disjoint lane sets
        gd_rows = gd_rows.at[row8].add(
            jnp.where(rvalid[:, None], w8 * dweight[:, None], 0.0)
        )
        if emission_on and gt_rows is not None:
            tgrid = medium.temperature
            i0t = jnp.floor(tp_local).astype(jnp.int32)
            ft = tp_local - i0t.astype(tp_local.dtype)
            w8t = trilinear_weights(ft)
            row8t, rvalidt = corner_row_index(tgrid.shape, i0t)
            gt_rows = gt_rows.at[row8t].add(
                jnp.where(rvalidt[:, None], w8t * tw[:, None], 0.0)
            )

        st_new = ReplayState(
            o=o_new, d=d_new, t=t_new, t_exit=t_exit_new,
            sig_seg=sig_seg_new, t_seg=t_seg_new,
            gL_acc=gL_acc, depth=depth_new, mode=mode_new,
            pend_o=pend_o_new, pend_d=pend_d_new,
            T_ray=T_ray_out, T_fin=T_fin_new, phase_val=phase_val_new,
            sh_ctr0=sh_ctr0_new, sh_t0=sh_t0_new, sh_t1=sh_t1_new,
            ctr=ctr_new,
        )
        return st_new, gd_rows, gt_rows

    return step


def _replay_init(medium: Medium, params: IntegratorParams, o_world, d_world, g_vec):
    """Initial replay state: mirrors integrator.init_state."""
    dgrid = medium.density
    N = o_world.shape[0]
    O = jnp.asarray(dgrid.origin_ijk, dtype=jnp.float32)
    shape = jnp.asarray(dgrid.shape, dtype=jnp.float32)
    o_idx = dgrid.world_to_index(o_world)
    d_idx = d_world
    t0, t1, hit = clip_ray(o_idx, d_idx, O, O + shape)
    zeros = jnp.zeros((N,), jnp.float32)
    t_init = jnp.where(hit, t0, 0.0)
    L_inf = (
        jnp.asarray(params.infinite_xyz, dtype=jnp.float32)
        * params.infinite_multiplier
    )
    gLinf = jnp.sum(g_vec * L_inf, axis=-1)
    return ReplayState(
        o=o_idx,
        d=d_idx,
        t=t_init,
        t_exit=jnp.where(hit, t1, 0.0),
        sig_seg=zeros,
        t_seg=t_init,
        gL_acc=jnp.where(hit, 0.0, gLinf),
        depth=jnp.zeros((N,), jnp.int32),
        mode=jnp.where(hit, RCAM, RDONE).astype(jnp.int32),
        pend_o=o_idx,
        pend_d=d_idx,
        T_ray=jnp.ones((N,), jnp.float32),
        T_fin=zeros,
        phase_val=zeros,
        sh_ctr0=jnp.zeros((N,), jnp.int32),
        sh_t0=zeros,
        sh_t1=zeros,
        ctr=jnp.zeros((N,), jnp.int32),
    )


def replay_grads(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    o_world,
    d_world,
    pixel_ids,
    stream,
    L_fwd,
    g_vec,
    with_check: bool = False,
):
    """Run the backward replay; returns (d_density [X,Y,Z], d_temp or None).

    L_fwd: forward per-lane radiance [N,3] (the only saved residual).
    g_vec: per-lane output cotangent [N,3].
    with_check=True additionally returns (gL_acc, gL_tot) so tests can assert
    the replayed accumulation reproduces <g, L_fwd> lane-for-lane.
    """
    from ..render.integrator import (
        alive_first_perm,
        compact_lanes,
        compaction_widths,
    )

    step = _make_replay_step(medium, params, bb_table)
    st0 = _replay_init(medium, params, o_world, d_world, g_vec)
    gL_tot_full = jnp.sum(g_vec * L_fwd, axis=-1)
    N = st0.t.shape[0]
    stream = jnp.broadcast_to(jnp.asarray(stream, jnp.uint32), (N,))

    X, Y, Z = medium.density.shape
    gd0 = jnp.zeros(((X + 1) * (Y + 1) * (Z + 1), 8), jnp.float32)
    emission_on = emission_enabled(medium, params)
    if emission_on:
        tX, tY, tZ = medium.temperature.shape
        gt0 = jnp.zeros(((tX + 1) * (tY + 1) * (tZ + 1), 8), jnp.float32)
    else:
        gt0 = None

    # Each forward counter value is replayed at most twice (camera/PRE + GRAD).
    iter_cap = 2 * params.max_iters + 4

    # Staged compaction, same ladder as the forward loop: the gradient
    # accumulators ride the carry un-compacted (they are grid-shaped); only
    # the per-lane state narrows. No output scatter-back is needed — retired
    # lanes contribute nothing further.
    st, pids_t, stream_t, gL_tot_t, g_vec_t = st0, pixel_ids, stream, gL_tot_full, g_vec
    gd, gt, it = gd0, gt0, jnp.int32(0)
    gL_fin = jnp.zeros((N,), jnp.float32)
    idx_map = jnp.arange(N, dtype=jnp.int32)

    for next_w in compaction_widths(N) + [None]:
        def cond(carry, next_w=next_w):
            st_, _, _, it_, alive_ = carry
            go = (it_ < iter_cap) & (alive_ > 0)
            if next_w is not None:
                go = go & (alive_ > next_w)
            return go

        def body(carry, pids_=pids_t, stream_=stream_t, gL_=gL_tot_t, g_=g_vec_t):
            st_, gd_, gt_, it_, _ = carry
            u = vrng.counter_uniforms(pids_, stream_, st_.ctr, 4)
            st2, gd2, gt2 = step(st_, u, gL_, g_, gd_, gt_)
            return st2, gd2, gt2, it_ + 1, jnp.sum((st2.mode != RDONE).astype(jnp.int32))

        alive0 = jnp.sum((st.mode != RDONE).astype(jnp.int32))
        st, gd, gt, it, _ = jax.lax.while_loop(
            cond, body, (st, gd, gt, it, alive0)
        )
        gL_fin = gL_fin.at[idx_map].set(st.gL_acc)
        if next_w is None:
            break
        keep = alive_first_perm(st.mode == RDONE)[:next_w]
        st, pids_t, stream_t, gL_tot_t, g_vec_t, idx_map = compact_lanes(
            keep, (st, pids_t, stream_t, gL_tot_t, g_vec_t, idx_map)
        )

    d_density = fold_corner_rows(gd, (X, Y, Z))
    d_temp = (
        fold_corner_rows(gt, medium.temperature.shape) if gt is not None else None
    )
    if with_check:
        return d_density, d_temp, gL_fin, gL_tot_full
    return d_density, d_temp


def trace_rays_prb(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    o_world,
    d_world,
    pixel_ids,
    stream,
):
    """Differentiable forward render with an O(1)-memory replay VJP.

    Returns radiance [N, 3]. Differentiable w.r.t. medium.density.data and
    medium.temperature.data (all other inputs get zero cotangents). The
    forward pass is the full-speed production while_loop (packed gathers
    allowed); the backward pass replays paths from the RNG counters.
    """
    sg = jax.lax.stop_gradient
    med_det = jax.tree.map(sg, medium)
    bb_det = sg(bb_table) if bb_table is not None else None
    o_det, d_det = sg(o_world), sg(d_world)

    @jax.custom_vjp
    def core(density_data, temp_data):
        del density_data, temp_data
        L, _, _ = trace_rays(
            med_det, params, bb_det, o_det, d_det, pixel_ids, stream
        )
        return L

    def core_fwd(density_data, temp_data):
        L = core(density_data, temp_data)
        return L, L

    def core_bwd(L, g_vec):
        d_density, d_temp = replay_grads(
            med_det, params, bb_det, o_det, d_det, pixel_ids, stream, L, g_vec
        )
        if med_det.temperature is None:
            d_temp = None
        return d_density, d_temp

    core.defvjp(core_fwd, core_bwd)

    temp_data = medium.temperature.data if medium.temperature is not None else None
    return core(medium.density.data, temp_data)
