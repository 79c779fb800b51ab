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
        sigma_n / sigma_maj. The per-collision gradient is
        -phase * <g,Li> * sigma_t * T_final / sigma_n per corner, where
        T_final is the walk's COMPLETED transmittance — unknown until the
        walk ends. Round 3 solved this by walking every shadow ray TWICE in
        the replay (a PRE walk reproducing the forward to establish T_final,
        then a counter-reset GRAD walk scattering the gradients); that PRE
        walk was measured at 35% of all replay lane-iterations. Round 4
        instead has the FORWARD pass record T_final per shadow walk
        (_trace_rays_record: one [N, K] residual, a float per walk encoding
        T_final > 0 / killed-at-counter < 0 / truncated == 0), so the replay
        jumps straight to the GRAD walk at scatter time — same collisions,
        naturally aligned draw counters, no reset. Lanes whose walk count
        overflows K fall back to the PRE+GRAD path, which remains intact
        (and is what replay_grads uses when no residuals are supplied).

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

from typing import NamedTuple

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
    """SoA replay wavefront state; [N], [N, 3] or [N, K] per field."""

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
    T_fin: jnp.ndarray  # the walk's final transmittance (for the GRAD walk)
    phase_val: jnp.ndarray
    sh_ctr0: jnp.ndarray  # draw counter at shadow start (PRE->GRAD reset)
    sh_t0: jnp.ndarray  # shadow ray clip entry
    sh_t1: jnp.ndarray  # shadow ray clip exit
    ctr: jnp.ndarray  # per-lane draw counter (replays forward counters)
    tf_row: jnp.ndarray  # [N, K] forward-saved walk residuals ([N, 0] unused)
    wc: jnp.ndarray  # int32 count of shadow walks started (residual slot)


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


# --- compacted gradient scatter ---------------------------------------------
# The TPU scatter engine costs ~40 ns per ISSUED row regardless of the row's
# value — zero-valued rows are not free — while the gather engine costs
# ~4.2 ns/row (PERF.md sections 4b/4d). Only ~45-55% of compacted replay
# lanes carry a nonzero gradient event per iteration, so dropping the zero
# rows before the scatter is a large row reduction on a pass that is ~60%
# scatter. Three measured dead ends shape this design
# (scratch/r5_compact_micro*.py):
#   1. exact front-compaction of a [K] mask needs a K-element scatter
#      (~15.6 ns/element: breaks even) or a sort (~ms at these widths);
#   2. lax.cond per iteration is useless — inside the replay while_loop XLA
#      executes BOTH branches and selects (measured: identical time
#      whichever branch "wins"), so a conditional full-width fallback costs
#      the full width every iteration;
#   3. a global fallback triggered by ANY overfull block fires essentially
#      always (1024 blocks, spatially-correlated events).
# Design: a fixed-capacity TWO-LEVEL compaction with no conditionals —
# level 1 compacts each strided 128-entry block to 64 slots with an exact
# one-hot rank matmul (ranks < 128, one product per output: exact in f32),
# level 2 compacts the leftovers (rank >= 64) per 2048-entry superblock to
# 128 slots. Rows issued: 0.5625*K, measured 0.665x the direct scatter
# including mechanics. Payloads that exceed the two-level capacity
# (`payload_fits` False — the ~10-iteration burst where the whole wavefront
# crosses into the cloud) must NOT use it: the replay loop carries the
# pending payload, checks fits in its while-loop CONDITION, and scatters a
# misfitting payload directly after the loop exits — a conditional in the
# loop condition costs nothing, unlike one in the body (dead end 2).
_SCATTER_BLOCK = 128
_SCATTER_CAP1 = 56
_SCATTER_SUPER = 2048  # 16 level-1 blocks
_SCATTER_CAP2 = 192
# Cap choice: the r5 on-chip sweep over (cap1, cap2) on the k=8 train step
# — (56,192) 278.2 ms, (64,128) 279.8, (48,256) 279.5, (72,192) 285.9,
# (80,160) 288.7, (96,128) 297.0 — a flat optimum around capacity ~0.5 with
# a generous level-2 for the post-compaction occupancy spikes.
# No wide-cap tier for the post-compaction occupancy spikes: an
# iteration-indexed wide-prefix while loop measured 380.7 ms/step vs 272.9
# without — on this backend each additional while-loop instance per stage
# costs ~2.5-5 ms (the two-tier fits cascade's 375.7 ms regression had the
# same cause, not ping-pong), which swamps the ~0.25*K rows the prefix
# saves on ~10 iterations. See PERF.md 4b-r5; the spikes ride the
# pending-payload loop's direct-scatter path instead.
# Below this payload width the fixed compaction overhead is not worth the
# saved rows; the ladder's tail stages scatter directly.
_COMPACT_MIN_WIDTH = 4096


def _compactable(K: int) -> bool:
    return K >= _COMPACT_MIN_WIDTH and K % _SCATTER_SUPER == 0


def payload_fits(nz, cap1=_SCATTER_CAP1, cap2=_SCATTER_CAP2) -> jnp.ndarray:
    """True iff compact_scatter_fitting(cap1, cap2) is exact for this payload.

    Small/ragged payloads "fit" trivially (they scatter directly inside
    compact_scatter_fitting); otherwise every 2048-entry superblock's
    leftover count beyond the level-1 caps must fit the level-2 cap
    (cap2=0: no level 2, every strided block must fit cap1 alone).
    """
    K = nz.shape[0]
    if not _compactable(K):
        return jnp.asarray(True)
    B = K // _SCATTER_BLOCK
    cnt = jnp.sum(nz.reshape(_SCATTER_BLOCK, B).T.astype(jnp.int32), axis=1)
    if cap2 == 0:
        return jnp.max(cnt) <= cap1
    left = jnp.maximum(cnt - cap1, 0)
    per_super = left.reshape(K // _SCATTER_SUPER, -1).sum(axis=1)
    return jnp.max(per_super) <= cap2


def direct_scatter(table, rows, vals, nz):
    """The plain full-width scatter: K issued rows, always exact."""
    return table.at[rows].add(jnp.where(nz[:, None], vals, 0.0))


def compact_scatter_fitting(table, rows, vals, nz,
                            cap1=_SCATTER_CAP1, cap2=_SCATTER_CAP2):
    """table.at[rows].add(vals masked by nz), issuing (cap1+cap2/16)/128 * K
    rows (0.5625*K at the default caps).

    rows [K] int32 (in-range), vals [K, C] f32, nz [K] bool — entries with
    nz False are dropped (the caller's validity x nonzero-weight mask).
    EXACT ONLY IF payload_fits(nz, cap1, cap2): callers must route
    misfitting payloads to direct_scatter (see replay_grads' pending-payload
    loop). Entry k belongs to STRIDED block (k mod B): adjacent lanes'
    events are spatially correlated, and striding spreads each block's 128
    probes over the whole wavefront so per-block counts concentrate near
    the Binomial mean.
    """
    K, C = vals.shape
    if not _compactable(K):
        return direct_scatter(table, rows, vals, nz)
    B = K // _SCATTER_BLOCK
    S = K // _SCATTER_SUPER
    nzb = nz.reshape(_SCATTER_BLOCK, B).T  # [B, 128], strided blocks
    pos = jnp.cumsum(nzb.astype(jnp.int32), axis=1) - 1  # rank within block
    # One payload matrix so each level's selection is ONE row gather; the
    # row indices ride as a bitcast f32 column (exact round-trip).
    payload = jnp.concatenate(
        [vals, jax.lax.bitcast_convert_type(rows, jnp.float32)[:, None]], axis=1
    )
    iota_blk = jnp.arange(_SCATTER_BLOCK, dtype=jnp.float32)

    # ---- level 1: first cap1 nonzero entries of each block ----
    cnt1 = jnp.minimum(pos[:, -1] + 1, cap1)
    j1 = jnp.arange(cap1, dtype=jnp.int32)
    # onehot[b, j, i] = (entry i is the j-th nonzero of block b); the rank
    # matmul is exact in f32 (values 0..127, one product per output).
    oh1 = (
        (pos[:, None, :] == j1[None, :, None]) & nzb[:, None, :]
    ).astype(jnp.float32)
    src1 = jnp.einsum("bji,i->bj", oh1, iota_blk).astype(jnp.int32)
    gidx1 = (src1 * B + jnp.arange(B, dtype=jnp.int32)[:, None]).reshape(-1)
    valid1 = (j1[None, :] < cnt1[:, None]).reshape(-1)
    sel1 = payload[gidx1]
    # Empty slots gather their block's entry 0 (a real row): zero their
    # values so they add nothing instead of double-counting.
    table = table.at[jax.lax.bitcast_convert_type(sel1[:, C], jnp.int32)].add(
        jnp.where(valid1[:, None], sel1[:, :C], 0.0)
    )
    if cap2 == 0:
        return table

    # ---- level 2: leftovers (rank >= cap1) per 2048-entry superblock ----
    nz2 = nzb & (pos >= cap1)  # [B, 128]
    nz2s = nz2.reshape(S, _SCATTER_SUPER)  # superblock = 16 whole blocks
    pos2 = jnp.cumsum(nz2s.astype(jnp.int32), axis=1) - 1
    cnt2 = jnp.minimum(pos2[:, -1] + 1, cap2)
    j2 = jnp.arange(cap2, dtype=jnp.int32)
    oh2 = (
        (pos2[:, None, :] == j2[None, :, None]) & nz2s[:, None, :]
    ).astype(jnp.float32)
    src2 = jnp.einsum(
        "sji,i->sj", oh2, jnp.arange(_SCATTER_SUPER, dtype=jnp.float32)
    ).astype(jnp.int32)
    # superblock entry j <-> (block 16*s + j // 128, slot j % 128) <-> the
    # strided global index (j % 128) * B + block.
    blk2 = 16 * jnp.arange(S, dtype=jnp.int32)[:, None] + src2 // _SCATTER_BLOCK
    gidx2 = ((src2 % _SCATTER_BLOCK) * B + blk2).reshape(-1)
    valid2 = (j2[None, :] < cnt2[:, None]).reshape(-1)
    sel2 = payload[gidx2]
    return table.at[jax.lax.bitcast_convert_type(sel2[:, C], jnp.int32)].add(
        jnp.where(valid2[:, None], sel2[:, :C], 0.0)
    )


def _make_replay_step(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    k_walks: int = 0,
):
    """One backward-replay iteration: returns step(st, u, gL_tot, g_vec) ->
    (st_new, density_payload, temperature_payload_or_None), each payload a
    (row, vals [N, 8], nz) triple in corner-row layout for the caller to
    scatter (directly or through compact_scatter_rows).

    k_walks > 0 enables the saved-residual fast path: st.tf_row[:, :k_walks]
    carries _trace_rays_record's per-walk residuals and scatter events go
    straight to the GRAD walk (or skip a zero-contribution walk by jumping
    the draw counter); walks beyond slot k_walks use the PRE+GRAD fallback.
    """
    use_saved = k_walks > 0
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

    def step(st: ReplayState, u, gL_tot, g_vec):
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

        # ---- saved-residual walks (use_saved): consume the forward-recorded
        # slot instead of running a PRE walk. Residual encoding per slot:
        #   > 0 : T_final — walk exited; GRAD-walk it now (counters align
        #         naturally: the walk's draws start at the next counter).
        #   < 0 : -(ctr after completion) — walk died (RR kill / sigma_n=0):
        #         zero gradient AND zero contribution; jump the counter past
        #         the walk's consumed draws and resume the camera path.
        #   == 0: the forward truncated mid-walk at max_iters — the lane
        #         contributed nothing further; retire it (truncation parity).
        false_ = jnp.zeros_like(cam_scat)
        sv_live = sv_unfinished = sv_skip_ok = sv_skip_escape = false_
        sv_killed = false_
        start_pre_ok = start_shadow_ok
        ce_val = st.ctr  # placeholder (only read under sv_killed)
        if use_saved:
            slot = st.wc
            slot_ok = slot < k_walks
            onehot = (
                jnp.arange(k_walks, dtype=jnp.int32)[None, :] == slot[:, None]
            )
            tf_val = jnp.sum(jnp.where(onehot, st.tf_row, 0.0), axis=1)
            saved_lane = start_shadow_ok & slot_ok
            sv_unfinished = saved_lane & (tf_val == 0.0)
            sv_live = saved_lane & (tf_val > 0.0)
            sv_killed = saved_lane & (tf_val < 0.0)
            ce_val = (-tf_val).astype(jnp.int32)  # exact: ctr <= max_iters < 2^24
            # The forward added the walk's contribution at completion; no
            # camera event can occur before the GRAD walk ends, so adding it
            # here keeps every later gsuffix correct.
            gL_acc = gL_acc + jnp.where(sv_live, phase_val_new * tf_val * gLi, 0.0)
            start_pre_ok = start_shadow_ok & (~slot_ok)
            sv_skip_ok = sv_killed & hitp & depth_ok
            sv_skip_escape = sv_killed & ((~hitp) | (~depth_ok))
        wc_new = st.wc + start_shadow_ok.astype(jnp.int32)

        cam_exit = in_cam & tr.exited
        becomes_done_inf = (
            cam_exit | resume_escape | miss_resume_escape | sv_skip_escape
        )
        gL_acc = gL_acc + jnp.where(becomes_done_inf, gLinf, 0.0)
        becomes_done_term = cam_abs | sv_unfinished

        mode_new = mode0
        mode_new = jnp.where(becomes_done_inf | becomes_done_term, RDONE, mode_new)
        mode_new = jnp.where(start_pre_ok, RPRE, mode_new)
        mode_new = jnp.where(resume_ok | miss_resume_ok | sv_skip_ok, RCAM, mode_new)
        mode_new = jnp.where(go_grad | sv_live, RGRAD, mode_new)

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

        # A skipped (zero-contribution) saved walk resumes the camera path.
        if use_saved:
            o_new = jnp.where(sv_skip_ok[:, None], pend_o_new, o_new)
            d_new = jnp.where(sv_skip_ok[:, None], pend_d_new, d_new)
            t_new = jnp.where(sv_skip_ok, t0p, t_new)
            t_exit_new = jnp.where(sv_skip_ok, t1p, t_exit_new)

        # (PRE->)GRAD walk restarts the saved shadow ray with reset counters.
        o_new = jnp.where(go_grad[:, None], pend_o_new, o_new)
        d_new = jnp.where(go_grad[:, None], wi[None, :], d_new)
        t_new = jnp.where(go_grad, st.sh_t0, t_new)
        t_exit_new = jnp.where(go_grad, st.sh_t1, t_exit_new)

        plain_adv = cam_null | zero_col | (shw_col & ~(pre_finish | grad_finish))
        t_new = jnp.where(plain_adv, tr.t_cand, t_new)
        t_new = jnp.where(tr.fetch, tr.t_next, t_new)

        new_ray = (
            start_shadow_ok | resume_ok | miss_resume_ok | go_grad | sv_skip_ok
        )
        sig_seg_new = jnp.where(tr.fetch, tr.sig_seg_f, st.sig_seg)
        sig_seg_new = jnp.where(new_ray, 0.0, sig_seg_new)
        t_seg_new = jnp.where(tr.fetch, tr.t_seg_f, st.t_seg)
        t_seg_new = jnp.where(new_ray, t_new, t_seg_new)

        T_ray_out = jnp.where(start_shadow_ok | go_grad, 1.0, T_ray_new)
        if use_saved:
            T_fin_new = jnp.where(sv_live, tf_val, T_fin_new)

        sh_ctr0_new = jnp.where(start_shadow_ok, st.ctr, st.sh_ctr0)
        sh_t0_new = jnp.where(start_shadow_ok, t0n, st.sh_t0)
        sh_t1_new = jnp.where(start_shadow_ok, t1n, st.sh_t1)
        ctr_new = jnp.where(go_grad, st.sh_ctr0, st.ctr) + 1
        if use_saved:
            # Skipped walks jump past the forward walk's consumed draws.
            ctr_new = jnp.where(sv_killed, ce_val, ctr_new)

        # =========== gradient scatter payloads ===========
        # Row payloads in the CORNER-ROW layout: one [8]-row per lane instead
        # of 8 element adds — TPU scatters pay per ROW like gathers (PERF.md
        # section 4: 12x), and replay_grads folds the row table back into the
        # [X,Y,Z] grid once at the end. Out-of-grid corners write into
        # row/column combinations the fold never reads, reproducing the old
        # per-corner validity masking exactly. The caller scatters the
        # payload (compact_scatter_fitting drops the zero-weight rows when
        # the payload fits; replay_grads routes misfits to direct_scatter).
        X, Y, Z = dgrid.shape
        i0 = jnp.floor(tr.lp).astype(jnp.int32)
        f = tr.lp - i0.astype(tr.lp.dtype)
        from ..grids.grid import corner_row_index, trilinear_weights

        w8 = trilinear_weights(f)
        row8, rvalid = corner_row_index((X, Y, Z), i0)
        dweight = demis + score_w + shadow_w  # disjoint lane sets
        dpay = (row8, w8 * dweight[:, None], rvalid & (dweight != 0.0))
        tpay = None
        if emission_on:
            tgrid = medium.temperature
            i0t = jnp.floor(tp_local).astype(jnp.int32)
            ft = tp_local - i0t.astype(tp_local.dtype)
            w8t = trilinear_weights(ft)
            row8t, rvalidt = corner_row_index(tgrid.shape, i0t)
            tpay = (row8t, w8t * tw[:, None], rvalidt & (tw != 0.0))

        st_new = ReplayState(
            o=o_new, d=d_new, t=t_new, t_exit=t_exit_new,
            sig_seg=sig_seg_new, t_seg=t_seg_new,
            gL_acc=gL_acc, depth=depth_new, mode=mode_new,
            pend_o=pend_o_new, pend_d=pend_d_new,
            T_ray=T_ray_out, T_fin=T_fin_new, phase_val=phase_val_new,
            sh_ctr0=sh_ctr0_new, sh_t0=sh_t0_new, sh_t1=sh_t1_new,
            ctr=ctr_new, tf_row=st.tf_row, wc=wc_new,
        )
        return st_new, dpay, tpay

    return step


def _replay_init(
    medium: Medium, params: IntegratorParams, o_world, d_world, g_vec, tf=None
):
    """Initial replay state: mirrors integrator.init_state.

    tf: [N, K] forward-saved walk residuals (_trace_rays_record) or None for
    the pure PRE+GRAD replay (tf_row rides along with zero width).
    """
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
        tf_row=tf if tf is not None else jnp.zeros((N, 0), jnp.float32),
        wc=jnp.zeros((N,), jnp.int32),
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
    tf=None,
):
    """Run the backward replay; returns (d_density [X,Y,Z], d_temp or None).

    L_fwd: forward per-lane radiance [N,3].
    g_vec: per-lane output cotangent [N,3].
    tf: optional [N, K] per-walk residuals from _trace_rays_record — enables
    the single-walk shadow replay (PRE walks only for slot-overflow lanes).
    None replays every shadow walk twice (PRE+GRAD), needing no residuals.
    with_check=True additionally returns (gL_acc, gL_tot) so tests can assert
    the replayed accumulation reproduces <g, L_fwd> lane-for-lane.
    """
    from ..render.integrator import (
        alive_first_perm,
        compact_lanes,
        compaction_widths,
    )

    k_walks = 0 if tf is None else tf.shape[1]
    step = _make_replay_step(medium, params, bb_table, k_walks=k_walks)
    st0 = _replay_init(medium, params, o_world, d_world, g_vec, tf=tf)
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
    # lanes contribute nothing further. (Measured dead ends on the v5e:
    # presorting lanes by forward-recorded lifetime costs more than the
    # width it saves — argsort + the full-width permute gather — and a finer
    # 3/4 ladder is neutral; see PERF.md section 4b.)
    #
    # PENDING-PAYLOAD SCATTER LOOP (round 5): the gradient scatter is ~85%
    # of the k=8 train step (scratch/r5_scatter_share.py), and the scatter
    # engine charges ~40 ns per issued row — zeros included — so the
    # payload is compacted (compact_scatter_fitting: 0.5625x the rows,
    # measured 0.665x the time) before scattering. Its fixed two-level
    # capacity cannot hold the ~10-iteration entry burst where most of the
    # wavefront collides at once, and a per-iteration lax.cond is useless
    # (XLA runs BOTH branches inside the loop — see the dead-end notes at
    # compact_scatter_fitting). Instead each iteration's payload rides the
    # carry as PENDING; the inner while-loop's CONDITION requires it to
    # fit, so a misfitting payload ends the inner loop and is scattered
    # directly (full width, exact) in the outer body, which then advances
    # one step and re-enters. Payload accounting: every step's payload is
    # scattered exactly once — by the next inner iteration (compact), by
    # the outer body (direct, the misfit/stage-end case), or by the
    # post-loop flush (direct).
    st, pids_t, stream_t, gL_tot_t, g_vec_t = st0, pixel_ids, stream, gL_tot_full, g_vec
    gd, gt, it = gd0, gt0, jnp.int32(0)
    gL_fin = jnp.zeros((N,), jnp.float32)
    idx_map = jnp.arange(N, dtype=jnp.int32)

    def scatter_pend(gd_, gt_, pend, fn):
        dpay, tpay = pend[0], pend[1]
        gd2 = fn(gd_, *dpay)
        gt2 = fn(gt_, *tpay) if tpay is not None else gt_
        return gd2, gt2

    for next_w in compaction_widths(N) + [None]:
        def stage_go(it_, alive_, next_w=next_w):
            go = (it_ < iter_cap) & (alive_ > 0)
            if next_w is not None:
                go = go & (alive_ > next_w)
            return go

        # Per-stage invariants ride the while carries explicitly (not as
        # closure captures): nested whiles closing over large constants
        # tripped an XLA RET_CHECK (while-loop operand-shape mismatch during
        # simplification) on the TPU backend.
        # Caps read from module globals at trace time (tunable; the r5 cap
        # sweep on the train bench picked the defaults — see PERF.md 4b).
        cap1, cap2 = _SCATTER_CAP1, _SCATTER_CAP2

        def fitting(t, rows, vals, nz):
            return compact_scatter_fitting(t, rows, vals, nz, cap1, cap2)

        def step_payload(st_, it_, inv):
            pids_, stream_, gL_, g_ = inv
            u = vrng.counter_uniforms(pids_, stream_, st_.ctr, 4)
            st2, dpay, tpay = step(st_, u, gL_, g_)
            fits = payload_fits(dpay[2], cap1, cap2)
            if tpay is not None:
                fits = fits & payload_fits(tpay[2], cap1, cap2)
            alive = jnp.sum((st2.mode != RDONE).astype(jnp.int32))
            return st2, (dpay, tpay, fits), it_ + 1, alive

        def inner_cond(c):
            _, _, _, it_, alive_, pend, _ = c
            return stage_go(it_, alive_) & pend[2]

        def inner_body(c):
            st_, gd_, gt_, it_, alive_, pend, inv = c
            gd_, gt_ = scatter_pend(gd_, gt_, pend, fitting)
            st_, pend, it_, alive_ = step_payload(st_, it_, inv)
            return st_, gd_, gt_, it_, alive_, pend, inv

        def outer_cond(c):
            _, _, _, it_, alive_, _, _ = c
            return stage_go(it_, alive_)

        def outer_body(c):
            c = jax.lax.while_loop(inner_cond, inner_body, c)
            st_, gd_, gt_, it_, alive_, pend, inv = c
            # misfit (or stage end): the pending payload needs full width
            gd_, gt_ = scatter_pend(gd_, gt_, pend, direct_scatter)
            st_, pend, it_, alive_ = step_payload(st_, it_, inv)
            return st_, gd_, gt_, it_, alive_, pend, inv

        # Seed: one unconditional step produces the first pending payload
        # (a no-op when the stage is already satisfied — scheduling only,
        # per-lane truncation lives inside the step).
        inv = (pids_t, stream_t, gL_tot_t, g_vec_t)
        st, pend, it, alive = step_payload(st, it, inv)
        st, gd, gt, it, alive, pend, _ = jax.lax.while_loop(
            outer_cond, outer_body, (st, gd, gt, it, alive, pend, inv)
        )
        # End-of-stage flush: unlike a cond in a while BODY (which XLA
        # executes both-branches-and-select — PERF.md 4b-r5 dead ends), a
        # top-level cond is a real conditional (measured), so the flush
        # compacts when the final pending payload fits.
        gd, gt = jax.lax.cond(
            pend[2],
            lambda ops: scatter_pend(ops[0], ops[1], pend, fitting),
            lambda ops: scatter_pend(ops[0], ops[1], pend, direct_scatter),
            (gd, gt),
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


# Saved-walk residual slots per lane: covers the observed scatter-event
# distribution on the bench scenes; slot-overflow walks replay through the
# intact PRE+GRAD fallback, so K only trades residual memory vs PRE work.
DEFAULT_K_WALKS = 16


def _trace_rays_record(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    o_world,
    d_world,
    pixel_ids,
    stream,
    k_walks: int,
):
    """Forward render recording per-walk NEE residuals: (L [N,3], tf [N,K]).

    Runs the SAME integrator step as trace_rays on the same draws (bitwise-
    equal radiance); the recording observes mode transitions from outside the
    step. Residual slot w of lane i describes the lane's w-th *started*
    shadow walk (slots count start_shadow events that hit the bbox — the
    replay counts the same deterministic events):

      tf[i, w] > 0  : the walk exited the volume with transmittance tf[i, w]
      tf[i, w] < 0  : the walk died (roulette kill / sigma_n = 0); the value
                      is -(draw counter after the finishing iteration), used
                      by the replay to jump past the walk's consumed draws
                      (exact in f32: counters are capped at max_iters < 2^24)
      tf[i, w] == 0 : the walk never completed (forward truncation at
                      max_iters mid-walk)
    """
    from ..render.integrator import (
        CAM,
        DONE,
        SHADOW,
        alive_first_perm,
        compact_lanes,
        compaction_widths,
        finalize_radiance,
        init_state,
        make_step,
    )

    step = make_step(medium, params, bb_table)
    st0 = init_state(medium, o_world, d_world, params)
    N = pixel_ids.shape[0]
    stream = jnp.broadcast_to(jnp.asarray(stream, jnp.uint32), (N,))
    slots = jnp.arange(k_walks, dtype=jnp.int32)

    out = jnp.zeros((N, 3), jnp.float32)
    tf_out = jnp.zeros((N, k_walks), jnp.float32)
    idx_map = jnp.arange(N, dtype=jnp.int32)
    st, pids = st0, pixel_ids
    tf = jnp.zeros((N, k_walks), jnp.float32)
    wc = jnp.zeros((N,), jnp.int32)
    it = jnp.int32(0)

    for next_w in compaction_widths(N) + [None]:
        def cond(carry, next_w=next_w):
            *_, it_, alive_ = carry
            go = (it_ < params.max_iters) & (alive_ > 0)
            if next_w is not None:
                go = go & (alive_ > next_w)
            return go

        def body(carry, pids_=pids, stream_=stream):
            st_, tf_, wc_, it_, _ = carry
            u = vrng.counter_uniforms(pids_, stream_, st_.ctr, 4)
            st2 = step(st_, u)
            started = (st_.mode == CAM) & (st2.mode == SHADOW)
            fin = (st_.mode == SHADOW) & (st2.mode != SHADOW)
            # The in-flight walk's slot; at finish, st2.T_ray is T_final and
            # st2.ctr the counter the resumed camera path draws next.
            slot = wc_ - 1
            val = jnp.where(st2.T_ray > 0.0, st2.T_ray, -st2.ctr.astype(jnp.float32))
            hot = (
                (slots[None, :] == slot[:, None])
                & fin[:, None]
                & (slot < k_walks)[:, None]
            )
            tf_ = jnp.where(hot, val[:, None], tf_)
            wc_ = wc_ + started.astype(jnp.int32)
            alive = jnp.sum((st2.mode != DONE).astype(jnp.int32))
            return st2, tf_, wc_, it_ + 1, alive

        alive0 = jnp.sum((st.mode != DONE).astype(jnp.int32))
        st, tf, wc, it, _ = jax.lax.while_loop(
            cond, body, (st, tf, wc, it, alive0)
        )
        out = out.at[idx_map].set(finalize_radiance(st, params))
        tf_out = tf_out.at[idx_map].set(tf)
        if next_w is None:
            break
        keep = alive_first_perm(st.mode == DONE)[:next_w]
        st, tf, wc, idx_map, pids, stream = compact_lanes(
            keep, (st, tf, wc, idx_map, pids, stream)
        )

    return out, tf_out


def trace_rays_prb(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    o_world,
    d_world,
    pixel_ids,
    stream,
    k_walks: int = DEFAULT_K_WALKS,
):
    """Differentiable forward render with an O(1)-memory replay VJP.

    Returns radiance [N, 3]. Differentiable w.r.t. medium.density.data and
    medium.temperature.data (all other inputs get zero cotangents). The
    forward pass is the production while_loop, recording one float per NEE
    shadow walk (k_walks slots/lane); the backward pass replays paths from
    the RNG counters, walking each recorded shadow ray ONCE (the GRAD walk —
    see the module docstring). k_walks=0 disables recording (PRE+GRAD
    replay for every walk, the round-3 behavior).
    """
    sg = jax.lax.stop_gradient
    med_det = jax.tree.map(sg, medium)
    bb_det = sg(bb_table) if bb_table is not None else None
    o_det, d_det = sg(o_world), sg(d_world)
    record = params.nee_enabled and k_walks > 0

    @jax.custom_vjp
    def core(density_data, temp_data):
        del density_data, temp_data
        L, _, _ = trace_rays(
            med_det, params, bb_det, o_det, d_det, pixel_ids, stream
        )
        return L

    def core_fwd(density_data, temp_data):
        del density_data, temp_data
        if record:
            L, tf = _trace_rays_record(
                med_det, params, bb_det, o_det, d_det, pixel_ids, stream,
                k_walks,
            )
        else:
            L, _, _ = trace_rays(
                med_det, params, bb_det, o_det, d_det, pixel_ids, stream
            )
            tf = None
        return L, (L, tf)

    def core_bwd(res, g_vec):
        L, tf = res
        d_density, d_temp = replay_grads(
            med_det, params, bb_det, o_det, d_det, pixel_ids, stream, L,
            g_vec, tf=tf,
        )
        if med_det.temperature is None:
            d_temp = None
        return d_density, d_temp

    core.defvjp(core_fwd, core_bwd)

    temp_data = medium.temperature.data if medium.temperature is not None else None
    return core(medium.density.data, temp_data)
