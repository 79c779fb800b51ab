"""Wavefront delta-tracking integrator: the TPU-native renderer core.

The reference integrates one ray at a time through three nested data-dependent
loops (path-depth loop, free-flight collision loop, HDDA segment loop —
/root/reference/src/worker.cpp:92-208, majorant_transmittance_sampler.cpp:21-81,
volume.cpp:38-76) plus a nested shadow-ray loop for next-event estimation
(worker.cpp:52-90). None of that control flow can run on a TPU.

TPU-first re-architecture: ONE batched wavefront loop over a block of rays.
Each iteration advances every ray by exactly one "tracking event":

    brick/superbrick DDA advance | exponential free-flight | collision handling

with per-ray *mode* flags turning the loop into a state machine:

    CAMERA  - delta tracking of the camera path: per-collision blackbody
              emission (expected-value estimator weighted by p_a,
              worker.cpp:152-157), then a discrete {null, absorb, scatter}
              event (worker.cpp:159-163).
    SHADOW  - ratio tracking of the NEE shadow ray toward the distant light,
              with Russian roulette below T=0.05, q=0.75 (worker.cpp:65-86).
              On completion the lane resumes its camera path with the
              HG-sampled direction recorded at scatter time.
    DONE    - retired lane (absorbed, escaped, or out of depth budget).

All lanes execute the same vector code under masks; XLA fuses the entire body
(gathers + RNG + arithmetic) into one loop kernel. Segment *merging* from the
reference (volume.cpp:53-71) is intentionally dropped: free-flight sampling is
memoryless, so restarting the exponential at every brick boundary yields the
exact same distribution — it only consumes differently-indexed random numbers,
which our counter-based RNG makes free.

Behavioral quirks preserved (SURVEY.md section 7.4): emission at every
collision pre-event; scatter consumes two depth units; escaping rays collect
the infinite light unattenuated; zero-density collisions advance t without an
event draw; NEE covers only the distant light; p_n clamped at 0.

Differentiability: the same step function runs under `lax.while_loop` (fast
forward) or bounded `lax.scan` (reverse-mode AD). Gradients flow through the
trilinearly-sampled density/temperature (emission term, ratio-tracking
weights) while majorants and event *selections* stay detached; discrete event
choices contribute score-function factors via the attached/detached ratio
`p_e / stop_grad(p_e)` (== 1 in value, d(log p) in gradient).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..grids.grid import (
    corner_row_index,
    sample_trilinear_local,
    sample_trilinear_rows,
    trilinear_weights,
)
from ..grids.majorant import BRICK, SUPER
from ..models.medium import Medium
from ..ops.phase import henyey_greenstein, sample_henyey_greenstein
from ..utils import rng as vrng
from ..utils.config import VolumeParameters, WorkerParameters

# Lane modes
CAM = 0
SHADOW = 1
DONE = 2

_TINY = 1e-20  # python float: no device array at import time
_LOOKAHEAD = 1e-3  # voxel units, mirrors the reference's t+1.0001 re-derive idea

# Opportunistic superbrick segments: crossing a brick boundary costs one full
# wavefront iteration (measured ~70% of all lane-steps on the bench scene),
# while sampling under a LOOSER majorant costs extra (null) collisions. Any
# majorant >= density is unbiased, so the traversal takes a whole 64-voxel
# superbrick segment under the superbrick majorant whenever the expected
# extra collisions (smaj - bmaj) * sigma_t * 64 * voxel are below this
# threshold — for smooth density (smaj ~ bmaj) that's 8x fewer crossings at
# the same collision rate. 0.0 recovers the empty-superbrick-only policy.
# This module-level value is the default for IntegratorParams.super_tau
# (tunable per scene; any value is unbiased — it only moves the
# crossings-vs-null-collisions tradeoff). Round-4 sweep across all three
# bench scenes (scratch/r4_tau_sweep.py): 8.0 is neutral on the flagship
# (3.777 vs 3.772 M rays/s) and fire (2.753 vs 2.735) and +7% on the 512^3
# big_cloud (0.803 vs 0.748) whose noisy occupancy makes brick crossings
# the dominant lane-step; the optimum is flat from 8 to 32.
_SUPER_TAU = 8.0


def emission_enabled(medium: Medium, params: "IntegratorParams") -> bool:
    """True when the medium emits: temperature grid present AND le_scale != 0.

    Single source of truth for the emission code-path selection (the
    reference's runtime check, worker.cpp:95-100,152) — used by the step
    builders, the megakernel prestep/kernel, and the renderer path choice.
    """
    return medium.has_temperature and params.le_scale != 0.0


@dataclasses.dataclass(frozen=True)
class IntegratorParams:
    """Static (compile-time) scene parameters closed over by the integrator."""

    sigma_a: float
    sigma_s: float
    hg_g: float
    le_scale: float
    temperature_offset: float
    temperature_scale: float
    infinite_xyz: Tuple[float, float, float]
    infinite_multiplier: float
    distant_xyz: Tuple[float, float, float]
    distant_multiplier: float
    distant_inv_direction: Tuple[float, float, float]
    max_depth: int
    max_iters: int = 8192
    # Superbrick-opportunism threshold (see _SUPER_TAU): per-scene tunable,
    # unbiased at any value.
    super_tau: float = _SUPER_TAU

    @property
    def sigma_t(self) -> float:
        return self.sigma_a + self.sigma_s

    @property
    def nee_enabled(self) -> bool:
        # sample_Ld early-outs on exactly-zero Li (worker.cpp:57).
        return any(c * self.distant_multiplier != 0.0 for c in self.distant_xyz)

    @staticmethod
    def from_config(
        vol: VolumeParameters, worker: WorkerParameters, max_iters: int = 8192
    ) -> "IntegratorParams":
        return IntegratorParams(
            sigma_a=vol.sigma_a,
            sigma_s=vol.sigma_s,
            hg_g=vol.henyey_greenstein_g,
            le_scale=vol.le_scale,
            temperature_offset=vol.temperature_offset,
            temperature_scale=vol.temperature_scale,
            infinite_xyz=worker.infinite_light.xyz,
            infinite_multiplier=worker.infinite_light.multiplier,
            distant_xyz=worker.distant_light.xyz,
            distant_multiplier=worker.distant_light.multiplier,
            distant_inv_direction=worker.distant_light.inv_direction,
            max_depth=worker.max_depth,
            max_iters=max_iters,
        )


class RayState(NamedTuple):
    """SoA wavefront state; every field is [N] or [N, 3]."""

    o: jnp.ndarray  # [N,3] ray origin, density-grid index space (absolute coords)
    d: jnp.ndarray  # [N,3] unit direction (== world direction, uniform scale)
    t: jnp.ndarray  # [N] current parameter, voxel units
    t_exit: jnp.ndarray  # [N] bbox exit parameter of the current ray
    sig_seg: jnp.ndarray  # [N] world-unit majorant sigma of the current segment
    t_seg: jnp.ndarray  # [N] segment end (voxel units); t_seg <= t = no segment
    L: jnp.ndarray  # [N,3] accumulated XYZ radiance
    wscore: jnp.ndarray  # [N] attached/detached score factor (== 1.0 in value)
    depth: jnp.ndarray  # [N] int32 path depth (reference semantics: +2/scatter)
    mode: jnp.ndarray  # [N] int32 CAM/SHADOW/DONE
    terminated: jnp.ndarray  # [N] bool (absorbed -> no infinite light)
    pend_o: jnp.ndarray  # [N,3] camera-resume origin (scatter point)
    pend_d: jnp.ndarray  # [N,3] camera-resume direction (HG sample)
    T_ray: jnp.ndarray  # [N] shadow-ray ratio-tracking transmittance
    phase_val: jnp.ndarray  # [N] HG(w . wi) recorded at scatter time
    ctr: jnp.ndarray  # [N] int32 per-lane RNG draw counter (+1 per step)


def _safe_inv(d: jnp.ndarray) -> jnp.ndarray:
    mag = jnp.maximum(jnp.abs(d), 1e-12)
    return jnp.sign(d) * (1.0 / mag) + jnp.where(d == 0.0, 1e12, 0.0)


def clip_ray(o, d, lo, hi, t_min=1e-4):
    """Slab-clip rays [N,3] against box [lo, hi]; returns (t0, t1, hit).

    The reference clips the index ray against the grid's index bbox
    (volume.cpp:83); t_min plays the role of the NanoVDB ray's default t0.
    """
    inv = _safe_inv(d)
    ta = (lo - o) * inv
    tb = (hi - o) * inv
    t_lo = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_hi = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t_lo, t_min)
    return t0, t_hi, t0 < t_hi


def _cell_exit_t(o, d, cell_lo, cell_hi):
    """Exit parameter of the axis-aligned cell [cell_lo, cell_hi] (per ray)."""
    inv = _safe_inv(d)
    ta = (cell_lo - o) * inv
    tb = (cell_hi - o) * inv
    return jnp.min(jnp.maximum(ta, tb), axis=-1)


class TravOut(NamedTuple):
    """Per-iteration traversal results shared by the forward step and the
    backward replay step (diff/prb.py). All fields are [N] or [N, 3]."""

    collide: jnp.ndarray  # collision sampled inside the current segment
    cross: jnp.ndarray  # crossing into the next segment (or exiting)
    exited: jnp.ndarray  # crossed past the bbox exit
    fetch: jnp.ndarray  # crossing lanes that install a fresh segment
    t_cand: jnp.ndarray  # free-flight candidate parameter (voxel units)
    t_next: jnp.ndarray  # next segment start for crossing lanes
    p_col: jnp.ndarray  # [N,3] gather point (collision or lookahead)
    lp: jnp.ndarray  # [N,3] local (grid-relative) float coords of p_col
    rho: jnp.ndarray  # trilinear density at p_col (collide lanes)
    sig: jnp.ndarray  # max(sig_seg, TINY): world-unit majorant sigma
    sigma_maj: jnp.ndarray  # current segment's majorant sigma (raw)
    sig_seg_f: jnp.ndarray  # freshly derived segment majorant (fetch lanes)
    t_seg_f: jnp.ndarray  # freshly derived segment end (fetch lanes)
    use_super: jnp.ndarray  # fetch used the superbrick level
    cell_lo: jnp.ndarray  # [N,3] DDA cell bounds (debug)
    cell_sz: jnp.ndarray  # [N] DDA cell size (debug)
    real_col: jnp.ndarray  # collide with rho > 0
    zero_col: jnp.ndarray  # collide with rho <= 0 (silent advance)
    temp_adim: Optional[jnp.ndarray] = None  # adimensional temperature at
    # p_col, from a 16-wide fused row's temperature corners (None unless the
    # medium folds an aligned temperature grid — pack_fused_rows)


def make_traversal(medium: Medium, params: IntegratorParams):
    """Build the shared traversal core: one tracking event per lane.

    Covers the reference's RayMajorantIterator::next + the free-flight half of
    MajorantTransmittanceSampler::next (volume.cpp:38-76,
    majorant_transmittance_sampler.cpp:21-61): carried-segment free flight,
    the fused row gather, and brick/superbrick segment derivation. Both the
    forward wavefront step and the backward path-replay step call this, so
    replayed paths reproduce forward paths bit-for-bit.

    Returns traverse(o, d, t, t_exit, sig_seg, t_seg, active, u0) -> TravOut.
    """
    dgrid = medium.density
    O = jnp.asarray(dgrid.origin_ijk, dtype=jnp.float32)
    voxel = dgrid.voxel_size  # idx_to_world_scale (volume.cpp:91)
    sigma_t = params.sigma_t

    maj_rows = medium.majorants.rows  # [NB, 2]: (brick, super) per brick
    BX, BY, BZ = medium.majorants.brick_maj.shape
    fused = medium.density_rows  # [(X+1)(Y+1)(Z+1) + NB, 8] or None

    def traverse(o, d, t, t_exit, sig_seg, t_seg, active, u0) -> TravOut:
        # ---- free flight within the CARRIED segment (sampler.cpp:44-45) ----
        # The segment's majorant sigma (world units) and end live in the state,
        # written by the previous iteration's crossing. A lane with no valid
        # segment (t_seg <= t: fresh ray or just-redirected path) falls through
        # to the crossing branch, which fetches its first segment.
        has_seg = t_seg > t
        sig = jnp.maximum(sig_seg, _TINY)
        dt_w = vrng.sample_exponential(u0, sig)
        t_cand = t + dt_w / voxel
        collide = active & has_seg & (sig_seg > 0.0) & (t_cand < t_seg)

        # Crossing lanes: no segment yet, empty segment, or flew past its end.
        cross = active & (~collide)
        t_next = jnp.where(has_seg, t_seg, t)  # next segment start
        exited = cross & (t_next >= t_exit - 1e-6)
        fetch = cross & (~exited)

        # ---- THE gather: one row per lane per iteration ----
        # Colliding lanes gather at the collision point (the trilinear corner
        # row of the containing voxel); crossing lanes gather at the lookahead
        # into the next cell (the majorant row of its brick, stored after the
        # corner rows in the same fused table). The per-lane row INDEX is
        # data-dependent, but it is one gather either way — and the gather is
        # the loop's dominant cost on TPU.
        t_gather = jnp.where(collide, t_cand, t_next + _LOOKAHEAD)
        p_col = o + d * t_gather[:, None]
        lp = p_col - O  # local (grid-relative) float coords
        # Brick coords of the (crossing-lane) lookahead point.
        bb = jnp.floor(lp / BRICK).astype(jnp.int32)
        bi, bj, bk = bb[:, 0], bb[:, 1], bb[:, 2]
        b_valid = (
            (bi >= 0) & (bi < BX) & (bj >= 0) & (bj < BY)
            & (bk >= 0) & (bk < BZ)
        )
        b_flat = (
            jnp.clip(bi, 0, BX - 1) * BY + jnp.clip(bj, 0, BY - 1)
        ) * BZ + jnp.clip(bk, 0, BZ - 1)
        temp_adim = None
        if fused is not None:
            X, Y, Z = dgrid.shape
            n_corner_rows = (X + 1) * (Y + 1) * (Z + 1)
            i0 = jnp.floor(lp).astype(jnp.int32)
            f = lp - i0.astype(lp.dtype)
            base, valid = corner_row_index(dgrid.shape, i0)
            idx = jnp.where(collide, base, n_corner_rows + b_flat)
            row = jnp.take(fused, idx, axis=0, mode="clip")  # [N, 8 or 16]
            w8 = trilinear_weights(f)
            # Corner payload (meaningful on collide lanes only):
            rho = jnp.where(valid, jnp.sum(row[:, :8] * w8, axis=-1), 0.0)
            # Majorant payload (meaningful on crossing lanes only):
            bmaj = jnp.where(b_valid, row[:, 0], 0.0)
            smaj = jnp.where(b_valid, row[:, 1], 0.0)
            if fused.shape[1] >= 16:
                # Aligned-temperature payload rides the same row: zero extra
                # gathers for emission (see pack_fused_rows).
                temp_adim = jnp.where(
                    valid, jnp.sum(row[:, 8:16] * w8, axis=-1), 0.0
                )
        else:
            # Fallback (no fused table): two gathers, same control flow.
            rho = sample_trilinear_local(dgrid.data, lp)
            both = jnp.take(maj_rows, b_flat, axis=0, mode="clip")
            bmaj = jnp.where(b_valid, both[:, 0], 0.0)
            smaj = jnp.where(b_valid, both[:, 1], 0.0)

        # ---- crossing lanes: derive the next segment (brick DDA advance) ----
        # Take the whole superbrick when it is empty OR when its (valid but
        # looser) majorant costs fewer expected extra collisions than the
        # brick crossings it saves (see _SUPER_TAU).
        extra = (smaj - bmaj) * sigma_t * float(BRICK * SUPER) * voxel
        use_super = extra <= params.super_tau
        cell_sz = jnp.where(use_super, float(BRICK * SUPER), float(BRICK))
        cell_lo = jnp.floor(lp / cell_sz[:, None]) * cell_sz[:, None] + O
        cell_hi = cell_lo + cell_sz[:, None]
        t_cell = _cell_exit_t(o, d, cell_lo, cell_hi)
        t_seg_f = jnp.minimum(t_cell, t_exit)
        # Guaranteed forward progress even on degenerate geometry.
        t_seg_f = jnp.maximum(t_seg_f, t_next + 2 * _LOOKAHEAD)
        sig_seg_f = jnp.where(use_super, smaj, bmaj) * sigma_t  # sampler.cpp:41
        sigma_maj = sig_seg  # world-space majorant of the CURRENT segment

        # ---- collision classification ----
        rho_pos = rho > 0.0
        real_col = collide & rho_pos
        zero_col = collide & (~rho_pos)  # sampler.cpp:60-61: silently advance

        return TravOut(
            collide=collide, cross=cross, exited=exited, fetch=fetch,
            t_cand=t_cand, t_next=t_next, p_col=p_col, lp=lp, rho=rho,
            sig=sig, sigma_maj=sigma_maj, sig_seg_f=sig_seg_f,
            t_seg_f=t_seg_f, use_super=use_super, cell_lo=cell_lo,
            cell_sz=cell_sz, real_col=real_col, zero_col=zero_col,
            temp_adim=temp_adim,
        )

    return traverse


def sample_temperature_kelvin(medium: Medium, params: IntegratorParams, p_col):
    """Trilinear temperature (kelvin) at density-index-space points p_col.

    The temperature grid has its OWN index transform; the collision point is
    mapped world -> temperature-index separately (worker.cpp:153-155).
    Returns (T_K [N], tp_local [N,3] temperature-grid local coords).
    """
    dgrid = medium.density
    tgrid = medium.temperature
    voxel = dgrid.voxel_size
    p_world = p_col * voxel + jnp.asarray(dgrid.world_offset, jnp.float32)
    tp = (
        p_world - jnp.asarray(tgrid.world_offset, jnp.float32)
    ) / tgrid.voxel_size
    tp_local = tp - jnp.asarray(tgrid.origin_ijk, jnp.float32)
    if medium.temperature_rows is not None:
        temp_adim = sample_trilinear_rows(
            medium.temperature_rows, tgrid.shape, tp_local
        )
    else:
        temp_adim = sample_trilinear_local(tgrid.data, tp_local)
    temp_k = temp_adim * params.temperature_scale + params.temperature_offset
    return temp_k, tp_local


def make_step(
    medium: Medium,
    params: IntegratorParams,
    bb_table: Optional[jnp.ndarray],
    collect_debug: bool = False,
):
    """Build the single-iteration wavefront step function.

    Returns step(state, uniforms [N,4]) -> state. `medium`'s array leaves are
    closed over (they are loop invariants; XLA keeps them in HBM and streams
    gathers), its static transform metadata becomes compile-time constants.

    collect_debug=True makes step return (state, dbg) where dbg is a dict of
    per-lane arrays describing what happened this iteration (collision flags,
    density, event kind, DDA cell, segment bounds) — the machinery behind the
    single-ray tracer / path-event dump (tools/trace.py), instrumenting the
    REAL production step rather than a parallel reimplementation (the
    reference's Logger + record_steps hooks, worker.cpp:15-49, volume.hpp:52).
    """
    dgrid = medium.density
    O = jnp.asarray(dgrid.origin_ijk, dtype=jnp.float32)
    shape = jnp.asarray(dgrid.shape, dtype=jnp.float32)
    bbox_lo = O
    bbox_hi = O + shape

    sigma_a, sigma_s = params.sigma_a, params.sigma_s
    sigma_t = params.sigma_t
    g = params.hg_g

    emission_on = emission_enabled(medium, params)
    nee_on = params.nee_enabled

    wi_np = jnp.asarray(params.distant_inv_direction, dtype=jnp.float32)
    wi = wi_np / jnp.linalg.norm(wi_np)  # worker.cpp:54
    Li = jnp.asarray(params.distant_xyz, dtype=jnp.float32) * params.distant_multiplier
    L_inf = (
        jnp.asarray(params.infinite_xyz, dtype=jnp.float32)
        * params.infinite_multiplier
    )

    traverse = make_traversal(medium, params)

    # Pair-packed blackbody LUT: built ONCE here (outside the wavefront
    # loop), halving the emission path's LUT gathers (utils/spectral).
    if emission_on:
        from ..utils.spectral import blackbody_pairs

        bb_pairs = blackbody_pairs(bb_table)

    def step(st: RayState, u: jnp.ndarray) -> RayState:
        active = st.mode != DONE
        in_cam = st.mode == CAM
        in_shw = st.mode == SHADOW

        tr = traverse(
            st.o, st.d, st.t, st.t_exit, st.sig_seg, st.t_seg, active, u[:, 0]
        )
        collide, exited, fetch = tr.collide, tr.exited, tr.fetch
        t_cand, t_next, p_col = tr.t_cand, tr.t_next, tr.p_col
        rho, sig, sigma_maj = tr.rho, tr.sig, tr.sigma_maj
        sig_seg_f, t_seg_f = tr.sig_seg_f, tr.t_seg_f
        real_col, zero_col = tr.real_col, tr.zero_col
        stepped = fetch  # debug-channel alias (advance to segment boundary)

        # =========== CAMERA-mode collision handling ===========
        cam_col = in_cam & real_col
        p_a = sigma_a * rho / sig  # worker.cpp:148
        p_s = sigma_s * rho / sig
        p_n = jnp.maximum(1.0 - p_a - p_s, 0.0)  # worker.cpp:150 clamp

        L_new = st.L
        if emission_on:
            if tr.temp_adim is not None:
                temp_k = (
                    tr.temp_adim * params.temperature_scale
                    + params.temperature_offset
                )
            else:
                temp_k, _ = sample_temperature_kelvin(medium, params, p_col)
            from ..utils.spectral import blackbody_radiation_xyz_from_pairs

            emit = p_a[:, None] * params.le_scale * (
                blackbody_radiation_xyz_from_pairs(bb_pairs, temp_k)
            )
            L_new = L_new + jnp.where(
                cam_col[:, None], emit * st.wscore[:, None], 0.0
            )

        event = vrng.sample_discrete3(p_n, p_a, p_s, u[:, 1])  # worker.cpp:159
        is_null = event == 0
        is_abs = event == 1
        is_scat = event == 2

        cam_null = cam_col & is_null
        cam_abs = cam_col & is_abs
        cam_scat = cam_col & is_scat

        # Score factor for the discrete event choice (1.0 in value).
        p_e = jnp.where(is_null, p_n, jnp.where(is_abs, p_a, p_s))
        p_e_safe = jnp.maximum(p_e, _TINY)
        ratio_e = p_e_safe / jax.lax.stop_gradient(p_e_safe)
        wscore_new = jnp.where(cam_col, st.wscore * ratio_e, st.wscore)

        # HG redirect sampled for every lane; used only on scatter.
        new_dir = sample_henyey_greenstein(st.d, u[:, 2], u[:, 3], g)
        phase_new = henyey_greenstein(jnp.sum(st.d * wi, axis=-1), g)  # worker.cpp:88

        depth_new = jnp.where(cam_scat, st.depth + 2, st.depth)  # quirk 7.4

        pend_o_new = jnp.where(cam_scat[:, None], p_col, st.pend_o)
        pend_d_new = jnp.where(cam_scat[:, None], new_dir, st.pend_d)
        phase_val_new = jnp.where(cam_scat, phase_new, st.phase_val)

        # =========== SHADOW-mode collision handling ===========
        shw_col = in_shw & real_col
        sigma_n = jnp.maximum(0.0, sigma_maj - sigma_t * rho)  # worker.cpp:68
        T_after = st.T_ray * (sigma_n / sig)
        rr = T_after <= 0.05
        # Slot 1 is shared: camera lanes use it for the event draw, shadow
        # lanes for Russian roulette - a lane is never in both modes.
        rr_kill = rr & (u[:, 1] < 0.75)
        T_after = jnp.where(
            rr_kill, 0.0, jnp.where(rr, T_after / 0.25, T_after)
        )  # worker.cpp:73-80
        T_ray_new = jnp.where(shw_col, T_after, st.T_ray)
        shw_dead = shw_col & (T_ray_new <= 0.0)

        shw_exit = in_shw & exited
        # Shadow ray finished: either escaped (estimate stands) or roulette-killed.
        shadow_finish = shw_exit | shw_dead
        contrib = (
            st.phase_val[:, None] * T_ray_new[:, None] * Li * wscore_new[:, None]
        )
        L_new = L_new + jnp.where(shadow_finish[:, None], contrib, 0.0)

        # =========== resume / retire ===========
        # Lanes that need to (re)start camera tracking from the pending ray:
        resume = shadow_finish | (cam_scat if not nee_on else jnp.zeros_like(cam_scat))
        if nee_on:
            # Scatter first runs the shadow ray; camera resume happens at
            # shadow completion.
            start_shadow = cam_scat
        else:
            start_shadow = jnp.zeros_like(cam_scat)
            resume = shadow_finish | cam_scat

        # Clip for whichever new ray this lane may start this iteration.
        new_o = jnp.where(start_shadow[:, None], p_col, pend_o_new)
        new_d = jnp.where(start_shadow[:, None], wi, pend_d_new)
        t0n, t1n, hitn = clip_ray(new_o, new_d, bbox_lo, bbox_hi)

        # Depth budget check on resume (reference's for-loop condition).
        depth_ok = depth_new < params.max_depth
        resume_ok = resume & hitn & depth_ok
        resume_escape = resume & ((~hitn) | (~depth_ok))

        start_shadow_ok = start_shadow & hitn
        # A shadow ray that misses the bbox entirely keeps T_ray = 1
        # (worker.cpp:63: no intersection -> transmittance 1).
        shadow_miss = start_shadow & (~hitn)
        L_new = L_new + jnp.where(
            shadow_miss[:, None],
            phase_val_new[:, None] * Li * wscore_new[:, None],
            0.0,
        )
        # After a missed shadow ray, resume camera immediately from pend.
        t0p, t1p, hitp = clip_ray(pend_o_new, pend_d_new, bbox_lo, bbox_hi)
        miss_resume_ok = shadow_miss & hitp & depth_ok
        miss_resume_escape = shadow_miss & ((~hitp) | (~depth_ok))

        # ---- retire lanes ----
        cam_exit = in_cam & exited
        becomes_done_inf = cam_exit | resume_escape | miss_resume_escape
        becomes_done_term = cam_abs
        L_new = L_new + jnp.where(
            becomes_done_inf[:, None], L_inf * wscore_new[:, None], 0.0
        )  # worker.cpp:198-200 (unattenuated infinite light)

        # ---- merge next state ----
        mode_new = st.mode
        mode_new = jnp.where(becomes_done_inf | becomes_done_term, DONE, mode_new)
        mode_new = jnp.where(start_shadow_ok, SHADOW, mode_new)
        mode_new = jnp.where(resume_ok | miss_resume_ok, CAM, mode_new)

        terminated_new = st.terminated | becomes_done_term

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

        # Plain tracking advances (no mode change, segment unchanged).
        plain_adv = (cam_null | zero_col | (in_shw & real_col & ~shadow_finish))
        t_new = jnp.where(plain_adv, t_cand, t_new)
        t_new = jnp.where(fetch, t_next, t_new)

        # ---- carried segment update ----
        # fetch lanes install the freshly-derived segment; lanes that start a
        # new ray this iteration (shadow start / camera resume) invalidate it
        # (t_seg = t marks "no segment" -> next iteration fetches).
        new_ray = start_shadow_ok | resume_ok | miss_resume_ok
        sig_seg_new = jnp.where(fetch, sig_seg_f, st.sig_seg)
        sig_seg_new = jnp.where(new_ray, 0.0, sig_seg_new)
        t_seg_new = jnp.where(fetch, t_seg_f, st.t_seg)
        t_seg_new = jnp.where(new_ray, t_new, t_seg_new)

        T_ray_out = jnp.where(start_shadow_ok, 1.0, T_ray_new)

        st_new = RayState(
            o=o_new,
            d=d_new,
            t=t_new,
            t_exit=t_exit_new,
            sig_seg=sig_seg_new,
            t_seg=t_seg_new,
            L=L_new,
            wscore=wscore_new,
            depth=depth_new,
            mode=mode_new,
            terminated=terminated_new,
            pend_o=pend_o_new,
            pend_d=pend_d_new,
            T_ray=T_ray_out,
            phase_val=phase_val_new,
            ctr=st.ctr + 1,
        )
        if not collect_debug:
            return st_new
        dbg = dict(
            active=active, in_cam=in_cam, in_shw=in_shw,
            cell_lo=tr.cell_lo, cell_sz=tr.cell_sz, use_super=tr.use_super,
            maj=sigma_maj / sigma_t if sigma_t else sigma_maj,
            sigma_maj=sigma_maj,
            t0=st.t, t_seg_end=jnp.where(fetch, t_seg_f, st.t_seg),
            t_cand=t_cand, fetch=fetch,
            collide=collide, exited=exited, stepped=stepped,
            p_col=p_col, rho=rho, zero_col=zero_col,
            cam_null=cam_null, cam_abs=cam_abs, cam_scat=cam_scat,
            p_a=p_a, p_s=p_s, p_n=p_n,
            shw_col=shw_col, T_ray=T_ray_new, shadow_finish=shadow_finish,
            start_shadow=start_shadow_ok, resume=resume_ok,
            new_dir=new_dir, becomes_done_inf=becomes_done_inf,
        )
        return st_new, dbg

    return step


def init_state(
    medium: Medium,
    o_world: jnp.ndarray,
    d_world: jnp.ndarray,
    params: IntegratorParams,
) -> RayState:
    """World rays -> initial wavefront state (Volume::intersect semantics).

    Rays that miss the index bbox retire immediately (DONE, unterminated) and
    collect the infinite light right here, matching the reference where a
    missing intersection breaks the depth loop without setting `terminated`
    and the escaping ray picks up the ambient light (worker.cpp:133-134,
    197-200). Adding it at init (rather than in a finalize pass keyed on a
    t_exit sentinel) keeps every DONE lane's radiance final at all times.
    """
    dgrid = medium.density
    N = o_world.shape[0]
    O = jnp.asarray(dgrid.origin_ijk, dtype=jnp.float32)
    shape = jnp.asarray(dgrid.shape, dtype=jnp.float32)
    o_idx = dgrid.world_to_index(o_world)
    d_idx = d_world  # unit under uniform scale
    t0, t1, hit = clip_ray(o_idx, d_idx, O, O + shape)
    zeros = jnp.zeros((N,), jnp.float32)
    t_init = jnp.where(hit, t0, 0.0)
    L_inf = (
        jnp.asarray(params.infinite_xyz, dtype=jnp.float32)
        * params.infinite_multiplier
    )
    L0 = jnp.where(hit[:, None], 0.0, L_inf[None, :] * jnp.ones((N, 1), jnp.float32))
    return RayState(
        o=o_idx,
        d=d_idx,
        t=t_init,
        t_exit=jnp.where(hit, t1, 0.0),
        sig_seg=jnp.zeros((N,), jnp.float32),
        t_seg=t_init,  # no segment yet: first iteration fetches it
        L=L0,
        wscore=jnp.ones((N,), jnp.float32),
        depth=jnp.zeros((N,), jnp.int32),
        mode=jnp.where(hit, CAM, DONE).astype(jnp.int32),
        terminated=jnp.zeros((N,), bool),
        pend_o=o_idx,
        pend_d=d_idx,
        T_ray=jnp.ones((N,), jnp.float32),
        phase_val=zeros,
        ctr=jnp.zeros((N,), jnp.int32),
    )


def finalize_radiance(st: RayState, params: IntegratorParams) -> jnp.ndarray:
    """Per-ray XYZ radiance [N, 3] under the truncation cap policy.

    Lanes still alive at the iteration cap (mode != DONE) are *truncated*:
    they keep the radiance accumulated so far and do NOT collect the infinite
    light — an out-of-iterations lane is still mid-volume, unlike the
    reference's out-of-depth rays which have legitimately escaped when they
    pick up L_inf (worker.cpp:197-200). Truncation loses only the path tail's
    unscattered remainder; callers surface the capped-lane count (`n_capped`
    from trace_rays) so cap sizing is visible, and renders should choose
    max_iters so n_capped == 0 (tested in tests/test_integrator.py).
    """
    del params
    return st.L


def count_capped(st: RayState) -> jnp.ndarray:
    """Number of lanes still alive (mid-volume) — the iteration-cap counter."""
    return jnp.sum((st.mode != DONE).astype(jnp.int32))


def alive_first_perm(done: jnp.ndarray) -> jnp.ndarray:
    """Stable alive-first permutation: indices of all alive lanes in order,
    then all done lanes in order — argsort(done, stable) without the sort.

    A bitonic argsort costs O(N log^2 N) multi-pass on TPU (~ms at 64K
    lanes, and it runs at every compaction stage); this cumsum partition is
    two scans + one scatter, bitwise-identical output.
    """
    n = done.shape[0]
    alive = ~done
    na = jnp.cumsum(alive.astype(jnp.int32))
    nd = jnp.cumsum(done.astype(jnp.int32))
    pos = jnp.where(alive, na - 1, na[-1] + nd - 1)
    return jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))


def compact_lanes(keep: jnp.ndarray, tree):
    """Gather lanes `keep` from every [N]/[N,C] leaf of `tree` in ONE gather.

    Per-array element gathers pay the TPU gather engine per ELEMENT — at a
    65K->32K compaction the ~26 state arrays cost ~6.1 ms, which round 2/3
    profiling showed was ~40% of the whole wave. Packing all leaves into one
    [N, F] matrix (bitcasting non-f32 leaves) turns the stage compaction
    into a single row gather: ~0.5 ms for the same width (12x). Bitwise
    identical results — bitcast/transpose round-trips are exact.
    """
    leaves, treedef = jax.tree.flatten(tree)
    cols = []
    meta = []
    for leaf in leaves:
        a = leaf
        dt = a.dtype
        if dt == jnp.bool_:
            a = a.astype(jnp.int32)
        if a.dtype != jnp.float32:
            a = jax.lax.bitcast_convert_type(a, jnp.float32)
        if a.ndim == 1:
            cols.append(a)
        else:
            cols.extend(a[:, j] for j in range(a.shape[1]))
        meta.append((dt, 1 if leaf.ndim == 1 else leaf.shape[1]))
    M = jnp.stack(cols, axis=1)  # [N, F]
    G = jnp.take(M, keep, axis=0)  # one row gather
    out = []
    ci = 0
    for dt, nc in meta:
        a = G[:, ci] if nc == 1 else G[:, ci:ci + nc]
        ci += nc
        if dt == jnp.bool_:
            a = jax.lax.bitcast_convert_type(a, jnp.int32).astype(jnp.bool_)
        elif dt != jnp.float32:
            a = jax.lax.bitcast_convert_type(a, dt)
        out.append(a)
    return jax.tree.unflatten(treedef, out)


def compaction_widths(N, min_width=512, num=1, den=2, max_stages=8, align=1):
    """Static compaction ladder: stage widths from N down to min_width.

    Each stage ends when the alive count fits the next width; a finer ladder
    (num/den closer to 1) wastes fewer lane-iterations on retired lanes —
    per-iteration cost is one row gather per LANE, alive or not — at the
    price of more compiled stages and compaction passes. Halving measured
    best on the flagship scene (A/B vs 5/8 and 3/4, PERF.md section 2);
    align keeps widths legal for the Pallas kernel's (8, 128) tiling.
    """
    widths = []
    w = N
    while w > min_width and len(widths) < max_stages:
        w = max(min_width, -(-(w * num // den) // align) * align)
        widths.append(w)
    return widths


def trace_rays(
    medium: Medium,
    params: IntegratorParams,
    bb_table: Optional[jnp.ndarray],
    o_world: jnp.ndarray,
    d_world: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    stream: jnp.ndarray,
    return_lane_iters: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast forward render of a ray batch with lax.while_loop + compaction.

    Lane occupancy decays rapidly (most rays retire within tens of
    iterations; a long tail runs for hundreds), so the batch is periodically
    *compacted*: once the alive count fits in the next (statically-shaped)
    narrower buffer, alive lanes are gathered to the front and the loop
    continues at reduced width. Results are bitwise identical to the
    uncompacted loop: every alive ray steps once per global iteration and its
    random draws are keyed on (pixel id, global iteration), independent of
    lane position.

    Returns (radiance [N,3], iterations_used [], n_capped []) where n_capped
    counts lanes still mid-volume at the iteration cap (see finalize_radiance
    for the truncation policy). return_lane_iters=True appends the LANE-
    iteration count (sum over loop trips of post-step alive lanes) — a pure
    work count that is scheduling/compaction/topology-INVARIANT, because
    each lane's path length is fixed by its counter-keyed draws; the
    multi-host harness reports it as the contention-free scaling metric.
    """
    step = make_step(medium, params, bb_table)
    st0 = init_state(medium, o_world, d_world, params)
    N = pixel_ids.shape[0]
    # stream may be scalar (one wave) or per-lane [N] (batched multi-wave
    # callers, e.g. the inverse-rendering loss); normalize to per-lane so
    # compaction can narrow it alongside pixel_ids.
    stream = jnp.broadcast_to(jnp.asarray(stream, jnp.uint32), (N,))

    widths = compaction_widths(N)

    out = jnp.zeros((N, 3), jnp.float32)
    idx_map = jnp.arange(N, dtype=jnp.int32)
    st = st0
    pids = pixel_ids
    it = jnp.int32(0)
    lane_it = jnp.int32(0)  # <= max_iters * N per wave: fits int32

    def make_loop(next_width: Optional[int]):
        def cond(carry):
            st_, it_, alive_, _ = carry
            go = (it_ < params.max_iters) & (alive_ > 0)
            if next_width is not None:
                go = go & (alive_ > next_width)
            return go

        return cond

    def body_for(pids_, stream_):
        def body(carry):
            st_, it_, _, lit_ = carry
            # Draws are keyed on each lane's OWN counter (== the global
            # iteration in this forward loop, since every lane steps every
            # iteration) — the backward replay (diff/prb.py) re-consumes a
            # lane's counters to reproduce its path draw-for-draw.
            u = vrng.counter_uniforms(pids_, stream_, st_.ctr, 4)
            st2 = step(st_, u)
            alive2 = jnp.sum((st2.mode != DONE).astype(jnp.int32))
            return st2, it_ + 1, alive2, lit_ + alive2

        return body

    for next_w in widths + [None]:
        alive = jnp.sum((st.mode != DONE).astype(jnp.int32))
        st, it, alive, lane_it = jax.lax.while_loop(
            make_loop(next_w), body_for(pids, stream), (st, it, alive, lane_it)
        )
        # Scatter current (finalized) radiance for every lane in this stage;
        # lanes that continue get overwritten by later stages' scatters.
        out = out.at[idx_map].set(finalize_radiance(st, params))
        if next_w is None:
            break
        # Compact: alive lanes first (stable), truncate to next width.
        keep = alive_first_perm(st.mode == DONE)[:next_w]
        st, idx_map, pids, stream = compact_lanes(
            keep, (st, idx_map, pids, stream)
        )

    if return_lane_iters:
        return out, it, count_capped(st), lane_it
    return out, it, count_capped(st)


def trace_rays_diff(
    medium: Medium,
    params: IntegratorParams,
    bb_table: Optional[jnp.ndarray],
    o_world: jnp.ndarray,
    d_world: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    stream: jnp.ndarray,
    n_iters: int,
) -> jnp.ndarray:
    """Differentiable forward render: bounded lax.scan of the same step.

    Reverse-mode AD cannot cross lax.while_loop; the scan bound `n_iters`
    caps path length for gradient renders (rays still alive at the cap are
    finalized exactly like the while path). jax.checkpoint on the step keeps
    backward memory at O(sqrt-ish) instead of storing every gather.
    """
    step = jax.checkpoint(make_step(medium, params, bb_table))
    st0 = init_state(medium, o_world, d_world, params)

    def body(st, it):
        del it
        u = vrng.counter_uniforms(pixel_ids, stream, st.ctr, 4)
        return step(st, u), None

    st_fin, _ = jax.lax.scan(body, st0, jnp.arange(n_iters, dtype=jnp.int32))
    return finalize_radiance(st_fin, params)
