"""Pallas TPU ray-integration megakernel: the fused wavefront step.

Why this exists (measured on TPU v5e, see PERF.md): XLA compiles the
wavefront step (render/integrator.py make_step) into 13 fusions + 17 copies
+ 8 custom-calls per iteration — the ~100 B/lane state round-trips HBM at
every fusion boundary, ~1,075 bytes/lane/iteration against an algorithmic
floor of ~250, leaving the loop well off speed-of-light. This module fuses
the transport-event step — segment derivation, delta-tracking events,
blackbody emission, NEE ratio tracking, HG redirect, retire/resume logic —
into ONE Pallas program per iteration, so per-lane state crosses HBM exactly
once per iteration.

Division of labor per iteration (round 3 restructure):

    prestep (XLA fusion):  counter RNG (PCG4D, bitwise = utils/rng), free
                           flight within the carried segment, gather-point
                           selection, THE row gather + trilinear/majorant
                           dots [+ blackbody LUT lerp]
    kernel  (Pallas):      everything that updates state — events, NEE,
                           HG redirect, segment install, retire/resume

Two reasons for this split. First, Mosaic has no large-table dynamic gather
(tpu.dynamic_gather requires table-shaped index arrays, i.e. small shuffle
LUTs only) — the XLA gather engine is the hardware path for random row
fetches, so the gather must sit in an XLA fusion either way. Second, the
VPU-heaviest scalar work (emulated uint32 multiplies for PCG4D, the
free-flight log1p) overlaps with the gather's memory latency when it lives
in the same XLA fusion, but would serialize with it if it lived in the
kernel (measured: moving RNG+free-flight out of the kernel cut the fused
step's cost; see PERF.md section 4). The split also deletes the round-2
software-pipeline registers — nine fewer [N] arrays written per iteration
and carried across compaction stages.

Draw parity with the XLA path is now *by construction*: prestep calls the
same utils/rng.pcg4d + uniform conversion on the same (pixel id, stream,
counter) keys that integrator.trace_rays uses, so event decisions match the
XLA integrator except where f32 transcendental rounding (log1p/sin/cos
differ by ulps between XLA and Mosaic lowerings) flips a knife-edge branch;
renders are statistically identical and that equivalence is tested
(tests/test_megakernel.py) and re-checked on real hardware by
`bench.py --verify`.

This is an exact batched rotation of the reference's per-ray sampling loop
(/root/reference/src/majorant_transmittance_sampler.cpp:21-81 fused with
/root/reference/src/worker.cpp:92-208).

State is stored SoA — one [N/128, 128] f32/i32 array per field — which also
removes the 4/3 padding XLA's [N,3] T(4,128) layouts pay.

Scope: the forward render path (trace_rays_fused). Gradients use diff/prb.py
whose forward is interchangeable. interpret=True runs the same kernel for
tests on CPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids.majorant import BRICK, SUPER
from ..models.medium import Medium
from ..utils import rng as vrng
from .integrator import (
    IntegratorParams,
    _LOOKAHEAD,
    _TINY,
    emission_enabled,
)

LANE = 128  # TPU lane width; all per-lane arrays are [rows, LANE]

# Below this many lanes the fused path's (8, 128)-tiled stages waste width on
# the shrinking alive tail; trace_rays_fused hands off to the XLA step there
# (hybrid tail), and the path selection won't pick the fused path at all.
HYBRID_MIN_LANES = 2048


def use_fused_path(medium: Medium, params: IntegratorParams, n_lanes: int) -> bool:
    """Single source of truth for the megakernel-vs-XLA-loop path choice.

    The Pallas megakernel wins measured head-to-heads on TPU for packed media
    at kernel-tileable batch sizes — including emissive media whose aligned
    temperature grid is folded into 16-wide fused rows (fire transport 2.62M
    vs 2.33M for the XLA loop on the same wide medium; PERF.md section 4c).
    Emissive media with a misaligned temperature grid (8-wide rows + separate
    temperature gather) stay on the XLA loop, which wins that configuration.
    The XLA loop is also the only path on CPU/GPU and for unpacked media.
    All conditions are static at trace time; callers (render/renderer.py,
    parallel/shard.py, __graft_entry__) share this predicate so it cannot
    drift.
    """
    rows = medium.density_rows
    return (
        jax.default_backend() == "tpu"
        and rows is not None
        and (not emission_enabled(medium, params) or rows.shape[1] >= 16)
        and n_lanes % 1024 == 0
        and n_lanes > HYBRID_MIN_LANES
    )

CAM = 0
SHADOW = 1
DONE = 2

# Per-lane state fields, SoA. Order matters: it is the pallas_call signature.
STATE_F32 = (
    "ox", "oy", "oz", "dx", "dy", "dz", "t", "t_exit", "sig_seg", "t_seg",
    "Lx", "Ly", "Lz", "pox", "poy", "poz", "pdx", "pdy", "pdz",
    "T_ray", "phase_val",
)
STATE_I32 = ("depth", "mode", "ctr")
# Prestep results, computed in the XLA gather fusion and consumed by the
# kernel in the same iteration. bb* channels only exist when emission is on.
# The collide flag and next-segment start are NOT shipped: the kernel
# re-derives them from its own state + t_cand with bitwise-identical
# comparisons (collide = active & has_seg & sig>0 & t_cand < t_seg;
# t_next = has_seg ? t_seg : t) — two fewer [rows, 128] HBM arrays per
# iteration across the prestep/kernel boundary.
FETCH_F32 = (
    "rho", "bmaj", "smaj", "lpx", "lpy", "lpz", "t_cand", "u1", "u2", "u3",
)
FETCH_F32_EMIT = FETCH_F32 + ("bbx", "bby", "bbz")


def _safe_inv1(d):
    mag = jnp.maximum(jnp.abs(d), 1e-12)
    return jnp.sign(d) * (1.0 / mag) + jnp.where(d == 0.0, 1e12, 0.0)


def _clip3_box(ox, oy, oz, dx, dy, dz, los, his, t_min=1e-4):
    """SoA slab clip against per-axis bounds (los/his are 3-tuples)."""
    t_lo = None
    t_hi = None
    for o_, d_, lo, hi in ((ox, dx, los[0], his[0]), (oy, dy, los[1], his[1]),
                           (oz, dz, los[2], his[2])):
        inv = _safe_inv1(d_)
        ta = (lo - o_) * inv
        tb = (hi - o_) * inv
        lo_ax = jnp.minimum(ta, tb)
        hi_ax = jnp.maximum(ta, tb)
        t_lo = lo_ax if t_lo is None else jnp.maximum(t_lo, lo_ax)
        t_hi = hi_ax if t_hi is None else jnp.minimum(t_hi, hi_ax)
    t0 = jnp.maximum(t_lo, t_min)
    return t0, t_hi, t0 < t_hi


def _cell_exit3(ox, oy, oz, dx, dy, dz, lox, loy, loz, hix, hiy, hiz):
    out = None
    for o_, d_, lo, hi in ((ox, dx, lox, hix), (oy, dy, loy, hiy), (oz, dz, loz, hiz)):
        inv = _safe_inv1(d_)
        ta = (lo - o_) * inv
        tb = (hi - o_) * inv
        mx = jnp.maximum(ta, tb)
        out = mx if out is None else jnp.minimum(out, mx)
    return out


def _hg_phase(cos_theta, g):
    den = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 / (4.0 * np.pi)) * (1.0 - g * g) / (
        den * jnp.sqrt(jnp.maximum(den, 1e-12))
    )


def _sample_hg3(wx, wy, wz, u1, u2, g):
    """SoA HG direction sampling, mirroring ops/phase.sample_henyey_greenstein."""
    g = jnp.float32(g)
    g2 = g * g
    denom = 1.0 + g - 2.0 * g * u1
    sqr = (1.0 - g2) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    aniso = (1.0 + g2 - sqr * sqr) / (2.0 * jnp.where(jnp.abs(g) < 1e-12, 1e-12, g))
    iso = 1.0 - 2.0 * u1
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, iso, aniso)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * u2
    sin_c = jnp.clip(sin_theta, -1.0, 1.0)
    lx = sin_c * jnp.cos(phi)
    ly = sin_c * jnp.sin(phi)
    lz = jnp.clip(cos_theta, -1.0, 1.0)
    inv_n = 1.0 / jnp.sqrt(lx * lx + ly * ly + lz * lz)
    lx, ly, lz = lx * inv_n, ly * inv_n, lz * inv_n
    # Branchless ONB (Duff et al.) with w as the z axis (ops/phase.py).
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + wz)
    b = wx * wy * a
    v2x, v2y, v2z = 1.0 + sign * a * wx * wx, sign * b, -sign * wx
    v3x, v3y, v3z = b, sign + a * wy * wy, -wy
    nx = lx * v2x + ly * v3x + lz * wx
    ny = lx * v2y + ly * v3y + lz * wy
    nz = lx * v2z + ly * v3z + lz * wz
    return nx, ny, nz


def make_kernel(medium: Medium, params: IntegratorParams, emission_on: bool):
    """The fused event-step kernel body.

    State/fetch fields travel PACKED — one [n_fields, rows, 128] array per
    dtype — so each grid program issues a handful of large DMAs instead of
    ~50 small ones (DMA issue overhead dominated the first cut).

    inputs:  state_f32 [21,r,128], state_i32 [3,r,128],
             fetch_f32 [10 or 13, r, 128]
    outputs: state_f32', state_i32'
    """
    dgrid = medium.density
    Ox, Oy, Oz = (float(v) for v in dgrid.origin_ijk)
    X, Y, Z = dgrid.shape
    voxel = float(dgrid.voxel_size)
    sigma_a, sigma_s = params.sigma_a, params.sigma_s
    sigma_t = params.sigma_t
    g_hg = params.hg_g
    nee_on = params.nee_enabled

    wi_np = np.asarray(params.distant_inv_direction, np.float64)
    wi_np = wi_np / np.linalg.norm(wi_np)
    wix, wiy, wiz = (float(v) for v in wi_np.astype(np.float32))
    Li = tuple(
        float(c) * params.distant_multiplier for c in params.distant_xyz
    )
    L_inf = tuple(
        float(c) * params.infinite_multiplier for c in params.infinite_xyz
    )
    le_scale = params.le_scale
    max_depth = params.max_depth
    fetch_f32 = FETCH_F32_EMIT if emission_on else FETCH_F32

    def kernel(sf_in, si_in, ff_in, sf_out, si_out):
        st = {name: sf_in[i] for i, name in enumerate(STATE_F32)}
        st.update({name: si_in[i] for i, name in enumerate(STATE_I32)})
        fe = {name: ff_in[i] for i, name in enumerate(fetch_f32)}
        rho, bmaj, smaj = fe["rho"], fe["bmaj"], fe["smaj"]

        active = st["mode"] != DONE
        in_cam = st["mode"] == CAM
        in_shw = st["mode"] == SHADOW
        # Re-derive the free-flight branch from state + t_cand: bitwise the
        # same comparisons the prestep made (see FETCH_F32 note).
        has_seg = st["t_seg"] > st["t"]
        sig = jnp.maximum(st["sig_seg"], _TINY)
        collide = (
            active & has_seg & (st["sig_seg"] > 0.0)
            & (fe["t_cand"] < st["t_seg"])
        )
        t_next = jnp.where(has_seg, st["t_seg"], st["t"])
        cross = active & (~collide)
        exited = cross & (t_next >= st["t_exit"] - 1e-6)
        fetchm = cross & (~exited)
        sigma_maj = st["sig_seg"]

        rho_pos = rho > 0.0
        real_col = collide & rho_pos
        zero_col = collide & (~rho_pos)

        # segment derivation for fetch lanes (from the lookahead point);
        # opportunistic superbrick segments (integrator._SUPER_TAU policy)
        extra = (smaj - bmaj) * sigma_t * float(BRICK * SUPER) * voxel
        use_super = extra <= params.super_tau
        cell_sz = jnp.where(use_super, float(BRICK * SUPER), float(BRICK))
        inv_cs = 1.0 / cell_sz
        clx = jnp.floor(fe["lpx"] * inv_cs) * cell_sz + Ox
        cly = jnp.floor(fe["lpy"] * inv_cs) * cell_sz + Oy
        clz = jnp.floor(fe["lpz"] * inv_cs) * cell_sz + Oz
        t_cell = _cell_exit3(
            st["ox"], st["oy"], st["oz"], st["dx"], st["dy"], st["dz"],
            clx, cly, clz, clx + cell_sz, cly + cell_sz, clz + cell_sz,
        )
        t_seg_f = jnp.minimum(t_cell, st["t_exit"])
        t_seg_f = jnp.maximum(t_seg_f, t_next + 2 * _LOOKAHEAD)
        sig_seg_f = jnp.where(use_super, smaj, bmaj) * sigma_t

        # the iteration's event/HG/RR draws, computed by prestep
        u1, u2, u3 = fe["u1"], fe["u2"], fe["u3"]

        # ---- CAMERA events ----
        cam_col = in_cam & real_col
        p_a = sigma_a * rho / sig
        p_s = sigma_s * rho / sig
        p_n = jnp.maximum(1.0 - p_a - p_s, 0.0)

        Lx, Ly, Lz = st["Lx"], st["Ly"], st["Lz"]
        if emission_on:
            emw = jnp.where(cam_col, p_a * le_scale, 0.0)
            Lx = Lx + emw * fe["bbx"]
            Ly = Ly + emw * fe["bby"]
            Lz = Lz + emw * fe["bbz"]

        # 3-way discrete event (utils/rng.sample_discrete3)
        total = p_n + p_a + p_s
        xval = u1 * total
        is_null = xval <= p_n
        is_abs = (~is_null) & (xval <= p_n + p_a)
        is_scat = (~is_null) & (~is_abs)

        cam_null = cam_col & is_null
        cam_abs = cam_col & is_abs
        cam_scat = cam_col & is_scat

        ndx, ndy, ndz = _sample_hg3(st["dx"], st["dy"], st["dz"], u2, u3, g_hg)
        cos_wi = st["dx"] * wix + st["dy"] * wiy + st["dz"] * wiz
        phase_new = _hg_phase(cos_wi, g_hg)

        depth_new = jnp.where(cam_scat, st["depth"] + 2, st["depth"])
        pcol_x = fe["lpx"] + Ox
        pcol_y = fe["lpy"] + Oy
        pcol_z = fe["lpz"] + Oz
        pox = jnp.where(cam_scat, pcol_x, st["pox"])
        poy = jnp.where(cam_scat, pcol_y, st["poy"])
        poz = jnp.where(cam_scat, pcol_z, st["poz"])
        pdx = jnp.where(cam_scat, ndx, st["pdx"])
        pdy = jnp.where(cam_scat, ndy, st["pdy"])
        pdz = jnp.where(cam_scat, ndz, st["pdz"])
        phase_val = jnp.where(cam_scat, phase_new, st["phase_val"])

        # ---- SHADOW events (ratio tracking + RR; worker.cpp:65-86) ----
        shw_col = in_shw & real_col
        sigma_n = jnp.maximum(0.0, sigma_maj - sigma_t * rho)
        T_after = st["T_ray"] * (sigma_n / sig)
        rr = T_after <= 0.05
        rr_kill = rr & (u1 < 0.75)
        T_after = jnp.where(rr_kill, 0.0, jnp.where(rr, T_after / 0.25, T_after))
        T_ray = jnp.where(shw_col, T_after, st["T_ray"])
        shw_dead = shw_col & (T_ray <= 0.0)
        shw_exit = in_shw & exited
        shadow_finish = shw_exit | shw_dead
        contrib_w = phase_val * T_ray
        Lx = Lx + jnp.where(shadow_finish, contrib_w * Li[0], 0.0)
        Ly = Ly + jnp.where(shadow_finish, contrib_w * Li[1], 0.0)
        Lz = Lz + jnp.where(shadow_finish, contrib_w * Li[2], 0.0)

        # ---- resume / retire ----
        if nee_on:
            start_shadow = cam_scat
            resume = shadow_finish
        else:
            start_shadow = jnp.zeros_like(cam_scat)
            resume = shadow_finish | cam_scat

        nox = jnp.where(start_shadow, pcol_x, pox)
        noy = jnp.where(start_shadow, pcol_y, poy)
        noz = jnp.where(start_shadow, pcol_z, poz)
        ndx2 = jnp.where(start_shadow, wix, pdx)
        ndy2 = jnp.where(start_shadow, wiy, pdy)
        ndz2 = jnp.where(start_shadow, wiz, pdz)
        t0n, t1n, hitn = _clip3_box(
            nox, noy, noz, ndx2, ndy2, ndz2,
            (Ox, Oy, Oz), (Ox + X, Oy + Y, Oz + Z),
        )

        depth_ok = depth_new < max_depth
        resume_ok = resume & hitn & depth_ok
        resume_escape = resume & ((~hitn) | (~depth_ok))

        start_shadow_ok = start_shadow & hitn
        shadow_miss = start_shadow & (~hitn)
        Lx = Lx + jnp.where(shadow_miss, phase_val * Li[0], 0.0)
        Ly = Ly + jnp.where(shadow_miss, phase_val * Li[1], 0.0)
        Lz = Lz + jnp.where(shadow_miss, phase_val * Li[2], 0.0)
        t0p, t1p, hitp = _clip3_box(
            pox, poy, poz, pdx, pdy, pdz,
            (Ox, Oy, Oz), (Ox + X, Oy + Y, Oz + Z),
        )
        miss_resume_ok = shadow_miss & hitp & depth_ok
        miss_resume_escape = shadow_miss & ((~hitp) | (~depth_ok))

        cam_exit = in_cam & exited
        becomes_done_inf = cam_exit | resume_escape | miss_resume_escape
        Lx = Lx + jnp.where(becomes_done_inf, L_inf[0], 0.0)
        Ly = Ly + jnp.where(becomes_done_inf, L_inf[1], 0.0)
        Lz = Lz + jnp.where(becomes_done_inf, L_inf[2], 0.0)
        becomes_done_term = cam_abs

        mode = st["mode"]
        mode = jnp.where(becomes_done_inf | becomes_done_term, DONE, mode)
        mode = jnp.where(start_shadow_ok, SHADOW, mode)
        mode = jnp.where(resume_ok | miss_resume_ok, CAM, mode)

        ox = jnp.where(start_shadow_ok, nox, st["ox"])
        oy = jnp.where(start_shadow_ok, noy, st["oy"])
        oz = jnp.where(start_shadow_ok, noz, st["oz"])
        dx = jnp.where(start_shadow_ok, ndx2, st["dx"])
        dy = jnp.where(start_shadow_ok, ndy2, st["dy"])
        dz = jnp.where(start_shadow_ok, ndz2, st["dz"])
        t = jnp.where(start_shadow_ok, t0n, st["t"])
        t_exit = jnp.where(start_shadow_ok, t1n, st["t_exit"])

        ox = jnp.where(resume_ok, pox, ox)
        oy = jnp.where(resume_ok, poy, oy)
        oz = jnp.where(resume_ok, poz, oz)
        dx = jnp.where(resume_ok, pdx, dx)
        dy = jnp.where(resume_ok, pdy, dy)
        dz = jnp.where(resume_ok, pdz, dz)
        t_res = jnp.where(resume & (~start_shadow), t0n, t0p)
        t_exit_res = jnp.where(resume & (~start_shadow), t1n, t1p)
        t = jnp.where(resume_ok, t_res, t)
        t_exit = jnp.where(resume_ok, t_exit_res, t_exit)
        ox = jnp.where(miss_resume_ok, pox, ox)
        oy = jnp.where(miss_resume_ok, poy, oy)
        oz = jnp.where(miss_resume_ok, poz, oz)
        dx = jnp.where(miss_resume_ok, pdx, dx)
        dy = jnp.where(miss_resume_ok, pdy, dy)
        dz = jnp.where(miss_resume_ok, pdz, dz)
        t = jnp.where(miss_resume_ok, t0p, t)
        t_exit = jnp.where(miss_resume_ok, t1p, t_exit)

        plain_adv = cam_null | zero_col | (in_shw & real_col & ~shadow_finish)
        t = jnp.where(plain_adv, fe["t_cand"], t)
        t = jnp.where(fetchm, t_next, t)

        new_ray = start_shadow_ok | resume_ok | miss_resume_ok
        sig_seg = jnp.where(fetchm, sig_seg_f, st["sig_seg"])
        sig_seg = jnp.where(new_ray, 0.0, sig_seg)
        t_seg = jnp.where(fetchm, t_seg_f, st["t_seg"])
        t_seg = jnp.where(new_ray, t, t_seg)

        T_ray = jnp.where(start_shadow_ok, 1.0, T_ray)
        ctr = st["ctr"] + 1

        # ---- write state (packed) ----
        outs = dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, t=t, t_exit=t_exit,
            sig_seg=sig_seg, t_seg=t_seg, Lx=Lx, Ly=Ly, Lz=Lz,
            pox=pox, poy=poy, poz=poz, pdx=pdx, pdy=pdy, pdz=pdz,
            T_ray=T_ray, phase_val=phase_val,
            depth=depth_new, mode=mode, ctr=ctr,
        )
        for i, n in enumerate(STATE_F32):
            sf_out[i] = outs[n]
        for i, n in enumerate(STATE_I32):
            si_out[i] = outs[n]

    return kernel


def _as2d(x):
    return x.reshape(-1, LANE)


def fetch_rows(medium: Medium, params: IntegratorParams, bb_pairs,
               lpx, lpy, lpz, collide, emission_on: bool):
    """The gather core of prestep: one fused-row gather + trilinear dots.

    Computes (rho, bmaj, smaj[, bb_xyz]) at the requested point. All math
    here fuses into the gather's consumer fusion. Mirrors the packed path of
    integrator.make_traversal exactly. `emission_on` must equal
    emission_enabled(medium, params) (asserted) — it selects the bb channels
    consistently with the kernel built for the same configuration.
    bb_pairs: the pair-packed blackbody LUT (spectral.blackbody_pairs),
    hoisted by the caller so the loop pays ONE LUT gather per iteration.

    Emissive gather budget per lane per iteration:
      - 16-wide fused rows (aligned temperature grid folded into the main
        table, models/medium.pack_fused_rows): 2 gathers (row + bb pair).
      - 8-wide rows (temperature grid with its own transform): 3 gathers
        (row + temperature corner row + bb pair).
    """
    assert emission_on == emission_enabled(medium, params)
    dgrid = medium.density
    X, Y, Z = dgrid.shape
    BX, BY, BZ = medium.majorants.brick_maj.shape
    fused = medium.density_rows
    assert fused is not None, "megakernel requires the packed fused rows"
    n_corner_rows = (X + 1) * (Y + 1) * (Z + 1)

    ix = jnp.floor(lpx).astype(jnp.int32)
    iy = jnp.floor(lpy).astype(jnp.int32)
    iz = jnp.floor(lpz).astype(jnp.int32)
    fx = lpx - ix.astype(lpx.dtype)
    fy = lpy - iy.astype(lpy.dtype)
    fz = lpz - iz.astype(lpz.dtype)
    valid = (
        (ix >= -1) & (ix <= X - 1) & (iy >= -1) & (iy <= Y - 1)
        & (iz >= -1) & (iz <= Z - 1)
    )
    rx = jnp.clip(ix + 1, 0, X)
    ry = jnp.clip(iy + 1, 0, Y)
    rz = jnp.clip(iz + 1, 0, Z)
    base = (rx * (Y + 1) + ry) * (Z + 1) + rz

    bi = jnp.floor(lpx * (1.0 / BRICK)).astype(jnp.int32)
    bj = jnp.floor(lpy * (1.0 / BRICK)).astype(jnp.int32)
    bk = jnp.floor(lpz * (1.0 / BRICK)).astype(jnp.int32)
    b_valid = (
        (bi >= 0) & (bi < BX) & (bj >= 0) & (bj < BY) & (bk >= 0) & (bk < BZ)
    )
    b_flat = (
        jnp.clip(bi, 0, BX - 1) * BY + jnp.clip(bj, 0, BY - 1)
    ) * BZ + jnp.clip(bk, 0, BZ - 1)

    collide_b = collide != 0
    idx = jnp.where(collide_b, base, n_corner_rows + b_flat)
    row = jnp.take(fused, idx.reshape(-1), axis=0, mode="clip").reshape(
        idx.shape + (fused.shape[1],)
    )
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    rho = (
        row[..., 0] * (gx * gy * gz) + row[..., 1] * (gx * gy * fz)
        + row[..., 2] * (gx * fy * gz) + row[..., 3] * (gx * fy * fz)
        + row[..., 4] * (fx * gy * gz) + row[..., 5] * (fx * gy * fz)
        + row[..., 6] * (fx * fy * gz) + row[..., 7] * (fx * fy * fz)
    )
    rho = jnp.where(valid, rho, 0.0)
    bmaj = jnp.where(b_valid, row[..., 0], 0.0)
    smaj = jnp.where(b_valid, row[..., 1], 0.0)

    out = [rho, bmaj, smaj]
    if emission_on:
        from ..utils.spectral import RESOLUTION

        if fused.shape[1] >= 16:
            # Aligned temperature grid: its corner values ride columns 8..15
            # of the SAME fused row (pack_fused_rows) — zero extra gathers.
            # The weights are the density cell's (the grids share cell
            # geometry; see medium.temperature_on_density_grid).
            tw = (
                row[..., 8] * (gx * gy * gz) + row[..., 9] * (gx * gy * fz)
                + row[..., 10] * (gx * fy * gz) + row[..., 11] * (gx * fy * fz)
                + row[..., 12] * (fx * gy * gz) + row[..., 13] * (fx * gy * fz)
                + row[..., 14] * (fx * fy * gz) + row[..., 15] * (fx * fy * fz)
            )
            temp_adim = jnp.where(valid, tw, 0.0)
        else:
            # Temperature grid with its OWN transform (worker.cpp:153-155):
            # map the collision point through it and gather its corner row.
            from ..grids.grid import sample_trilinear_rows

            dg, tg = medium.density, medium.temperature
            voxel = dg.voxel_size
            wx = (lpx + dg.origin_ijk[0]) * voxel + dg.world_offset[0]
            wy = (lpy + dg.origin_ijk[1]) * voxel + dg.world_offset[1]
            wz = (lpz + dg.origin_ijk[2]) * voxel + dg.world_offset[2]
            tpx = (wx - tg.world_offset[0]) / tg.voxel_size - tg.origin_ijk[0]
            tpy = (wy - tg.world_offset[1]) / tg.voxel_size - tg.origin_ijk[1]
            tpz = (wz - tg.world_offset[2]) / tg.voxel_size - tg.origin_ijk[2]
            tp = jnp.stack([tpx, tpy, tpz], axis=-1)
            assert medium.temperature_rows is not None
            temp_adim = sample_trilinear_rows(
                medium.temperature_rows, tg.shape, tp
            )
        temp_k = temp_adim * params.temperature_scale + params.temperature_offset
        nbb = bb_pairs.shape[0] + 1
        tc = jnp.clip(temp_k, 0.0, (nbb - 1) * RESOLUTION - 1e-3)
        ti = jnp.floor(tc / RESOLUTION).astype(jnp.int32) + 1
        ti = jnp.clip(ti, 0, nbb - 2)
        frac = tc / RESOLUTION - (ti - 1).astype(tc.dtype)
        pr = jnp.take(bb_pairs, ti.reshape(-1), axis=0).reshape(ti.shape + (6,))
        bb = pr[..., :3] + pr[..., 3:] * frac[..., None]
        bb = jnp.where(temp_k[..., None] <= 0.0, 0.0, bb)
        out.extend([bb[..., 0], bb[..., 1], bb[..., 2]])
    return tuple(out)


def make_prestep(medium: Medium, params: IntegratorParams, bb_table,
                 emission_on: bool):
    """Build the XLA half of the iteration: RNG + free flight + gather.

    Returns prestep(pids2d, stream2d, sf, si) -> ff [nfe, rows, 128].
    Consumes the same counter draws as
    integrator.trace_rays: u = pcg4d(pixel, stream, ctr, 0) — u0 drives the
    free flight here; u1..u3 ride the fetch array to the kernel (event draw,
    HG phi/cos). All of this fuses with the row gather, whose memory latency
    hides the emulated-u32-multiply VPU cost of PCG4D.
    """
    dgrid = medium.density
    O = jnp.asarray(dgrid.origin_ijk, jnp.float32)
    voxel = float(dgrid.voxel_size)
    if emission_on:
        from ..utils.spectral import blackbody_pairs

        bb_pairs = blackbody_pairs(bb_table)  # hoisted: built once per trace
    else:
        bb_pairs = None
    i_mode = STATE_I32.index("mode")
    i_ctr = STATE_I32.index("ctr")
    idx = {n: i for i, n in enumerate(STATE_F32)}
    i_t, i_tseg, i_sig = idx["t"], idx["t_seg"], idx["sig_seg"]
    i_ox, i_oy, i_oz = idx["ox"], idx["oy"], idx["oz"]
    i_dx, i_dy, i_dz = idx["dx"], idx["dy"], idx["dz"]

    def prestep(pids2d, stream2d, sf, si):
        mode, ctr = si[i_mode], si[i_ctr]
        t, t_seg, sig_seg = sf[i_t], sf[i_tseg], sf[i_sig]
        w0, w1, w2, w3 = vrng.pcg4d(
            pids2d, stream2d, ctr, jnp.zeros_like(ctr)
        )
        u0 = vrng._u32_to_uniform(w0)
        u1 = vrng._u32_to_uniform(w1)
        u2 = vrng._u32_to_uniform(w2)
        u3 = vrng._u32_to_uniform(w3)

        active = mode != DONE
        has_seg = t_seg > t
        sig = jnp.maximum(sig_seg, _TINY)
        dt_w = vrng.sample_exponential(u0, sig)
        t_cand = t + dt_w / voxel
        collide = active & has_seg & (sig_seg > 0.0) & (t_cand < t_seg)
        t_next = jnp.where(has_seg, t_seg, t)
        t_gather = jnp.where(collide, t_cand, t_next + _LOOKAHEAD)
        lpx = sf[i_ox] + sf[i_dx] * t_gather - O[0]
        lpy = sf[i_oy] + sf[i_dy] * t_gather - O[1]
        lpz = sf[i_oz] + sf[i_dz] * t_gather - O[2]
        collide_i = collide.astype(jnp.int32)

        fetched = fetch_rows(
            medium, params, bb_pairs, lpx, lpy, lpz, collide_i, emission_on
        )
        ff = jnp.stack(
            list(fetched[:3]) + [lpx, lpy, lpz, t_cand, u1, u2, u3]
            + list(fetched[3:])
        )
        return ff

    return prestep


def _pallas_step_call(medium, params, emission_on, n_lanes, block_lanes,
                      interpret):
    kernel = make_kernel(medium, params, emission_on)
    rows = n_lanes // LANE
    brows = block_lanes // LANE
    grid = (rows // brows,)
    n_fetch = len(FETCH_F32_EMIT) if emission_on else len(FETCH_F32)
    nf, ni = len(STATE_F32), len(STATE_I32)

    def packed(n_fields):
        return pl.BlockSpec(
            (n_fields, brows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    in_specs = [packed(nf), packed(ni), packed(n_fetch)]
    out_specs = (packed(nf), packed(ni))
    out_shape = (
        jax.ShapeDtypeStruct((nf, rows, LANE), jnp.float32),
        jax.ShapeDtypeStruct((ni, rows, LANE), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def trace_rays_fused(
    medium: Medium,
    params: IntegratorParams,
    bb_table,
    o_world: jnp.ndarray,
    d_world: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    stream,
    block_lanes: int = 8192,
    interpret: bool = False,
    return_lane_iters: bool = False,
):
    """Forward render via the Pallas megakernel; same contract as trace_rays.

    Returns (radiance [N,3], iterations [], n_capped []), plus the
    topology-invariant lane-iteration count when return_lane_iters=True
    (see integrator.trace_rays). N must be a multiple
    of 1024 (callers pad; see parallel/shard.pad_ray_batch). Requires the
    medium's packed fused rows. Consumes the identical PCG4D draw sequence as
    trace_rays (statistically identical renders; individual lanes can differ
    where transcendental rounding flips a knife-edge event).

    Off-TPU (CPU/GPU) callers without interpret=True fall back to the XLA
    wavefront loop automatically — Mosaic kernels only compile for TPU, and
    the two paths are draw-compatible, so the fallback renders the same image.
    """
    from .integrator import init_state

    if jax.default_backend() != "tpu" and not interpret:
        from .integrator import trace_rays

        return trace_rays(
            medium, params, bb_table, o_world, d_world, pixel_ids, stream
        )

    N = o_world.shape[0]
    assert N % 1024 == 0, "lane count must be a multiple of 1024 (pad rays)"
    block_lanes = min(block_lanes, N)

    emission_on = emission_enabled(medium, params)

    st0 = init_state(medium, o_world, d_world, params)

    # SoA state from the AoS init (one-time, outside the loop).
    state = dict(
        ox=st0.o[:, 0], oy=st0.o[:, 1], oz=st0.o[:, 2],
        dx=st0.d[:, 0], dy=st0.d[:, 1], dz=st0.d[:, 2],
        t=st0.t, t_exit=st0.t_exit, sig_seg=st0.sig_seg, t_seg=st0.t_seg,
        Lx=st0.L[:, 0], Ly=st0.L[:, 1], Lz=st0.L[:, 2],
        pox=st0.pend_o[:, 0], poy=st0.pend_o[:, 1], poz=st0.pend_o[:, 2],
        pdx=st0.pend_d[:, 0], pdy=st0.pend_d[:, 1], pdz=st0.pend_d[:, 2],
        T_ray=st0.T_ray, phase_val=st0.phase_val,
        depth=st0.depth, mode=st0.mode, ctr=st0.ctr,
    )

    stream_full = jnp.broadcast_to(
        jnp.asarray(stream, jnp.uint32).reshape(-1), (N,)
    ) if jnp.asarray(stream).ndim <= 1 and jnp.asarray(stream).size in (1, N) \
        else jnp.asarray(stream, jnp.uint32)
    stream_full = jnp.broadcast_to(jnp.asarray(stream_full, jnp.uint32), (N,))

    prestep = make_prestep(medium, params, bb_table, emission_on)
    i_mode = STATE_I32.index("mode")

    # Staged compaction (same ladder as integrator.trace_rays): most lanes
    # retire within tens of iterations; once the alive tail fits a narrower
    # (statically-shaped) buffer, gather alive lanes to the front and run a
    # narrower loop. Widths stay multiples of 1024 so the kernel tiles.
    #
    # Hybrid tail: the kernel's (8, 128) tiling floors its width at 1024
    # lanes, but the alive tail keeps shrinking — on deep-path scenes
    # (fire.json: thousands of tail iterations) a 1024-wide fused tail is
    # ~2x wasteful vs the XLA step at 512. Below 2048 lanes the stages hand
    # off to the XLA step (identical draws: both key RNG on the per-lane
    # counter), keeping the fused path's full-width advantage AND the XLA
    # loop's narrow tail.
    from .integrator import compaction_widths

    hybrid = N > HYBRID_MIN_LANES
    widths = compaction_widths(
        N, min_width=HYBRID_MIN_LANES if hybrid else 1024, align=1024
    )

    def run_stage(state_t, pids_t, stream_t, it, lane_it, width, next_w):
        # 8192-lane blocks by default: a [21+3+14+1, 64, 128] block set fits
        # VMEM with room for double buffering; 16384-lane blocks nearly fill
        # the 16 MB scoped limit and measurably slow the kernel (PERF.md §1).
        blk = next(
            b for b in (block_lanes, 8192, 4096, 2048, 1024)
            if b <= width and width % b == 0
        )
        call = _pallas_step_call(
            medium, params, emission_on, width, blk, interpret
        )
        pids2d = _as2d(pids_t.astype(jnp.uint32))
        stream2d = _as2d(stream_t.astype(jnp.uint32))
        sf = jnp.stack([_as2d(state_t[n]) for n in STATE_F32])
        si = jnp.stack([_as2d(state_t[n]) for n in STATE_I32])

        def body(carry):
            sf, si, it, alive, lit = carry
            ff = prestep(pids2d, stream2d, sf, si)
            sf, si = call(sf, si, ff)
            alive_out = jnp.sum((si[i_mode] != DONE).astype(jnp.int32))
            return sf, si, it + 1, alive_out, lit + alive_out

        def cond(carry):
            _, _, it, alive, _ = carry
            go = (it < params.max_iters) & (alive > 0)
            if next_w is not None:
                go = go & (alive > next_w)
            return go

        alive0 = jnp.sum((state_t["mode"] != DONE).astype(jnp.int32))
        sf, si, it, alive, lane_it = jax.lax.while_loop(
            cond, body, (sf, si, it, alive0, lane_it)
        )
        state_o = {n: sf[i].reshape(-1) for i, n in enumerate(STATE_F32)}
        state_o.update({n: si[i].reshape(-1) for i, n in enumerate(STATE_I32)})
        return state_o, it, lane_it

    from .integrator import alive_first_perm, compact_lanes

    out = jnp.zeros((N, 3), jnp.float32)
    idx_map = jnp.arange(N, dtype=jnp.int32)
    pids_t = pixel_ids
    stream_t = stream_full
    it = jnp.int32(0)
    lane_it = jnp.int32(0)
    width = N
    fused_plan = widths + ([1024] if hybrid else [None])
    for next_w in fused_plan:
        state, it, lane_it = run_stage(
            state, pids_t, stream_t, it, lane_it, width, next_w
        )
        L_stage = jnp.stack(
            [state["Lx"], state["Ly"], state["Lz"]], axis=-1
        )
        out = out.at[idx_map].set(L_stage)
        if next_w is None:
            break
        keep = alive_first_perm(state["mode"] == DONE)[:next_w]
        state, idx_map, pids_t, stream_t = compact_lanes(
            keep, (state, idx_map, pids_t, stream_t)
        )
        width = next_w

    if not hybrid:
        n_capped = jnp.sum((state["mode"] != DONE).astype(jnp.int32))
        if return_lane_iters:
            return out, it, n_capped, lane_it
        return out, it, n_capped

    # ---- XLA tail: 1024 -> 512 -> drain, via the integrator step ----
    from .integrator import RayState, finalize_radiance, make_step

    step = make_step(medium, params, bb_table)
    st = RayState(
        o=jnp.stack([state["ox"], state["oy"], state["oz"]], -1),
        d=jnp.stack([state["dx"], state["dy"], state["dz"]], -1),
        t=state["t"], t_exit=state["t_exit"],
        sig_seg=state["sig_seg"], t_seg=state["t_seg"],
        L=jnp.stack([state["Lx"], state["Ly"], state["Lz"]], -1),
        wscore=jnp.ones_like(state["t"]),
        depth=state["depth"], mode=state["mode"],
        terminated=jnp.zeros_like(state["mode"], dtype=bool),
        pend_o=jnp.stack([state["pox"], state["poy"], state["poz"]], -1),
        pend_d=jnp.stack([state["pdx"], state["pdy"], state["pdz"]], -1),
        T_ray=state["T_ray"], phase_val=state["phase_val"],
        ctr=state["ctr"],
    )

    for next_w in [512, None]:
        def cond(carry, next_w=next_w):
            st_, it_, alive_, _ = carry
            go = (it_ < params.max_iters) & (alive_ > 0)
            if next_w is not None:
                go = go & (alive_ > next_w)
            return go

        def body(carry, pids_=pids_t, stream_=stream_t):
            st_, it_, _, lit_ = carry
            u = vrng.counter_uniforms(pids_, stream_, st_.ctr, 4)
            st2 = step(st_, u)
            alive2 = jnp.sum((st2.mode != DONE).astype(jnp.int32))
            return st2, it_ + 1, alive2, lit_ + alive2

        alive0 = jnp.sum((st.mode != DONE).astype(jnp.int32))
        st, it, _, lane_it = jax.lax.while_loop(
            cond, body, (st, it, alive0, lane_it)
        )
        out = out.at[idx_map].set(finalize_radiance(st, params))
        if next_w is None:
            break
        keep = alive_first_perm(st.mode == DONE)[:next_w]
        st, idx_map, pids_t, stream_t = compact_lanes(
            keep, (st, idx_map, pids_t, stream_t)
        )

    n_capped = jnp.sum((st.mode != DONE).astype(jnp.int32))
    if return_lane_iters:
        return out, it, n_capped, lane_it
    return out, it, n_capped
