"""A literal, sequential NumPy implementation of the reference algorithm.

This is an *independent oracle* for statistical tests: it follows the
reference's integrator semantics step by step (delta tracking with majorant
segments, per-collision emission, {null, absorb, scatter} events, NEE with
ratio tracking + Russian roulette, unattenuated infinite light on escape —
/root/reference/src/worker.cpp:92-208, majorant_transmittance_sampler.cpp:21-81)
using plain Python loops and numpy RNG. It shares no code with the TPU
integrator, so agreement between the two is meaningful evidence of
correctness. Majorant granularity differs (global majorant here) which is
statistically irrelevant: any majorant >= density yields the same estimator
distribution.
"""
from __future__ import annotations

import numpy as np


def _hg_phase(cos_theta, g):
    den = 1.0 + g * g + 2.0 * g * cos_theta
    return (1.0 / (4.0 * np.pi)) * (1.0 - g * g) / (den * np.sqrt(max(den, 0.0)))


def _sample_hg_dir(w, u1, u2, g):
    if abs(g) < 1e-3:
        cos_theta = 1.0 - 2.0 * u1
    else:
        sqr = (1.0 - g * g) / (1.0 + g - 2.0 * g * u1)
        cos_theta = (1.0 + g * g - sqr * sqr) / (2.0 * g)
    sin_theta = np.sqrt(max(0.0, 1.0 - cos_theta**2))
    phi = 2.0 * np.pi * u2
    local = np.array(
        [sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta]
    )
    local /= np.linalg.norm(local)
    # branchless ONB
    sign = 1.0 if w[2] >= 0 else -1.0
    a = -1.0 / (sign + w[2])
    b = w[0] * w[1] * a
    v2 = np.array([1.0 + sign * a * w[0] ** 2, sign * b, -sign * w[0]])
    v3 = np.array([b, sign + a * w[1] ** 2, -w[1]])
    return local[0] * v2 + local[1] * v3 + local[2] * w


def _trilinear(data, p):
    i0 = np.floor(p).astype(int)
    f = p - i0
    acc = 0.0
    X, Y, Z = data.shape
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                i, j, k = i0[0] + dx, i0[1] + dy, i0[2] + dz
                if 0 <= i < X and 0 <= j < Y and 0 <= k < Z:
                    v = data[i, j, k]
                else:
                    v = 0.0
                wgt = (
                    (f[0] if dx else 1 - f[0])
                    * (f[1] if dy else 1 - f[1])
                    * (f[2] if dz else 1 - f[2])
                )
                acc += v * wgt
    return acc


def _clip(o, d, lo, hi, t_min=1e-4):
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.copysign(1e-12, d) + (d == 0) * 1e-12, d)
    ta = (lo - o) * inv
    tb = (hi - o) * inv
    t0 = max(np.minimum(ta, tb).max(), t_min)
    t1 = np.maximum(ta, tb).min()
    return t0, t1, t0 < t1


class ReferencePathTracer:
    """Sequential delta tracker mirroring the reference worker loop."""

    def __init__(
        self,
        density,  # [X,Y,Z] numpy
        origin_ijk,
        voxel_size,
        world_offset,
        sigma_a,
        sigma_s,
        g,
        max_depth,
        infinite_rgbxyz,
        distant_xyz,
        distant_inv_dir,
        temperature=None,  # (data, origin_ijk, voxel_size, world_offset)
        le_scale=0.0,
        temp_offset=300.0,
        temp_scale=40.0,
        bb_lookup=None,  # callable T_K -> xyz[3]
    ):
        self.density = np.asarray(density, np.float64)
        self.O = np.asarray(origin_ijk, np.float64)
        self.voxel = voxel_size
        self.world_offset = np.asarray(world_offset, np.float64)
        self.sigma_a, self.sigma_s, self.g = sigma_a, sigma_s, g
        self.sigma_t = sigma_a + sigma_s
        self.max_depth = max_depth
        self.L_inf = np.asarray(infinite_rgbxyz, np.float64)
        self.Li = np.asarray(distant_xyz, np.float64)
        wi = np.asarray(distant_inv_dir, np.float64)
        self.wi = wi / np.linalg.norm(wi) if np.linalg.norm(wi) > 0 else wi
        self.maj = float(self.density.max())  # global majorant (valid everywhere)
        # a global majorant also bounds trilinear interpolation; add halo slack
        self.temperature = temperature
        self.le_scale = le_scale
        self.temp_offset = temp_offset
        self.temp_scale = temp_scale
        self.bb_lookup = bb_lookup

    def _world_to_index(self, p):
        return (p - self.world_offset) / self.voxel

    def _density_at(self, p_idx):
        return _trilinear(self.density, p_idx - self.O)

    def _track(self, o_w, d_w, rng, handler):
        """Delta-track a ray; call handler(point_idx, rho, sigma_maj) at each
        real collision; handler returns False to stop. Returns True if the
        ray exited the volume (segments exhausted)."""
        o = self._world_to_index(np.asarray(o_w, np.float64))
        d = np.asarray(d_w, np.float64)
        lo = self.O
        hi = self.O + np.array(self.density.shape, np.float64)
        t0, t1, hit = _clip(o, d, lo, hi)
        if not hit:
            return True
        sigma_maj = self.maj * self.sigma_t
        if sigma_maj <= 0:
            return True
        t = t0
        while True:
            dt_w = -np.log(1 - rng.random()) / sigma_maj
            t = t + dt_w / self.voxel
            if t >= t1:
                return True
            p = o + d * t
            rho = self._density_at(p)
            if rho <= 0.0:
                continue
            if handler(p, rho, sigma_maj) is False:
                return False

    def sample_Ld(self, pos_idx, w_dir, rng):
        if not np.any(self.Li != 0.0):
            return np.zeros(3)
        pos_w = pos_idx * self.voxel + self.world_offset
        state = {"T": 1.0}

        def handler(p, rho, sigma_maj):
            sigma_n = max(0.0, sigma_maj - self.sigma_t * rho)
            state["T"] *= sigma_n / sigma_maj
            if state["T"] <= 0.05:
                if rng.random() < 0.75:
                    state["T"] = 0.0
                else:
                    state["T"] /= 0.25
            if state["T"] <= 0.0:
                return False

        self._track(pos_w, self.wi, rng, handler)
        p = _hg_phase(float(np.dot(w_dir, self.wi)), self.g)
        return p * state["T"] * self.Li

    def trace(self, o_w, d_w, rng):
        """Full path trace of one camera ray; returns XYZ radiance."""
        L = np.zeros(3)
        r_o = np.asarray(o_w, np.float64)
        r_d = np.asarray(d_w, np.float64)
        terminated = False
        depth = 0
        while depth < self.max_depth:
            result = {"scattered": False}

            def handler(p_idx, rho, sigma_maj):
                p_a = self.sigma_a * rho / sigma_maj
                p_s = self.sigma_s * rho / sigma_maj
                p_n = max(1.0 - p_a - p_s, 0.0)
                if self.temperature is not None and self.le_scale != 0.0:
                    tdata, t_origin, t_voxel, t_off = self.temperature
                    pos_w = p_idx * self.voxel + self.world_offset
                    tp = (pos_w - np.asarray(t_off)) / t_voxel
                    temp_adim = _trilinear(np.asarray(tdata, np.float64),
                                           tp - np.asarray(t_origin, np.float64))
                    temp_k = temp_adim * self.temp_scale + self.temp_offset
                    L[:] = L + p_a * self.le_scale * np.asarray(
                        self.bb_lookup(temp_k), np.float64
                    )
                u = rng.random() * (p_n + p_a + p_s)
                if u <= p_n:
                    return None  # null: continue tracking
                elif u <= p_n + p_a:
                    result["event"] = "absorb"
                    return False
                else:
                    result["event"] = "scatter"
                    result["point"] = p_idx.copy()
                    return False

            exited = self._track(r_o, r_d, rng, handler)
            if exited:
                break
            if result.get("event") == "absorb":
                terminated = True
                break
            # scatter
            depth += 1  # inner depth++ (worker.cpp:169)
            p_idx = result["point"]
            L += self.sample_Ld(p_idx, r_d, rng)
            nd = _sample_hg_dir(r_d, rng.random(), rng.random(), self.g)
            r_o = p_idx * self.voxel + self.world_offset
            r_d = nd / np.linalg.norm(nd)
            depth += 1  # for-loop increment
        if not terminated:
            L = L + self.L_inf
        return L
