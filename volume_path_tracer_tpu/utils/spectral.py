"""Spectral subsystem: Planck blackbody emission pre-integrated to CIE XYZ.

Behavioral parity with the reference:
  - planck_law: /root/reference/src/spectral.cpp:7-20
  - spectrum_to_xyz (471-wavelength inner products / Y_integral):
    /root/reference/include/vpt/spectral.hpp:62-75
  - blackbody XYZ LUT, 500 breakpoints at 100 K spacing with the reference's
    deliberate one-slot shift (idx_to_temp(i) = (i-1)*100, so slot 0 holds
    T=-100K which the Planck T<=0 guard zeroes):
    /root/reference/src/precompute_blackbody.cpp:7-52

TPU-first design: the LUT is built once on host with numpy (the reference
builds it at startup too, main.cpp:32) and shipped to the device as a small
[500, 3] table; the runtime lookup `blackbody_radiation_xyz` is pure jnp
(gather + lerp), fully differentiable w.r.t. temperature, and is fused by XLA
into the integrator loop.

Above-table temperatures: the reference falls back to exact spectral
integration at runtime for T >= 49,900 K (precompute_blackbody.cpp:25-36).
Data-dependent 471-term integration inside a jit region would destroy TPU
performance, so instead the table is SIZED TO COVER the scene: callers pass
n_breakpoints = breakpoints_for_max_temp(scene max temperature) (the
renderer derives it from the loaded temperature grid), so no reachable
temperature ever exceeds the table and every lookup is a 100 K lerp of
exactly-integrated breakpoints. Temperatures beyond even that (unbounded
user input) continue the last LUT segment's slope linearly — the input is
clamped to the table range, but the final segment's fractional index is not,
so out-of-range lookups are a linear extrapolation of the last segment (the
value-grad helper treats them as out-of-range: zero temperature gradient).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .cie_data import CIE_X, CIE_Y, CIE_Z, CIE_Y_INTEGRAL, LAMBDA_MIN, NUM_WAVELENGTHS

N_BREAKPOINTS = 500
RESOLUTION = 50000.0 / N_BREAKPOINTS  # 100 K
TEMP_MAX = (N_BREAKPOINTS - 1) * RESOLUTION  # 49,900 K


def planck_law(lambda_m: np.ndarray, temperature_k: float) -> np.ndarray:
    """Spectral radiance of a blackbody (W.sr^-1.m^-3), float32 math.

    Mirrors spectral.cpp:7-20 including the float32 constants.
    """
    lambda_m = np.asarray(lambda_m, dtype=np.float32)
    if temperature_k <= 0.0:
        return np.zeros_like(lambda_m)
    c = np.float32(299792458.0)
    h = np.float32(6.62606957e-34)
    kb = np.float32(1.3806488e-23)
    num = np.float32(2.0) * h * c * c
    lambda5 = lambda_m**5
    with np.errstate(over="ignore"):  # exp overflow -> inf -> radiance 0, as in f32 C++
        ex = np.exp((h * c) / (lambda_m * kb * np.float32(temperature_k)))
        return num / (lambda5 * (ex - np.float32(1.0)))


def blackbody_spectrum_to_xyz(temperature_k: float) -> np.ndarray:
    """Integrate the Planck spectrum at T against the CIE XYZ curves.

    Mirrors spectral.hpp:62-75: plain 1 nm Riemann sums over 360..830 nm,
    normalized by the CIE Y integral.
    """
    lambdas_nm = np.arange(LAMBDA_MIN, LAMBDA_MIN + NUM_WAVELENGTHS, dtype=np.float32)
    s = planck_law(lambdas_nm * np.float32(1e-9), temperature_k)
    return (
        np.array([np.dot(CIE_X, s), np.dot(CIE_Y, s), np.dot(CIE_Z, s)])
        / CIE_Y_INTEGRAL
    ).astype(np.float32)


def _idx_to_temp(idx: int) -> float:
    # Reference quirk (precompute_blackbody.cpp:14-16): the table is shifted
    # one slot, so slot i holds the XYZ of temperature (i-1)*100 K.
    return (idx - 1) * RESOLUTION


@functools.lru_cache(maxsize=8)
def blackbody_xyz_table(n_breakpoints: int = N_BREAKPOINTS) -> np.ndarray:
    """The [n, 3] blackbody XYZ LUT, breakpoint i at temperature (i-1)*100 K.

    The default n matches the reference's 500-slot table; pass a larger n
    (see breakpoints_for_max_temp) to cover scenes hotter than 49,900 K —
    the runtime lookup derives its range from the table's actual length.
    """
    table = np.zeros((n_breakpoints, 3), dtype=np.float32)
    for i in range(n_breakpoints):
        table[i] = blackbody_spectrum_to_xyz(_idx_to_temp(i))
    return table


def breakpoints_for_max_temp(t_max_k: float) -> int:
    """Table length covering temperatures up to t_max_k (>= the default 500).

    Replaces the reference's runtime exact-integration fallback for
    T >= 49,900 K: sizing the table at scene load keeps every reachable
    temperature inside the lerp range at the same 100 K resolution.
    """
    import math

    need = int(math.ceil(max(0.0, float(t_max_k)) / RESOLUTION)) + 2
    return max(N_BREAKPOINTS, need)


def blackbody_radiation_xyz(table: jnp.ndarray, temperature_k: jnp.ndarray) -> jnp.ndarray:
    """XYZ radiance of a blackbody at temperature_k (any shape) via the LUT.

    Mirrors precompute_blackbody.cpp:25-52: T <= 0 -> 0; otherwise linear
    interpolation between the two straddling breakpoints of the shifted
    table. Differentiable w.r.t. temperature_k. The covered range derives
    from the table's length (see breakpoints_for_max_temp); temperatures
    beyond it linearly extrapolate the final LUT segment (the index clips to
    the last segment while the fraction keeps growing) — unreachable in
    production because the renderer sizes the table to the scene's maximum
    temperature. megakernel.fetch_rows implements the identical math.
    """
    t = jnp.asarray(temperature_k)
    n = table.shape[0]
    t_max = (n - 1) * RESOLUTION
    # Shifted table: temperature T lives between slots floor(T/100)+1 and +2.
    tc = jnp.clip(t, 0.0, t_max - 1e-3)
    idx = jnp.floor(tc / RESOLUTION).astype(jnp.int32) + 1
    idx = jnp.clip(idx, 0, n - 2)
    frac = tc / RESOLUTION - (idx - 1).astype(tc.dtype)
    lo = table[idx]
    hi = table[idx + 1]
    out = lo + (hi - lo) * frac[..., None]
    return jnp.where(t[..., None] <= 0.0, 0.0, out)


def blackbody_pairs(table: jnp.ndarray) -> jnp.ndarray:
    """Pair-packed LUT [n-1, 6]: row i = (table[i].xyz, (table[i+1]-table[i]).xyz).

    The straddling-breakpoint lerp needs both table[idx] and table[idx+1] —
    two row gathers per lookup from the raw table. Packing each segment's
    (lo, hi-lo) into one row halves the gather count in the integrator's hot
    loop; lo + slope * frac is bitwise-identical to the two-gather lerp
    (the precomputed difference is the same f32 subtraction). Callers hoist
    this outside the wavefront loop (it is built once per trace).
    """
    t = jnp.asarray(table)
    return jnp.concatenate([t[:-1], t[1:] - t[:-1]], axis=-1)


def blackbody_radiation_xyz_from_pairs(
    pairs: jnp.ndarray, temperature_k: jnp.ndarray
) -> jnp.ndarray:
    """blackbody_radiation_xyz via the pair-packed LUT — one row gather.

    Bitwise-identical output to blackbody_radiation_xyz(table, t) for
    pairs = blackbody_pairs(table).
    """
    t = jnp.asarray(temperature_k)
    n = pairs.shape[0] + 1
    t_max = (n - 1) * RESOLUTION
    tc = jnp.clip(t, 0.0, t_max - 1e-3)
    idx = jnp.floor(tc / RESOLUTION).astype(jnp.int32) + 1
    idx = jnp.clip(idx, 0, n - 2)
    frac = tc / RESOLUTION - (idx - 1).astype(tc.dtype)
    row = pairs[idx]
    out = row[..., :3] + row[..., 3:] * frac[..., None]
    return jnp.where(t[..., None] <= 0.0, 0.0, out)


def blackbody_radiation_xyz_value_grad(table: jnp.ndarray, temperature_k: jnp.ndarray):
    """(xyz, d xyz / dT) of the LUT lookup — the closed-form derivative of
    blackbody_radiation_xyz, used by the replay backward pass (diff/vjp.py).

    Matches reverse-mode AD of the lookup exactly: the lerp slope
    (hi - lo) / RESOLUTION inside the active range, 0 where the T <= 0 guard
    or the clamp to [0, TEMP_MAX) is in effect.
    """
    t = jnp.asarray(temperature_k)
    n = table.shape[0]
    t_max = (n - 1) * RESOLUTION
    tc = jnp.clip(t, 0.0, t_max - 1e-3)
    idx = jnp.floor(tc / RESOLUTION).astype(jnp.int32) + 1
    idx = jnp.clip(idx, 0, n - 2)
    frac = tc / RESOLUTION - (idx - 1).astype(tc.dtype)
    lo = table[idx]
    hi = table[idx + 1]
    out = lo + (hi - lo) * frac[..., None]
    in_range = (t > 0.0) & (t < t_max - 1e-3)
    grad = jnp.where(in_range[..., None], (hi - lo) / RESOLUTION, 0.0)
    return jnp.where(t[..., None] <= 0.0, 0.0, out), grad
