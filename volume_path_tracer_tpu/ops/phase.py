"""Henyey-Greenstein phase function: evaluation and direction sampling.

Behavioral parity with the reference:
  - phase eval: /root/reference/include/vpt/utils.hpp:61-66
  - direction sampling + branchless orthonormal basis:
    /root/reference/include/vpt/random.hpp:56-84, utils.hpp:39-51
    (both PBRT-derived in the reference)

All functions are pure jnp, vectorized over a leading ray axis, and fused by
XLA into the integrator loop.
"""
from __future__ import annotations

import jax.numpy as jnp

INV_4PI = 1.0 / (4.0 * jnp.pi)


def henyey_greenstein(cos_theta: jnp.ndarray, g) -> jnp.ndarray:
    """HG phase function value for scattering angle cosine cos_theta."""
    den = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / (den * jnp.sqrt(jnp.maximum(den, 1e-12)))


def coordinate_system(v1: jnp.ndarray):
    """Branchless ONB (Duff et al.) with v1 as the z axis; v1 is [..., 3].

    Matches utils.hpp:39-51 exactly (same construction the reference uses).
    """
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = x * y * a
    v2 = jnp.stack([1.0 + sign * a * x * x, sign * b, -sign * x], axis=-1)
    v3 = jnp.stack([b, sign + a * y * y, -y], axis=-1)
    return v2, v3


def sample_henyey_greenstein(w: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray, g) -> jnp.ndarray:
    """Sample a new direction around w ([..., 3]) from the HG distribution.

    Mirrors random.hpp:56-84: inversion sampling of cos_theta (with the
    isotropic fallback for |g| < 1e-3), uniform phi, local->world via the
    branchless ONB, with the local direction normalized before the frame
    transform.
    """
    g = jnp.asarray(g, dtype=w.dtype)
    g2 = g * g
    denom = 1.0 + g - 2.0 * g * u1
    sqr = (1.0 - g2) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    aniso = (1.0 + g2 - sqr * sqr) / (2.0 * jnp.where(jnp.abs(g) < 1e-12, 1e-12, g))
    iso = 1.0 - 2.0 * u1
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, iso, aniso)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2

    sin_c = jnp.clip(sin_theta, -1.0, 1.0)
    local = jnp.stack(
        [sin_c * jnp.cos(phi), sin_c * jnp.sin(phi), jnp.clip(cos_theta, -1.0, 1.0)],
        axis=-1,
    )
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)

    vx, vy = coordinate_system(w)
    return local[..., 0:1] * vx + local[..., 1:2] * vy + local[..., 2:3] * w
