"""Counter-based, stateless RNG for the wavefront integrator.

The reference uses a stateful pcg32_fast engine reseeded per (tile, wave) job
with MurmurHash64A(seed, jid) (/root/reference/include/vpt/random.hpp:86-115,
hash.hpp:20-67), which makes renders deterministic and independent of thread
count / scheduling.

The TPU-native equivalent is a counter-based threefry stream keyed on
(seed, wave, global pixel id, iteration): every random draw is a pure function
of those coordinates, so renders are bit-deterministic for a given seed and
*identical under any device sharding* (a pixel's stream depends on its global
pixel id, never on which shard or lane processes it). We preserve the
determinism *property*, not the pcg32 bit streams — image comparisons against
the reference are statistical (converged means), per SURVEY.md section 4.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def wave_key(seed, wave) -> jax.Array:
    """Root key for one wave of one render: fold the wave index into the seed."""
    return jax.random.fold_in(jax.random.key(seed), wave)


def ray_keys(base_key: jax.Array, pixel_ids: jnp.ndarray) -> jax.Array:
    """Per-ray keys from *global* pixel ids (shape [N]) — shard-invariant."""
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, pixel_ids)


def iter_uniforms(keys: jax.Array, iteration, n: int) -> jnp.ndarray:
    """Draw n uniforms in [0, 1) per ray for one wavefront iteration.

    keys: [N] per-ray keys. Returns [N, n] float32. Each (ray, iteration)
    pair gets an independent stream; the integrator consumes a fixed budget of
    n draws per iteration regardless of which draws a given lane actually
    uses (unused draws are free — threefry output is cheap and fully fused).
    """
    it_keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, iteration)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype=jnp.float32))(it_keys)


def pcg4d(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray):
    """PCG4D hash (Jarzynski & Olano, JCGT 2020): 4 x uint32 -> 4 x uint32.

    The integrator's inner-loop generator: a counter-based hash of
    (pixel id, seed/wave, iteration, salt) — the TPU-native analog of the
    reference's hash-reseeded pcg32 streams (random.hpp:93-95). ~20 vector ops
    for 4 outputs, fully fused by XLA into the wavefront loop; every draw is a
    pure function of global coordinates, so results are shard-invariant.
    """
    v0 = a.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v1 = b.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v2 = c.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v3 = d.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


# Largest float32 strictly below 1.0 — same clamp as the reference's
# uniform<float> (random.hpp:100-111: u32 * 2^-32 clamped to 1-eps).
_ONE_MINUS_EPS = float(np.float32(1.0 - 2.0 ** -24))


def _u32_to_uniform(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(v.astype(jnp.float32) * jnp.float32(2.0 ** -32), _ONE_MINUS_EPS)


def counter_uniforms(pixel_ids: jnp.ndarray, stream: jnp.ndarray, iteration, n: int):
    """n uniforms in [0,1) per lane, shape [N, n], from pure counters.

    pixel_ids: [N] int32/uint32 global pixel ids (shard-invariant lane key).
    stream: scalar uint32 mixing seed and wave.
    iteration: scalar OR per-lane [N] int32 draw counter (the integrator keys
    draws on each lane's own counter so the backward replay can re-consume
    a lane's stream independently of other lanes).
    """
    outs = []
    it = jnp.asarray(iteration).astype(jnp.uint32)
    for salt in range((n + 3) // 4):
        v = pcg4d(
            pixel_ids.astype(jnp.uint32),
            jnp.broadcast_to(jnp.uint32(stream), pixel_ids.shape),
            jnp.broadcast_to(it, pixel_ids.shape),
            jnp.full(pixel_ids.shape, jnp.uint32(salt)),
        )
        outs.extend(v)
    return jnp.stack([_u32_to_uniform(o) for o in outs[:n]], axis=-1)


def mix_stream(seed, wave) -> jnp.ndarray:
    """Mix (seed, wave) into the single uint32 stream word for counter_uniforms."""
    return (
        jnp.uint32(seed) * jnp.uint32(0x9E3779B9) + jnp.uint32(wave) * jnp.uint32(0x85EBCA6B)
    )


def sample_exponential(u: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Sample from pdf a*exp(-a*x): -log(1-u)/a (random.hpp:20-22)."""
    return -jnp.log1p(-u) / a


def sample_discrete3(w0, w1, w2, u):
    """Vectorized 3-way discrete sample by CDF inversion (random.hpp:30-47).

    Returns int32 index 0/1/2 choosing among weights (w0, w1, w2) — the
    reference draws events in the order (Null, Absorption, Scatter) with
    u scaled by the total weight, picking the first prefix sum >= u.
    """
    total = w0 + w1 + w2
    x = u * total
    idx = jnp.where(x <= w0, 0, jnp.where(x <= w0 + w1, 1, 2))
    return idx.astype(jnp.int32)
