"""Per-brick majorant hierarchy: the TPU replacement for VDB leaf maxima + HDDA.

The reference gets empty-space skipping from the VDB tree: per-leaf (8^3)
maxima patched at startup to cover the trilinear interpolation halo
(fix_majorants_for_interpolation, /root/reference/src/volume.cpp:104-160) and
walked with a hierarchical DDA (volume.cpp:38-76).

TPU-native equivalent: a max-pool pyramid over the dense grid.
  - level 0 (brick, 8^3 voxels): max over each brick *plus a 1-voxel halo*
    (exactly the invariant the reference establishes per leaf, here for every
    brick including the implicit upper-tile regions the reference's TODO at
    volume.cpp:105-107 leaves unfixed — our majorants are valid everywhere).
  - level 1 (superbrick, 8^3 bricks = 64^3 voxels): max over brick majorants,
    used by the traversal loop to take giant steps through empty space.

Both levels are one `lax.reduce_window` each — a single fused XLA op — and are
recomputed from the (stop-gradient'd) density whenever it changes during
inverse rendering; majorants are control data, never differentiated through.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .grid import DenseGrid

BRICK = 8  # voxels per brick edge, mirroring the VDB leaf DIM (volume.hpp:29)
SUPER = 8  # bricks per superbrick edge


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MajorantPyramid:
    """Majorant max-pyramid over a DenseGrid.

    brick_maj[b] >= trilinear density everywhere inside brick b (halo-corrected)
    super_maj[s] >= brick_maj over the superbrick s.
    Brick (i,j,k) covers absolute index coords origin_ijk + [8i, 8i+8) etc.
    """

    brick_maj: jnp.ndarray  # [BX, BY, BZ] float32
    super_maj: jnp.ndarray  # [SX, SY, SZ] float32
    # Packed per-brick rows [BX*BY*BZ, 2]: (brick majorant, superbrick
    # majorant) — one row-2 gather fetches both levels in the traversal loop
    # (TPU row gathers are far cheaper than two element gathers).
    rows: jnp.ndarray
    origin_ijk: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def brick_shape(self) -> Tuple[int, int, int]:
        return tuple(self.brick_maj.shape)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def build_majorants(grid: DenseGrid, order: int = 1, bloat: float = 0.0) -> MajorantPyramid:
    """Build the majorant pyramid for a density grid.

    order: interpolation stencil halo in voxels (1 for trilinear), as in
    fix_majorants_for_interpolation(density, 1) at volume.cpp:169.
    Jittable; gradients are cut (majorants are bounds, not integrands).

    bloat: multiplicative slack (1 + bloat) applied to nonzero majorants.
    Forward rendering wants bloat=0 (fewest collisions). *Gradient* rendering
    needs bloat > 0: where the majorant exactly equals the local density the
    null-collision probability is 0, escaping paths see no collisions at all,
    and the score-function gradient estimator degenerates to zero while the
    true transmittance gradient does not. A strictly positive p_null keeps
    the gradient measure absolutely continuous (detached-majorant
    differentiable delta tracking).
    """
    data = jax.lax.stop_gradient(grid.data)
    X, Y, Z = data.shape
    bx, by, bz = _ceil_div(X, BRICK), _ceil_div(Y, BRICK), _ceil_div(Z, BRICK)

    # Brick max with halo: window BRICK + 2*order, stride BRICK, padded so that
    # window b covers voxels [BRICK*b - order, BRICK*(b+1) - 1 + order].
    # Out-of-array voxels are background 0 (identity for max of nonneg fields;
    # we still use -inf init and clamp below to support general data).
    #
    # Computed SEPARABLY — one 1-D reduce_window per axis — because max over
    # a rectangular window factors exactly across axes: the fused 3-D window
    # costs win^3 compares per output where the separable form costs 3*win
    # (and inverse-rendering training rebuilds majorants EVERY step; the 3-D
    # reduce_window was ~40% of the per-step medium rebuild).
    win = BRICK + 2 * order
    pad_lo = order
    pad_hi = [bx * BRICK - X + order, by * BRICK - Y + order, bz * BRICK - Z + order]
    brick = data
    for axis, ph in enumerate(pad_hi):
        wd, ws, pd = [1, 1, 1], [1, 1, 1], [(0, 0)] * 3
        wd[axis], ws[axis], pd[axis] = win, BRICK, (pad_lo, ph)
        brick = jax.lax.reduce_window(
            brick, -jnp.inf, jax.lax.max,
            window_dimensions=tuple(wd), window_strides=tuple(ws), padding=pd,
        )
    # Padding lanes contribute -inf; background outside the bbox is 0, and the
    # density field itself is non-negative, so clamp at 0.
    brick = jnp.maximum(brick, 0.0)
    if bloat:
        brick = brick * (1.0 + bloat)

    sx, sy, sz = _ceil_div(bx, SUPER), _ceil_div(by, SUPER), _ceil_div(bz, SUPER)
    sup = jax.lax.reduce_window(
        brick,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(SUPER, SUPER, SUPER),
        window_strides=(SUPER, SUPER, SUPER),
        padding=[
            (0, sx * SUPER - bx),
            (0, sy * SUPER - by),
            (0, sz * SUPER - bz),
        ],
    )
    sup = jnp.maximum(sup, 0.0)

    # Per-brick packed rows: duplicate each superbrick value over its bricks.
    sup_per_brick = jnp.repeat(
        jnp.repeat(jnp.repeat(sup, SUPER, 0), SUPER, 1), SUPER, 2
    )[:bx, :by, :bz]
    rows = jnp.stack([brick.reshape(-1), sup_per_brick.reshape(-1)], axis=-1)

    return MajorantPyramid(
        brick_maj=brick, super_maj=sup, rows=rows, origin_ijk=grid.origin_ijk
    )


def brick_majorant_reference(data, order: int = 1):
    """Direct nested-loop computation of the halo-corrected brick max.

    Used by unit tests to validate build_majorants against an
    independently-computed answer.
    """
    import numpy as np

    data = np.asarray(data)
    X, Y, Z = data.shape
    bx, by, bz = _ceil_div(X, BRICK), _ceil_div(Y, BRICK), _ceil_div(Z, BRICK)
    out = np.zeros((bx, by, bz), dtype=np.float32)
    for i in range(bx):
        for j in range(by):
            for k in range(bz):
                x0, x1 = i * BRICK - order, (i + 1) * BRICK + order
                y0, y1 = j * BRICK - order, (j + 1) * BRICK + order
                z0, z1 = k * BRICK - order, (k + 1) * BRICK + order
                sl = data[
                    max(0, x0) : min(X, x1),
                    max(0, y0) : min(Y, y1),
                    max(0, z0) : min(Z, z1),
                ]
                out[i, j, k] = max(0.0, sl.max() if sl.size else 0.0)
    return out
