"""Dense voxel grids: the TPU-native replacement for NanoVDB sparse trees.

The reference stores volumes as NanoVDB trees and traverses them with pointer
chasing (HDDA over root/internal/leaf nodes). On TPU, pointer chasing is a
non-starter: we re-lay each grid out as a dense [X, Y, Z] float32 tensor in
HBM covering the active index bounding box, paired with a per-brick majorant
hierarchy (see majorant.py) that provides the same empty-space skipping the
VDB tree gave the reference at leaf (8^3) granularity.

Index/world transform parity (uniform scale + translation, the NanoVDB map
used by all reference assets):
  - indexToWorldF / worldToIndexF / worldToIndexDirF:
    /root/reference/src/volume.cpp:80,91,172-174
  - trilinear sampling at index coords with floor + fractional weights,
    background value 0 outside the active bbox, matching
    nanovdb::math::SampleFromVoxels<Acc, 1>
    (/root/reference/src/majorant_transmittance_sampler.cpp:59).

`DenseGrid` is a pytree whose only array leaf is the voxel data, so grids are
directly differentiable (inverse rendering optimizes `data`), shardable, and
donate-able; the transform is static metadata.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseGrid:
    """A dense voxel grid over the active index bbox of a (possibly sparse) volume.

    world = ijk * voxel_size + world_offset, with ijk in absolute index
    coordinates (same convention as NanoVDB's uniform-scale map). Voxel (i,j,k)
    of `data` holds the value at absolute index origin_ijk + (i,j,k).
    """

    data: jnp.ndarray  # [X, Y, Z] float32
    origin_ijk: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    voxel_size: float = dataclasses.field(metadata=dict(static=True))
    world_offset: Tuple[float, float, float] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def shape(self) -> Tuple[int, int, int]:
        return tuple(self.data.shape)

    # ---- transforms (host or traced) ----
    def world_to_index(self, p_world: jnp.ndarray) -> jnp.ndarray:
        off = jnp.asarray(self.world_offset, dtype=jnp.float32)
        return (p_world - off) / self.voxel_size

    def index_to_world(self, p_index: jnp.ndarray) -> jnp.ndarray:
        off = jnp.asarray(self.world_offset, dtype=jnp.float32)
        return p_index * self.voxel_size + off

    def world_to_index_dir_scale(self) -> float:
        """|worldToIndexDirF(unit dir)| = 1/voxel_size for uniform-scale maps.

        The reference's idx_to_world_scale (volume.cpp:91) is the reciprocal:
        one voxel unit of ray parameter equals `voxel_size` world units.
        """
        return 1.0 / self.voxel_size

    # ---- sampling ----
    def sample_trilinear(self, p_index: jnp.ndarray) -> jnp.ndarray:
        """Trilinear interpolation at absolute index coords p_index [..., 3].

        Out-of-bbox corners contribute the background value 0, matching the
        NanoVDB accessor's behavior for inactive/out-of-tree voxels.
        """
        local = p_index - jnp.asarray(self.origin_ijk, dtype=p_index.dtype)
        return sample_trilinear_local(self.data, local)

    def sample_nearest(self, ijk_abs: jnp.ndarray) -> jnp.ndarray:
        """Raw voxel fetch at absolute integer index coords [..., 3], 0 outside."""
        local = ijk_abs - jnp.asarray(self.origin_ijk, dtype=ijk_abs.dtype)
        return gather_voxels(self.data, local)


def gather_voxels(data: jnp.ndarray, ijk: jnp.ndarray) -> jnp.ndarray:
    """Gather voxels at integer local coords ijk [..., 3]; 0 outside the array.

    Implemented as one flat gather (XLA lowers this to a single TPU gather):
    indices are clamped and a validity mask zeroes out-of-range lanes.
    """
    X, Y, Z = data.shape
    i, j, k = ijk[..., 0], ijk[..., 1], ijk[..., 2]
    valid = (
        (i >= 0) & (i < X) & (j >= 0) & (j < Y) & (k >= 0) & (k < Z)
    )
    ic = jnp.clip(i, 0, X - 1)
    jc = jnp.clip(j, 0, Y - 1)
    kc = jnp.clip(k, 0, Z - 1)
    flat_idx = (ic * Y + jc) * Z + kc
    vals = jnp.take(data.reshape(-1), flat_idx.reshape(-1), mode="clip").reshape(
        flat_idx.shape
    )
    return jnp.where(valid, vals, 0.0)


def sample_trilinear_local(data: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of `data` [X,Y,Z] at float local coords p [..., 3]."""
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0.astype(p.dtype)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    # Gather the 8 corners as a single batched gather of shape [..., 8].
    offsets = jnp.array(
        [
            [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
            [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
        ],
        dtype=jnp.int32,
    )
    corners = i0[..., None, :] + offsets  # [..., 8, 3]
    v = gather_voxels(data, corners)  # [..., 8]

    wx0, wx1 = 1.0 - fx, fx
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz
    return (
        v[..., 0] * wx0 * wy0 * wz0
        + v[..., 1] * wx0 * wy0 * wz1
        + v[..., 2] * wx0 * wy1 * wz0
        + v[..., 3] * wx0 * wy1 * wz1
        + v[..., 4] * wx1 * wy0 * wz0
        + v[..., 5] * wx1 * wy0 * wz1
        + v[..., 6] * wx1 * wy1 * wz0
        + v[..., 7] * wx1 * wy1 * wz1
    )


def pack_corner_rows(data: jnp.ndarray, padded: bool = False) -> jnp.ndarray:
    """Corner-packed layout: row i of the result holds the 2x2x2 neighborhood
    of voxel i (flat order), i.e. the 8 trilinear corners, contiguously.

    TPU gathers fetch whole minor-dimension tiles; a single row-8 gather from
    this layout is ~13x faster on TPU than eight strided element gathers from
    the raw [X,Y,Z] array (measured on v5e). Costs 8x memory — used for the
    integrator's hot path; the raw array remains the source of truth.

    The table covers base coords -1..dim-1 per axis (shape [(X+1)(Y+1)(Z+1),
    8]), so every query point in [-1, dim] interpolates with correct zero
    background, matching the generic gather path for ALL inputs.

    padded=True: `data` already carries values at coords -1..dim per axis
    (shape [X+2, Y+2, Z+2]) and is used as-is instead of zero-padding — the
    fused temperature fold supplies real values for the one-voxel fringe
    where an aligned temperature grid extends beyond the density extent
    (medium.temperature_on_density_grid).
    """
    if padded:
        X, Y, Z = (s - 2 for s in data.shape)
        p = data
    else:
        X, Y, Z = data.shape
        p = jnp.pad(data, ((1, 1), (1, 1), (1, 1)))
    R = (Y + 1) * (Z + 1)
    table_bytes = (X + 1) * R * 8 * 4

    # Small grids (inverse-rendering training rebuilds the table EVERY step):
    # one all-at-once stack of the 8 shifted slices — a single fused XLA op,
    # ~5x faster than the scan below, at a ~3x-table peak-memory cost that
    # only matters at production scale.
    if table_bytes <= 128 * 2 ** 20:
        corners = jnp.stack(
            [
                p[dx : dx + X + 1, dy : dy + Y + 1, dz : dz + Z + 1]
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=-1,
        )
        return corners.reshape(-1, 8)

    # Large grids: built one X-slab at a time under a scan — the all-at-once
    # stack+reshape materializes several full-table temporaries, which OOMs
    # HBM at production scale (512^3 -> 4.3 GB table; peak was ~3x that).
    # The scan allocates the output once and stays reverse-differentiable
    # (the corner table is the differentiable path for packed training).
    def slab(_, i):
        corners = jnp.stack(
            [
                jax.lax.dynamic_slice(p, (i + dx, dy, dz), (1, Y + 1, Z + 1))[0]
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=-1,
        )
        return None, corners.reshape(R, 8)

    _, rows = jax.lax.scan(slab, None, jnp.arange(X + 1))
    return rows.reshape(-1, 8)


def corner_row_index(shape, i0: jnp.ndarray):
    """(row index, validity) of base coord i0 [..., 3] in a corner-packed table.

    Rows cover base coords -1..dim-1 per axis; out-of-range coords clamp (the
    caller masks with `valid`).
    """
    X, Y, Z = shape
    valid = (
        (i0[..., 0] >= -1) & (i0[..., 0] <= X - 1)
        & (i0[..., 1] >= -1) & (i0[..., 1] <= Y - 1)
        & (i0[..., 2] >= -1) & (i0[..., 2] <= Z - 1)
    )
    r = jnp.clip(i0 + 1, 0, jnp.asarray([X, Y, Z], jnp.int32))
    base = (r[..., 0] * (Y + 1) + r[..., 1]) * (Z + 1) + r[..., 2]
    return base, valid


def trilinear_weights(f: jnp.ndarray) -> jnp.ndarray:
    """The 8 corner weights [..., 8] for fractional coords f [..., 3], in the
    same corner order as pack_corner_rows (z fastest)."""
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    return jnp.stack(
        [
            gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
            fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
        ],
        axis=-1,
    )


def sample_trilinear_rows(
    rows: jnp.ndarray, shape, p: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear sample from a corner-packed table at local coords p [..., 3].

    Bitwise-equivalent semantics to sample_trilinear_local (zero background
    outside the volume) for any query point; one row gather per sample. Rows
    wider than 8 (fused tables carrying extra per-voxel data) are allowed —
    only the first 8 columns (the corners) are used.
    """
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0.astype(p.dtype)
    base, valid = corner_row_index(shape, i0)
    v = jnp.take(rows, base, axis=0, mode="clip")[..., :8]
    w = trilinear_weights(f)
    return jnp.where(valid, jnp.sum(v * w, axis=-1), 0.0)


def dense_grid_from_array(
    data: np.ndarray,
    origin_ijk=(0, 0, 0),
    voxel_size: float = 1.0,
    world_offset=(0.0, 0.0, 0.0),
) -> DenseGrid:
    return DenseGrid(
        data=jnp.asarray(data, dtype=jnp.float32),
        origin_ijk=tuple(int(v) for v in origin_ijk),
        voxel_size=float(voxel_size),
        world_offset=tuple(float(v) for v in world_offset),
    )
