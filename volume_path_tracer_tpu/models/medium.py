"""Medium (participating volume) model: grids + majorants + coefficients.

Bundles what the reference spreads across VolumeGrids + Volume + VolumeParameters
(/root/reference/include/vpt/volume_grids.hpp:11-34, volume.hpp:78-100,
configuration.hpp:46-53) into one pytree:

  - density: DenseGrid (required, differentiable leaf)
  - temperature: DenseGrid or None (optional, differentiable leaf; missing
    temperature degrades to a non-emissive medium, volume_grids.cpp:43-45)
  - majorants: MajorantPyramid over density (control data, stop-gradient)

The scattering coefficients live in the static VolumeParameters (scene config)
and are closed over by the integrator: they select compiled-in code paths
(e.g. emission on/off) the same way the reference's config selects behavior.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..grids.grid import DenseGrid, pack_corner_rows
from ..grids.majorant import MajorantPyramid, build_majorants
from ..utils.config import VolumeParameters


def temperature_on_density_grid(
    density: DenseGrid, temperature: Optional[DenseGrid]
):
    """Temperature resampled onto the density grid's frame, or None.

    Returns [X+2, Y+2, Z+2] T with T[q + 1] = the temperature grid's value
    at density voxel coordinate q for q in -1..X per axis — the CORNER-TABLE
    extent (grid.corner_row_index covers base coords -1..X-1, whose corners
    reach -1..X) — an EXACT integer shift when the grids are
    alignment-compatible (same voxel size, integer index offset between
    frames; true for co-simulated volumes exported with one transform).
    Alignment makes every density cell's image in temperature index space
    exactly one temperature cell, so trilinear interpolation of these corner
    values equals the reference's own-transform temperature sample
    (worker.cpp:153-155) for EVERY collision point, including density
    boundary cells where an aligned temperature grid extends one voxel
    beyond the density extent (the one-voxel fringe zero-padding would
    otherwise mis-reproduce). It is what lets the emissive fused table carry
    temperature corners (pack_fused_rows) and the hot loop pay ZERO extra
    gathers for emission. Returns None for misaligned grids (callers fall
    back to the separate temperature-row gather).
    """
    if temperature is None:
        return None
    vd, vt = density.voxel_size, temperature.voxel_size
    if abs(vt - vd) > 1e-9 * max(vd, vt):
        return None
    delta = []
    for a in range(3):
        dw = (
            density.origin_ijk[a] * vd
            + density.world_offset[a]
            - temperature.world_offset[a]
        ) / vt - temperature.origin_ijk[a]
        r = round(dw)
        if abs(dw - r) > 1e-4:
            return None
        delta.append(int(r))
    X, Y, Z = density.shape
    tX, tY, tZ = temperature.shape
    # Extended coordinate e in 0..dim+1 maps to density coord q = e - 1 and
    # temperature index q + delta; values outside the temperature grid are
    # its true zero background.
    lo = [max(0, 1 - d) for d in delta]
    hi = [
        min(s + 2, ts + 1 - d)
        for s, ts, d in zip((X, Y, Z), (tX, tY, tZ), delta)
    ]
    out = jnp.zeros((X + 2, Y + 2, Z + 2), jnp.float32)
    if any(h <= l for l, h in zip(lo, hi)):
        return out  # disjoint bboxes: temperature is background 0 everywhere
    src = temperature.data[
        lo[0] - 1 + delta[0] : hi[0] - 1 + delta[0],
        lo[1] - 1 + delta[1] : hi[1] - 1 + delta[1],
        lo[2] - 1 + delta[2] : hi[2] - 1 + delta[2],
    ]
    return out.at[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]].set(src)


def pack_fused_rows(
    data: jnp.ndarray, pyr: MajorantPyramid, temp_on_density=None
) -> jnp.ndarray:
    """The integrator's hot-path table: [(X+1)(Y+1)(Z+1) + NB, 8 or 16].

    The trilinear corner rows (grid.pack_corner_rows, differentiable) followed
    by the per-brick majorant rows (brick majorant, superbrick majorant,
    zero-padded; stop-gradient). One table so the traversal loop's single
    data-dependent row gather serves both lane kinds — corners at row
    corner_row_index(voxel) for collision lanes, majorants at row
    R_corners + brick_flat for segment-crossing lanes. TPU gather cost is per
    ROW for widths up to 32 bytes (measured on v5e: row-1..row-8 f32 all
    ~1.0-1.1 ms per 64Ki gathers; 40+ byte rows cost ~1.5x), so fusing the two
    fetches into one gather halves the loop's dominant cost.

    temp_on_density (temperature_on_density_grid): when given, its corner
    rows ride columns 8..15 of the same table — 16-wide rows whose one
    (~1.5x) gather replaces the emissive path's separate temperature gather.
    It arrives PRE-PADDED over the corner extent (-1..X per axis) so the
    fringe corners carry the temperature grid's real values, not zeros.
    """
    # One jit region: built eagerly, the 8x corner table's intermediates
    # (scan output, reshape copy, concatenate operands) accumulate to ~3x
    # the table and OOM HBM at production scale (512^3 -> 4.3 GB table);
    # under jit the reshape is a bitcast and XLA frees intermediates.
    @jax.jit
    def _build(data_, rows_, temp_=None):
        corners = pack_corner_rows(data_)  # [(X+1)(Y+1)(Z+1), 8]
        if temp_ is not None:
            corners = jnp.concatenate(
                [corners, pack_corner_rows(temp_, padded=True)], axis=1
            )
        maj = jax.lax.stop_gradient(rows_)  # [NB, 2]
        majp = jnp.pad(maj, ((0, 0), (0, corners.shape[1] - maj.shape[1])))
        return jnp.concatenate([corners, majp], axis=0)

    if temp_on_density is not None:
        return _build(data, pyr.rows, temp_on_density)
    return _build(data, pyr.rows)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    density: DenseGrid
    majorants: MajorantPyramid
    temperature: Optional[DenseGrid] = None
    # Fused per-voxel rows ([(X+1)(Y+1)(Z+1) + NB, 8], see pack_fused_rows):
    # the integrator's hot-path layout — one row gather per wavefront
    # iteration fetches the 8 trilinear corners (rows < R_corners) OR the
    # brick/superbrick majorants (rows >= R_corners). Optional: None falls
    # back to the generic gather paths (large volumes where the ~8x memory
    # overhead is too much, and gradient renders, which re-trace from the raw
    # grid). Corner columns stay differentiable (built by pad/stack ops from
    # the raw grid); majorant columns are stop-gradient.
    density_rows: Optional[jnp.ndarray] = None
    temperature_rows: Optional[jnp.ndarray] = None  # [(...), 8] corner rows

    @property
    def has_temperature(self) -> bool:
        return self.temperature is not None

    @staticmethod
    def from_grids(
        density: DenseGrid,
        temperature: Optional[DenseGrid] = None,
        order: int = 1,
        pack: bool = True,
        fuse_temperature: bool = True,
    ) -> "Medium":
        """Build a medium, computing majorants (Volume ctor, volume.cpp:162-170).

        fuse_temperature: fold an alignment-compatible temperature grid into
        the fused rows (16-wide; see temperature_on_density_grid) so emissive
        tracing costs no extra gather. Misaligned grids pack the separate
        temperature corner rows regardless (the fallback gather path).
        """
        majorants = build_majorants(density, order=order)
        t_on_d = (
            temperature_on_density_grid(density, temperature)
            if (pack and fuse_temperature)
            else None
        )
        return Medium(
            density=density,
            majorants=majorants,
            temperature=temperature,
            density_rows=(
                pack_fused_rows(density.data, majorants, t_on_d)
                if pack
                else None
            ),
            temperature_rows=(
                pack_corner_rows(temperature.data)
                if (pack and temperature is not None)
                else None
            ),
        )

    def with_density(self, density: DenseGrid) -> "Medium":
        """Replace density and rebuild majorants (inverse-rendering update path)."""
        majorants = build_majorants(density)
        t_on_d = None
        if self.density_rows is not None and self.density_rows.shape[1] >= 16:
            t_on_d = temperature_on_density_grid(density, self.temperature)
        return Medium(
            density=density,
            majorants=majorants,
            temperature=self.temperature,
            density_rows=(
                pack_fused_rows(density.data, majorants, t_on_d)
                if self.density_rows is not None
                else None
            ),
            temperature_rows=self.temperature_rows,
        )
