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


def pack_fused_rows(data: jnp.ndarray, pyr: MajorantPyramid) -> jnp.ndarray:
    """The integrator's hot-path table: [(X+1)(Y+1)(Z+1) + NB, 8].

    The trilinear corner rows (grid.pack_corner_rows, differentiable) followed
    by the per-brick majorant rows (brick majorant, superbrick majorant,
    zero-padded; stop-gradient). One table so the traversal loop's single
    data-dependent row gather serves both lane kinds — corners at row
    corner_row_index(voxel) for collision lanes, majorants at row
    R_corners + brick_flat for segment-crossing lanes. TPU gather cost is per
    ROW for widths up to 32 bytes (measured on v5e: row-1..row-8 f32 all
    ~1.0-1.1 ms per 64Ki gathers; 40+ byte rows cost ~1.5x), so fusing the two
    fetches into one gather halves the loop's dominant cost.
    """
    # One jit region: built eagerly, the 8x corner table's intermediates
    # (scan output, reshape copy, concatenate operands) accumulate to ~3x
    # the table and OOM HBM at production scale (512^3 -> 4.3 GB table);
    # under jit the reshape is a bitcast and XLA frees intermediates.
    @jax.jit
    def _build(data_, rows_):
        corners = pack_corner_rows(data_)  # [(X+1)(Y+1)(Z+1), 8]
        maj = jax.lax.stop_gradient(rows_)  # [NB, 2]
        majp = jnp.pad(maj, ((0, 0), (0, corners.shape[1] - maj.shape[1])))
        return jnp.concatenate([corners, majp], axis=0)

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
    ) -> "Medium":
        """Build a medium, computing majorants (Volume ctor, volume.cpp:162-170)."""
        majorants = build_majorants(density, order=order)
        return Medium(
            density=density,
            majorants=majorants,
            temperature=temperature,
            density_rows=pack_fused_rows(density.data, majorants) if pack else None,
            temperature_rows=(
                pack_corner_rows(temperature.data)
                if (pack and temperature is not None)
                else None
            ),
        )

    def with_density(self, density: DenseGrid) -> "Medium":
        """Replace density and rebuild majorants (inverse-rendering update path)."""
        majorants = build_majorants(density)
        return Medium(
            density=density,
            majorants=majorants,
            temperature=self.temperature,
            density_rows=(
                pack_fused_rows(density.data, majorants)
                if self.density_rows is not None
                else None
            ),
            temperature_rows=self.temperature_rows,
        )
