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

from ..grids.grid import DenseGrid, pack_corner_rows
from ..grids.majorant import MajorantPyramid, build_majorants
from ..utils.config import VolumeParameters


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    density: DenseGrid
    majorants: MajorantPyramid
    temperature: Optional[DenseGrid] = None
    # Corner-packed trilinear tables ([X*Y*Z, 8], see grid.pack_corner_rows):
    # the integrator's hot-path layout (one row-8 gather per sample instead of
    # eight strided element gathers — ~13x faster on TPU). Optional: None
    # falls back to the generic gather path (large volumes where 8x memory is
    # too much). Differentiable: rebuilt from the raw grids by pad/stack ops.
    density_rows: Optional[jnp.ndarray] = None
    temperature_rows: Optional[jnp.ndarray] = None

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
        return Medium(
            density=density,
            majorants=build_majorants(density, order=order),
            temperature=temperature,
            density_rows=pack_corner_rows(density.data) if pack else None,
            temperature_rows=(
                pack_corner_rows(temperature.data)
                if (pack and temperature is not None)
                else None
            ),
        )

    def with_density(self, density: DenseGrid) -> "Medium":
        """Replace density and rebuild majorants (inverse-rendering update path)."""
        return Medium(
            density=density,
            majorants=build_majorants(density),
            temperature=self.temperature,
            density_rows=(
                pack_corner_rows(density.data)
                if self.density_rows is not None
                else None
            ),
            temperature_rows=self.temperature_rows,
        )
