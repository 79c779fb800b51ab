"""volume_path_tracer_tpu: a TPU-native differentiable volumetric path tracer.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
Shibodd/volume_path_tracer reference (an interactive multi-threaded CPU
spectral volumetric path tracer): delta-tracking (null-collision) transport
through density/temperature voxel grids with per-brick majorants, blackbody
spectral emission pre-integrated to CIE XYZ, Henyey-Greenstein scattering,
next-event estimation with ratio-tracking shadow rays, progressive wave
rendering — plus the capabilities the reference lacks: reverse-mode
differentiability w.r.t. the voxel grids and multi-chip/multi-host scaling
over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from .grids.grid import DenseGrid, dense_grid_from_array
from .grids.majorant import MajorantPyramid, build_majorants
from .models.camera import Camera
from .models.medium import Medium
from . import render  # callable subpackage: vpt.render(scene) forwards to renderer.render
from .render.integrator import IntegratorParams
from .render.renderer import Scene, render_wave_image
from .utils.config import Configuration, read_configuration

__all__ = [
    "DenseGrid",
    "dense_grid_from_array",
    "MajorantPyramid",
    "build_majorants",
    "Camera",
    "Medium",
    "IntegratorParams",
    "Scene",
    "render",
    "render_wave_image",
    "Configuration",
    "read_configuration",
]
