"""Shared deterministic scene fixtures for cross-process comparison tests."""
from volume_path_tracer_tpu.grids.procedural import fog_sphere
from volume_path_tracer_tpu.models.camera import Camera
from volume_path_tracer_tpu.models.medium import Medium
from volume_path_tracer_tpu.render.integrator import IntegratorParams
from volume_path_tracer_tpu.utils.config import CameraParameters


def small_scene(width: int = 32, height: int = 16):
    """A small wdas_cloud-like scattering scene, bitwise reproducible."""
    medium = Medium.from_grids(fog_sphere(radius=10.0, falloff=3.0), pack=False)
    camera = Camera.from_parameters(
        CameraParameters(
            position=(42.0, 0.0, 0.0),
            look=(0.0, 0.0, 0.0),
            up=(0.0, 1.0, 0.0),
            vfov_deg=40.0,
            imaging_ratio=0.1,
        ),
        (width, height),
    )
    params = IntegratorParams(
        sigma_a=0.0,
        sigma_s=0.15,
        hg_g=0.4,
        le_scale=0.0,
        temperature_offset=300.0,
        temperature_scale=40.0,
        infinite_xyz=(4.382, 3.509, 17.603),
        infinite_multiplier=0.14,
        distant_xyz=(0.95047, 1.0, 1.08883),
        distant_multiplier=50.0,
        distant_inv_direction=(0.5826, 0.7660, 0.2717),
        max_depth=100,
        max_iters=1024,
    )
    return medium, camera, params, width, height
