"""Pinhole camera with the reference's exact raster->world mapping.

Behavioral parity with the reference:
  - look-at basis (dir = normalize(look-pos), left = normalize(up) x dir,
    up' = dir x left): /root/reference/src/camera.cpp:5-18
  - raster [0,W]x[0,H] -> screen [-1,1]^2 with (0,0)->(1,1):
    /root/reference/src/camera.cpp:21-31
  - screen -> camera with film at z=1 scaled by (ar*tan(vfov/2), tan(vfov/2)):
    /root/reference/src/camera.cpp:33-43
  - generate_ray adds a +0.5 pixel-center offset plus jitter, then normalizes
    the world direction: /root/reference/include/vpt/camera.hpp:14-23
  - jitter amplitude is *half* a pixel (uniform^2 * 0.5) when enabled:
    /root/reference/src/worker.cpp:121-122 (preserved quirk, SURVEY.md 7.4)

TPU-first: the whole raster->world-direction map is precomposed on host into
one 3x3 matrix + translation; ray generation for a batch of pixels is a single
fused matmul + normalize, vectorized over every pixel of a wave.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import CameraParameters


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Precomposed camera: world ray = (position, normalize(M @ raster + t)).

    A pytree: the three transform arrays are leaves (traced through jit), the
    exposure multiplier is static metadata.
    """

    position: jnp.ndarray  # [3] float32
    raster_to_world_dir: jnp.ndarray  # [3, 3] float32 (acts on (x, y, 0))
    raster_to_world_trans: jnp.ndarray  # [3] float32
    imaging_ratio: float = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_parameters(p: CameraParameters, output_size) -> "Camera":
        width, height = int(output_size[0]), int(output_size[1])
        pos = np.asarray(p.position, dtype=np.float64)
        look = np.asarray(p.look, dtype=np.float64)
        up = np.asarray(p.up, dtype=np.float64)

        # camera_to_world look-at basis (camera.cpp:5-18)
        d = look - pos
        d = d / np.linalg.norm(d)
        un = up / np.linalg.norm(up)
        left = np.cross(un, d)
        new_up = np.cross(d, left)
        c2w = np.stack([left, new_up, d], axis=1)  # columns

        # screen_to_camera (camera.cpp:33-43): film plane at z=1
        ar = width / height
        vfov = np.pi * p.vfov_deg / 180.0
        tanv = np.tan(vfov / 2.0)
        s2c_lin = np.diag([ar * tanv, tanv, 0.0])
        s2c_t = np.array([0.0, 0.0, 1.0])

        # raster_to_screen (camera.cpp:21-31): (0,0)->(1,1), (W,H)->(-1,-1)
        r2s_lin = np.diag([-2.0 / width, -2.0 / height, 0.0])
        r2s_t = np.array([1.0, 1.0, 0.0])

        # Precompose: dir(raster) = c2w @ (s2c_lin @ (r2s_lin@raster + r2s_t) + s2c_t)
        lin = c2w @ s2c_lin @ r2s_lin
        trans = c2w @ (s2c_lin @ r2s_t + s2c_t)
        return Camera(
            position=jnp.asarray(pos, dtype=jnp.float32),
            raster_to_world_dir=jnp.asarray(lin, dtype=jnp.float32),
            raster_to_world_trans=jnp.asarray(trans, dtype=jnp.float32),
            imaging_ratio=float(p.imaging_ratio),
        )

    def generate_rays(self, raster_xy: jnp.ndarray, jitter: jnp.ndarray):
        """Batch ray generation.

        raster_xy: [N, 2] integer pixel coordinates (x, y).
        jitter: [N, 2] offsets already scaled by the caller (0 or uniform*0.5).
        Returns (origins [N, 3], directions [N, 3]) in world space, unit dirs.
        """
        pt = raster_xy.astype(jnp.float32) + 0.5 + jitter
        m = jnp.asarray(self.raster_to_world_dir)
        t = jnp.asarray(self.raster_to_world_trans)
        d = pt @ m[:, :2].T + t
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(jnp.asarray(self.position), d.shape)
        return o, d
