"""Color space conversions (CIE XYZ -> sRGB) and film tonemapping.

Behavioral parity with the reference renderer's display path:
  - XYZ -> linear sRGB 3x3 matrix: /root/reference/include/vpt/color.hpp:8-16
  - linear sRGB -> sRGB gamma encode: /root/reference/include/vpt/color.hpp:18-30
  - film (XYZ accumulator, sample weight) -> u8 image:
    /root/reference/src/main.cpp:12-24

All functions are pure jnp and jit/vmap friendly; they operate on arrays whose
last axis is the 3 color channels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Standard CIE XYZ -> linear sRGB matrix (D65), identical constants to the
# reference (color.hpp:11-13).
XYZ_TO_LINSRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ],
    dtype=np.float32,
)


def xyz_to_linsrgb(xyz: jnp.ndarray) -> jnp.ndarray:
    """Convert CIE XYZ to linear sRGB. Last axis is the color axis."""
    return jnp.einsum("ij,...j->...i", jnp.asarray(XYZ_TO_LINSRGB), xyz)


def linsrgb_to_srgb(linsrgb: jnp.ndarray) -> jnp.ndarray:
    """Gamma-encode linear sRGB (IEC 61966-2-1 piecewise curve)."""
    x = linsrgb
    # Clamp the argument of the power to keep gradients finite at 0.
    safe = jnp.maximum(x, 1e-12)
    return jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * jnp.power(safe, 1.0 / 2.4) - 0.055,
    )


def film_to_srgb_u8(film: jnp.ndarray) -> jnp.ndarray:
    """Tonemap a film [H, W, 4] (XYZ sum, sample count) to a u8 [H, W, 3] image.

    Matches main.cpp:12-24: divide accumulated XYZ by the sample weight,
    convert to linear sRGB, gamma encode, clamp to [0, 1], scale to 255 and
    truncate (C-style float->u8 cast truncates toward zero).

    Pixels with zero weight (mid-wave previews before any sample landed)
    tonemap to black: the weight is floored at a tiny positive value so
    0/0 never produces NaN (NaN->u8 casting is implementation-defined and
    garbled the live preview during wave 1). Any real weight is >= 1, so
    the floor never changes a rendered pixel.
    """
    xyz = film[..., :3] / jnp.maximum(film[..., 3:4], 1e-30)
    srgb = linsrgb_to_srgb(xyz_to_linsrgb(xyz))
    return (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def film_to_xyz(film: jnp.ndarray) -> jnp.ndarray:
    """Mean XYZ image [H, W, 3] from a film [H, W, 4] accumulator."""
    return film[..., :3] / film[..., 3:4]
