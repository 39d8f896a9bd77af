"""Pinhole camera model (replaces image_geometry::PinholeCameraModel use in
reference ``feature_extraction/src/feature_extraction_core.cpp:254-295``)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int


def default_kinect() -> PinholeCamera:
    """Kinect-like VGA intrinsics (the reference's sensor)."""
    return PinholeCamera(
        fx=jnp.float32(525.0), fy=jnp.float32(525.0),
        cx=jnp.float32(319.5), cy=jnp.float32(239.5),
        width=640, height=480,
    )


def backproject(cam: PinholeCamera, u: jax.Array, v: jax.Array, depth: jax.Array) -> jax.Array:
    """(u, v, z) pixel coords + depth -> 3-D camera-frame points (..., 3).

    Pinhole lift, reference ``conversions.cpp:423-455`` / 3-D feature
    extraction ``feature_extraction_core.cpp:254-295``.
    """
    x = (u - cam.cx) / cam.fx * depth
    y = (v - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(cam: PinholeCamera, pts: jax.Array):
    """3-D camera-frame points (..., 3) -> (u, v, z)."""
    z = pts[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pts[..., 0] / zs * cam.fx + cam.cx
    v = pts[..., 1] / zs * cam.fy + cam.cy
    return u, v, z


def backproject_image(cam: PinholeCamera, depth: jax.Array) -> jax.Array:
    """Dense depth image (H, W) -> cloud (H, W, 3) in camera frame."""
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return backproject(cam, uu, vv, depth)
