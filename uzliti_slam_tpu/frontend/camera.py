"""Pinhole camera model (replaces image_geometry::PinholeCameraModel use in
reference ``feature_extraction/src/feature_extraction_core.cpp:254-295``)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Pinhole intrinsics + Brown-Conrady distortion (plumb_bob, the
    sensor_msgs/CameraInfo model the reference's image_geometry consumes;
    rectification before feature/GIST work mirrors
    ``feature_extraction_core.cpp:123-135``). Zero coefficients = ideal
    pinhole; the projective helpers below assume a RECTIFIED image — run
    ``rectify_image``/``undistort_points`` first on raw distorted input.
    """
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0


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


def distort_normalized(cam: PinholeCamera, xn: jax.Array, yn: jax.Array):
    """Ideal normalized coords -> distorted normalized coords
    (Brown-Conrady radial k1,k2 + tangential p1,p2)."""
    r2 = xn * xn + yn * yn
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = xn * radial + 2.0 * cam.p1 * xn * yn + cam.p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + cam.p1 * (r2 + 2.0 * yn * yn) + 2.0 * cam.p2 * xn * yn
    return xd, yd


def undistort_points(
    cam: PinholeCamera, u: jax.Array, v: jax.Array, iterations: int = 5
):
    """Distorted pixel coords -> ideal (rectified) pixel coords by
    fixed-point inversion of the distortion model (cv::undistortPoints'
    iteration, expressed as a fixed-count fori_loop for XLA)."""
    xd = (u - cam.cx) / cam.fx
    yd = (v - cam.cy) / cam.fy

    def body(_, xy):
        x, y = xy
        ddx, ddy = distort_normalized(cam, x, y)
        return (x + (xd - ddx), y + (yd - ddy))

    x, y = jax.lax.fori_loop(0, iterations, body, (xd, yd))
    return x * cam.fx + cam.cx, y * cam.fy + cam.cy


def rectify_image(
    cam: PinholeCamera, img: jax.Array, nearest: bool = False
) -> jax.Array:
    """Undistort a full image: each RECTIFIED pixel samples the raw image
    at its distorted location (``image_proc`` rectification; the reference
    rectifies before GIST and feature extraction,
    ``feature_extraction_core.cpp:123-135``). ``nearest=True`` for depth
    images (bilinear would blend across depth discontinuities)."""
    h, w = img.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xn = (uu - cam.cx) / cam.fx
    yn = (vv - cam.cy) / cam.fy
    xd, yd = distort_normalized(cam, xn, yn)
    us = xd * cam.fx + cam.cx
    vs = yd * cam.fy + cam.cy
    if nearest:
        ui = jnp.clip(jnp.round(us), 0, w - 1).astype(jnp.int32)
        vi = jnp.clip(jnp.round(vs), 0, h - 1).astype(jnp.int32)
        return img[vi, ui]
    u0 = jnp.clip(jnp.floor(us), 0, w - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(vs), 0, h - 2).astype(jnp.int32)
    du = jnp.clip(us - u0, 0.0, 1.0)
    dv = jnp.clip(vs - v0, 0.0, 1.0)
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )


def backproject_image(cam: PinholeCamera, depth: jax.Array) -> jax.Array:
    """Dense depth image (H, W) -> cloud (H, W, 3) in camera frame."""
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return backproject(cam, uu, vv, depth)
