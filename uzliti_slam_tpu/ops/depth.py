"""Depth-map refinement: joint bilateral filtering guided by intensity.

Replaces the reference's external DepthMapRefinement library (only
``jointBilateralFilter`` + ``jointNearestFilter`` are actually used,
``feature_extraction_service_node.cpp:133-149``) with static-window shift
stacks — (2r+1)² shifted adds that XLA fuses into one VPU loop, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifts(r: int):
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def _shift2d(img: jax.Array, dy: int, dx: int) -> jax.Array:
    h, w = img.shape
    out = jnp.zeros_like(img)
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[yd, xd].set(img[ys, xs])


def joint_bilateral_filter(
    depth: jax.Array,
    guide: jax.Array,
    radius: int = 2,
    sigma_space: float = 1.5,
    sigma_color: float = 10.0,
) -> jax.Array:
    """Smooth depth with weights from spatial distance × guide-image
    similarity × depth validity. Invalid (<=0 / non-finite) depths get
    filled from valid neighbours when any weight support exists."""
    valid = (depth > 0.0) & jnp.isfinite(depth)
    d = jnp.where(valid, depth, 0.0)
    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    for dy, dx in _shifts(radius):
        ws = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma_space**2))
        g = _shift2d(guide, -dy, -dx)
        wd = jnp.exp(-((g - guide) ** 2) / (2 * sigma_color**2))
        dv = _shift2d(d, -dy, -dx)
        vv = _shift2d(valid.astype(depth.dtype), -dy, -dx)
        w = ws * wd * vv
        num = num + w * dv
        den = den + w
    out = num / jnp.maximum(den, 1e-9)
    return jnp.where(den > 1e-6, out, 0.0)


def joint_nearest_filter(
    depth: jax.Array,
    refined: jax.Array,
    radius: int = 1,
) -> jax.Array:
    """Snap each refined depth back to the nearest original neighbour value
    (the reference's jointNearestFilter pass: keeps depth discontinuities
    crisp after bilateral smoothing)."""
    valid = (depth > 0.0) & jnp.isfinite(depth)
    best = jnp.full_like(depth, jnp.inf)
    out = jnp.zeros_like(depth)
    for dy, dx in _shifts(radius):
        dv = _shift2d(depth, -dy, -dx)
        vv = _shift2d(valid, -dy, -dx)
        dist = jnp.where(vv, jnp.abs(dv - refined), jnp.inf)
        take = dist < best
        best = jnp.where(take, dist, best)
        out = jnp.where(take, dv, out)
    return jnp.where(jnp.isfinite(best), out, 0.0)
