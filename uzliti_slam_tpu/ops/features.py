"""Batched ORB-style feature detection and description, array-native.

TPU-first re-design of the reference front-end
(``feature_extraction/src/feature_extraction_core.cpp``: AORB = tunable-
threshold FAST + oriented BRIEF over a pyramid, grid-adapted, response-
sorted). Everything here is static-shaped: a fixed budget of K keypoints
with validity masks, so detection/description fuse into one XLA program and
vmap over camera batches.

No OpenCV tables are used: the BRIEF sampling pattern is generated from a
fixed PRNG seed (steered-BRIEF construction), which preserves the
*capability* (256-bit rotation-compensated binary descriptors matched by
Hamming distance) without copying any reference pattern data.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


# FAST circle of radius 3 (Bresenham), 16 offsets in clockwise order.
_FAST_OFFSETS = jnp.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=jnp.int32,
)  # (dy, dx) pairs


class Keypoints(NamedTuple):
    uv: jax.Array        # (K, 2) float32 pixel coords (u=x, v=y)
    response: jax.Array  # (K,)
    angle: jax.Array     # (K,) orientation in radians
    scale: jax.Array     # (K,) pyramid scale factor applied to uv
    valid: jax.Array     # (K,) bool


def _shift2d(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift with zero padding (static shifts -> pure XLA slices)."""
    h, w = img.shape
    out = jnp.zeros_like(img)
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[yd, xd].set(img[ys, xs])


def fast_score(
    img: jax.Array,
    threshold: float = 20.0,
    bounds: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """FAST-9/16 corner response map.

    Segment test: ≥9 contiguous circle pixels all brighter (or all darker)
    than center ± threshold. Score = sum of absolute differences over the
    brighter/darker circle pixels (AORB's tunable-threshold FAST,
    ``external/aorb/aorb.cpp``). Runs as 16 static shifts + cumsum window
    reduction — no gathers, fully fused on the VPU.

    ``bounds``: optional traced (h_real, w_real) when ``img`` is a padded
    canvas (the batched-pyramid path) — the interior/border suppression
    then clips to the REAL region, so padding can never spawn keypoints.
    """
    offs = [(int(dy), int(dx)) for dy, dx in _FAST_OFFSETS.tolist()]
    ring = jnp.stack([_shift2d(img, -dy, -dx) for (dy, dx) in offs])  # (16,H,W)
    diff = ring - img[None]
    brighter = diff > threshold
    darker = diff < -threshold

    def contiguous9(mask):
        # wraparound window-of-9 all-true test by AND-doubling on booleans:
        # a_k[i] = AND(mask[i..i+2^k-1]); win9 = a_8 & mask[i+8]. Four
        # rolled ANDs on (16,H,W) bools — much cheaper on the VPU than the
        # previous int32 cumsum over a 24-long tiled axis.
        a = mask & jnp.roll(mask, -1, axis=0)          # runs of 2
        a = a & jnp.roll(a, -2, axis=0)                # runs of 4
        a = a & jnp.roll(a, -4, axis=0)                # runs of 8
        win9 = a & jnp.roll(mask, -8, axis=0)          # runs of 9
        return jnp.any(win9, axis=0)

    is_corner = contiguous9(brighter) | contiguous9(darker)
    score_b = jnp.sum(jnp.where(brighter, diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(darker, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)

    # suppress borders: the rotated BRIEF pattern reaches 13·√2 ≈ 18.4 px
    # plus the blur radius, so anything closer would sample (extrapolate)
    # outside the image
    h, w = img.shape
    h_real, w_real = (h, w) if bounds is None else bounds
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    b = 21
    interior = (yy >= b) & (yy < h_real - b) & (xx >= b) & (xx < w_real - b)
    return jnp.where(is_corner & interior, score, 0.0)


def nms(score: jax.Array, radius: int = 1) -> jax.Array:
    """3x3 (or (2r+1)²) non-maximum suppression via max pooling."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return jnp.where((score == pooled) & (score > 0), score, 0.0)


def select_topk_grid(
    score: jax.Array, k_total: int, grid: int = 4
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Grid-adapted top-K selection (reference GridAdaptedFeatureDetector +
    response sort, ``feature_extraction_core.cpp:93-102``): the per-cell
    budget spreads keypoints across the image.

    Returns (uv (K,2) float, response (K,), valid (K,)).
    """
    h, w = score.shape
    gh, gw = h // grid, w // grid
    k_cell = max(k_total // (grid * grid), 1)
    # crop to multiple of grid, reshape into cells
    sc = score[: gh * grid, : gw * grid].reshape(grid, gh, grid, gw)
    sc = sc.transpose(0, 2, 1, 3).reshape(grid * grid, gh * gw)
    # approx_max_k lowers to the TPU-optimized PartialReduce op (Chern et
    # al. 2022) instead of a full sort; recall≈0.95 only reshuffles which
    # near-tied corners are kept — selection here is heuristic anyway
    # (exact top_k kept the keyframe front-end measurably slower)
    vals, idx = jax.lax.approx_max_k(sc, k_cell)  # per cell
    cy = idx // gw
    cx = idx % gw
    gy = (jnp.arange(grid * grid) // grid)[:, None]
    gx = (jnp.arange(grid * grid) % grid)[:, None]
    ys = gy * gh + cy
    xs = gx * gw + cx
    uv = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)
    resp = vals.reshape(-1)
    valid = resp > 0

    # keep global top k_total by response (static shape)
    n = uv.shape[0]
    if n > k_total:
        top_vals, top_idx = jax.lax.top_k(jnp.where(valid, resp, -1.0), k_total)
        uv = uv[top_idx]
        resp = top_vals
        valid = top_vals > 0
    elif n < k_total:
        pad = k_total - n
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2))])
        resp = jnp.concatenate([resp, jnp.zeros(pad)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, dtype=bool)])
    return uv, resp, valid


def _sep_blur(img: jax.Array, radius: int = 2) -> jax.Array:
    """Separable box blur (descriptor pre-smoothing, as ORB's GaussianBlur).

    reduce_window additions instead of 1-channel convolutions — single-
    channel NCHW convs hit a slow path on TPU, a windowed sum stays on the
    VPU."""
    k = 2 * radius + 1
    s = jax.lax.reduce_window(img, 0.0, jax.lax.add, (1, k), (1, 1), "SAME")
    s = jax.lax.reduce_window(s, 0.0, jax.lax.add, (k, 1), (1, 1), "SAME")
    return s * (1.0 / (k * k))


def intensity_centroid_angles(img: jax.Array, uv: jax.Array, radius: int = 7) -> jax.Array:
    """Orientation per keypoint by the intensity-centroid method (ORB's
    IC_Angle): angle = atan2(m01, m10) over a circular patch.

    Patches are gathered with dynamic_slice (vmapped); patch size is
    static (2r+1)².
    """
    k = 2 * radius + 1
    dy = jax.lax.broadcasted_iota(jnp.float32, (k, k), 0) - radius
    dx = jax.lax.broadcasted_iota(jnp.float32, (k, k), 1) - radius
    circ = (dx * dx + dy * dy) <= radius * radius
    h, w = img.shape
    imf = img.reshape(-1)

    # one linearized gather of all K patches ((K,k,k) flat indices) — the
    # vmapped dynamic_slice version lowered to K separate row gathers
    y0 = jnp.clip(uv[:, 1].astype(jnp.int32) - radius, 0, h - k)
    x0 = jnp.clip(uv[:, 0].astype(jnp.int32) - radius, 0, w - k)
    yy = y0[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 1)
    xx = x0[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (1, k, k), 2)
    patches = jnp.take(imf, yy * w + xx) * circ[None]
    m01 = jnp.sum(dy[None] * patches, axis=(1, 2))
    m10 = jnp.sum(dx[None] * patches, axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_pattern(n_bits: int = 256, patch_radius: int = 13, seed: int = 1234) -> jax.Array:
    """Fixed steered-BRIEF sampling pattern: (n_bits, 2, 2) int offsets
    drawn from a clipped Gaussian (BRIEF-G II construction). Deterministic
    across runs; NOT copied from any library table."""
    key = jax.random.PRNGKey(seed)
    pts = jnp.clip(
        jnp.round(jax.random.normal(key, (n_bits, 2, 2)) * patch_radius / 2.5),
        -patch_radius, patch_radius,
    )
    return pts.astype(jnp.float32)


def brisk_pattern(n_bits: int = 256, patch_radius: int = 13) -> jax.Array:
    """BRISK-style deterministic sampling pattern: points on concentric
    rings (staggered), paired by SHORT distance — the second binary family
    of the reference's descriptor factory
    (``feature_extraction_core.cpp:51-85``: BRIEF/ORB/BRISK/FREAK selection;
    BRISK reference: Leutenegger et al., ICCV 2011). Geometry is generated
    here from the published ring construction, not copied from any table.

    Returns (n_bits, 2, 2) float offsets compatible with
    ``brief_descriptors``'s pattern argument (same steering + sampling).
    """
    import numpy as np

    rings = [(0.0, 1), (0.25, 8), (0.45, 12), (0.7, 16), (1.0, 20)]
    pts = []
    for ri, (rfrac, n) in enumerate(rings):
        r = rfrac * patch_radius
        for i in range(n):
            th = 2.0 * np.pi * i / n + (np.pi / n) * (ri % 2)
            pts.append((r * np.cos(th), r * np.sin(th)))
    pts = np.asarray(pts, dtype=np.float32)  # (57, 2)
    # short-distance pairs (BRISK's descriptor set): all pairs sorted by
    # distance, ties broken by index order; take the n_bits shortest
    # non-degenerate ones
    ii, jj = np.triu_indices(len(pts), k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=-1)
    order = np.argsort(d, kind="stable")
    sel = order[:n_bits]
    pat = np.stack([pts[ii[sel]], pts[jj[sel]]], axis=-2)  # (n_bits, 2, 2)
    return jnp.asarray(pat)


def freak_pattern(n_bits: int = 256, patch_radius: int = 13) -> jax.Array:
    """FREAK-style retinal sampling pattern — the third binary family of the
    reference's descriptor factory (``feature_extraction_core.cpp:51-85``;
    FREAK reference: Alahi et al., CVPR 2012). Receptive fields sit on
    concentric rings whose radii grow geometrically outward (retinal
    topology: dense fovea, sparse periphery) and pairs are taken LONGEST
    distance first — the coarse-to-fine comparison order FREAK's cascade
    uses, and the opposite pairing rule from :func:`brisk_pattern`'s short
    pairs. Geometry generated from the published retinal construction, not
    copied from any table.

    Returns (n_bits, 2, 2) float offsets for ``brief_descriptors``.
    """
    import numpy as np

    n_rings = 7
    pts = [(0.0, 0.0)]  # fovea center
    for ri in range(n_rings):
        # geometric radius progression: dense center, sparse periphery
        r = patch_radius * (2.0 ** (ri + 1) - 1.0) / (2.0 ** n_rings - 1.0)
        n = 6
        for i in range(n):
            th = 2.0 * np.pi * i / n + (np.pi / n) * (ri % 2)
            pts.append((r * np.cos(th), r * np.sin(th)))
    pts = np.asarray(pts, dtype=np.float32)  # (43, 2)
    ii, jj = np.triu_indices(len(pts), k=1)
    d = np.linalg.norm(pts[ii] - pts[jj], axis=-1)
    order = np.argsort(-d, kind="stable")  # longest (coarsest) pairs first
    sel = order[:n_bits]
    pat = np.stack([pts[ii[sel]], pts[jj[sel]]], axis=-2)  # (n_bits, 2, 2)
    return jnp.asarray(pat)


_DEFAULT_PATTERN = brief_pattern()
_BRISK_PATTERN = brisk_pattern()
_FREAK_PATTERN = freak_pattern()

_PATTERNS = {
    "brief": _DEFAULT_PATTERN,
    "brisk": _BRISK_PATTERN,
    "freak": _FREAK_PATTERN,
}


def brief_descriptors(
    img: jax.Array,
    uv: jax.Array,
    angles: jax.Array,
    pattern: jax.Array | None = None,
) -> jax.Array:
    """Rotation-steered BRIEF: 256 pairwise intensity tests per keypoint,
    pattern rotated by the keypoint angle, bilinear sampling on the smoothed
    image. Returns (K, 32) uint8 packed descriptors."""
    if pattern is None:
        pattern = _DEFAULT_PATTERN
    sm = _sep_blur(img, 2)
    h, w = img.shape

    ca = jnp.cos(angles)
    sa = jnp.sin(angles)
    # rotate pattern offsets per keypoint: (K, n_bits, 2, 2)
    px = pattern[None, :, :, 0]
    py = pattern[None, :, :, 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    sx = uv[:, None, None, 0] + rx
    sy = uv[:, None, None, 1] + ry

    smf = sm.reshape(-1)

    def sample(ys, xs):
        # nearest-pixel sampling on the smoothed image, as ORB's
        # GET_VALUE(cvRound) — one LINEARIZED gather (row-major flat index)
        # instead of a 2-D gather: a flat 1-D take lowers to the fast
        # dynamic-gather path on TPU
        xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
        return jnp.take(smf, yi * w + xi)

    va = sample(sy[..., 0], sx[..., 0])
    vb = sample(sy[..., 1], sx[..., 1])
    bits = (va < vb).astype(jnp.uint8)  # (K, 256)
    from uzliti_slam_tpu.ops import matching
    return matching.pack_bits(bits)  # single LSB-first layout for Hamming


@partial(jax.jit, static_argnames=(
    "max_keypoints", "grid", "n_levels", "scale_factor", "descriptor"
))
def detect_and_describe(
    img: jax.Array,
    max_keypoints: int = 300,
    threshold: float = 20.0,
    grid: int = 4,
    n_levels: int = 4,
    scale_factor: float = 1.2,
    descriptor: str = "brief",
):
    """Full ORB-equivalent pipeline over an image pyramid.

    Returns (Keypoints, descriptors (K, 32) uint8) with K == max_keypoints
    EXACTLY (per-level budgets floor-divide and the remainder is padded
    with invalid slots, so callers can size banks to max_keypoints without
    divisibility constraints; reference default 300 features,
    ``FeatureExtraction.cfg:11``). Keypoint uv are in level-0 pixels.

    ``descriptor`` selects the family — binary "brief" (steered random
    pairs), "brisk" (ring-pattern short pairs), "freak" (retinal long
    pairs), or float "sift" (gradient-histogram, (K, 128) float32 matched
    by L2) — the reference's descriptor-type factory
    (``feature_extraction_core.cpp:51-85``, enums ``Features.msg:1-15``).
    Binary families yield 256-bit packed descriptors matched by the same
    Hamming path.
    """
    if descriptor == "sift":
        pattern = None
    elif descriptor in _PATTERNS:
        pattern = _PATTERNS[descriptor]
    else:
        raise ValueError(f"unknown descriptor family {descriptor!r}")
    img = img.astype(jnp.float32)
    k_level = max(max_keypoints // n_levels, 1)

    def one_level(canvas, h_real, w_real):
        score = nms(fast_score(canvas, threshold, bounds=(h_real, w_real)))
        uv, resp, valid = select_topk_grid(score, k_level, grid)
        ang = intensity_centroid_angles(canvas, uv)
        if descriptor == "sift":
            d = sift_descriptors(canvas, uv, ang)
        else:
            d = brief_descriptors(canvas, uv, ang, pattern)
        return uv, resp, ang, valid, d

    # Sequential pyramid: each level's arrays shrink by scale_factor², so
    # the total pixel work is ~2.5x one level (a level-batched padded-
    # canvas variant was measured SLOWER on TPU: the padding waste on
    # fast_score's per-pixel compute outweighs the op-count savings).
    all_out = []
    cur = img
    scale = 1.0
    for lvl in range(n_levels):
        h_l, w_l = cur.shape
        uv, resp, ang, valid, d = one_level(cur, jnp.int32(h_l), jnp.int32(w_l))
        all_out.append((uv * scale, resp, ang,
                        jnp.full((k_level,), scale), valid, d))
        if lvl + 1 < n_levels:
            scale *= scale_factor
            nh = max(int(round(img.shape[0] / scale)), 32)
            nw = max(int(round(img.shape[1] / scale)), 32)
            cur = jax.image.resize(img, (nh, nw), "linear")

    uv, resp, ang, scl, valid, desc = (
        jnp.concatenate([o[i] for o in all_out]) for i in range(6)
    )
    kps = Keypoints(uv=uv, response=resp, angle=ang, scale=scl, valid=valid)
    # honor the K == max_keypoints contract exactly: pad the remainder
    # (max_keypoints % n_levels) with invalid slots
    short = max_keypoints - desc.shape[0]
    if short > 0:
        kps = Keypoints(
            uv=jnp.concatenate([kps.uv, jnp.zeros((short, 2))]),
            response=jnp.concatenate([kps.response, jnp.zeros(short)]),
            angle=jnp.concatenate([kps.angle, jnp.zeros(short)]),
            scale=jnp.concatenate([kps.scale, jnp.ones(short)]),
            valid=jnp.concatenate([kps.valid, jnp.zeros(short, dtype=bool)]),
        )
        desc = jnp.concatenate(
            [desc, jnp.zeros((short,) + desc.shape[1:], dtype=desc.dtype)]
        )
    return kps, desc


def sift_descriptors(
    img: jax.Array,
    uv: jax.Array,
    angles: jax.Array,
    patch_radius: float = 8.0,
) -> jax.Array:
    """SIFT-family float descriptor: 4x4 spatial cells x 8 orientation bins
    of gradient-magnitude histograms over a rotation-steered 16x16 sample
    grid, Gaussian-weighted, L2-normalized with 0.2 clipping (Lowe, IJCV
    2004). This is the float branch of the reference's descriptor-type
    factory (``feature_extraction_core.cpp:51-85``; ``Features.msg`` enums
    SURF=5, SIFT=6) — matched by L2 (:func:`matching.match_descriptors_l2`)
    instead of Hamming, exactly as the reference's BFMatcher switches norms
    for float descriptor types.

    Batched TPU formulation: all K keypoints sample their rotated grids in
    one gather; gradients are finite differences INSIDE the rotated frame,
    so gradient orientations are already keypoint-relative; histograms are
    one-hot einsums (no scatter).

    Returns (K, 128) float32.
    """
    sm = _sep_blur(img.astype(jnp.float32), 1)
    h, w = img.shape
    G = 16  # sample grid
    step = 2.0 * patch_radius / G
    gy = (jnp.arange(G + 2, dtype=jnp.float32) - (G + 1) / 2.0) * step
    gx = (jnp.arange(G + 2, dtype=jnp.float32) - (G + 1) / 2.0) * step
    dyy, dxx = jnp.meshgrid(gy, gx, indexing="ij")  # (G+2, G+2) incl. 1-px halo

    ca, sa = jnp.cos(angles), jnp.sin(angles)
    rx = ca[:, None, None] * dxx - sa[:, None, None] * dyy
    ry = sa[:, None, None] * dxx + ca[:, None, None] * dyy
    sx = jnp.clip(uv[:, None, None, 0] + rx, 0, w - 1)
    sy = jnp.clip(uv[:, None, None, 1] + ry, 0, h - 1)
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    patch = sm[yi, xi]  # (K, G+2, G+2) in the rotated frame

    # central differences in the rotated frame -> keypoint-relative gradients
    gx_ = 0.5 * (patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2])
    gy_ = 0.5 * (patch[:, 2:, 1:-1] - patch[:, :-2, 1:-1])
    mag = jnp.sqrt(gx_ * gx_ + gy_ * gy_ + 1e-12)
    ori = jnp.arctan2(gy_, gx_)  # [-pi, pi]

    # Gaussian window over the patch (sigma = half patch width)
    yy = jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0
    wg = jnp.exp(-(yy[:, None] ** 2 + yy[None, :] ** 2) / (2.0 * (G / 2.0) ** 2))
    mag = mag * wg[None]

    # soft orientation binning into 8 bins (linear interp between bins)
    nb = 8
    t = (ori + jnp.pi) * (nb / (2.0 * jnp.pi))  # [0, nb]
    b0 = jnp.floor(t).astype(jnp.int32) % nb
    frac = t - jnp.floor(t)
    onehot0 = jax.nn.one_hot(b0, nb) * (1.0 - frac)[..., None]
    onehot1 = jax.nn.one_hot((b0 + 1) % nb, nb) * frac[..., None]
    hist_soft = (onehot0 + onehot1) * mag[..., None]  # (K, G, G, nb)

    # 4x4 spatial cells: sum each 4x4 sample block
    K = uv.shape[0]
    cells = hist_soft.reshape(K, 4, 4, 4, 4, nb).sum(axis=(2, 4))  # (K,4,4,nb)
    desc = cells.reshape(K, 128)

    # SIFT normalization: unit L2, clip 0.2, renormalize
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return desc


def binary_gist(img: jax.Array, roll_angle: jax.Array | float = 0.0) -> jax.Array:
    """Whole-image binary GIST descriptor: resize the frame to 63×63 and
    take ONE oriented BRIEF descriptor at the center, orientation
    compensated by the robot's roll (reference
    ``feature_extraction_core.cpp:119-162``). Returns (32,) uint8."""
    small = jax.image.resize(img.astype(jnp.float32), (63, 63), "linear")
    center = jnp.array([[31.0, 31.0]])
    ang = jnp.asarray(roll_angle, dtype=jnp.float32)[None]
    d = brief_descriptors(small, center, ang, brief_pattern(patch_radius=25, seed=4321))
    return d[0]
