"""Front-end kernel tests: FAST/ORB, GIST, depth lift, virtual scans
(SURVEY.md §7 phase 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzliti_slam_tpu.frontend import camera
from uzliti_slam_tpu.frontend import camera as cam_mod
from uzliti_slam_tpu.ops import depth as depth_ops
from uzliti_slam_tpu.ops import features, lie, matching, scan

KEY = jax.random.PRNGKey(0)


def checkerboard(h=120, w=160, sq=16, noise_key=None):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((yy // sq) + (xx // sq)) % 2).astype(np.float32) * 200.0 + 20.0
    if noise_key is not None:
        img = img + 2.0 * np.asarray(jax.random.normal(noise_key, (h, w)))
    return jnp.asarray(img)


def blob_image(h=160, w=200, n=25, seed=0, noise_key=None):
    """Isolated bright rectangles on dark background — L-junction corners,
    which (unlike ideal checkerboard X-junctions, 8 contiguous arc pixels)
    are true FAST-9 corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 30.0, dtype=np.float32)
    for _ in range(n):
        y = rng.integers(20, h - 40)
        x = rng.integers(20, w - 40)
        hh = rng.integers(10, 25)
        ww = rng.integers(10, 25)
        img[y:y + hh, x:x + ww] = rng.uniform(150, 250)
    if noise_key is not None:
        img = img + 2.0 * np.asarray(jax.random.normal(noise_key, (h, w)))
    return jnp.asarray(img)


class TestFast:
    def test_detects_blob_corners(self):
        img = blob_image()
        score = features.nms(features.fast_score(img, 20.0))
        n = int(jnp.sum(score > 0))
        assert n >= 20  # rectangle corners

    def test_checkerboard_x_junctions_are_not_fast9(self):
        # Ideal X-junctions have exactly 8 contiguous arc pixels — FAST-9
        # must reject them (same as OpenCV FAST).
        img = checkerboard()
        score = features.fast_score(img, 20.0)
        assert float(jnp.max(score)) == 0.0

    def test_flat_image_no_corners(self):
        img = jnp.full((100, 100), 128.0)
        score = features.fast_score(img, 20.0)
        assert float(jnp.max(score)) == 0.0

    def test_single_bright_dot(self):
        img = jnp.zeros((64, 64)).at[32, 32].set(255.0)
        score = features.fast_score(img, 20.0)
        # dot center is a FAST corner? circle pixels all darker -> yes
        assert float(score[32, 32]) > 0
        # nothing else
        assert int(jnp.sum(features.nms(score) > 0)) == 1


class TestDetectDescribe:
    def test_shapes_and_validity(self):
        img = blob_image(noise_key=KEY)
        kps, desc = features.detect_and_describe(img, max_keypoints=128)
        assert kps.uv.shape == (128, 2)
        assert desc.shape == (128, 32)
        assert desc.dtype == jnp.uint8
        assert int(kps.valid.sum()) > 30

    def test_descriptors_match_under_shift(self):
        """Same scene shifted a few px: descriptors must Hamming-match."""
        base = np.asarray(blob_image(176, 216, 30, 3, KEY))
        img1 = jnp.asarray(base[8:136, 8:168])
        img2 = jnp.asarray(base[0:128, 0:160])
        kp1, d1 = features.detect_and_describe(img1, max_keypoints=64, n_levels=1)
        kp2, d2 = features.detect_and_describe(img2, max_keypoints=64, n_levels=1)
        mi, ok, dist = matching.match_descriptors(
            matching.unpack_bits(d1), matching.unpack_bits(d2),
            valid_a=kp1.valid, valid_b=kp2.valid, ratio=0.8, max_dist=60.0,
        )
        mi = np.asarray(mi)
        okn = np.asarray(ok)
        assert okn.sum() >= 10
        # matched keypoints should correspond to the same physical corner:
        # uv1 + (8,8) == uv2 within tolerance
        uv1 = np.asarray(kp1.uv)[okn]
        uv2 = np.asarray(kp2.uv)[mi[okn]]
        d = np.linalg.norm(uv1 + 8.0 - uv2, axis=-1)
        assert np.median(d) < 2.0


class TestGist:
    def test_deterministic_and_discriminative(self):
        img1 = blob_image(noise_key=KEY)
        img2 = blob_image(seed=7, noise_key=jax.random.PRNGKey(9)) * 0.3 + 50.0
        g1a = features.binary_gist(img1)
        g1b = features.binary_gist(img1)
        np.testing.assert_array_equal(np.asarray(g1a), np.asarray(g1b))
        assert g1a.shape == (32,)
        # same image == distance 0; the test is determinism + shape.

    def test_roll_compensation(self):
        img = blob_image(noise_key=KEY)
        g0 = features.binary_gist(img, 0.0)
        gr = features.binary_gist(img, 0.5)
        # different roll angles give different descriptors (pattern steered)
        d = matching.hamming_matrix_packed(g0[None], gr[None])[0, 0]
        assert float(d) > 0


class TestDepthCamera:
    def test_backproject_project_roundtrip(self):
        cam = camera.default_kinect()
        u = jnp.array([10.0, 320.0, 600.0])
        v = jnp.array([15.0, 240.0, 400.0])
        z = jnp.array([0.5, 2.0, 4.0])
        pts = camera.backproject(cam, u, v, z)
        u2, v2, z2 = camera.project(cam, pts)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-6)

    def test_joint_bilateral_fills_holes(self):
        depth = jnp.full((40, 40), 2.0).at[20, 20].set(0.0)
        guide = jnp.full((40, 40), 100.0)
        out = depth_ops.joint_bilateral_filter(depth, guide)
        assert abs(float(out[20, 20]) - 2.0) < 0.01

    def test_joint_bilateral_respects_edges(self):
        # two flat regions split by a guide edge: no cross-bleeding
        depth = jnp.concatenate([jnp.full((40, 20), 1.0), jnp.full((40, 20), 3.0)], axis=1)
        guide = jnp.concatenate([jnp.full((40, 20), 0.0), jnp.full((40, 20), 255.0)], axis=1)
        out = depth_ops.joint_bilateral_filter(depth, guide)
        assert abs(float(out[20, 5]) - 1.0) < 0.01
        assert abs(float(out[20, 35]) - 3.0) < 0.01


class TestScan:
    def test_wall_scan(self):
        """A wall of points at x=2 in front of the robot."""
        ys = jnp.linspace(-1.0, 1.0, 50)
        zs = jnp.linspace(0.2, 0.8, 10)
        yy, zz = jnp.meshgrid(ys, zs)
        pts = jnp.stack([jnp.full_like(yy, 2.0), yy, zz], axis=-1).reshape(-1, 3)
        s = scan.cloud_to_scan(pts, jnp.ones(pts.shape[0], bool), n_bins=180)
        ang = np.asarray(s.angles())
        rng = np.asarray(s.ranges)
        hit = np.isfinite(rng)
        assert hit.sum() > 10
        # range along bearing theta to wall x=2 is 2/cos(theta)
        expected = 2.0 / np.cos(ang[hit])
        np.testing.assert_allclose(rng[hit], expected, rtol=0.1)

    def test_height_band_filter(self):
        pts = jnp.array([[2.0, 0.0, 0.05], [2.0, 0.0, 1.5]])  # below and above band
        s = scan.cloud_to_scan(pts, jnp.ones(2, bool), n_bins=36)
        assert not np.any(np.isfinite(np.asarray(s.ranges)))

    def test_merge_prefers_newest(self):
        r1 = jnp.full((36,), jnp.inf).at[0].set(2.0).at[1].set(3.0)
        r2 = jnp.full((36,), jnp.inf).at[1].set(4.0)
        s1 = scan.Scan(r1, r1, jnp.float32(-np.pi), jnp.float32(np.pi))
        s2 = scan.Scan(r2, r2, jnp.float32(-np.pi), jnp.float32(np.pi))
        m = scan.merge_scans(s1, s2)
        assert float(m.ranges[0]) == 2.0       # only in old
        assert float(m.ranges[1]) == 4.0       # disagree -> newest wins
        assert not np.isfinite(float(m.ranges[5]))

    def test_merge_averages_close(self):
        r1 = jnp.full((36,), jnp.inf).at[3].set(2.0)
        r2 = jnp.full((36,), jnp.inf).at[3].set(2.1)
        s1 = scan.Scan(r1, r1, jnp.float32(-np.pi), jnp.float32(np.pi))
        s2 = scan.Scan(r2, r2, jnp.float32(-np.pi), jnp.float32(np.pi))
        m = scan.merge_scans(s1, s2)
        np.testing.assert_allclose(float(m.ranges[3]), 2.05, atol=1e-5)

    def test_depth_to_scan_end_to_end(self):
        cam = camera.default_kinect()
        depth = jnp.full((480, 640), 2.0)
        # camera looking along +x of base, z up: rotate camera optical frame
        # (z forward, x right, y down) to base (x forward, z up)
        # R maps camera axes -> base: cam z -> base x, cam x -> base -y, cam y -> base -z
        R = jnp.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
        cam_pose = lie.make_pose(jnp.array([0.0, 0.0, 0.5]), lie.matrix_to_quat(R))
        s = scan.depth_to_scan(depth, cam, cam_pose, n_bins=180, height_band=(0.1, 1.0))
        rng = np.asarray(s.ranges)
        hit = np.isfinite(rng)
        assert hit.sum() > 20
        # forward bin should see the wall at ~2m
        ang = np.asarray(s.angles())
        fwd = np.argmin(np.abs(ang))
        assert abs(rng[fwd] - 2.0) < 0.1

    def test_scan_center(self):
        r = jnp.full((360,), jnp.inf).at[0:180].set(1.0)
        s = scan.Scan(r, r, jnp.float32(-np.pi), jnp.float32(np.pi))
        c = np.asarray(scan.scan_center(s))
        assert c.shape == (2,)
        assert np.all(np.isfinite(c))


class TestBriskFamily:
    """Second binary descriptor family (VERDICT r1 #6; the reference's
    descriptor-type factory, feature_extraction_core.cpp:51-85)."""

    def test_pattern_is_rings_and_short_pairs(self):
        pat = np.asarray(features.brisk_pattern())
        assert pat.shape == (256, 2, 2)
        # all sampling points lie inside the patch radius
        assert np.all(np.linalg.norm(pat.reshape(-1, 2), axis=-1) <= 13.01)
        # short-pair construction: mean pair distance well below BRIEF's
        brief = np.asarray(features.brief_pattern())
        d_brisk = np.linalg.norm(pat[:, 0] - pat[:, 1], axis=-1).mean()
        d_brief = np.linalg.norm(brief[:, 0] - brief[:, 1], axis=-1).mean()
        assert d_brisk < d_brief

    def test_brisk_descriptors_match_under_shift(self):
        img = blob_image()
        k1, d1 = features.detect_and_describe(img, 64, descriptor="brisk")
        sh = jnp.roll(img, 3, axis=1)
        k2, d2 = features.detect_and_describe(sh, 64, descriptor="brisk")
        from uzliti_slam_tpu.ops import matching
        mi, ok, dist = matching.match_descriptors(
            matching.unpack_bits(d1), matching.unpack_bits(d2),
            valid_a=k1.valid, valid_b=k2.valid, ratio=0.9, max_dist=60.0,
        )
        assert int(jnp.sum(ok)) >= 10
        # matched keypoints actually shifted by ~3 px in u
        du = k2.uv[mi][:, 0] - k1.uv[:, 0]
        med = float(jnp.median(jnp.where(ok, du, jnp.nan)[ok]))
        assert abs(med - 3.0) < 1.5

    def test_families_differ(self):
        img = blob_image()
        _, d1 = features.detect_and_describe(img, 64, descriptor="brief")
        _, d2 = features.detect_and_describe(img, 64, descriptor="brisk")
        assert not np.array_equal(np.asarray(d1), np.asarray(d2))


class TestFreakFamily:
    """Third binary descriptor family (reference descriptor factory
    BRIEF/ORB/BRISK/FREAK, feature_extraction_core.cpp:51-85)."""

    def test_pattern_is_retinal_and_long_pairs(self):
        pat = np.asarray(features.freak_pattern())
        assert pat.shape == (256, 2, 2)
        assert np.all(np.linalg.norm(pat.reshape(-1, 2), axis=-1) <= 13.01)
        # coarse-to-fine construction: mean pair distance well ABOVE
        # BRISK's short pairs (FREAK compares across the retina first)
        brisk = np.asarray(features.brisk_pattern())
        d_freak = np.linalg.norm(pat[:, 0] - pat[:, 1], axis=-1).mean()
        d_brisk = np.linalg.norm(brisk[:, 0] - brisk[:, 1], axis=-1).mean()
        assert d_freak > d_brisk
        # retinal topology: sampling-point radii span fovea to periphery
        radii = np.linalg.norm(pat.reshape(-1, 2), axis=-1)
        assert radii.min() < 2.0 and radii.max() > 10.0

    def test_freak_descriptors_match_under_shift(self):
        img = blob_image()
        k1, d1 = features.detect_and_describe(img, 64, descriptor="freak")
        sh = jnp.roll(img, 3, axis=1)
        k2, d2 = features.detect_and_describe(sh, 64, descriptor="freak")
        from uzliti_slam_tpu.ops import matching
        mi, ok, dist = matching.match_descriptors(
            matching.unpack_bits(d1), matching.unpack_bits(d2),
            valid_a=k1.valid, valid_b=k2.valid, ratio=0.9, max_dist=60.0,
        )
        assert int(jnp.sum(ok)) >= 10
        du = k2.uv[mi][:, 0] - k1.uv[:, 0]
        med = float(jnp.median(jnp.where(ok, du, jnp.nan)[ok]))
        assert abs(med - 3.0) < 1.5

    def test_freak_differs_from_other_families(self):
        img = blob_image()
        _, d1 = features.detect_and_describe(img, 64, descriptor="freak")
        _, d2 = features.detect_and_describe(img, 64, descriptor="brisk")
        _, d3 = features.detect_and_describe(img, 64, descriptor="brief")
        assert not np.array_equal(np.asarray(d1), np.asarray(d2))
        assert not np.array_equal(np.asarray(d1), np.asarray(d3))


class TestSiftFamily:
    """Float descriptor family (reference descriptor-type factory enums
    SURF=5 / SIFT=6, Features.msg:1-15; matched by L2 as the reference's
    BFMatcher switches norms for float types)."""

    def test_shapes_and_normalization(self):
        img = blob_image(noise_key=KEY)
        kps, desc = features.detect_and_describe(
            img, max_keypoints=64, n_levels=1, descriptor="sift"
        )
        assert desc.shape == (64, 128)
        assert desc.dtype == jnp.float32
        norms = np.linalg.norm(np.asarray(desc), axis=-1)
        v = np.asarray(kps.valid)
        # unit L2 (clipped-renormalized) for real keypoints
        np.testing.assert_allclose(norms[v], 1.0, atol=1e-3)
        # clipped at 0.2 BEFORE the final renormalization, so entries stay
        # bounded well below 1 (illumination robustness)
        assert np.asarray(desc).max() < 0.5

    def test_sift_descriptors_match_under_shift(self):
        img = blob_image()
        k1, d1 = features.detect_and_describe(img, 64, n_levels=1, descriptor="sift")
        sh = jnp.roll(img, 3, axis=1)
        k2, d2 = features.detect_and_describe(sh, 64, n_levels=1, descriptor="sift")
        mi, ok, dist = matching.match_descriptors_l2(
            d1, d2, valid_a=k1.valid, valid_b=k2.valid, ratio=0.9,
        )
        assert int(jnp.sum(ok)) >= 10
        du = k2.uv[mi][:, 0] - k1.uv[:, 0]
        med = float(jnp.median(jnp.where(ok, du, jnp.nan)[ok]))
        assert abs(med - 3.0) < 1.5

    def test_rotation_steering(self):
        """Descriptors of the same keypoints are stable under a global 90°
        image rotation (orientation-steered sampling grid)."""
        img = blob_image(160, 160, 20, seed=5)
        k1, d1 = features.detect_and_describe(img, 48, n_levels=1, descriptor="sift")
        rot = jnp.rot90(img)  # +90° CCW
        k2, d2 = features.detect_and_describe(rot, 48, n_levels=1, descriptor="sift")
        mi, ok, dist = matching.match_descriptors_l2(
            d1, d2, valid_a=k1.valid, valid_b=k2.valid, ratio=0.85,
        )
        okn = np.asarray(ok)
        assert okn.sum() >= 8
        # matched keypoints map through the rotation: (u,v) -> (v, W-1-u)
        h, w = img.shape
        uv1 = np.asarray(k1.uv)[okn]
        uv2 = np.asarray(k2.uv)[np.asarray(mi)[okn]]
        pred = np.stack([uv1[:, 1], (w - 1) - uv1[:, 0]], axis=-1)
        d = np.linalg.norm(pred - uv2, axis=-1)
        assert np.median(d) < 2.0

    def test_l2_matrix_matches_numpy(self):
        a = np.random.default_rng(0).normal(size=(17, 128)).astype(np.float32)
        b = np.random.default_rng(1).normal(size=(23, 128)).astype(np.float32)
        dm = np.asarray(matching.l2_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(dm, ref, rtol=1e-4, atol=1e-3)


class TestDistortion:
    """Radial/tangential distortion model + rectification (VERDICT r1 #6;
    reference rectifies before feature/GIST work,
    feature_extraction_core.cpp:123-135)."""

    def _cam(self, k1=-0.2, k2=0.05):
        return cam_mod.PinholeCamera(
            fx=jnp.float32(110.0), fy=jnp.float32(110.0),
            cx=jnp.float32(64.0), cy=jnp.float32(48.0),
            width=128, height=96, k1=k1, k2=k2, p1=0.001, p2=-0.001,
        )

    def test_undistort_inverts_distort(self):
        cam = self._cam()
        u = jnp.asarray(np.linspace(10, 118, 13), jnp.float32)
        v = jnp.asarray(np.linspace(8, 88, 13), jnp.float32)
        xn = (u - cam.cx) / cam.fx
        yn = (v - cam.cy) / cam.fy
        xd, yd = cam_mod.distort_normalized(cam, xn, yn)
        ud = xd * cam.fx + cam.cx
        vd = yd * cam.fy + cam.cy
        ur, vr = cam_mod.undistort_points(cam, ud, vd)
        np.testing.assert_allclose(np.asarray(ur), np.asarray(u), atol=1e-2)
        np.testing.assert_allclose(np.asarray(vr), np.asarray(v), atol=1e-2)

    def test_zero_coeffs_identity(self):
        cam = self._cam(k1=0.0, k2=0.0)._replace(p1=0.0, p2=0.0)
        img = blob_image(96, 128)
        out = cam_mod.rectify_image(cam, img)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)
        u, v = cam_mod.undistort_points(cam, jnp.asarray([30.0]), jnp.asarray([40.0]))
        np.testing.assert_allclose([float(u[0]), float(v[0])], [30.0, 40.0], atol=1e-5)

    def test_rectified_image_straightens(self):
        # a bright straight vertical line, warped by distortion, comes back
        # straight after rectification
        cam = self._cam()
        h, w = 96, 128
        line_u = 100  # rectified-space column
        vv = jnp.arange(h, dtype=jnp.float32)
        uu = jnp.full((h,), float(line_u), jnp.float32)
        # draw the line in the RAW (distorted) image at its distorted coords
        xn = (uu - cam.cx) / cam.fx
        yn = (vv - cam.cy) / cam.fy
        xd, yd = cam_mod.distort_normalized(cam, xn, yn)
        ud = np.asarray(xd * cam.fx + cam.cx)
        vd = np.asarray(yd * cam.fy + cam.cy)
        raw = np.zeros((h, w), np.float32)
        raw[np.round(vd).astype(int) % h, np.round(ud).astype(int) % w] = 200.0
        assert np.std(np.argmax(raw, axis=1)[10:-10]) > 0.25  # curved in raw
        rect = np.asarray(cam_mod.rectify_image(cam, jnp.asarray(raw)))
        cols = np.argmax(rect, axis=1)[10:-10]
        assert np.std(cols) < 0.6  # straight after rectification
        assert abs(np.median(cols) - line_u) <= 1.0


class TestCaptureDisplacement:
    @pytest.mark.slow
    def test_cam_disp_shifts_points(self):
        """Per-camera capture displacement moves the 3-D lift by the base
        motion during staggered capture
        (feature_extraction_service_node.cpp:191-217)."""
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import KeyframeConfig, SlamConfig
        from uzliti_slam_tpu.io import simulator
        from uzliti_slam_tpu.ops import lie

        cfg = SlamConfig(node_capacity=16, edge_capacity=64, feats_per_node=32,
                         scan_bins=90)
        world = simulator.WallWorld(img_h=96, img_w=128)
        img, dep = world.render(0.0, 0.0)
        odom = lie.pose_identity()
        kf0 = pipeline.Keyframe(
            image=jnp.asarray(img), depth=jnp.asarray(dep),
            odom_pose=odom, stamp=jnp.asarray(0.0),
        )
        disp = lie.make_pose(jnp.array([0.0, 0.3, 0.0]), jnp.array([1.0, 0, 0, 0]))
        kf1 = kf0._replace(cam_disp=disp[None])
        st0 = pipeline.init_state(cfg)
        st1 = pipeline.init_state(cfg)
        cpose = simulator.cam_extrinsic()[None]
        st0, _ = pipeline.process_keyframe(st0, kf0, world.cam, cpose, cfg)
        st1, _ = pipeline.process_keyframe(st1, kf1, world.cam, cpose, cfg)
        v0 = np.asarray(st0.desc_valid[0])
        v1 = np.asarray(st1.desc_valid[0])
        both = v0 & v1
        assert both.sum() >= 5
        p0 = np.asarray(st0.points[0])[both]
        p1 = np.asarray(st1.points[0])[both]
        np.testing.assert_allclose(p1 - p0, np.broadcast_to([0.0, 0.3, 0.0], p0.shape), atol=1e-4)
