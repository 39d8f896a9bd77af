"""The SLAM orchestrator: keyframe processing + optimization epochs.

Functional re-design of the reference's ``GraphSlamNode``
(``graph_slam/src/graph_slam_node.cpp:42-159``): the 20-thread callback
spinner, worker queues and mutexes collapse into two pure jitted steps
advancing one ``SlamState`` pytree:

- ``process_keyframe``: the ``odomTimerCallback → sensorDataCallback`` path
  (``:161-396``) — front-end, place recognition, batched candidate
  registration, node/edge insertion.
- ``optimize_epoch``: the ``optimizationTimerCallback →
  finishedGraphOptimization`` path (``:1138-1279``) — loop-closure
  filtering, LM solve, uncertainty + map→odom diff update.

The reference's process-level local/global split maps onto scope eviction
(``lifecycle.py``) plus the sharded solver (``parallel/sharded.py``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from uzliti_slam_tpu.config import SlamConfig
from uzliti_slam_tpu.frontend import camera as cam_mod
from uzliti_slam_tpu.graph import filter as gfilter
from uzliti_slam_tpu.graph import lifecycle, shortest_path, solver
from uzliti_slam_tpu.graph import state as gstate
from uzliti_slam_tpu.ops import depth as depth_ops
from uzliti_slam_tpu.ops import features, icp, lie, matching, ransac
from uzliti_slam_tpu.mapping import occupancy
from uzliti_slam_tpu.ops import scan as scan_ops
from uzliti_slam_tpu.recognition import recognizer as rec
from uzliti_slam_tpu.recognition import vocabulary as voc


_project_map_jit = partial(
    jax.jit, static_argnames=("config", "force_full")
)(occupancy.project)


@partial(jax.jit, static_argnames=("iterations",))
def _calibrate_jit(g, sensor_transforms, sensor_idx, iterations):
    from uzliti_slam_tpu.graph import calibration

    return calibration.calibrate(
        g, sensor_transforms, sensor_idx, sensor_idx, iterations=iterations
    )


class Keyframe(NamedTuple):
    image: jax.Array      # (H, W) grayscale f32
    depth: jax.Array      # (H, W) metric depth f32 (0 = invalid)
    odom_pose: jax.Array  # (7,) odometry-frame pose of the robot base
    stamp: jax.Array      # () seconds
    # optional per-camera capture displacement (C, 7): odometry motion of
    # the base between the sensor trigger and each camera's actual capture
    # during staggered multi-cam acquisition (the reference's per-camera
    # displacement, feature_extraction_service_node.cpp:191-217). None =
    # simultaneous capture.
    cam_disp: jax.Array | None = None


class SlamState(NamedTuple):
    graph: gstate.GraphState
    gist: rec.GistBank
    desc: jax.Array        # (N, F, 32) uint8 per-node descriptors
    desc_valid: jax.Array  # (N, F)
    points: jax.Array      # (N, F, 3) base-frame 3-D keypoints
    scans: jax.Array       # (N, B) virtual-scan near ranges
    scan_valid: jax.Array  # (N,) node has a scan
    last_kf_odom: jax.Array  # (7,) odometry pose at last keyframe
    prng: jax.Array
    n_keyframes: jax.Array  # () int32
    # slot of the most recent KEYFRAME node (-1 before the first). NOT
    # num_nodes-1: GPS anchors and scope-boundary nodes also append to the
    # table, and odometry/scan edges must chain keyframes, not anchors.
    last_kf_slot: jax.Array  # () int32
    # method-specific recognition state (None unless selected by
    # config.recognition.method — the reference's place_recognition_method)
    repo: rec.FeatureRepository | None = None
    bow: "voc.BowBank | None" = None
    vocab: "voc.Vocabulary | None" = None
    # voxel-downsampled colored clouds (None unless estimation.method ==
    # "gicp" — the reference's CloudTransformationEstimator keeps dense
    # clouds per node; here a fixed-budget voxel cloud per node)
    clouds: jax.Array | None = None       # (N, V, 3) base-frame points
    cloud_lab: jax.Array | None = None    # (N, V, 3) CIELAB color
    cloud_valid: jax.Array | None = None  # (N, V)
    # live-retunable numeric gates as device scalars (the
    # dynamic_reconfigure analog, config.Tunables); None falls back to
    # the static config values
    tunables: "object | None" = None


def init_state(config: SlamConfig, seed: int = 0, vocabulary=None) -> SlamState:
    n = config.node_capacity
    f = _feat_count(config)
    b = config.scan_bins
    rc = config.recognition
    repo = bow = None
    if rc.method == "repository":
        repo = rec.repository_init(n * rc.repo_desc_per_node, rc.repo_links_per_desc, n)
    if rc.method == "bow":
        if vocabulary is None:
            raise ValueError(
                "method='bow' needs a trained vocabulary "
                "(recognition.vocabulary.build_vocabulary)"
            )
        if vocabulary.centers.shape[0] != rc.bow_words:
            raise ValueError(
                f"vocabulary has {vocabulary.centers.shape[0]} words, "
                f"config.recognition.bow_words={rc.bow_words}"
            )
        bow = voc.bow_bank_init(n, rc.bow_words)
    clouds = cloud_lab = cloud_valid = None
    if config.estimation.method == "gicp":
        v = config.estimation.gicp_max_voxels
        clouds = jnp.zeros((n, v, 3))
        cloud_lab = jnp.zeros((n, v, 3))
        cloud_valid = jnp.zeros((n, v), dtype=bool)
    from uzliti_slam_tpu.config import tunables_from_config

    return SlamState(
        graph=gstate.empty_graph(n, config.edge_capacity),
        tunables=tunables_from_config(config),
        clouds=clouds,
        cloud_lab=cloud_lab,
        cloud_valid=cloud_valid,
        gist=rec.gist_bank_init(n),
        desc=jnp.zeros((n, f, 32), dtype=jnp.uint8),
        desc_valid=jnp.zeros((n, f), dtype=bool),
        points=jnp.zeros((n, f, 3)),
        scans=jnp.full((n, b), jnp.inf),
        scan_valid=jnp.zeros((n,), dtype=bool),
        last_kf_odom=lie.pose_identity(),
        prng=jax.random.PRNGKey(seed),
        n_keyframes=jnp.zeros((), dtype=jnp.int32),
        last_kf_slot=jnp.full((), -1, dtype=jnp.int32),
        repo=repo,
        bow=bow,
        vocab=vocabulary if rc.method == "bow" else None,
    )


def _feat_count(config: SlamConfig) -> int:
    # detect_and_describe honors K == max_keypoints exactly (padding the
    # per-level remainder), so the bank size is simply the budget
    return config.feats_per_node


# ---------------------------------------------------------------------------
# Keyframe step
# ---------------------------------------------------------------------------

def _keyframe_body(
    state: SlamState,
    kf: Keyframe,
    cam: cam_mod.PinholeCamera,
    cam_pose: jax.Array,
    config: SlamConfig = SlamConfig(),
) -> tuple[SlamState, dict]:
    """Ingest one keyframe: front-end, candidate search, edge estimation,
    graph insertion.

    Multi-camera: ``kf.image``/``kf.depth`` may carry a leading camera axis
    (C, H, W) with ``cam_pose`` (C, 7) per-camera extrinsics — the
    reference's multi-Kinect capture path (per-camera extraction then
    merged SensorDataArray + merged virtual scans,
    ``feature_extraction_service_node.cpp:101-285``). Single-camera inputs
    (H, W) and (7,) are promoted to C=1. Intrinsics are shared across
    cameras (per-camera intrinsics: pass stacked fields in ``cam``).
    """
    from uzliti_slam_tpu.config import tunables_from_config

    fc = config.frontend
    ec = config.estimation
    rc = config.recognition
    tn = (state.tunables if state.tunables is not None
          else tunables_from_config(config))
    g = state.graph
    prng, k_ransac = jax.random.split(state.prng)

    # --- normalize to a camera axis; accept native sensor dtypes (uint8
    # mono images, uint16 millimeter depth — the Kinect wire format) so
    # host->device transfers stay 4x smaller than float32 ---
    imgs = kf.image if kf.image.ndim == 3 else kf.image[None]
    deps = kf.depth if kf.depth.ndim == 3 else kf.depth[None]
    imgs = imgs.astype(jnp.float32)
    if jnp.issubdtype(deps.dtype, jnp.integer):
        # integer depth carries sensor units (default mm); the scale is
        # config so TUM's native 0.2 mm png units ship losslessly
        deps = deps.astype(jnp.float32) * config.depth_scale
    else:
        deps = deps.astype(jnp.float32)
    cam_poses = cam_pose if cam_pose.ndim == 2 else cam_pose[None]
    if kf.cam_disp is not None:
        # staggered capture: each camera's extrinsic is composed with the
        # base displacement accumulated between trigger and capture
        disp = kf.cam_disp if kf.cam_disp.ndim == 2 else kf.cam_disp[None]
        cam_poses = lie.pose_compose(disp, cam_poses)
    n_cams = imgs.shape[0]
    k_per_cam = _feat_count(config) // n_cams
    if k_per_cam * n_cams != _feat_count(config):
        raise ValueError(
            f"feats_per_node budget {_feat_count(config)} not divisible by "
            f"{n_cams} cameras"
        )

    # --- front-end, vmapped over cameras (feature_extraction_service_node.cpp:85-285) ---
    def frontend_one(img, dep_raw, cpose):
        if fc.rectify:
            # undistort before any feature/GIST work so the pinhole lift
            # holds on real (distorted) sensors
            img = cam_mod.rectify_image(cam, img)
            dep_raw = cam_mod.rectify_image(cam, dep_raw, nearest=True)
        kps, desc = features.detect_and_describe(
            img,
            max_keypoints=k_per_cam,
            threshold=tn.fast_threshold,
            grid=fc.grid,
            n_levels=fc.pyramid_levels,
            scale_factor=fc.scale_factor,
            descriptor=fc.descriptor,
        )
        dep = (
            depth_ops.joint_bilateral_filter(dep_raw, img)
            if fc.use_depth_refinement
            else dep_raw
        )
        ui = jnp.clip(kps.uv[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
        vi = jnp.clip(kps.uv[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
        z = dep[vi, ui]
        pts_cam = cam_mod.backproject(cam, kps.uv[:, 0], kps.uv[:, 1], z)
        pts_base = lie.pose_apply(cpose[None], pts_cam)
        pts_valid = kps.valid & (z > 0.1) & jnp.isfinite(z)
        vscan = scan_ops.depth_to_scan(
            dep, cam, cpose, n_bins=config.scan_bins,
            height_band=(-0.4, 0.6), max_range=6.0,
        )
        # rectified image is also the GIST source (the reference rectifies
        # inside extractBinaryGist, feature_extraction_core.cpp:123-135)
        gist_img = img
        return desc, pts_base, pts_valid, vscan, gist_img, kps.uv, kps.valid

    desc_c, pts_c, valid_c, vscan_c, gist_imgs, uv_c, kpvalid_c = jax.vmap(
        frontend_one
    )(imgs, deps, cam_poses)
    desc = desc_c.reshape(-1, 32)
    pts_base = pts_c.reshape(-1, 3)
    pts_valid = valid_c.reshape(-1)

    # dense voxel cloud for the gicp estimator (the reference's
    # CloudTransformationEstimator voxel-grids colored clouds,
    # cloud_transformation_estimator.cpp:117-129); grayscale replicates
    # into the Lab conversion (mono sensors carry no chroma)
    cloud_pts = cloud_lab = cloud_ok = None
    if ec.method == "gicp":
        from uzliti_slam_tpu.ops import gicp as gicp_ops

        def cloud_one(img, dep, cpose):
            pc = cam_mod.backproject_image(cam, dep)
            pb = lie.pose_apply(cpose[None], pc.reshape(-1, 3))
            ok = (dep.reshape(-1) > 0.1) & jnp.isfinite(dep.reshape(-1))
            gray = jnp.clip(img.reshape(-1) / 255.0, 0.0, 1.0)
            lab = gicp_ops.rgb_to_lab(
                jnp.stack([gray, gray, gray], axis=-1)
            )
            return pb, lab, ok

        cp_c, cl_c, co_c = jax.vmap(cloud_one)(imgs, deps, cam_poses)
        cloud_pts, cloud_lab, cloud_ok = gicp_ops.voxel_downsample(
            cp_c.reshape(-1, 3), cl_c.reshape(-1, 3), co_c.reshape(-1),
            ec.gicp_voxel, ec.gicp_max_voxels,
        )

    # merge per-camera virtual scans in polar space (graph_grid_mapper.cpp:45-133)
    def merge_fold(acc, i):
        cur = scan_ops.Scan(
            vscan_c.ranges[i], vscan_c.far_ranges[i],
            vscan_c.angle_min[i], vscan_c.angle_max[i],
        )
        return scan_ops.merge_scans(acc, cur), None

    vscan0 = scan_ops.Scan(
        vscan_c.ranges[0], vscan_c.far_ranges[0],
        vscan_c.angle_min[0], vscan_c.angle_max[0],
    )
    if n_cams > 1:
        vscan, _ = jax.lax.scan(merge_fold, vscan0, jnp.arange(1, n_cams))
    else:
        vscan = vscan0

    # GIST orientation compensated by the camera transform's roll, as the
    # reference does (feature_extraction_core.cpp:137-149: toEuler(...)(0)
    # of the camera transform feeds the center keypoint angle)
    gist = features.binary_gist(
        gist_imgs[0], roll_angle=lie.roll_of(lie.pose_q(cam_poses[0]))
    )

    # --- pose bootstrap: map estimate from diff ∘ odom (graph_slam_node.cpp:188-202)
    map_pose = lie.pose_compose(g.diff_transform, kf.odom_pose)
    prev_slot = state.last_kf_slot
    has_prev = prev_slot >= 0
    prev_slot_safe = jnp.maximum(prev_slot, 0)

    # --- place-recognition + distance candidates BEFORE inserting the node
    # (method selection = the reference's place_recognition_method yaml
    # param; static config -> a single retrieval path is compiled)
    k = rc.k_candidates
    bow_vec = None
    if rc.method == "gist":
        pr_slots, _pr_score, pr_ok = rec.gist_query(
            state.gist, gist, kf.stamp, k=k, max_dist=tn.gist_max_dist,
            min_dt=tn.min_time_separation,
        )
    elif rc.method == "feature_set":
        fbank = rec.FeatureSetBank(
            desc=state.desc,
            desc_valid=state.desc_valid & g.node_valid[:, None],
            stamp=g.stamp,
            valid=g.node_valid
            & (jnp.sum(state.desc_valid, axis=-1) >= tn.min_descriptors),
        )
        pr_slots, _pr_score, pr_ok = rec.feature_set_query(
            fbank, desc, pts_valid, kf.stamp, k=k,
            hamming_thresh=tn.feature_hamming_thresh,
            min_similarity=tn.min_similarity,
            min_dt=tn.min_time_separation,
        )
        # the min-descriptor gate applies to the QUERY frame too — the
        # reference indexes AND searches only nodes with enough descriptors
        # (lsh_set_recognizer.cpp:64,112), so a sparse frame neither
        # proposes nor receives candidates
        pr_ok &= jnp.sum(pts_valid) >= tn.min_descriptors
    elif rc.method == "repository":
        pr_slots, _pr_score, pr_ok = rec.repository_query(
            state.repo, desc, pts_valid, kf.stamp, k=k,
            match_thresh=tn.feature_hamming_thresh,
            min_votes=tn.repo_min_votes,
            min_dt=tn.min_time_separation,
        )
    elif rc.method == "bow":
        bow_vec = voc.quantize(state.vocab, desc, pts_valid)
        pr_slots, _pr_score, pr_ok = voc.bow_query(
            state.bow, bow_vec, kf.stamp, k=k,
            min_score=tn.bow_min_score, min_dt=tn.min_time_separation,
        )
    else:
        raise ValueError(f"unknown place_recognition method {rc.method!r}")
    # distance loop closures (graph_slam_node.cpp:273-289): nearest valid
    # nodes within radius, heading within 30°, temporally separated
    d_nodes = jnp.linalg.norm(lie.pose_t(g.pose) - lie.pose_t(map_pose)[None], axis=-1)
    rel_q = lie.quat_mul(lie.quat_conj(lie.pose_q(g.pose)), lie.pose_q(map_pose)[None])
    ang_ok = jnp.degrees(lie.rotation_angle(rel_q)) < config.keyframe.distance_closure_max_angle_deg
    d_eligible = (
        g.node_valid
        & (d_nodes < config.keyframe.distance_closure_radius)
        & ang_ok
        & (jnp.abs(g.stamp - kf.stamp) >= tn.min_time_separation)
    )
    d_sorted = jnp.where(d_eligible, d_nodes, jnp.inf)
    neg, dist_slots = jax.lax.top_k(-d_sorted, k)
    dist_ok = jnp.isfinite(-neg)

    cand_slots = jnp.concatenate([pr_slots, dist_slots]).astype(jnp.int32)
    cand_ok = jnp.concatenate([pr_ok, dist_ok])
    # dedup against existing edges (by PRESENCE, not validity — closures
    # enter invalid-until-validated, and a once-proposed pair must not be
    # re-proposed, the reference's checked_ set) and within the candidate
    # list; only an OK earlier duplicate suppresses (top_k padding reuses
    # slot ids of ineligible entries — those must not shadow a genuine
    # later candidate)
    edge_present = jnp.arange(g.edge_capacity) < g.num_edges
    cand_ok &= rec.mask_existing_pairs(
        g.e_from, g.e_to, edge_present, cand_slots,
        jnp.full_like(cand_slots, g.num_nodes),
    )
    nb = cand_slots.shape[0]
    earlier_valid_dup = (
        (cand_slots[None, :] == cand_slots[:, None])
        & cand_ok[None, :]
        & (jnp.arange(nb)[None, :] < jnp.arange(nb)[:, None])
    )
    cand_ok &= ~jnp.any(earlier_valid_dup, axis=-1)

    # --- batched candidate registration, method-selected (the reference
    # instantiates its estimator choice in code, graph_slam_node.cpp:49;
    # all methods produce (pose T_cand<-cur, info, score, ok) and feed the
    # same gates + invalid-until-validated filter path) ---
    cur_bits = matching.unpack_bits(desc)

    if ec.method == "feature":

        def register(cslot, key):
            cdesc = state.desc[cslot]
            cvalid = state.desc_valid[cslot]
            cpts = state.points[cslot]
            mi, ok_m, dist = matching.match_descriptors(
                cur_bits, matching.unpack_bits(cdesc),
                valid_a=pts_valid, valid_b=cvalid,
                ratio=tn.match_ratio, max_dist=tn.max_match_distance,
            )
            res = ransac.ransac_rigid(
                key, pts_base, cpts[mi], ok_m,
                n_hypotheses=ec.ransac_hypotheses,
                inlier_thresh=tn.ransac_inlier_thresh,
                min_consensus=tn.min_consensus,
                quality=-dist,  # soft PROSAC: prefer low-Hamming matches
                min_sigma=tn.ransac_min_sigma,
            )
            return res.pose, res.information, res.consensus.astype(jnp.float32), res.ok

    elif ec.method == "pnp":
        from uzliti_slam_tpu.ops import pnp as pnp_ops

        # single-camera pose problem: use camera-0 features (multi-camera
        # generalized PnP is out of scope — configure "feature" there)
        uv_all = uv_c.reshape(-1, 2)
        valid2d = kpvalid_c.reshape(-1) & (
            jnp.arange(uv_all.shape[0]) < k_per_cam
        )
        # measured camera-frame depth per observation (0 where the depth
        # image had no return): breaks the planar two-fold pose ambiguity
        depth0 = jnp.where(
            pts_valid,
            lie.pose_apply(lie.pose_inverse(cam_poses[0])[None], pts_base)[:, 2],
            0.0,
        )

        def register(cslot, key):
            mi, ok_m, dist = matching.match_descriptors(
                cur_bits, matching.unpack_bits(state.desc[cslot]),
                valid_a=valid2d, valid_b=state.desc_valid[cslot],
                ratio=tn.match_ratio, max_dist=tn.max_match_distance,
            )
            pr = pnp_ops.pnp_ransac(
                key, state.points[cslot][mi], uv_all, ok_m,
                cam.fx, cam.fy, cam.cx, cam.cy,
                n_hypotheses=ec.pnp_hypotheses,
                reproj_thresh_px=tn.pnp_reproj_px,
                min_consensus=tn.min_consensus,
                depth=depth0,
            )
            # pr.pose maps cand-base -> current cam0; the edge stores
            # T_cand<-cur over BASE frames
            edge_pose = lie.pose_inverse(lie.pose_compose(cam_poses[0], pr.pose))
            base = 0.1 * pr.consensus.astype(jnp.float32) / jnp.maximum(
                pr.reproj_mse, 1e-2
            )
            info = jnp.diag(
                jnp.concatenate([jnp.full((3,), 1.0), jnp.full((3,), 100.0)])
            ) * base
            return edge_pose, info, pr.consensus.astype(jnp.float32), pr.ok

    elif ec.method == "gicp":
        from uzliti_slam_tpu.ops import gicp as gicp_ops

        def register(cslot, key):
            init = lie.pose_relative(g.pose[cslot], map_pose)
            rg = gicp_ops.gicp_6d(
                cloud_pts, cloud_lab, cloud_ok,
                state.clouds[cslot], state.cloud_lab[cslot],
                state.cloud_valid[cslot],
                init_pose=init,
                iterations=ec.gicp_iterations,
                max_corr_dist=tn.gicp_max_corr,
            )
            ok = rg.ok & jnp.any(state.cloud_valid[cslot])
            return rg.pose, rg.information, 100.0 * rg.fraction, ok

    else:
        raise ValueError(f"unknown estimation method {ec.method!r}")

    rkeys = jax.random.split(k_ransac, cand_slots.shape[0])
    r_pose, r_info, r_score, r_ok = jax.vmap(register)(
        jnp.maximum(cand_slots, 0), rkeys
    )

    # acceptance gates (newEdgeCallback, graph_slam_node.cpp:798-803)
    t_norm = jnp.linalg.norm(lie.pose_t(r_pose), axis=-1)
    r_deg = jnp.degrees(lie.rotation_angle(lie.pose_q(r_pose)))
    edge_ok = (
        cand_ok
        & r_ok
        & (r_score >= tn.min_matching_score)
        & (t_norm < tn.max_edge_translation)
        & (r_deg < tn.max_edge_rotation_deg)
    )

    # --- insert node ---
    # uid minted from the monotonic keyframe counter, NOT the slot
    # high-water mark: compaction shrinks num_nodes, and a reused uid would
    # alias an already-shipped node in the global graph / database
    g, new_slot = gstate.add_node(
        g, map_pose, kf.odom_pose, kf.stamp,
        uncertainty=jnp.where(
            has_prev, g.uncertainty[prev_slot_safe], 0.0
        ),
        uid=config.instance_id * 1_000_000 + state.n_keyframes,
    )

    # odometry edge (graph_slam_node.cpp:327-336)
    rel_odom = lie.pose_relative(g.odom_pose[prev_slot_safe], kf.odom_pose)
    odo_info = gstate.odometry_information(rel_odom)
    g, _ = gstate.add_edge(
        g, jnp.where(has_prev, prev_slot, -1), new_slot, rel_odom, odo_info,
        etype=gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY,
    )

    # scan edge to previous node (estimateScanEdge, :1180-1246)
    if config.use_laser_edges:
        prev_scan = state.scans[prev_slot_safe]
        prev_pts, prev_okm = _scan_pts(prev_scan, config.scan_bins)
        cur_pts, cur_okm = scan_ops.scan_points(vscan)
        init2 = lie.pose_to_pose2(rel_odom)
        ires = icp.icp_point_to_line(
            cur_pts, cur_okm, prev_pts, prev_okm & state.scan_valid[prev_slot_safe],
            init2,
            iterations=ec.icp_iterations,
            max_corr_dist=tn.icp_max_corr,
            min_valid_fraction=tn.icp_min_valid_fraction,
        )
        # ICP aligns current scan into the previous frame: T_prev_cur.
        # Enters INVALID: like every non-odometry edge it only becomes
        # active once the cluster filter corroborates it
        # (g2o_optimizer.cpp:75-103 routes 2D_LASER through the filter too)
        laser_ok = has_prev & ires.ok
        g, _ = gstate.add_edge(
            g,
            jnp.where(laser_ok, prev_slot, -1),
            new_slot,
            icp.icp_edge_pose(ires.pose2),
            icp.icp_information_6d(ires.cov3),
            etype=gstate.EDGE_TYPE_2D_LASER,
            valid=False,
        )

    # loop-closure candidate edges: from candidate (old) -> current, transform
    # X_cand^-1 X_cur; enter INVALID until the cluster filter validates them
    # (slam_edge.cpp:47 default + g2o_optimizer whitelist)
    def add_cand(gg, xs):
        cslot, ok, pose, info, score = xs
        gg, _ = gstate.add_edge(
            gg,
            jnp.where(ok, cslot, -1),
            new_slot,
            pose,
            info,
            etype=gstate.EDGE_TYPE_3D_FULL,
            score=score,
            valid=False,
        )
        return gg, None

    g, _ = jax.lax.scan(
        add_cand, g,
        (cand_slots, edge_ok, r_pose, r_info, r_score),
    )

    # --- store node data in banks ---
    ns = jnp.maximum(new_slot, 0)
    wrote = new_slot >= 0
    repo = state.repo
    if rc.method == "repository":
        repo = jax.lax.cond(
            wrote,
            lambda r: rec.repository_add(
                r, ns, desc, pts_valid, kf.stamp,
                match_thresh=tn.feature_hamming_thresh,
            ),
            lambda r: r,
            repo,
        )
    bow = state.bow
    if rc.method == "bow":
        bow = voc.bow_bank_add(bow, new_slot, bow_vec, kf.stamp)
    cb = {}
    if ec.method == "gicp":
        cb = dict(
            clouds=state.clouds.at[ns].set(
                jnp.where(wrote, cloud_pts, state.clouds[ns])
            ),
            cloud_lab=state.cloud_lab.at[ns].set(
                jnp.where(wrote, cloud_lab, state.cloud_lab[ns])
            ),
            cloud_valid=state.cloud_valid.at[ns].set(
                jnp.where(wrote, cloud_ok, state.cloud_valid[ns])
            ),
        )
    state = state._replace(
        graph=g,
        repo=repo,
        bow=bow,
        **cb,
        gist=rec.gist_bank_add(state.gist, new_slot, gist, kf.stamp),
        desc=state.desc.at[ns].set(jnp.where(wrote, desc, state.desc[ns])),
        desc_valid=state.desc_valid.at[ns].set(jnp.where(wrote, pts_valid, state.desc_valid[ns])),
        points=state.points.at[ns].set(jnp.where(wrote, pts_base, state.points[ns])),
        scans=state.scans.at[ns].set(jnp.where(wrote, vscan.ranges, state.scans[ns])),
        scan_valid=state.scan_valid.at[ns].set(
            jnp.where(wrote, True, state.scan_valid[ns])
        ),
        last_kf_odom=kf.odom_pose,
        prng=prng,
        n_keyframes=state.n_keyframes + 1,
        last_kf_slot=jnp.where(wrote, new_slot, state.last_kf_slot).astype(jnp.int32),
    )
    info = {
        "new_slot": new_slot,
        "n_candidates": jnp.sum(cand_ok),
        "n_edges_proposed": jnp.sum(edge_ok),
        "n_features": jnp.sum(pts_valid),
    }
    return state, info


process_keyframe = partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))(
    _keyframe_body
)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def process_frame_chunk(
    state: SlamState,
    kfs: Keyframe,
    cam: cam_mod.PinholeCamera,
    cam_pose: jax.Array,
    config: SlamConfig = SlamConfig(),
    due: jax.Array | None = None,
) -> tuple[SlamState, dict]:
    """Ingest a CHUNK of raw frames in one device dispatch.

    ``kfs`` carries a leading time axis T on every field. Each frame runs
    the on-device keyframe gate (``odomTimerCallback``'s 0.3 m / 10° test,
    ``graph_slam_node.cpp:161-186``); non-due frames are skipped by
    ``lax.cond``. This is the TPU-native form of the reference's streaming
    front-end (P1): one host dispatch per T frames instead of per frame,
    which matters when per-dispatch latency is high (remote hosts,
    congested queues). When dispatch is cheap the per-frame path pipelines
    just as well — prefer ``Slam.add_frame`` there, since ``lax.scan``
    serializes what the async dispatch queue would otherwise overlap.

    ``due``: optional (T,) bool mask precomputed by the HOST gate
    (``Slam.add_frames``) — the same 0.3 m / 10° test on the same odometry,
    hoisted off-device so the caller needs no device round trip per chunk
    to know how many keyframes landed (the r4→r5 30 Hz fix: the per-chunk
    ``inserted`` fetch serialized dispatch against execution).

    Returns (state, infos) where each info leaf has leading axis T and an
    extra ``inserted`` (T,) bool mask.
    """
    kc = config.keyframe

    def step(st: SlamState, xs):
        kf, due_i = xs
        if due_i is None:
            due_v = (st.n_keyframes == 0) | lifecycle.keyframe_due(
                st.last_kf_odom, kf.odom_pose,
                kc.new_node_distance, kc.new_node_angle_deg,
            )
        else:
            due_v = due_i

        def do(st):
            st2, info = _keyframe_body(st, kf, cam, cam_pose, config)
            # inserted = the node actually landed in a slot; the gate alone
            # would count keyframes that add_node dropped at full capacity
            info["inserted"] = info["new_slot"] >= 0
            return st2, info

        def skip(st):
            zero = jnp.zeros((), jnp.int32)
            return st, {
                "new_slot": zero - 1,
                "n_candidates": zero,
                "n_edges_proposed": zero,
                "n_features": zero,
                "inserted": jnp.asarray(False),
            }

        return jax.lax.cond(due_v, do, skip, st)

    return jax.lax.scan(step, state, (kfs, due))


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def recognize_absorbed(
    state: SlamState,
    slots: jax.Array,       # (K,) node slots freshly absorbed from a delta
    mask: jax.Array,        # (K,) run PR for this slot?
    config: SlamConfig = SlamConfig(),
) -> tuple[SlamState, jax.Array]:
    """Global-side place recognition + registration for absorbed nodes.

    The reference's global instance re-runs its PlaceRecognizer on every
    received node and feeds matches to the transformation estimator
    (``graph_slam_node.cpp:473-476``). Here the shipped sensor payloads
    (descriptors/points/gist, ``GraphDelta.n_desc…``) already sit in the
    banks, so each absorbed slot runs the configured retrieval + batched
    RANSAC registration; accepted edges enter invalid-until-validated.

    Methods: "gist" and "feature_set" query straight from the shipped
    banks; "repository"/"bow" (whose incremental index state is not part
    of the wire format) fall back to the feature_set query — same
    candidates, different index.
    """
    from uzliti_slam_tpu.config import tunables_from_config

    rc = config.recognition
    ec = config.estimation
    tn = (state.tunables if state.tunables is not None
          else tunables_from_config(config))

    def one(st: SlamState, xs):
        slot, ok = xs
        s = jnp.maximum(slot, 0)
        g = st.graph
        prng, k_ransac = jax.random.split(st.prng)
        st = st._replace(prng=prng)
        stamp = g.stamp[s]
        k = rc.k_candidates

        if rc.method == "gist":
            pr_slots, _sc, pr_ok = rec.gist_query(
                st.gist, st.gist.desc[s], stamp, k=k,
                max_dist=tn.gist_max_dist, min_dt=tn.min_time_separation,
            )
        else:
            fbank = rec.FeatureSetBank(
                desc=st.desc,
                desc_valid=st.desc_valid & g.node_valid[:, None],
                stamp=g.stamp,
                valid=g.node_valid
                & (jnp.sum(st.desc_valid, axis=-1) >= tn.min_descriptors),
            )
            pr_slots, _sc, pr_ok = rec.feature_set_query(
                fbank, st.desc[s], st.desc_valid[s], stamp, k=k,
                hamming_thresh=tn.feature_hamming_thresh,
                min_similarity=tn.min_similarity,
                min_dt=tn.min_time_separation,
            )
            pr_ok &= jnp.sum(st.desc_valid[s]) >= tn.min_descriptors
        pr_ok &= ok & (pr_slots != s)

        # dedup against existing edges (presence-keyed, both directions)
        edge_present = jnp.arange(g.edge_capacity) < g.num_edges
        pr_ok &= rec.mask_existing_pairs(
            g.e_from, g.e_to, edge_present, pr_slots,
            jnp.full_like(pr_slots, s),
        )
        nb = pr_slots.shape[0]
        earlier_dup = (
            (pr_slots[None, :] == pr_slots[:, None])
            & pr_ok[None, :]
            & (jnp.arange(nb)[None, :] < jnp.arange(nb)[:, None])
        )
        pr_ok &= ~jnp.any(earlier_dup, axis=-1)

        cur_bits = matching.unpack_bits(st.desc[s])
        cur_valid = st.desc_valid[s]
        cur_pts = st.points[s]

        def register(cslot, key):
            mi, ok_m, dist = matching.match_descriptors(
                cur_bits, matching.unpack_bits(st.desc[cslot]),
                valid_a=cur_valid, valid_b=st.desc_valid[cslot],
                ratio=tn.match_ratio, max_dist=tn.max_match_distance,
            )
            return ransac.ransac_rigid(
                key, cur_pts, st.points[cslot][mi], ok_m,
                n_hypotheses=ec.ransac_hypotheses,
                inlier_thresh=tn.ransac_inlier_thresh,
                min_consensus=tn.min_consensus,
                quality=-dist,
                min_sigma=tn.ransac_min_sigma,
            )

        rkeys = jax.random.split(k_ransac, nb)
        res = jax.vmap(register)(jnp.maximum(pr_slots, 0), rkeys)
        t_norm = jnp.linalg.norm(lie.pose_t(res.pose), axis=-1)
        r_deg = jnp.degrees(lie.rotation_angle(lie.pose_q(res.pose)))
        edge_ok = (
            pr_ok
            & res.ok
            & (res.consensus >= tn.min_matching_score)
            & (t_norm < tn.max_edge_translation)
            & (r_deg < tn.max_edge_rotation_deg)
        )

        def add_cand(gg, ys):
            cslot, okk, pose, info, consensus = ys
            gg, _ = gstate.add_edge(
                gg, jnp.where(okk, cslot, -1), s, pose, info,
                etype=gstate.EDGE_TYPE_3D_FULL,
                score=consensus.astype(jnp.float32),
                valid=False,
            )
            return gg, None

        g, _ = jax.lax.scan(
            add_cand, g,
            (pr_slots, edge_ok, res.pose, res.information, res.consensus),
        )
        return st._replace(graph=g), jnp.sum(edge_ok)

    state, counts = jax.lax.scan(one, state, (slots, mask))
    return state, jnp.sum(counts)


def _scan_pts(ranges: jax.Array, n_bins: int):
    s = scan_ops.Scan(
        ranges, ranges, jnp.float32(-jnp.pi), jnp.float32(jnp.pi)
    )
    return scan_ops.scan_points(s)


# ---------------------------------------------------------------------------
# Optimization epoch
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def optimize_epoch(
    state: SlamState, config: SlamConfig = SlamConfig()
) -> tuple[SlamState, solver.SolveStats]:
    """Filter loop closures, solve, update uncertainty and map→odom diff
    (optimizationTimerCallback → finishedGraphOptimization)."""
    g = state.graph
    key, prng = jax.random.split(state.prng)

    # candidate loop closures = ALL non-odometry edges regardless of
    # current validity (the reference routes everything except
    # TYPE_2D_WHEEL_ODOMETRY through the TransformationFilter,
    # g2o_optimizer.cpp:75-103 — including 2D_LASER edges); endpoints must
    # be live, and the window follows RECENCY so new closures are never
    # starved once the table outgrows it
    # GPS factors are exempt: they are unary absolute priors from a fixed
    # anchor — the cluster filter's rigid-transform consensus model (built
    # for relative loop closures) cannot corroborate them (their from-side
    # time span is always zero)
    slot_idx = jnp.arange(g.edge_capacity)
    is_lc = (
        (g.e_type != gstate.EDGE_TYPE_2D_WHEEL_ODOMETRY)
        & (g.e_type != gstate.EDGE_TYPE_3D_GPS)
        & (slot_idx < g.num_edges)
        & g.node_valid[g.e_from]
        & g.node_valid[g.e_to]
    )
    idx = gfilter.recent_candidates(is_lc, min(256, g.edge_capacity))
    cand_valid = idx >= 0
    safe = jnp.where(cand_valid, idx, 0)
    # plausibility pre-gate (checkEdgeHeuristic) feeds the filter as the
    # candidate mask — implausible edges are excluded BEFORE clustering so
    # they cannot corroborate each other inside a cluster
    heur = gfilter.edge_heuristic(
        g, g.e_from[safe], g.e_to[safe], config.scope.scope_size_factor
    ) & cand_valid
    keep = gfilter.filter_loop_closures(
        g, idx, key, config.filter, cand_mask=heur
    )
    new_valid = g.e_valid.at[safe].set(jnp.where(cand_valid, keep, g.e_valid[safe]))
    g = g._replace(e_valid=new_valid)

    g, stats = solver.optimize(g, config.solver)
    g = shortest_path.reevaluate_uncertainty(g)

    # map->odom diff from the newest valid node (graph_slam_node.cpp:188-202)
    newest = jnp.argmax(jnp.where(g.node_valid, g.stamp, -jnp.inf))
    diff = lie.pose_compose(g.pose[newest], lie.pose_inverse(g.odom_pose[newest]))
    g = g._replace(diff_transform=diff)

    return state._replace(graph=g, prng=prng), stats


# ---------------------------------------------------------------------------
# Periodic maintenance steps (the reference's auxiliary timers)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("config", "k_targets"), donate_argnums=(0,))
def scan_reregistration(
    state: SlamState, config: SlamConfig = SlamConfig(), k_targets: int = 4
) -> tuple[SlamState, jax.Array]:
    """ICP the newest node's scan against its k nearest neighbours and add
    laser edges — the reference's scan re-registration timer
    (``GraphSlam.cfg:24``, up to 10 Hz re-running ``estimateScanEdge``
    against nearby nodes). Returns (state, number of edges added)."""
    from uzliti_slam_tpu.config import tunables_from_config

    g = state.graph
    ec = config.estimation
    tn = (state.tunables if state.tunables is not None
          else tunables_from_config(config))
    cur = jnp.maximum(state.last_kf_slot, 0)
    has = (state.last_kf_slot >= 0) & state.scan_valid[cur]

    d = jnp.linalg.norm(lie.pose_t(g.pose) - lie.pose_t(g.pose[cur])[None], axis=-1)
    slots = jnp.arange(g.node_capacity)
    eligible = (
        g.node_valid & state.scan_valid & (slots != cur)
        & (slots != cur - 1)  # consecutive edge already added at insertion
        & (d < config.keyframe.distance_closure_radius * 2)
    )
    neg, targets = jax.lax.top_k(-jnp.where(eligible, d, jnp.inf), k_targets)
    t_ok = jnp.isfinite(-neg) & has
    # skip targets already connected to cur by a laser edge — the periodic
    # timer must not accumulate duplicates until the table overflows
    # (presence-keyed: rereg edges enter invalid-until-validated)
    t_ok &= rec.mask_existing_pairs(
        g.e_from, g.e_to,
        (jnp.arange(g.edge_capacity) < g.num_edges)
        & (g.e_type == gstate.EDGE_TYPE_2D_LASER),
        targets, jnp.full_like(targets, cur),
    )

    cur_pts, cur_okm = _scan_pts(state.scans[cur], config.scan_bins)

    def one(tslot):
        tp, tok = _scan_pts(state.scans[tslot], config.scan_bins)
        init2 = lie.pose_to_pose2(lie.pose_relative(g.pose[tslot], g.pose[cur]))
        return icp.icp_point_to_line(
            cur_pts, cur_okm, tp, tok, init2,
            iterations=ec.icp_iterations,
            max_corr_dist=tn.icp_max_corr,
            min_valid_fraction=tn.icp_min_valid_fraction,
        )

    ires = jax.vmap(one)(jnp.maximum(targets, 0))
    ok = t_ok & ires.ok

    def add_one(gg, xs):
        tslot, okk, p2, cov = xs
        # invalid-until-validated: one bad ICP match on a corridor revisit
        # must not corrupt the solve without spatio-temporal corroboration
        # (the cluster filter in optimize_epoch validates it)
        gg, _ = gstate.add_edge(
            gg, jnp.where(okk, tslot, -1), cur,
            icp.icp_edge_pose(p2), icp.icp_information_6d(cov),
            etype=gstate.EDGE_TYPE_2D_LASER,
            valid=False,
        )
        return gg, None

    g, _ = jax.lax.scan(add_one, g, (targets, ok, ires.pose2, ires.cov3))
    return state._replace(graph=g), jnp.sum(ok)


def _merge_banks(
    state: SlamState,
    g_before: gstate.GraphState,
    g_after: gstate.GraphState,
    ki: jax.Array,
    ai: jax.Array,
    ok: jax.Array,
    n_bins: int,
) -> SlamState:
    """Fold each absorbed node's sensor payload into its kept node
    (reference ``mergeNodes`` merges laser scans and moves sensor data,
    ``graph_slam_node.cpp:890-1062``):

    - descriptors/3-D points: the kept node's invalid slots are backfilled
      with the absorbed node's valid entries (fixed budget F — the SoA
      analog of appending sensor data), points re-expressed in the kept
      node's NEW (slerp-averaged) frame;
    - scans: both scans' points transform into the new kept frame and
      re-bin to one virtual scan (nearest range per bearing).
    """
    pi = jnp.float32(jnp.pi)

    def one(st, xs):
        k, a, o = xs
        ks = jnp.maximum(k, 0)
        a_s = jnp.maximum(a, 0)
        # frame changes: old owner frame -> new kept frame
        rel_k = lie.pose_relative(g_after.pose[ks], g_before.pose[ks])
        rel_a = lie.pose_relative(g_after.pose[ks], g_before.pose[a_s])

        # --- descriptor/point backfill ---
        kv = st.desc_valid[ks]
        av = st.desc_valid[a_s]
        f = kv.shape[0]
        pri = jnp.concatenate(
            [jnp.where(kv, 0, 2), jnp.where(av, 1, 3)]
        ).astype(jnp.int32)
        order = jnp.argsort(pri, stable=True)[:f]
        desc_all = jnp.concatenate([st.desc[ks], st.desc[a_s]])[order]
        valid_all = jnp.concatenate([kv, av])[order]
        pk = lie.pose_apply(rel_k[None], st.points[ks])
        pa = lie.pose_apply(rel_a[None], st.points[a_s])
        pts_all = jnp.concatenate([pk, pa])[order]

        # --- scan union in the new kept frame (planar) ---
        def scan_of(slot):
            s = scan_ops.Scan(
                st.scans[slot], st.scans[slot],
                -pi, pi,
            )
            return scan_ops.scan_points(s)

        pk2, okk = scan_of(ks)
        pa2, oka = scan_of(a_s)
        rk2 = lie.pose_to_pose2(rel_k)
        ra2 = lie.pose_to_pose2(rel_a)

        def tf2(p2, pts):
            c, s2 = jnp.cos(p2[2]), jnp.sin(p2[2])
            x = c * pts[:, 0] - s2 * pts[:, 1] + p2[0]
            y = s2 * pts[:, 0] + c * pts[:, 1] + p2[1]
            return jnp.stack([x, y], axis=-1)

        union = jnp.concatenate([tf2(rk2, pk2), tf2(ra2, pa2)])
        union_ok = jnp.concatenate(
            [okk & st.scan_valid[ks], oka & st.scan_valid[a_s]]
        )
        merged = scan_ops.points_to_scan(union, union_ok, n_bins=n_bins)
        any_scan = st.scan_valid[ks] | st.scan_valid[a_s]

        # --- voxel-cloud union (gicp method): kept node's free voxel
        # slots backfill with the absorbed node's, both re-expressed in
        # the kept node's new frame ---
        if st.clouds is not None:
            kvc = st.cloud_valid[ks]
            avc = st.cloud_valid[a_s]
            vcap = kvc.shape[0]
            pri_c = jnp.concatenate(
                [jnp.where(kvc, 0, 2), jnp.where(avc, 1, 3)]
            ).astype(jnp.int32)
            order_c = jnp.argsort(pri_c, stable=True)[:vcap]
            ck = lie.pose_apply(rel_k[None], st.clouds[ks])
            ca = lie.pose_apply(rel_a[None], st.clouds[a_s])
            cl_all = jnp.concatenate([ck, ca])[order_c]
            lab_all = jnp.concatenate(
                [st.cloud_lab[ks], st.cloud_lab[a_s]]
            )[order_c]
            cval_all = jnp.concatenate([kvc, avc])[order_c]
            st = st._replace(
                clouds=st.clouds.at[ks].set(jnp.where(o, cl_all, st.clouds[ks])),
                cloud_lab=st.cloud_lab.at[ks].set(
                    jnp.where(o, lab_all, st.cloud_lab[ks])
                ),
                cloud_valid=st.cloud_valid.at[ks].set(
                    jnp.where(o, cval_all, st.cloud_valid[ks])
                ),
            )

        st = st._replace(
            desc=st.desc.at[ks].set(jnp.where(o, desc_all, st.desc[ks])),
            desc_valid=st.desc_valid.at[ks].set(
                jnp.where(o, valid_all, st.desc_valid[ks])
            ),
            points=st.points.at[ks].set(jnp.where(o, pts_all, st.points[ks])),
            scans=st.scans.at[ks].set(
                jnp.where(o, merged.ranges, st.scans[ks])
            ),
            scan_valid=st.scan_valid.at[ks].set(
                jnp.where(o, any_scan, st.scan_valid[ks])
            ),
        )
        return st, None

    state, _ = jax.lax.scan(one, state, (ki, ai, ok))
    return state


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def maintenance_epoch(
    state: SlamState,
    config: SlamConfig = SlamConfig(),
    shipped: jax.Array | None = None,
    center: jax.Array | None = None,
) -> tuple[SlamState, dict]:
    """Scope-window maintenance: node merging (global role,
    ``mergeTimerCallback``) and/or eviction bookkeeping (local role). The
    robot center is the newest keyframe, or ``center`` (7,) when given —
    the GLOBAL instance has no keyframes and centers on the robot pose
    carried by the latest scope request (``scopeRequestCallback``).

    ``shipped`` (N,) gates eviction to nodes already ACKed by the global
    graph (the reference only evicts sent nodes, ``:619-660``); without a
    scope protocol it defaults to everything (standalone local window).
    """
    g = state.graph
    sc = config.scope
    cur = jnp.maximum(state.last_kf_slot, 0)
    if center is None:
        center = g.pose[cur]
    radius = lifecycle.scope_radius(
        g.uncertainty[cur], sc.scope_size_min, sc.scope_size_factor
    )

    def drop_from_banks(state, dead):
        repo = state.repo
        if repo is not None:
            repo = repo._replace(
                node_valid=repo.node_valid & ~dead,
                link_valid=repo.link_valid & ~dead[repo.links],
            )
        bow = state.bow
        if bow is not None:
            bow = bow._replace(valid=bow.valid & ~dead)
        cb = {}
        if state.cloud_valid is not None:
            cb = dict(cloud_valid=state.cloud_valid & ~dead[:, None])
        return state._replace(
            gist=state.gist._replace(valid=state.gist.valid & ~dead),
            scan_valid=state.scan_valid & ~dead,
            desc_valid=state.desc_valid & ~dead[:, None],
            repo=repo,
            bow=bow,
            **cb,
        )

    n_merged = jnp.zeros((), jnp.int32)
    if sc.merge_nodes:
        live_before = g.node_valid
        g_before = g
        ki, ai, ok_pairs = lifecycle.find_merge_pairs(
            g, center, radius,
            dist_thresh=sc.merge_dist,
            angle_thresh_deg=sc.merge_angle_deg,
            margin=sc.merge_margin,
        )
        g = lifecycle.merge_nodes(g, ki, ai, ok_pairs)
        n_merged = jnp.sum(ok_pairs).astype(jnp.int32)
        # sensor payloads MERGE into the kept node (scans re-binned in the
        # kept frame, descriptor slots backfilled) — the reference merges
        # laser scans and sensor data on mergeNodes
        # (graph_slam_node.cpp:890-1062) instead of discarding them
        state = _merge_banks(
            state, g_before, g, ki, ai, ok_pairs, config.scan_bins
        )
        # absorbed nodes must leave the recognition banks too, or PR keeps
        # proposing candidates against dead slots
        state = drop_from_banks(state, live_before & ~g.node_valid)
    evicted = jnp.zeros((), jnp.int32)
    if sc.is_sub_graph:
        mask = lifecycle.out_of_scope_mask(
            g, center, radius, sc.eviction_margin, shipped=shipped
        )
        g = lifecycle.evict_nodes(g, mask)
        state = drop_from_banks(state, mask)
        evicted = jnp.sum(mask).astype(jnp.int32)
    return state._replace(graph=g), {"merged": n_merged, "evicted": evicted}


@partial(jax.jit, donate_argnums=(0,))
def compact_state(state: SlamState) -> tuple[SlamState, dict]:
    """Slot reclamation over the graph AND every per-node bank
    (``lifecycle.compact_graph``): live nodes permute to the front, the
    high-water marks shrink to the live counts, and freed capacity is
    reusable — a bounded local scope stays in one capacity tier forever
    (reference ``removeNode`` frees entries, ``slam_graph.cpp:216-229``).

    Returns (state, perm); ``perm`` remaps any external slot-aligned
    tables (e.g. ``scope.ShipState`` masks: ``node_acked[node_order]``,
    ``edge_acked[edge_order] & edge_kept``)."""
    g, perm = lifecycle.compact_graph(state.graph)
    order = perm["node_order"]
    inv = perm["node_inv"]
    live = g.node_valid

    def nperm(a):
        return a[order]

    repo = state.repo
    if repo is not None:
        remapped = inv[repo.links]
        repo = repo._replace(
            node_stamp=nperm(repo.node_stamp),
            node_valid=nperm(repo.node_valid) & live,
            links=jnp.maximum(remapped, 0),
            link_valid=repo.link_valid & (remapped >= 0),
        )
    bow = state.bow
    if bow is not None:
        bow = voc.BowBank(
            vec=nperm(bow.vec), stamp=nperm(bow.stamp),
            valid=nperm(bow.valid) & live,
        )
    last = state.last_kf_slot
    new_last = jnp.where(last >= 0, inv[jnp.maximum(last, 0)], -1).astype(jnp.int32)
    cb = {}
    if state.clouds is not None:
        cb = dict(
            clouds=nperm(state.clouds),
            cloud_lab=nperm(state.cloud_lab),
            cloud_valid=nperm(state.cloud_valid) & live[:, None],
        )
    state = state._replace(
        graph=g,
        **cb,
        gist=rec.GistBank(
            desc=nperm(state.gist.desc),
            stamp=nperm(state.gist.stamp),
            valid=nperm(state.gist.valid) & live,
        ),
        desc=nperm(state.desc),
        desc_valid=nperm(state.desc_valid) & live[:, None],
        points=nperm(state.points),
        scans=nperm(state.scans),
        scan_valid=nperm(state.scan_valid) & live,
        last_kf_slot=new_last,
        repo=repo,
        bow=bow,
    )
    return state, perm


def grow_state(state: SlamState, node_capacity: int, edge_capacity: int) -> SlamState:
    """Host-side capacity growth of the graph AND all per-node banks
    (recompilation-free growth tiers: shapes change only between jitted
    steps). Not jit-safe."""
    g = lifecycle.ensure_capacity(state.graph, node_capacity, edge_capacity)
    new_n = g.node_capacity
    old_n = state.desc.shape[0]
    if new_n == old_n:
        return state._replace(graph=g)
    pad = new_n - old_n

    def pad0(a, fill=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    repo = state.repo
    if repo is not None:
        # node-indexed fields grow; the unique-descriptor bank keeps its
        # capacity (it scales with total features seen, not node slots)
        repo = repo._replace(
            node_stamp=pad0(repo.node_stamp),
            node_valid=pad0(repo.node_valid),
        )
    bow = state.bow
    if bow is not None:
        bow = voc.BowBank(
            vec=pad0(bow.vec), stamp=pad0(bow.stamp), valid=pad0(bow.valid)
        )
    cb = {}
    if state.clouds is not None:
        cb = dict(
            clouds=pad0(state.clouds),
            cloud_lab=pad0(state.cloud_lab),
            cloud_valid=pad0(state.cloud_valid),
        )
    return state._replace(
        graph=g,
        **cb,
        gist=rec.GistBank(
            desc=pad0(state.gist.desc),
            stamp=pad0(state.gist.stamp),
            valid=pad0(state.gist.valid),
        ),
        desc=pad0(state.desc),
        desc_valid=pad0(state.desc_valid),
        points=pad0(state.points),
        scans=pad0(state.scans, fill=jnp.inf),
        scan_valid=pad0(state.scan_valid),
        repo=repo,
        bow=bow,
    )


# ---------------------------------------------------------------------------
# Host-side convenience wrapper
# ---------------------------------------------------------------------------

def _keyframe_due_np(last_pose, cur_pose, dist_thresh, angle_deg) -> bool:
    """Host-side keyframe gate (numpy) — avoids device round trips."""
    import numpy as np

    dt = float(np.linalg.norm(cur_pose[:3] - last_pose[:3]))
    dot = float(np.abs(np.clip(np.sum(cur_pose[3:7] * last_pose[3:7]), -1.0, 1.0)))
    dr = 2.0 * np.arccos(dot)
    return dt >= dist_thresh or np.degrees(dr) >= angle_deg


GPS_ANCHOR_UID = gstate.GPS_ANCHOR_UID


class Slam:
    """Imperative shell over the functional core: keyframe gating, capacity
    growth, and epoch scheduling (the role of ``main()`` + timers,
    ``graph_slam_node.cpp:1284-1355``)."""

    def __init__(self, config: SlamConfig = SlamConfig(), cam=None,
                 cam_pose=None, seed: int = 0, vocabulary=None):
        self.config = config
        self.cam = cam or cam_mod.default_kinect()
        self.cam_pose = cam_pose if cam_pose is not None else lie.pose_identity()
        self.state = init_state(config, seed, vocabulary=vocabulary)
        self.grid: occupancy.OccupancyGrid | None = None
        self.optimize_every = 10
        self.auto_grow = True
        self._since_opt = 0
        self._epochs_since_calib = 0
        self._pending = []  # host-side due-frame buffer (enqueue_frame)
        import numpy as np
        self._pending_last_odom = np.zeros(7, np.float32)
        import numpy as np
        self._last_kf_odom_host = np.asarray(self.state.last_kf_odom)
        self._n_kf_host = 0
        # host-side estimate of the node-slot high-water mark: grows with
        # insertions, resets to the true count after maintain()/compaction —
        # this is what gates capacity growth (NOT the total keyframe count,
        # which never shrinks when eviction frees slots)
        self._n_slots_host = 0
        # odometry x IMU EKF (lazy; first fuse_odometry call initializes)
        self._ekf = None
        self._ekf_prev_odom = None
        self._ekf_prev_stamp = None
        # live persistence (reference sync_to_database, slam_graph.cpp:154-174)
        self._db = None
        self._db_num_edges = 0
        if config.sync_to_database:
            from uzliti_slam_tpu.io.database import GraphDatabase

            self._db = GraphDatabase(config.sync_to_database)
            if self._db.counts()[0] > 0:
                self._resume_from_db()

    # -- odometry x IMU fusion (reference robot_pose_ekf upstream of the
    # SLAM node, iti_slam_launch/launch/pose_ekf.launch:4-17) --------------

    def fuse_odometry(self, odom_pose, stamp, imu_yaw_rates=()):
        """Fuse raw wheel odometry with IMU yaw-rate samples queued since
        the last frame; returns the fused SE(3) pose (numpy). Available to
        every ingestion surface (serve, demo, runner, offline eval). EKF
        math runs on the CPU backend — 5x5 matrices are not worth a
        remote-TPU dispatch."""
        import numpy as np

        from uzliti_slam_tpu.frontend import ekf
        from uzliti_slam_tpu.ops import lie as _lie

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            if self._ekf is None:
                xy_yaw = _lie.pose_to_pose2(jnp.asarray(odom_pose, jnp.float32))
                self._ekf = ekf.ekf_init(jnp.concatenate([xy_yaw, jnp.zeros(2)]))
                self._ekf_prev_odom = np.asarray(odom_pose, np.float32)
                self._ekf_prev_stamp = float(stamp)
                return np.asarray(ekf.ekf_pose(self._ekf))
            dt = max(float(stamp) - self._ekf_prev_stamp, 1e-3)
            rel = _lie.pose_relative(
                jnp.asarray(self._ekf_prev_odom, jnp.float32),
                jnp.asarray(odom_pose, jnp.float32),
            )
            body_delta = _lie.pose_to_pose2(rel)
            s = ekf.ekf_predict(self._ekf, jnp.asarray(dt, jnp.float32))
            s = ekf.ekf_update_odom(s, body_delta, jnp.asarray(dt, jnp.float32))
            for wz in np.atleast_1d(np.asarray(imu_yaw_rates, np.float32)):
                s = ekf.ekf_update_imu_yaw_rate(s, jnp.asarray(wz))
            self._ekf = s
            self._ekf_prev_odom = np.asarray(odom_pose, np.float32)
            self._ekf_prev_stamp = float(stamp)
            return np.asarray(ekf.ekf_pose(s))

    # -- live persistence (reference sync_to_database + loadGraph) ---------

    def _resume_from_db(self):
        """Rebuild the full SLAM state from the database: graph rows,
        sensor payloads, recognition banks (the reference re-runs PR
        indexing on load, ``graph_slam_node.cpp:875-888``)."""
        import dataclasses as _dc

        import numpy as np

        db = self._db
        n_db, e_db = db.counts()
        counters = db.load_meta("counters")
        need_n = max(n_db, int(counters[0]) if counters is not None else 0)
        while (need_n >= int(0.9 * self.config.node_capacity)
               or e_db >= int(0.9 * self.config.edge_capacity)):
            self.config = _dc.replace(
                self.config,
                node_capacity=self.config.node_capacity * 2,
                edge_capacity=self.config.edge_capacity * 2,
            )
            self.state = grow_state(
                self.state, self.config.node_capacity, self.config.edge_capacity
            )
        g = db.load_graph(self.config.node_capacity, self.config.edge_capacity)
        st = self.state
        f = st.desc.shape[1]
        b = st.scans.shape[1]
        uids = np.asarray(g.node_uid)
        valid = np.asarray(g.node_valid)
        slot_of = {int(u): s for s, u in enumerate(uids) if valid[s]}
        desc = np.zeros(st.desc.shape, np.uint8)
        desc_valid = np.zeros(st.desc_valid.shape, bool)
        points = np.zeros(st.points.shape, np.float32)
        scans = np.full(st.scans.shape, np.inf, np.float32)
        scan_valid = np.zeros(st.scan_valid.shape, bool)
        gists = np.zeros((st.desc.shape[0], 32), np.uint8)
        has_gist = np.zeros(st.desc.shape[0], bool)
        for uid, d, dv, pts, scan, sv, gist in db.load_sensor_rows(f, b):
            s = slot_of.get(int(uid))
            if s is None:
                continue
            desc[s], desc_valid[s], points[s] = d, dv, pts
            scans[s], scan_valid[s] = scan, sv
            gists[s], has_gist[s] = gist, True

        # newest keyframe (anchor nodes — GPS origin, scope boundaries —
        # are not keyframes)
        stamps = np.asarray(g.stamp)
        is_kf = valid & (uids // 1_000_000 == self.config.instance_id) & (
            uids != GPS_ANCHOR_UID
        )
        last = int(np.argmax(np.where(is_kf, stamps, -np.inf))) if is_kf.any() else -1
        nk_meta = db.load_meta("n_keyframes")
        n_kf = int(nk_meta[0]) if nk_meta is not None else int(is_kf.sum())

        st = st._replace(
            graph=g,
            gist=rec.GistBank(
                desc=jnp.asarray(gists),
                stamp=jnp.asarray(stamps, jnp.float32),
                valid=jnp.asarray(has_gist & valid),
            ),
            desc=jnp.asarray(desc),
            desc_valid=jnp.asarray(desc_valid),
            points=jnp.asarray(points),
            scans=jnp.asarray(scans),
            scan_valid=jnp.asarray(scan_valid),
            last_kf_slot=jnp.asarray(last, jnp.int32),
            last_kf_odom=(
                g.odom_pose[last] if last >= 0 else st.last_kf_odom
            ),
            n_keyframes=jnp.asarray(n_kf, jnp.int32),
        )
        # method-specific PR index rebuild from the restored descriptors
        rc = self.config.recognition
        if rc.method == "repository":
            order = np.argsort(stamps)
            for s in order:
                if not (valid[s] and desc_valid[s].any()):
                    continue
                st = st._replace(
                    repo=rec.repository_add(
                        st.repo, jnp.asarray(int(s)), jnp.asarray(desc[s]),
                        jnp.asarray(desc_valid[s]),
                        jnp.asarray(float(stamps[s])),
                        match_thresh=tn.feature_hamming_thresh,
                    )
                )
        elif rc.method == "bow":
            bow = st.bow
            for s in range(len(valid)):
                if not (valid[s] and desc_valid[s].any()):
                    continue
                vec = voc.quantize(
                    st.vocab, jnp.asarray(desc[s]), jnp.asarray(desc_valid[s])
                )
                bow = voc.bow_bank_add(
                    bow, jnp.asarray(s, jnp.int32), vec,
                    jnp.asarray(float(stamps[s])),
                )
            st = st._replace(bow=bow)
        self.state = st
        self._n_kf_host = n_kf
        self._n_slots_host = int(jax.device_get(g.num_nodes))
        self._db_num_edges = int(jax.device_get(g.num_edges))
        self._last_kf_odom_host = np.asarray(st.last_kf_odom)

    def _db_sync_keyframe(self, info):
        """Write-through of the just-inserted node + its new edges + sensor
        payload (``slam_graph.cpp:154-156, 337-339``)."""
        import numpy as np

        slot = int(jax.device_get(info["new_slot"]))
        if slot < 0:
            return
        g = self.state.graph
        st = self.state
        self._db.store_nodes(g, [slot])
        ne = int(jax.device_get(g.num_edges))
        if ne > self._db_num_edges:
            self._db.store_edges(g, np.arange(self._db_num_edges, ne))
        self._db_num_edges = ne
        self._db.store_sensor_rows([(
            int(jax.device_get(g.node_uid[slot])),
            jax.device_get(st.desc[slot]),
            jax.device_get(st.desc_valid[slot]),
            jax.device_get(st.points[slot]),
            jax.device_get(st.scans[slot]),
            bool(jax.device_get(st.scan_valid[slot])),
            jax.device_get(st.gist.desc[slot]),
        )])

    def _db_sync_full(self):
        """Reconciling full sync after optimize/maintain (poses moved,
        nodes merged/evicted, slots compacted)."""
        import numpy as np

        g = self.state.graph
        st = self.state
        self._db.sync_graph(g)
        self._db.store_meta(
            "n_keyframes", np.array([self._n_kf_host], np.float64)
        )
        valid = np.asarray(g.node_valid)
        uids = np.asarray(g.node_uid)
        desc = np.asarray(st.desc)
        dv = np.asarray(st.desc_valid)
        pts = np.asarray(st.points)
        scans = np.asarray(st.scans)
        sv = np.asarray(st.scan_valid)
        gists = np.asarray(st.gist.desc)
        self._db.store_sensor_rows([
            (int(uids[s]), desc[s], dv[s], pts[s], scans[s], bool(sv[s]), gists[s])
            for s in np.nonzero(valid)[0]
        ])
        self._db_num_edges = int(jax.device_get(g.num_edges))

    def add_frame(self, image, depth, odom_pose, stamp, cam_disp=None) -> dict | None:
        """Process a frame if keyframe-due; returns step info (device
        arrays — don't sync them on the hot path) or None.

        The keyframe gate runs host-side in numpy and the step is a single
        jitted dispatch: over a remote-TPU tunnel each dispatch costs
        ~40 ms, so the frame path must be exactly one round trip.
        """
        import numpy as np

        kc = self.config.keyframe
        due = self._n_kf_host == 0 or _keyframe_due_np(
            self._last_kf_odom_host, np.asarray(odom_pose),
            kc.new_node_distance, kc.new_node_angle_deg,
        )
        if not due:
            return None
        # auto-growth: re-pad to the next tier BEFORE slots run out so
        # add_node never silently drops keyframes (growth recompiles the
        # steps once per tier — the recompilation-free-within-tier design)
        if self.auto_grow and self._n_slots_host >= int(0.9 * self.config.node_capacity):
            import dataclasses as _dc
            new_cfg = _dc.replace(
                self.config,
                node_capacity=self.config.node_capacity * 2,
                edge_capacity=self.config.edge_capacity * 2,
            )
            self.state = grow_state(
                self.state, new_cfg.node_capacity, new_cfg.edge_capacity
            )
            self.config = new_cfg
        kf = Keyframe(image=image, depth=depth, odom_pose=odom_pose,
                      stamp=jnp.asarray(stamp, jnp.float32),
                      cam_disp=None if cam_disp is None else jnp.asarray(cam_disp))
        self.state, info = process_keyframe(
            self.state, kf, self.cam, self.cam_pose, self.config
        )
        self._last_kf_odom_host = np.asarray(odom_pose)
        self._n_kf_host += 1
        self._n_slots_host += 1
        self._since_opt += 1
        if self._db is not None:
            self._db_sync_keyframe(info)
        if self._since_opt >= self.optimize_every:
            self.optimize()
        return info

    def enqueue_frame(self, image, depth, odom_pose, stamp,
                      chunk: int = 8) -> bool:
        """Streaming ingest with the gate BEFORE the transfer.

        The reference requests sensor data only when odometry moved past
        the keyframe threshold (``SensorRequest``,
        ``graph_slam_node.cpp:161-186``) — camera frames for non-keyframes
        never cross the wire.  This is that policy for the TPU: the host
        gate runs on odometry alone; non-due frames are dropped with ZERO
        host->device traffic, due frames buffer host-side and ship as one
        fixed-shape ``process_frame_chunk`` dispatch per ``chunk``
        keyframes (partial flushes pad to ``chunk`` so one compiled shape
        serves the whole stream).  Returns whether the frame was due.
        Call ``flush_frames()`` at end of stream.
        """
        import numpy as np

        kc = self.config.keyframe
        odom = np.asarray(odom_pose, np.float32)
        first = self._n_kf_host == 0 and not self._pending
        last = (
            self._pending_last_odom if self._pending
            else self._last_kf_odom_host
        )
        due = first or _keyframe_due_np(
            last, odom, kc.new_node_distance, kc.new_node_angle_deg,
        )
        if not due:
            return False
        self._pending.append((np.asarray(image), np.asarray(depth), odom,
                              np.float32(stamp)))
        self._pending_last_odom = odom
        if len(self._pending) >= chunk:
            self.flush_frames(chunk)
        return True

    def flush_frames(self, chunk: int = 8):
        """Dispatch buffered due frames (padding a partial buffer to the
        static ``chunk`` shape with masked-out repeats)."""
        import numpy as np

        if not self._pending:
            return None
        n_real = len(self._pending)
        pend = list(self._pending)
        self._pending = []
        while len(pend) < chunk:
            pend.append(pend[-1])
        due = np.zeros(len(pend), bool)
        due[:n_real] = True
        infos = self.add_frames(
            np.stack([p[0] for p in pend]),
            np.stack([p[1] for p in pend]),
            np.stack([p[2] for p in pend]),
            np.asarray([p[3] for p in pend], np.float32),
            due=due,
        )
        return infos

    def add_frames(self, images, depths, odom_poses, stamps,
                   due=None) -> dict:
        """Process a chunk of raw frames in ONE device dispatch
        (``process_frame_chunk``): the keyframe gate runs on-device, so
        this accepts the full 30 Hz camera stream and inserts only due
        keyframes. Leading axis of every argument is time.

        Returns the per-frame info pytree (device arrays; ``inserted`` is
        the keyframe mask)."""
        import numpy as np

        t = len(stamps)
        # loop the doubling: a chunk can hold more due keyframes than one
        # doubling provides, and add_node silently drops past capacity
        while self.auto_grow and (
            self._n_slots_host + t >= int(0.9 * self.config.node_capacity)
        ):
            import dataclasses as _dc
            new_cfg = _dc.replace(
                self.config,
                node_capacity=self.config.node_capacity * 2,
                edge_capacity=self.config.edge_capacity * 2,
            )
            self.state = grow_state(
                self.state, new_cfg.node_capacity, new_cfg.edge_capacity
            )
            self.config = new_cfg
        kfs = Keyframe(
            image=jnp.asarray(images), depth=jnp.asarray(depths),
            odom_pose=jnp.asarray(odom_poses),
            stamp=jnp.asarray(stamps, jnp.float32),
        )
        # HOST keyframe gate (same 0.3 m / 10° test the device would run,
        # sequential over the chunk): passing the mask down means the chunk
        # result is never fetched on the hot path, so dispatches pipeline —
        # chunk N+1 is built and enqueued while N still executes. Capacity
        # is guaranteed by the growth loop above, so gate == inserted; the
        # non-growing configuration keeps the authoritative device fetch.
        if due is not None:
            due = np.asarray(due, bool)
            self.state, infos = process_frame_chunk(
                self.state, kfs, self.cam, self.cam_pose, self.config,
                due=jnp.asarray(due),
            )
            inserted = due
            n_new = int(due.sum())
            if n_new:
                last = int(np.nonzero(due)[0][-1])
                self._last_kf_odom_host = np.asarray(odom_poses[last], np.float32)
        elif self.auto_grow:
            kc = self.config.keyframe
            odoms = np.asarray(odom_poses, np.float32)
            due = np.zeros(t, bool)
            last_odom = self._last_kf_odom_host
            n_kf = self._n_kf_host
            for i in range(t):
                d = n_kf == 0 or _keyframe_due_np(
                    last_odom, odoms[i],
                    kc.new_node_distance, kc.new_node_angle_deg,
                )
                if d:
                    last_odom = odoms[i]
                    n_kf += 1
                due[i] = d
            self.state, infos = process_frame_chunk(
                self.state, kfs, self.cam, self.cam_pose, self.config,
                due=jnp.asarray(due),
            )
            inserted = due
            n_new = int(n_kf - self._n_kf_host)
            self._last_kf_odom_host = last_odom
        else:
            self.state, infos = process_frame_chunk(
                self.state, kfs, self.cam, self.cam_pose, self.config
            )
            inserted = np.asarray(infos["inserted"])
            n_new = int(inserted.sum())
            if n_new:
                last = int(np.nonzero(inserted)[0][-1])
                self._last_kf_odom_host = np.asarray(odom_poses[last])
        self._n_kf_host += n_new
        self._n_slots_host += n_new
        self._since_opt += n_new
        if self._db is not None and n_new:
            self._db_sync_full()
        if self._since_opt >= self.optimize_every:
            self.optimize()
        return infos

    def add_gps(self, xyz, sigma: float = 1.0) -> bool:
        """Ingest an absolute GPS fix for the newest keyframe as a
        translation-only TYPE_3D_GPS factor from a fixed map-origin anchor
        node (``Edge.msg`` TYPE_3D_GPS + ``Graph.msg`` gps_offset — fold
        any UTM offset into ``xyz`` before calling). Low-rate host path;
        returns False when no keyframe exists yet."""
        import numpy as np

        g = self.state.graph
        last = int(jax.device_get(self.state.last_kf_slot))
        if last < 0:
            return False
        uids = np.asarray(g.node_uid)
        valid = np.asarray(g.node_valid)
        anchors = np.nonzero(valid & (uids == GPS_ANCHOR_UID))[0]
        if len(anchors) == 0:
            g, slot = gstate.add_node(
                g, lie.pose_identity(), lie.pose_identity(),
                jnp.asarray(0.0), fixed=True, uid=GPS_ANCHOR_UID,
            )
            anchor = int(jax.device_get(slot))
            if anchor < 0:
                return False
            self._n_slots_host += 1
        else:
            anchor = int(anchors[0])
        measurement = lie.make_pose(
            jnp.asarray(xyz, jnp.float32), jnp.array([1.0, 0, 0, 0], jnp.float32)
        )
        info = (1.0 / float(sigma) ** 2) * jnp.eye(6)
        g, eslot = gstate.add_edge(
            g, jnp.asarray(anchor, jnp.int32), jnp.asarray(last, jnp.int32),
            measurement, info, etype=gstate.EDGE_TYPE_3D_GPS,
        )
        self.state = self.state._replace(graph=g)
        return int(jax.device_get(eslot)) >= 0

    def optimize(self):
        self.state, stats = optimize_epoch(self.state, self.config)
        self._since_opt = 0
        self._epochs_since_calib += 1
        if (
            self.config.calibrate_every > 0
            and self._epochs_since_calib >= self.config.calibrate_every
        ):
            self.calibrate()
        if self.config.project_map:
            self.project_map()
        if self._db is not None:
            self._db_sync_full()
        return stats

    def set_param(self, name: str, value: float) -> None:
        """Live-retune a numeric gate with ZERO recompilation — the
        dynamic_reconfigure analog (``GraphSlam.cfg:9-34``, callbacks
        ``graph_slam_node.cpp:1087-1116``).  ``name`` is a
        ``config.Tunables`` field (estimation / recognition / front-end
        gate); the scalar updates on device and the next jitted step reads
        it as a dynamic operand.  Keyframe spacing and timer cadences are
        plain host attributes (``config.keyframe`` is read by the host
        gate; ``optimize_every`` / ``calibrate_every`` by the scheduler) —
        also recompile-free.  Shape-determining params (capacities,
        budgets, method selection) are intentionally NOT here: changing
        them re-specializes the compiled step.
        """
        import dataclasses as _dc

        tn = self.state.tunables
        if tn is None or not hasattr(tn, name):
            # host-side keyframe-gate params retune through the config
            # dataclass (never traced on the frame path)
            if hasattr(self.config.keyframe, name):
                self.config = _dc.replace(
                    self.config,
                    keyframe=_dc.replace(self.config.keyframe, **{name: value}),
                )
                return
            raise KeyError(f"unknown tunable {name!r}")
        self.state = self.state._replace(
            tunables=tn._replace(**{name: jnp.asarray(value, jnp.float32)})
        )

    def calibrate(self, update_extrinsics: bool = False,
                  iterations: int = 20):
        """Periodic calibration epoch (the reference's
        ``SensorTransformOptimizer``, ``sensor_transform_optimizer.cpp:37-192``,
        run live instead of offline): on the current frozen graph,
        re-estimate the odometry drift parameters (and optionally the
        camera extrinsics) and store them on the graph, where the next
        ``optimize_epoch`` consumes them via
        ``solver.use_odometry_calibration`` (``g2o_optimizer.cpp:209-227``).

        ``update_extrinsics=False`` mirrors the reference's shipped
        behavior (its sensor vertices are held fixed,
        ``sensor_transform_optimizer.cpp:49``); pass True to also adopt
        the refined camera extrinsics into ``self.cam_pose``.
        """
        from uzliti_slam_tpu.graph import calibration

        g = self.state.graph
        cam_poses = (
            self.cam_pose if self.cam_pose.ndim == 2 else self.cam_pose[None]
        )
        # visual loop closures are measured through camera 0's frame pair;
        # odometry edges carry sensor index -1 (base frame)
        sensor_idx = jnp.where(
            g.e_type == gstate.EDGE_TYPE_3D_FULL,
            0 if update_extrinsics else -1,
            -1,
        ).astype(jnp.int32)
        result = _calibrate_jit(
            g, cam_poses, sensor_idx, iterations
        )
        self.state = self.state._replace(
            graph=g._replace(odom_params=result.odom_params)
        )
        if update_extrinsics:
            new_cp = result.sensor_transforms
            self.cam_pose = new_cp if self.cam_pose.ndim == 2 else new_cp[0]
        self._epochs_since_calib = 0
        return result

    def project_map(self, force_full: bool = False):
        """Project the graph's virtual scans into the live occupancy grid —
        the reference ends every optimization with a detached
        ``projector_->project(graph)`` (``graph_slam_node.cpp:1277-1279``).
        One async jitted dispatch; the host does not block on it."""
        g = self.state.graph
        if self.grid is None or self.grid.ref_poses.shape[0] != g.node_capacity:
            self.grid = occupancy.grid_init(g, self.config.grid)
            force_full = True
        self.grid = _project_map_jit(
            self.grid, g, self.state.scans, self.state.scan_valid,
            self.config.grid, force_full=force_full,
        )
        return self.grid

    def map_probability(self):
        """(size, size) occupancy probabilities of the live grid (projects
        first if no epoch has run yet)."""
        if self.grid is None:
            self.project_map()
        return occupancy.occupancy_probability(self.grid)

    def map_ternary(self):
        """ROS-style -1/0/100 occupancy classes of the live grid."""
        if self.grid is None:
            self.project_map()
        return occupancy.to_ternary(self.grid)

    def reregister_scans(self, k_targets: int = 4):
        """Scan re-registration timer equivalent."""
        self.state, n = scan_reregistration(self.state, self.config, k_targets)
        return n

    def maintain(self, shipped=None, center=None):
        """Merge/eviction timer equivalent (role set by config.scope).
        ``shipped``: (N,) ACK mask from the scope protocol — without it a
        sub-graph evicts unconditionally (standalone window). ``center``:
        explicit robot pose (7,) for instances without keyframes (global).

        Also reclaims slots: when eviction/merging has freed at least half
        the used slots, the state is compacted so the capacity tier never
        grows for a bounded scope. Returns info with ``compact_perm`` set
        (or None) so callers can remap slot-aligned side state
        (``scope.ShipState``)."""
        self.state, info = maintenance_epoch(self.state, self.config, shipped, center)
        info = dict(info)
        info["compact_perm"] = None
        hw = int(jax.device_get(self.state.graph.num_nodes))
        live = int(jax.device_get(jnp.sum(self.state.graph.node_valid)))
        if hw >= max(64, int(0.25 * self.config.node_capacity)) and live <= hw // 2:
            self.state, perm = compact_state(self.state)
            info["compact_perm"] = perm
            hw = live
            # compaction permutes slots: the grid's slot-aligned drift
            # snapshot is stale — rebuild from scratch on next projection
            self.grid = None
        self._n_slots_host = hw
        if self._db is not None:
            self._db_sync_full()
        return info

    def trajectory(self):
        g = self.state.graph
        n = int(g.num_nodes)
        return g.pose[:n], g.node_valid[:n]
