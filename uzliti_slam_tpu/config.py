"""Configuration tree for the engine.

Mirrors the reference's three-tier config system (launch yaml +
dynamic_reconfigure groups, SURVEY.md §5): one frozen dataclass per
subsystem, matching the reference's parameter groups —
GraphSlam (``graph_slam/cfg/GraphSlam.cfg``), GraphOptimizer,
FeatureLinkEstimation, PlaceRecognizer, OccupancyGridProjector,
FeatureExtraction.

Numeric GATE parameters additionally live in ``Tunables`` — device
scalars inside ``SlamState`` that ``Slam.set_param`` retunes mid-run
with no recompilation (the dynamic_reconfigure analog).  The remaining
dataclass values are static jit args; changing them recompiles, the
analog of a dynamic_reconfigure callback restarting timers.
"""

from __future__ import annotations

import dataclasses
import typing

import jax

from uzliti_slam_tpu.graph.filter import FilterConfig
from uzliti_slam_tpu.graph.solver import SolverConfig
from uzliti_slam_tpu.mapping.occupancy import GridConfig


class Tunables(typing.NamedTuple):
    """Live-retunable thresholds, carried as DEVICE SCALARS in SlamState.

    The reference live-tunes ~40 params through dynamic_reconfigure
    (``graph_slam/cfg/GraphSlam.cfg:9-34`` + the per-subsystem cfg groups,
    config callbacks ``graph_slam_node.cpp:1087-1116``).  Here the
    numeric GATES among them are dynamic jit operands instead of static
    trace constants, so ``Slam.set_param`` changes them mid-run with ZERO
    recompilation.  Shape-determining params (budgets, capacities,
    iteration counts, method selection) stay static — changing those
    re-specializes the compiled step, exactly as the reference's
    restart-requiring params do.  Timer cadences and the keyframe gate
    are host-side attributes (already recompile-free).
    """

    # feature extraction (FeatureExtraction.cfg)
    fast_threshold: jax.Array
    # place recognition gates (PlaceRecognizer.cfg)
    gist_max_dist: jax.Array
    feature_hamming_thresh: jax.Array
    min_similarity: jax.Array
    min_time_separation: jax.Array
    min_descriptors: jax.Array
    repo_min_votes: jax.Array
    bow_min_score: jax.Array
    # edge estimation gates (FeatureLinkEstimation.cfg)
    match_ratio: jax.Array
    max_match_distance: jax.Array
    ransac_inlier_thresh: jax.Array
    ransac_min_sigma: jax.Array
    min_consensus: jax.Array
    min_matching_score: jax.Array
    max_edge_translation: jax.Array
    max_edge_rotation_deg: jax.Array
    icp_max_corr: jax.Array
    icp_min_valid_fraction: jax.Array
    gicp_max_corr: jax.Array
    pnp_reproj_px: jax.Array


def tunables_from_config(cfg: "SlamConfig") -> Tunables:
    """Initialize the dynamic scalars from the static config defaults."""
    import jax.numpy as jnp

    fc, rc, ec = cfg.frontend, cfg.recognition, cfg.estimation
    f = lambda v: jnp.asarray(v, jnp.float32)
    return Tunables(
        fast_threshold=f(fc.fast_threshold),
        gist_max_dist=f(rc.gist_max_dist),
        feature_hamming_thresh=f(rc.feature_hamming_thresh),
        min_similarity=f(rc.min_similarity),
        min_time_separation=f(rc.min_time_separation),
        min_descriptors=f(rc.min_descriptors),
        repo_min_votes=f(rc.repo_min_votes),
        bow_min_score=f(rc.bow_min_score),
        match_ratio=f(ec.match_ratio),
        max_match_distance=f(ec.max_match_distance),
        ransac_inlier_thresh=f(ec.ransac_inlier_thresh),
        ransac_min_sigma=f(ec.ransac_min_sigma),
        min_consensus=f(ec.min_consensus),
        min_matching_score=f(ec.min_matching_score),
        max_edge_translation=f(ec.max_edge_translation),
        max_edge_rotation_deg=f(ec.max_edge_rotation_deg),
        icp_max_corr=f(ec.icp_max_corr),
        icp_min_valid_fraction=f(ec.icp_min_valid_fraction),
        gicp_max_corr=f(ec.gicp_max_corr),
        pnp_reproj_px=f(ec.pnp_reproj_px),
    )


@dataclasses.dataclass(frozen=True)
class FeatureExtractionConfig:
    """Reference FeatureExtraction.cfg:9-16."""
    max_keypoints: int = 300
    fast_threshold: float = 20.0
    pyramid_levels: int = 4
    scale_factor: float = 1.2
    grid: int = 4
    use_depth_refinement: bool = True
    # descriptor family ("brief" | "brisk" | "freak" binary, "sift" float)
    # — the reference's descriptor-type factory
    # (feature_extraction_core.cpp:51-85, Features.msg enums). The live
    # pipeline banks are binary (Hamming); "sift" is the float branch
    # matched by matching.match_descriptors_l2, available to offline /
    # custom pipelines exactly as the reference's SURF/SIFT enum values
    # are never selected by its deployment yamls.
    descriptor: str = "brief"
    # undistort image+depth before feature/GIST work (the reference
    # rectifies when distortion coefficients are nonzero,
    # feature_extraction_core.cpp:123-135); requires camera k1/k2/p1/p2
    rectify: bool = False


@dataclasses.dataclass(frozen=True)
class PlaceRecognitionConfig:
    """Reference PlaceRecognizer.cfg:9-11 + yaml method selection."""
    method: str = "gist"          # "gist" | "feature_set" | "repository" | "bow"
    k_candidates: int = 5          # local_slam.yaml:31
    gist_max_dist: float = 60.0
    feature_hamming_thresh: float = 40.0
    min_similarity: float = 0.2
    min_time_separation: float = 5.0
    # feature_set: queryable AND searchable only with enough descriptors
    # (lsh_set_recognizer.cpp:64,112 — reference gate 150 of a 300-feature
    # budget, i.e. 50%; scaled here to the default feats_per_node=128)
    min_descriptors: int = 64
    # repository (GlobalFeatureRepository) capacities/gates
    repo_desc_per_node: int = 32   # unique-descriptor capacity multiplier
    repo_links_per_desc: int = 8
    repo_min_votes: int = 5
    # bow (DBoW2 BinaryBowRecognizer analog)
    bow_words: int = 256
    bow_min_score: float = 0.05


@dataclasses.dataclass(frozen=True)
class EdgeEstimationConfig:
    """Reference FeatureLinkEstimation.cfg:9-13 + laser params."""
    # visual registration estimator, the reference's estimator choice
    # (graph_slam_node.cpp:49 instantiates one TransformationEstimator;
    # CloudTransformationEstimator / the EPnP twin are the swappable
    # alternatives, cloud_transformation_estimator.cpp:144-153,
    # graph_slam_common feature_transformation_estimator.cpp:136-144):
    # "feature" = Hamming match + 3-pt RANSAC-SVD, "gicp" = dense colored
    # 6-D ICP on voxel clouds, "pnp" = EPnP-style 2D-3D RANSAC
    method: str = "feature"
    ransac_hypotheses: int = 128   # ref: <=100 iterations
    ransac_inlier_thresh: float = 0.05
    ransac_min_sigma: float = 0.01  # sensor noise floor (m) for the
                                  # consensus/mse information model
    min_consensus: int = 12
    match_ratio: float = 0.9       # ref 0.99; tightened default
    max_match_distance: float = 64.0
    icp_iterations: int = 20
    icp_max_corr: float = 0.5
    icp_min_valid_fraction: float = 0.25
    # acceptance gates, reference newEdgeCallback graph_slam_node.cpp:798-803
    min_matching_score: float = 10.0
    max_edge_translation: float = 2.0
    max_edge_rotation_deg: float = 60.0
    # gicp estimator (reference cloud_transformation_estimator.cpp:117-153)
    gicp_voxel: float = 0.05
    gicp_max_voxels: int = 256
    gicp_iterations: int = 20
    gicp_max_corr: float = 0.2
    # pnp estimator (reference EPnP twin, 7-pt + reprojection consensus)
    pnp_hypotheses: int = 64
    pnp_reproj_px: float = 3.0


@dataclasses.dataclass(frozen=True)
class ScopeConfig:
    """Reference GraphSlam.cfg:33-34 + merge params."""
    is_sub_graph: bool = False
    scope_size_min: float = 8.0
    scope_size_factor: float = 0.1
    eviction_margin: float = 4.0
    merge_nodes: bool = False
    merge_dist: float = 0.25
    merge_angle_deg: float = 15.0
    merge_margin: float = 6.0


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Reference GraphSlam.cfg:9-10."""
    new_node_distance: float = 0.3
    new_node_angle_deg: float = 10.0
    distance_closure_radius: float = 2.0   # distance loop closures, :273-289
    distance_closure_max_angle_deg: float = 30.0


def config_from_dict(cls, data: dict):
    """Build a (nested) frozen config from plain dicts — the launch-yaml
    tier of the reference's config system, for JSON/YAML deployment files."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = config_from_dict(f.type, v)
        elif isinstance(v, dict):
            sub = f.default if not isinstance(f.default, dataclasses._MISSING_TYPE) else None
            kwargs[f.name] = config_from_dict(type(sub), v) if sub is not None else v
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str) -> "SlamConfig":
    """Load a SlamConfig from a JSON file (nested dicts per subsystem)."""
    import json

    with open(path) as f:
        return config_from_dict(SlamConfig, json.load(f))


def save_config(config, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2)


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    instance_id: int = 0            # namespaces node uids across instances
    node_capacity: int = 512
    edge_capacity: int = 2048
    feats_per_node: int = 128
    scan_bins: int = 360
    frontend: FeatureExtractionConfig = FeatureExtractionConfig()
    recognition: PlaceRecognitionConfig = PlaceRecognitionConfig()
    estimation: EdgeEstimationConfig = EdgeEstimationConfig()
    # the live pipeline multi-starts every solve from the odometry prior
    # too (batched with the refined start) — optimization must never end
    # in a basin worse than raw odometry.  Chain-preconditioned fast LM
    # (fused scatters, g2o-parity early exit) is the measured winner at
    # live graph sizes on TPU v5e AT CHI2 PARITY; the woodbury
    # preconditioner ran faster but with degraded chi2 (r5 sweep:
    # 47.5 vs 37.7 on the 1k rung), so quality keeps chain the default.
    solver: SolverConfig = SolverConfig(
        odometry_restart=True, preconditioner="chain",
        pcg_iterations=12, precond_refresh=5,
    )
    filter: FilterConfig = FilterConfig()
    scope: ScopeConfig = ScopeConfig()
    keyframe: KeyframeConfig = KeyframeConfig()
    use_laser_edges: bool = True
    # occupancy-grid projection after every optimization epoch — the
    # reference fires projector_->project(graph) on a detached thread at
    # the end of each solve (graph_slam_node.cpp:1277-1279); here the
    # projection is one async device dispatch after the solve
    grid: GridConfig = GridConfig()
    project_map: bool = True
    # live write-through persistence (the reference's sync_to_database,
    # slam_graph.cpp:154-174 + load-at-startup with PR rebuild,
    # graph_slam_node.cpp:875-888): path of a SQLite graph database. Every
    # keyframe upserts its node/edges/sensor payload; optimize/maintain
    # reconcile the whole graph. On construction, a non-empty database is
    # loaded and the recognition banks rebuilt — kill-and-resume.
    sync_to_database: str | None = None
    # periodic odometry-drift calibration (the reference's
    # SensorTransformOptimizer run live): every N optimization epochs,
    # re-estimate graph.odom_params from the current graph
    # (``graph/calibration.py``); the solver consumes them when
    # ``solver.use_odometry_calibration`` is set
    # (``g2o_optimizer.cpp:209-227``). 0 = off.
    calibrate_every: int = 0
    # meters per unit of INTEGER depth inputs (uint16 wire format):
    # 0.001 = millimeters (Kinect); TUM pngs use 1/5000 m units
    depth_scale: float = 1e-3
