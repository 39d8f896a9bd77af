"""Synthetic RGB-D world simulator for end-to-end pipeline tests and demos.

Substitutes for the reference's rosbag dataset playback
(``iti_slam_launch/launch/dataset.launch``): a robot drives past an
infinite textured wall; each frame renders the wall texture and metric
depth through a pinhole camera, with odometry drift injected — so the full
front-end → registration → optimization loop can be validated against
ground truth without external data (zero-egress environment).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from uzliti_slam_tpu.frontend import camera as cam_mod
from uzliti_slam_tpu.ops import lie


# Camera optical frame -> robot base frame: z_cam = +x_base (forward),
# x_cam = -y_base (right), y_cam = -z_base (down).
CAM_IN_BASE_R = np.array([
    [0.0, 0.0, 1.0],
    [-1.0, 0.0, 0.0],
    [0.0, -1.0, 0.0],
])


def cam_extrinsic(height: float = 0.5) -> jnp.ndarray:
    return lie.make_pose(
        jnp.array([0.0, 0.0, height]),
        lie.matrix_to_quat(jnp.asarray(CAM_IN_BASE_R, dtype=jnp.float32)),
    )


class WallWorld:
    """A textured wall at world x = ``wall_x``; the robot moves in the
    x-y plane facing +x. Texture = random bright blobs (FAST-friendly)."""

    def __init__(self, wall_x: float = 3.0, tex_size: int = 4096,
                 px_per_m: float = 120.0, seed: int = 0,
                 img_h: int = 120, img_w: int = 160, f: float = 130.0):
        rng = np.random.default_rng(seed)
        tex = np.full((tex_size, tex_size), 40.0, dtype=np.float32)
        n_blobs = (tex_size // 24) ** 2
        ys = rng.integers(0, tex_size - 30, n_blobs)
        xs = rng.integers(0, tex_size - 30, n_blobs)
        for y, x in zip(ys, xs):
            h = rng.integers(6, 24)
            w = rng.integers(6, 24)
            tex[y:y + h, x:x + w] = rng.uniform(120, 250)
        self.tex = tex
        self.tex_size = tex_size
        self.px_per_m = px_per_m
        self.wall_x = wall_x
        self.cam = cam_mod.PinholeCamera(
            fx=jnp.float32(f), fy=jnp.float32(f),
            cx=jnp.float32(img_w / 2), cy=jnp.float32(img_h / 2),
            width=img_w, height=img_h,
        )
        self.img_h = img_h
        self.img_w = img_w
        self.cam_height = 0.5

    def render(self, tx: float, ty: float) -> tuple[np.ndarray, np.ndarray]:
        """Render (image, depth) for a robot at (tx, ty), heading +x."""
        h, w = self.img_h, self.img_w
        f = float(self.cam.fx)
        cx = float(self.cam.cx)
        cy = float(self.cam.cy)
        z = self.wall_x - tx                       # wall distance (optical z)
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        # world coordinates of the wall point each pixel sees:
        # cam x (right) = -y_base  -> wall y = ty - (u-cx)/f*z
        # cam y (down)  = -z_base  -> wall height = cam_h - (v-cy)/f*z
        wy = ty - (uu - cx) / f * z
        wz = self.cam_height - (vv - cy) / f * z
        tu = np.mod(wy * self.px_per_m, self.tex_size - 1)
        tv = np.mod(-wz * self.px_per_m, self.tex_size - 1)
        # bilinear sample
        t0u = np.floor(tu).astype(int)
        t0v = np.floor(tv).astype(int)
        fu = tu - t0u
        fv = tv - t0v
        t1u = np.minimum(t0u + 1, self.tex_size - 1)
        t1v = np.minimum(t0v + 1, self.tex_size - 1)
        img = (
            self.tex[t0v, t0u] * (1 - fu) * (1 - fv)
            + self.tex[t0v, t1u] * fu * (1 - fv)
            + self.tex[t1v, t0u] * (1 - fu) * fv
            + self.tex[t1v, t1u] * fu * fv
        )
        # native Kinect wire format: uint8 mono image, uint16 depth in mm
        # (pipeline converts on device; transfers stay 4x smaller than f32)
        depth = np.full((h, w), round(z * 1000.0), dtype=np.uint16)
        return np.clip(img, 0, 255).astype(np.uint8), depth


def out_and_back_trajectory(n: int, length: float = 6.0):
    """Ground-truth (tx, ty) waypoints: drive +y for n/2 frames, return."""
    half = n // 2
    fwd = np.linspace(0.0, length, half)
    back = np.linspace(length, 0.0, n - half)
    ty = np.concatenate([fwd, back])
    tx = np.zeros(n)
    return tx, ty


def multi_lap_trajectory(n: int, length: float = 12.0, laps: int = 5):
    """(tx, ty) waypoints for ``laps`` out-and-back passes along the wall —
    every lap revisits the full corridor (genuine loop closures at scale)."""
    t = np.linspace(0.0, laps, n)
    # triangle wave in [0, 1]
    tri = 1.0 - np.abs(2.0 * (t - np.floor(t)) - 1.0)
    return np.zeros(n), tri * length


def export_tum_dataset(
    root: str,
    n_frames: int = 1040,
    length: float = 13.0,
    laps: int = 5,
    img_h: int = 480,
    img_w: int = 640,
    f: float = 525.0,
    odom_drift: float = 0.03,
    seed: int = 0,
    fps: float = 10.0,
    hard: bool = False,
) -> str:
    """Write a full TUM RGB-D directory rendered from the simulator:
    ``rgb/``+``depth/`` 8/16-bit PNGs, ``rgb.txt``/``depth.txt`` indexes,
    ``groundtruth.txt`` and ``odometry.txt`` trajectories (the drifted
    wheel odometry the reference's dataset bags carry,
    ``dataset.launch:1-36``). Idempotent: returns immediately when the
    directory already holds a complete export with the same parameters.

    ``hard=True`` adds the sensor pathologies real freiburg sequences
    carry and clean renders lack (real datasets are unreachable from this
    environment): depth speckle dropout + range-proportional noise
    (Kinect disparity error grows ~z^2) and a slow exposure drift with
    per-frame gain jitter. Rotation-only motion is NOT covered — the
    corridor renderer is translation-only."""
    import json
    import os

    from uzliti_slam_tpu.io import tum

    params = dict(
        n_frames=n_frames, length=length, laps=laps, img_h=img_h,
        img_w=img_w, f=f, odom_drift=odom_drift, seed=seed, fps=fps,
        hard=hard,
    )
    stamp_file = os.path.join(root, "params.json")
    if os.path.exists(stamp_file):
        with open(stamp_file) as fh:
            if json.load(fh) == params:
                return root
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    # texture long enough for the corridor (tex wraps at tex_size/px_per_m)
    world = WallWorld(
        img_h=img_h, img_w=img_w, f=f,
        tex_size=8192, px_per_m=int(8192 / (length + 8)),
    )
    rng = np.random.default_rng(seed)
    tx, ty = multi_lap_trajectory(n_frames, length, laps)
    bias = rng.normal(0, odom_drift, 2)
    odom = np.zeros(2)
    prev = np.array([tx[0], ty[0]])
    rgb_lines, dep_lines, gt_rows, od_rows = [], [], [], []
    for i in range(n_frames):
        stamp = i / fps
        gt_xy = np.array([tx[i], ty[i]])
        step = gt_xy - prev
        noise = rng.normal(0, odom_drift / 2, 2)
        odom = odom + step + (bias + noise) * np.linalg.norm(step)
        prev = gt_xy
        img, dep_mm = world.render(tx[i], ty[i])
        if hard:
            # exposure drift (slow sinusoid) + per-frame gain jitter
            gain = (1.0 + 0.25 * np.sin(2 * np.pi * i / 180.0)
                    + rng.normal(0, 0.03))
            img = np.clip(np.asarray(img, np.float64) * gain, 0, 255)
            # depth: range-proportional noise + speckle dropout holes
            z_m = np.asarray(dep_mm, np.float64) / 1000.0
            z_m = z_m * (1.0 + rng.normal(0, 0.004, z_m.shape) * z_m)
            z_m[rng.random(z_m.shape) < 0.05] = 0.0
            dep_mm = z_m * 1000.0
        # TUM depth png: meters * 5000
        dep16 = (dep_mm.astype(np.float64) * (tum.DEPTH_SCALE / 1000.0))
        dep16 = np.clip(dep16, 0, 65535).astype(np.uint16)
        rname = f"rgb/{stamp:.6f}.png"
        dname = f"depth/{stamp:.6f}.png"
        tum.write_png_gray(os.path.join(root, rname), img)
        tum.write_png_gray(os.path.join(root, dname), dep16)
        rgb_lines.append(f"{stamp:.6f} {rname}")
        dep_lines.append(f"{stamp:.6f} {dname}")
        gt_rows.append((stamp, [gt_xy[0], gt_xy[1], 0.0, 1.0, 0.0, 0.0, 0.0]))
        od_rows.append((stamp, [odom[0], odom[1], 0.0, 1.0, 0.0, 0.0, 0.0]))
    with open(os.path.join(root, "rgb.txt"), "w") as fh:
        fh.write("# color images\n" + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as fh:
        fh.write("# depth images\n" + "\n".join(dep_lines) + "\n")
    tum.write_trajectory(
        os.path.join(root, "groundtruth.txt"),
        [s for s, _ in gt_rows], np.asarray([p for _, p in gt_rows]),
    )
    tum.write_trajectory(
        os.path.join(root, "odometry.txt"),
        [s for s, _ in od_rows], np.asarray([p for _, p in od_rows]),
    )
    with open(stamp_file, "w") as fh:
        json.dump(params, fh)
    return root


def simulate_sequence(
    world: WallWorld,
    n_frames: int = 30,
    odom_drift: float = 0.01,
    seed: int = 0,
    length: float = 6.0,
):
    """Yield (image, depth, noisy_odom_pose, gt_pose, stamp) frames.

    Odometry accumulates a per-step bias (systematic drift), the classic
    error model SLAM must correct via loop closures.
    """
    rng = np.random.default_rng(seed)
    tx, ty = out_and_back_trajectory(n_frames, length)
    bias = rng.normal(0, odom_drift, 2)
    odom = np.zeros(2)
    prev = np.array([tx[0], ty[0]])
    frames = []
    for i in range(n_frames):
        gt_xy = np.array([tx[i], ty[i]])
        step = gt_xy - prev
        noise = rng.normal(0, odom_drift / 2, 2)
        odom = odom + step + (bias + noise) * np.linalg.norm(step)
        prev = gt_xy
        img, dep = world.render(tx[i], ty[i])
        gt_pose = lie.make_pose(
            jnp.array([gt_xy[0], gt_xy[1], 0.0], dtype=jnp.float32),
            jnp.array([1.0, 0, 0, 0], dtype=jnp.float32),
        )
        odom_pose = lie.make_pose(
            jnp.array([odom[0], odom[1], 0.0], dtype=jnp.float32),
            jnp.array([1.0, 0, 0, 0], dtype=jnp.float32),
        )
        frames.append(
            dict(
                # host (numpy) arrays, like a live sensor feed — device
                # arrays here would force a device->host sync in the
                # host-side keyframe gate on every frame
                image=img,
                depth=dep,
                odom_pose=np.asarray(odom_pose),
                gt_pose=gt_pose,
                stamp=float(i),
            )
        )
    return frames
