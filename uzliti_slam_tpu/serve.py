"""SLAM-as-a-service: a minimal HTTP ingestion/query server.

The deployment surface replacing the reference's ROS topic graph
(``slam.launch`` wiring): frames stream in over HTTP, trajectory/map/state
stream out.  Stdlib-only (zero-egress image); the heavy lifting stays in
the jitted pipeline — the handler thread does one dispatch per frame.

Endpoints:
- ``POST /frame``       npz body: image (H,W) or (C,H,W) f32, depth, odom_pose (7,), stamp ()
                        → {"keyframe": bool, "n_nodes": int}
- ``POST /optimize``    run one optimization epoch → {"chi2": [...]}
- ``POST /set_param``   JSON {name: value, ...} live gate retuning
                        (``config.Tunables`` — no recompilation)
- ``GET  /trajectory``  → JSON {stamps, poses} of valid nodes
- ``GET  /graph``       → JSON marker export (viz.graph_to_dict)
- ``GET  /stats``       → node/edge counts + metrics summary
- ``GET  /map``         → RLE occupancy grid (resolution, origin, cells)
- ``POST /checkpoint``  body {"path": ...} → snapshot state
- ``POST /shutdown``

Usage: ``python -m uzliti_slam_tpu.serve --port 8765 [--cpu]``
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class SlamService:
    """Thread-safe wrapper: one SLAM instance behind a lock (the jitted
    steps are sequential by design — state threading replaces the
    reference's graph mutex).

    Package imports are deferred to construction so ``--cpu`` can set the
    platform BEFORE any array is created (module-level imports would pin
    the default remote-TPU backend).
    """

    def __init__(self, config=None, cam=None, cam_pose=None, use_ekf: bool = False):
        from uzliti_slam_tpu import metrics as metrics_mod
        from uzliti_slam_tpu import pipeline
        from uzliti_slam_tpu.config import SlamConfig

        self.slam = pipeline.Slam(config or SlamConfig(), cam=cam, cam_pose=cam_pose)
        self.metrics = metrics_mod.Metrics()
        self.lock = threading.Lock()
        # odometry x IMU EKF upstream of the keyframe gate — the reference
        # runs robot_pose_ekf in front of the SLAM node
        # (iti_slam_launch/launch/pose_ekf.launch:4-17). Auto-enables when
        # a frame carries IMU samples.
        self.use_ekf = use_ekf

    def _fuse_odometry(self, odom_pose, stamp, imu_yaw_rates):
        """Delegates to ``pipeline.Slam.fuse_odometry`` — the EKF is part of
        the pipeline shell so demo/runner/offline-eval paths can fuse too."""
        return self.slam.fuse_odometry(odom_pose, stamp, imu_yaw_rates)

    def add_frame(self, image, depth, odom_pose, stamp, imu_yaw_rates=None):
        import jax
        with self.lock:
            if imu_yaw_rates is not None:
                self.use_ekf = True
            if self.use_ekf:
                odom_pose = self._fuse_odometry(
                    odom_pose, stamp,
                    imu_yaw_rates if imu_yaw_rates is not None else [],
                )
            with self.metrics.stage("frontend"):
                info = self.slam.add_frame(image, depth, odom_pose, stamp)
                # block so the stage timing covers device compute, not
                # just async dispatch
                jax.block_until_ready(self.slam.state.graph.pose)
            self.metrics.count("frames")
            if info is not None:
                self.metrics.count("keyframes")
        return info

    def optimize(self):
        import jax
        with self.lock:
            with self.metrics.stage("optimization"):
                stats = self.slam.optimize()
                jax.block_until_ready(self.slam.state.graph.pose)
        return stats

    def trajectory(self):
        with self.lock:
            g = self.slam.state.graph
            n = int(g.num_nodes)
            valid = np.asarray(g.node_valid[:n])
            poses = np.asarray(g.pose[:n])[valid]
            stamps = np.asarray(g.stamp[:n])[valid]
        return stamps.tolist(), poses.tolist()

    def graph_dict(self):
        from uzliti_slam_tpu import viz
        with self.lock:
            return viz.graph_to_dict(self.slam.state.graph)

    def stats(self):
        with self.lock:
            g = self.slam.state.graph
            out = {
                "n_nodes": int(g.num_nodes),
                "n_edges": int(g.num_edges),
                "n_valid_nodes": int(np.asarray(g.node_valid).sum()),
            }
            # metrics mutate under the same lock; summarize inside it so a
            # concurrent first-use insert can't resize dicts mid-iteration
            out.update(self.metrics.summary())
        return out

    def map_dict(self):
        """ROS ``nav_msgs/OccupancyGrid``-shaped export of the live map
        (the reference's ``/map`` topic from OccupancyGridProjector).
        Cells are run-length encoded [value, count] pairs in row-major
        order — a mostly-unknown 256x256 grid compresses ~100x."""
        with self.lock:
            tern = np.asarray(self.slam.map_ternary(), dtype=np.int8)
            grid = self.slam.grid
            origin = np.asarray(grid.origin, np.float64).tolist()
            res = self.slam.config.grid.resolution
        flat = tern.reshape(-1)
        # run-length encode
        change = np.nonzero(np.diff(flat))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(flat)]])
        rle = [[int(flat[s]), int(e - s)] for s, e in zip(starts, ends)]
        return {
            "resolution": res,
            "width": int(tern.shape[1]),
            "height": int(tern.shape[0]),
            "origin": origin,
            "rle": rle,
            "n_occupied": int((flat == 100).sum()),
            "n_free": int((flat == 0).sum()),
            "n_unknown": int((flat == -1).sum()),
        }

    def checkpoint(self, path: str):
        from uzliti_slam_tpu.io import storage
        with self.lock:
            storage.save_state(path, self.slam.state)


def make_handler(service: SlamService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path == "/trajectory":
                    stamps, poses = service.trajectory()
                    self._json({"stamps": stamps, "poses": poses})
                elif self.path == "/graph":
                    self._json(service.graph_dict())
                elif self.path == "/stats":
                    self._json(service.stats())
                elif self.path == "/map":
                    self._json(service.map_dict())
                else:
                    self._json({"error": f"unknown path {self.path}"}, 404)
            except Exception as e:  # pragma: no cover
                self._json({"error": str(e)}, 500)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if self.path == "/frame":
                    data = np.load(io.BytesIO(body))
                    # pass sensor dtypes through unchanged: the pipeline
                    # treats integer depth as millimeters (Kinect wire
                    # format), float depth as meters. Optional
                    # ``imu_yaw_rates`` (K,) samples since the last frame
                    # switch the service to EKF-fused odometry.
                    info = service.add_frame(
                        np.asarray(data["image"]),
                        np.asarray(data["depth"]),
                        np.asarray(data["odom_pose"], np.float32),
                        float(data["stamp"]),
                        imu_yaw_rates=(
                            np.asarray(data["imu_yaw_rates"], np.float32)
                            if "imu_yaw_rates" in data else None
                        ),
                    )
                    self._json({
                        "keyframe": info is not None,
                        "n_nodes": int(service.slam.state.graph.num_nodes),
                    })
                elif self.path == "/optimize":
                    stats = service.optimize()
                    self._json({"chi2": np.asarray(stats.chi2_history).tolist()})
                elif self.path == "/set_param":
                    # live retuning endpoint — the dynamic_reconfigure
                    # analog (config.Tunables; zero recompilation)
                    req = json.loads(body or b"{}")
                    for k, v in req.items():
                        service.slam.set_param(k, float(v))
                    self._json({"ok": True, "set": sorted(req)})
                elif self.path == "/checkpoint":
                    req = json.loads(body or b"{}")
                    service.checkpoint(req["path"])
                    self._json({"ok": True})
                elif self.path == "/shutdown":
                    self._json({"ok": True})
                    threading.Thread(target=self.server.shutdown).start()
                else:
                    self._json({"error": f"unknown path {self.path}"}, 404)
            except KeyError as e:
                self._json({"error": f"missing field {e}"}, 400)
            except Exception as e:
                self._json({"error": str(e)}, 400)

    return Handler


def serve(service: SlamService, port: int = 8765, host: str = "127.0.0.1"):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    return httpd


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    svc = SlamService()
    httpd = serve(svc, args.port)
    print(f"uzliti_slam_tpu serving on :{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
