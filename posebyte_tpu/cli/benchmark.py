"""benchmark — synthetic component + pipeline micro-benchmarks.

CLI parity with the reference benchmark binary
(reference: src/benchmark.cpp): the same seeded random human-shaped
pose fixture (benchmark.cpp:19-66, mt19937(42)), per-component latency
for the Kalman filter, OKS matrices, auction assignment, and pose NMS,
a full tracker benchmark over synthetic frames, and an optional
end-to-end model benchmark.

Usage:
  python -m posebyte_tpu.cli.benchmark [-n ITERS] [-e MODEL] [--json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def generate_random_pose(rng, img_w=640, img_h=640,
                         scale_range=(50.0, 150.0)):
    """Procedural human-shaped skeleton (reference: benchmark.cpp:19-66)."""
    offsets = np.array([
        (0.0, -0.45), (-0.05, -0.5), (0.05, -0.5), (-0.1, -0.48),
        (0.1, -0.48), (-0.2, -0.3), (0.2, -0.3), (-0.25, -0.1),
        (0.25, -0.1), (-0.25, 0.1), (0.25, 0.1), (-0.15, 0.05),
        (0.15, 0.05), (-0.15, 0.3), (0.15, 0.3), (-0.15, 0.5),
        (0.15, 0.5),
    ], dtype=np.float32)
    cx = rng.uniform(100, img_w - 100)
    cy = rng.uniform(100, img_h - 100)
    s = rng.uniform(*scale_range)
    pose = np.zeros((17, 3), np.float32)
    pose[:, 0] = cx + offsets[:, 0] * s
    pose[:, 1] = cy + offsets[:, 1] * s
    pose[:, 2] = rng.uniform(0.5, 1.0, size=17)
    return pose


def _bench(fn, *args, iters=100):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmark")
    p.add_argument("-n", "--iterations", type=int, default=100)
    p.add_argument("-e", "--engine", default="",
                   help="also benchmark this model end-to-end "
                        "(name or weights path)")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line instead of a table")
    p.add_argument("--stages", action="store_true",
                   help="also print per-stage tracker timing "
                        "(printTimingStats parity)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..core.config import TrackerConfig
    from ..core.structs import Detections, KalmanState136, TrackerState
    from ..ops import (auction_assign, oks_matrix, torso_oks_matrix,
                       pose_nms, Kalman136)
    from ..tracker.step import tracker_step

    rng = np.random.default_rng(42)
    n = args.iterations
    results = {}

    # --- Kalman 136-D (reference: benchmarkKalmanFilter, 50 tracks) ------
    kstate = KalmanState136.init(50)
    dets50 = jnp.asarray(np.stack([generate_random_pose(rng)
                                   for _ in range(50)]))
    slots = jnp.arange(50, dtype=jnp.int32)
    valid = jnp.ones((50,), bool)
    kstate = Kalman136.initiate(kstate, dets50, slots, valid)
    predict = jax.jit(Kalman136.predict)
    results["kalman136_predict_ms"] = _bench(predict, kstate, iters=n)
    update = jax.jit(Kalman136.update)
    results["kalman136_update_ms"] = _bench(
        update, kstate, dets50, slots, slots, valid, iters=n)

    # --- OKS distance (reference: benchmarkOKSDistance, 50x100) ----------
    tracks = jnp.asarray(np.stack([generate_random_pose(rng)
                                   for _ in range(50)]))
    dets100 = jnp.asarray(np.stack([generate_random_pose(rng)
                                    for _ in range(100)]))
    joks = jax.jit(oks_matrix)
    results["oks_50x100_ms"] = _bench(joks, tracks, dets100, iters=n)
    jtorso = jax.jit(torso_oks_matrix)
    results["torso_oks_50x100_ms"] = _bench(jtorso, tracks, dets100,
                                            iters=n)

    # --- Auction assignment (reference: benchmarkHungarian, 50x50) -------
    cost = jnp.asarray(rng.uniform(0, 1, (50, 50)).astype(np.float32))
    results["auction_50x50_ms"] = _bench(auction_assign, cost, iters=n)

    # --- Pose NMS (reference: benchmarkNMS, 100 candidates) --------------
    poses100 = np.stack([generate_random_pose(rng) for _ in range(100)])
    boxes = np.stack([
        [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]
        for p in poses100]).astype(np.float32)
    det = Detections(
        poses=jnp.asarray(poses100), boxes=jnp.asarray(boxes),
        scores=jnp.asarray(rng.uniform(0.3, 1.0, 100).astype(np.float32)),
        valid=jnp.ones((100,), bool))
    jnms = jax.jit(lambda d: pose_nms(d, 0.55, 0.55, 64))
    results["pose_nms_100_ms"] = _bench(jnms, det, iters=n)

    # --- Full tracker (reference: benchmarkGPUTracker, 5 persons) --------
    cfg = TrackerConfig()
    state = TrackerState.init()
    det5 = Detections.empty(cfg.max_detections)
    p5 = np.stack([generate_random_pose(rng) for _ in range(5)])
    det5 = det5.replace(
        poses=det5.poses.at[:5].set(jnp.asarray(p5)),
        scores=det5.scores.at[:5].set(0.9),
        valid=det5.valid.at[:5].set(True))
    jstep = jax.jit(lambda s, d: tracker_step(s, d, cfg), donate_argnums=0)
    s, _ = jstep(state, det5)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s, _ = jstep(s, det5)
    jax.block_until_ready(s)
    results["tracker_step_ms"] = (time.perf_counter() - t0) / n * 1e3

    # --- Optional end-to-end model ---------------------------------------
    if args.engine:
        from ..core.config import PipelineConfig
        from ..pipeline import PosePipeline
        from .demo import load_model_params
        params, name = load_model_params(args.engine)
        pipe = PosePipeline(PipelineConfig(model_name=name), params=params)
        frame = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        for _ in range(3):
            pipe.process_frame(frame, block=True)
        t0 = time.perf_counter()
        for _ in range(n):
            pipe.process_frame(frame, block=True)
        results[f"e2e_{name}_ms"] = (time.perf_counter() - t0) / n * 1e3

    if args.stages:
        from ..utils.profiling import profile_tracker_stages
        timing = profile_tracker_stages(s, det5, cfg, iters=args.iterations)
        timing.print_stats()

    if args.json:
        print(json.dumps({k: round(v, 4) for k, v in results.items()}))
    else:
        print(f"\n=== PoseBYTE-TPU benchmark ({n} iters, "
              f"{jax.devices()[0]}) ===")
        for k, v in results.items():
            print(f"  {k:28s} {v:9.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
