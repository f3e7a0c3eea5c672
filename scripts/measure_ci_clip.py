#!/usr/bin/env python
"""Measure the held-out CI clip metrics for a trained checkpoint.

Replicates tests/test_trained_pixels.py's clip construction EXACTLY
(same seed/geometry/warmup), so the printed OKS-mAP / MOTA are the
point measurements the test bars must sit ~5% under (VERDICT r4 weak 4:
the 11n640 row had a bar with no recorded measurement).

Usage: python scripts/measure_ci_clip.py --model yolo11n-pose --size 640
           [--frames 24] [--conf 0.30]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

W, H = 640, 360
SEED = 424242


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolo11n-pose")
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--conf", type=float, default=0.30)
    args = p.parse_args()

    import numpy as np
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.models.weights import load_params
    from posebyte_tpu.pipeline import PosePipeline
    from posebyte_tpu.utils.evaluation import (TrackingEvaluator,
                                               keypoint_map)
    from posebyte_tpu.utils.synthetic import SyntheticScene, render_frame

    asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                         f"{args.model}-synthetic{args.size}.safetensors")
    params, name = load_params(asset)
    S = args.size
    num_anchors = sum((S // s) ** 2 for s in (8, 16, 32))
    config = PipelineConfig(
        detector=DetectorConfig(input_size=S, num_anchors=num_anchors,
                                conf_threshold=args.conf),
        tracker=TrackerConfig.from_conf_threshold(args.conf),
        model_name=name, precision="fp32")
    pipe = PosePipeline(config, params=params)

    scene = SyntheticScene(n_persons=3, width=W, height=H, seed=SEED,
                           scale_range=(80.0, 130.0), speed=4.0)
    frames, gts = [], []
    for gt in scene.frames(args.frames):
        frames.append(render_frame(gt, W, H))
        gts.append(gt.copy())

    ev = TrackingEvaluator(oks_threshold=0.5)
    det_gt, det_pred, det_scores = [], [], []
    warmup = config.tracker.min_hits
    for f, (frame, gt) in enumerate(zip(frames, gts)):
        out = pipe.process_frame(frame)
        tracks = pipe.fetch_outputs(out, W, H)
        if f >= warmup:
            ev.update({i: gt[i] for i in range(len(gt))}, tracks)
        det_gt.append(gt)
        det_pred.append(np.stack([t.keypoints for t in tracks])
                        if tracks else np.zeros((0, 17, 3), np.float32))
        det_scores.append(np.asarray([t.score for t in tracks],
                                     np.float32))

    maps = keypoint_map(det_gt, det_pred, det_scores)
    print(json.dumps({"model": name, "size": S, "frames": args.frames,
                      "clip_mAP": round(maps["mAP"], 4),
                      "clip_AP50": round(maps["AP50"], 4),
                      "clip_AP75": round(maps["AP75"], 4),
                      **ev.summary()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
