"""evaluate — score pipeline output against ground truth.

The reference ships no quantitative evaluation at all (SURVEY.md §4);
this CLI closes the loop: run the full tracking pipeline over a video
and score it against a ground-truth file (the .npz written by
`scripts/make_test_video.py --gt`, or any npz with `poses`
[F, P, 17, 3] in frame pixel coordinates), reporting OKS-mAP for
detection quality and MOTA / id-switches for tracking quality
(utils/evaluation.py).

Usage:
  python -m posebyte_tpu.cli.evaluate -e yolov8n.safetensors \\
      -i video.mp4 -g gt.npz [-c 0.30] [--oks 0.5] [--warmup 3] [--json]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        prog="posebyte_evaluate",
        description="score tracking output against ground truth")
    p.add_argument("-e", "--engine", required=True,
                   help="model weights (.safetensors / .pt / model name)")
    p.add_argument("-i", "--input", required=True, help="input video")
    p.add_argument("-g", "--gt", required=True,
                   help="ground-truth .npz (poses [F,P,17,3])")
    p.add_argument("-c", "--conf", type=float, default=0.30)
    p.add_argument("--oks", type=float, default=0.5,
                   help="OKS threshold for GT matching")
    p.add_argument("--warmup", type=int, default=3,
                   help="frames excluded from MOTA while tracks confirm "
                        "(min_hits warmup)")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--size", type=int, default=640,
                   help="model input size")
    p.add_argument("--chunk", type=int, default=0,
                   help="evaluate in N-frame chunks (fused tracker "
                        "kernel on TPU; much faster on long videos)")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line instead of a report")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..core.config import (DetectorConfig, PipelineConfig,
                               TrackerConfig)
    from ..pipeline import PosePipeline
    from ..utils.evaluation import TrackingEvaluator, keypoint_map
    from ..utils.video import VideoReader
    from .demo import load_model_params

    gt_data = np.load(args.gt)
    gt_poses = gt_data["poses"]                  # [F, P, 17, 3]
    n_gt_frames = len(gt_poses)

    params, model_name = load_model_params(args.engine)
    num_anchors = sum((args.size // s) ** 2 for s in (8, 16, 32))
    config = PipelineConfig(
        detector=DetectorConfig(conf_threshold=args.conf,
                                input_size=args.size,
                                num_anchors=num_anchors),
        tracker=TrackerConfig.from_conf_threshold(args.conf),
        model_name=model_name,
    )
    pipe = PosePipeline(config, params=params)
    video = VideoReader(args.input)

    ev = TrackingEvaluator(oks_threshold=args.oks)
    det_gt, det_pred, det_scores = [], [], []
    n = 0

    def frame_tracks():
        """Yield per-frame track lists, per-frame or chunked."""
        nonlocal n
        if args.chunk <= 1:
            for frame in video:
                if n >= n_gt_frames or (args.max_frames
                                        and n >= args.max_frames):
                    return
                out = pipe.process_frame(frame)
                yield pipe.fetch_outputs(out, video.width, video.height)
            return
        import jax
        buf = []
        for frame in video:
            if n + len(buf) >= n_gt_frames or \
                    (args.max_frames and n + len(buf) >= args.max_frames):
                break
            buf.append(frame)
            if len(buf) == args.chunk:
                outs = jax.device_get(pipe.process_chunk(np.stack(buf)))
                for i in range(len(buf)):
                    sub = {k: v[i] for k, v in outs.items()}
                    yield pipe.fetch_outputs(sub, video.width,
                                             video.height)
                buf = []
        for f in buf:                        # tail: per-frame
            out = pipe.process_frame(f)
            yield pipe.fetch_outputs(out, video.width, video.height)

    for tracks in frame_tracks():
        gt_f = gt_poses[n]
        if n >= args.warmup:
            ev.update({i: gt_f[i] for i in range(len(gt_f))}, tracks)
        det_gt.append(gt_f)
        det_pred.append(np.stack([t.keypoints for t in tracks])
                        if tracks else np.zeros((0, 17, 3), np.float32))
        det_scores.append(np.asarray([t.score for t in tracks],
                                     np.float32))
        n += 1
    video.release()

    if n == 0:
        print("no frames evaluated", file=sys.stderr)
        return 1

    maps = keypoint_map(det_gt, det_pred, det_scores)
    summary = {"frames": n, **ev.summary(), **{k: round(v, 4)
                                               for k, v in maps.items()}}
    if args.json:
        print(json.dumps(summary))
    else:
        print(f"\n=== Evaluation ({n} frames vs {args.gt}) ===")
        print(f"  OKS-mAP:        {maps['mAP']:.4f} "
              f"(AP50 {maps['AP50']:.4f}, AP75 {maps['AP75']:.4f})")
        s = ev.summary()
        print(f"  MOTA:           {s['MOTA']:.4f}")
        print(f"  id switches:    {s['id_switches']}")
        print(f"  misses:         {s['misses']} / {s['gt']} GT")
        print(f"  false positives:{s['false_positives']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
