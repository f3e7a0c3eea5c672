#!/usr/bin/env python
"""Synthesize a short test video with moving human-ish figures.

Offline stand-in for the reference's downloaded dance clip: renders
skeleton figures (the benchmark fixture geometry) bouncing across the
frame so the demo pipeline has something structured to chew on.

With --gt, also writes the exact ground-truth poses (.npz with
`poses` [F, P, 17, 3] float32, frame pixel coords) so pipeline output
can be scored quantitatively with utils/evaluation.py (OKS-mAP / MOTA)
— the accuracy loop the reference never ships (SURVEY.md §4).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/test_video.mp4")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--size", default="1280x720")
    p.add_argument("--persons", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gt", default="",
                   help="write ground-truth poses to this .npz")
    args = p.parse_args()

    from posebyte_tpu.utils.synthetic import SyntheticScene, render_frame
    from posebyte_tpu.utils.video import VideoWriter

    w, h = (int(x) for x in args.size.split("x"))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    writer = VideoWriter(args.out, w, h, 30.0)
    scene = SyntheticScene(n_persons=args.persons, width=w, height=h,
                           seed=args.seed)
    gt = []
    for pose_set in scene.frames(args.frames):
        gt.append(pose_set.copy())
        writer.write(render_frame(pose_set, w, h))
    writer.release()
    print(f"wrote {args.out} ({args.frames} frames, {w}x{h})")
    if args.gt:
        np.savez_compressed(args.gt, poses=np.stack(gt),
                            width=w, height=h)
        print(f"wrote ground truth {args.gt} "
              f"({args.frames}x{args.persons} poses)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
