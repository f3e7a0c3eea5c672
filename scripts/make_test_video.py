#!/usr/bin/env python
"""Synthesize a short test video with moving human-ish figures.

Offline stand-in for the reference's downloaded dance clip: renders
skeleton figures (the benchmark fixture geometry) walking across the
frame so the demo pipeline has something structured to chew on.
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
    args = p.parse_args()

    import cv2
    from posebyte_tpu.cli.benchmark import generate_random_pose
    from posebyte_tpu.core import constants as C

    w, h = (int(x) for x in args.size.split("x"))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (w, h))
    rng = np.random.default_rng(42)
    poses = [generate_random_pose(rng, w, h, (120.0, 200.0))
             for _ in range(args.persons)]
    vels = rng.uniform(-4, 4, size=(args.persons, 2))

    for _ in range(args.frames):
        frame = np.full((h, w, 3), 40, np.uint8)
        for i, pose in enumerate(poses):
            pose[:, :2] += vels[i]
            # bounce off edges
            cx = pose[:, 0].mean()
            cy = pose[:, 1].mean()
            if cx < 80 or cx > w - 80:
                vels[i, 0] *= -1
            if cy < 80 or cy > h - 80:
                vels[i, 1] *= -1
            color = (60 + 60 * i % 255, 200, 255 - 50 * i % 255)
            for a, b in C.SKELETON_EDGES:
                cv2.line(frame, (int(pose[a, 0]), int(pose[a, 1])),
                         (int(pose[b, 0]), int(pose[b, 1])), color, 6)
            for k in range(17):
                cv2.circle(frame, (int(pose[k, 0]), int(pose[k, 1])), 7,
                           color, -1)
        writer.write(frame)
    writer.release()
    print(f"wrote {args.out} ({args.frames} frames, {w}x{h})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
