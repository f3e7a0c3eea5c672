"""Oracle detector: exact inverse of the decode path.

Encodes known ground-truth poses into raw YOLO-pose head tensors
(box DFL logits / class logits / keypoint regressions) such that
`ops.decode.decode_topk` + `ops.nms.pose_nms` reproduce them. Injected
into PosePipeline as a `heads_fn` override, this validates the entire
accuracy-bearing chain — letterbox geometry, sparse top-K decode, DFL
expectation, keypoint un-anchoring, OKS NMS, tracking, output
extraction and un-letterboxing — end to end with a known answer, on a
host where real trained weights are unavailable (VERDICT r1 item 4;
the reference's analogous implicit contract is that real engines
produce real poses, yolo_pose_engine.cpp:183-411).

The GT rides in `params` (a dict of the three head tensors), which
PosePipeline binds as a jit call argument — so per-frame GT updates
need no retrace.
"""
from __future__ import annotations

import numpy as np

from .yolo_pose import REG_MAX, make_anchors

NUM_KPT = 17


def _logit(p: float) -> float:
    p = min(max(p, 1e-6), 1.0 - 1e-6)
    return float(np.log(p / (1.0 - p)))


def encode_oracle_head(poses: np.ndarray, boxes: np.ndarray,
                       scores: np.ndarray, input_size: int) -> dict:
    """GT (letterbox/input coords) -> raw head tensors.

    poses [P, 17, 3], boxes [P, 4] xyxy, scores [P]. Returns
    {"box": [A, 4*REG_MAX], "cls": [A, 1], "kpt": [A, 51]} float32 such
    that decode_topk recovers each GT entry exactly (DFL distances are
    encoded as two-bin distributions whose softmax expectation is the
    exact fractional distance). Each GT takes the finest-stride anchor
    cell containing its box center; distances are clipped to the DFL
    support [0, REG_MAX-1] in stride units, so keep objects smaller
    than ~2*(REG_MAX-1)*8 px at stride 8.
    """
    anchors, strides = make_anchors(input_size)       # [A,2] grid, [A]
    A = anchors.shape[0]
    box = np.zeros((A, 4 * REG_MAX), np.float32)
    cls = np.full((A, 1), -20.0, np.float32)          # sigmoid ~ 0
    kpt = np.zeros((A, NUM_KPT * 3), np.float32)
    kpt[:, 2::3] = -20.0                               # kpt conf ~ 0

    n0 = input_size // 8                               # stride-8 grid
    taken = set()
    for p in range(len(poses)):
        x1, y1, x2, y2 = (float(v) for v in boxes[p])
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        ix = int(np.clip(round(cx / 8.0 - 0.5), 0, n0 - 1))
        iy = int(np.clip(round(cy / 8.0 - 0.5), 0, n0 - 1))
        while (iy * n0 + ix) in taken:                 # collision: shift
            ix = (ix + 1) % n0
        a = iy * n0 + ix
        taken.add(a)
        ax, ay = anchors[a]                            # grid units
        s = strides[a]

        # DFL: distance d (stride units) -> two-bin distribution with
        # expectation exactly d; log-probs survive the softmax intact.
        dists = np.clip([ax - x1 / s, ay - y1 / s,
                         x2 / s - ax, y2 / s - ay], 0.0, REG_MAX - 1.0)
        for f, d in enumerate(dists):
            lo = int(np.floor(d))
            hi = min(lo + 1, REG_MAX - 1)
            fr = float(d - lo)
            probs = np.full(REG_MAX, 1e-12, np.float64)
            probs[lo] += 1.0 - fr
            probs[hi] += fr
            box[a, f * REG_MAX:(f + 1) * REG_MAX] = np.log(probs)

        cls[a, 0] = _logit(float(scores[p]))

        # keypoints: kxy = (raw*2 + (anchor - 0.5)) * stride  (decode)
        raw_xy = (poses[p, :, :2] / s - (np.asarray([ax, ay]) - 0.5)) / 2.0
        kpt[a, 0::3] = raw_xy[:, 0]
        kpt[a, 1::3] = raw_xy[:, 1]
        kpt[a, 2::3] = [_logit(float(c)) for c in poses[p, :, 2]]

    return {"box": box, "cls": cls, "kpt": kpt}


def make_oracle_heads():
    """heads_fn(params, images) that ignores pixels and returns the
    oracle head tensors from params, broadcast over the batch."""
    import jax.numpy as jnp

    def heads_fn(params, images):
        B = images.shape[0]
        return (jnp.broadcast_to(params["box"][None],
                                 (B,) + params["box"].shape),
                jnp.broadcast_to(params["cls"][None],
                                 (B,) + params["cls"].shape),
                jnp.broadcast_to(params["kpt"][None],
                                 (B,) + params["kpt"].shape))

    return heads_fn
