"""Device-resident pose NMS.

TPU-native reformulation of the reference's NMS chain
(reference: src/cuda/gpu_postprocess.cu:88-242): a symmetric pairwise
overlap matrix (IoU + OKS rules) computed as one broadcast VPU pass,
then greedy score-ordered suppression.

Suppression rule between detections i and j (gpu_postprocess.cu:134-168):
  - IoU > iou_threshold, OR
  - (>= 3 co-visible keypoints at conf > 0.2) AND
    (OKS > oks_threshold OR (OKS > 0.4 AND IoU > 0.2))
with OKS scale^2 = max(area_i, area_j, 32^2) over *bbox* areas and
falloff exp(-d^2 / (2 * scale^2 * 4 * sigma^2)).

The greedy sweep is NOT run as a sequential loop (the reference runs it
on a single GPU thread, gpu_postprocess.cu:209-242; a 256-step
`fori_loop` port measured ~31 ms on v5e). Greedy NMS in score order is
the unique solution of the triangular recurrence

    keep[i] = valid[i] and not any_{j<i} (keep[j] and overlap[j, i])

which we solve by Jacobi fixed-point iteration: each sweep is one fused
[N, N] masked reduction, and the iteration provably reaches the exact
greedy solution in (longest suppression chain + 1) sweeps — bounded by
N, detected by convergence, typically 2-4 sweeps (< 0.1 ms).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.structs import Detections
from .geometry import boxes_iou_matrix

# numpy on purpose — no backend init at import (see ops/oks.py note)
_SIGMAS = np.asarray(C.COCO_SIGMAS, np.float32)


def nms_overlap_matrix(det: Detections, iou_threshold: float,
                       oks_threshold: float) -> jnp.ndarray:
    """Symmetric [N, N] bool overlap mask (kernelComputeNMSMask)."""
    N = det.capacity
    iou = boxes_iou_matrix(det.boxes, det.boxes)              # [N,N]

    area = ((det.boxes[:, 2] - det.boxes[:, 0])
            * (det.boxes[:, 3] - det.boxes[:, 1]))            # [N]
    scale_sq = jnp.maximum(jnp.maximum(area[:, None], area[None, :]),
                           32.0 * 32.0)                       # [N,N]

    xy = det.poses[..., :2]
    conf = det.poses[..., 2]
    diff = xy[:, None, :, :] - xy[None, :, :, :]              # [N,N,17,2]
    dist_sq = jnp.sum(diff * diff, axis=-1)                   # [N,N,17]
    oks_kp = jnp.exp(-dist_sq / (2.0 * scale_sq[..., None]
                                 * 4.0 * _SIGMAS ** 2))
    vis = (conf[:, None, :] > 0.2) & (conf[None, :, :] > 0.2)  # [N,N,17]
    count = jnp.sum(vis, axis=-1)
    oks = jnp.where(count >= 3,
                    jnp.sum(jnp.where(vis, oks_kp, 0.0), axis=-1)
                    / jnp.maximum(count, 1),
                    0.0)

    overlap = (iou > iou_threshold) | (
        (count >= 3) & ((oks > oks_threshold)
                        | ((oks > 0.4) & (iou > 0.2))))
    pair_ok = det.valid[:, None] & det.valid[None, :]
    eye = jnp.eye(N, dtype=bool)
    return overlap & pair_ok & ~eye


def _greedy_keep(overlap_sorted: jnp.ndarray,
                 valid_sorted: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep mask in score order via Jacobi fixed point."""
    N = overlap_sorted.shape[0]
    # dominance[j, i]: j earlier in score order and overlapping i
    row = jnp.arange(N)
    earlier = row[:, None] < row[None, :]
    dom = overlap_sorted & earlier

    def cond(carry):
        keep, prev, it = carry
        return (it < N) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        new = valid_sorted & ~jnp.any(dom & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = valid_sorted
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


@functools.partial(jax.jit, static_argnums=(1, 2, 3),
                   static_argnames=("iou_threshold", "oks_threshold",
                                    "max_keep", "presorted"))
def pose_nms(det: Detections, iou_threshold: float = 0.55,
             oks_threshold: float = 0.55,
             max_keep: int = C.DEFAULT_MAX_DETECTIONS,
             presorted: bool = False) -> Detections:
    """Greedy score-ordered NMS; returns a compacted, score-descending
    Detections of capacity `max_keep` (reference pipeline:
    kernelSortByScore -> kernelApplyNMSMask -> kernelCompactDetections,
    gpu_postprocess.cu:178-313).

    presorted=True skips the score sort + reorder gathers — valid for
    inputs already score-descending with invalids at the tail, which
    decode_topk guarantees by construction (its top_k IS the sort)."""
    N = det.capacity
    if presorted:
        sorted_poses, sorted_boxes = det.poses, det.boxes
        sorted_scores, valid_sorted = det.scores, det.valid
    else:
        order = jnp.argsort(-jnp.where(det.valid, det.scores, -jnp.inf))
        sorted_poses = det.poses[order]
        sorted_boxes = det.boxes[order]
        sorted_scores = det.scores[order]
        valid_sorted = det.valid[order]

    sdet = Detections(poses=sorted_poses, boxes=sorted_boxes,
                      scores=sorted_scores, valid=valid_sorted)
    if jax.default_backend() == "tpu":
        # Fused Pallas kernel: overlap matrix + greedy fixed point in one
        # VMEM-resident pass (bit-identical; tests/test_pallas_kernels.py).
        from .pallas_kernels import nms_keep_pallas
        keep_ranked = nms_keep_pallas(sorted_poses, sorted_boxes,
                                      valid_sorted, iou_threshold,
                                      oks_threshold)
    else:
        overlap = nms_overlap_matrix(sdet, iou_threshold, oks_threshold)
        keep_ranked = _greedy_keep(overlap, valid_sorted)

    # Compact survivors to the front in score order
    # (kernelCompactDetections) — as a one-hot selection matmul instead
    # of a scatter (XLA scatters lower poorly on TPU; a [max_keep, N]
    # one-hot against the sorted arrays is one MXU pass and exact).
    pos = jnp.cumsum(keep_ranked.astype(jnp.int32)) - 1        # [N]
    sel = (keep_ranked[None, :]
           & (pos[None, :] == jnp.arange(max_keep)[:, None]))  # [M,N]
    sel_f = sel.astype(jnp.float32)

    def compact(src):
        flat = src.reshape(N, -1).astype(jnp.float32)
        # Precision.HIGHEST: keeps the one-hot selection exact on TPU
        # (default f32 matmul precision is bf16 passes)
        out = jax.lax.dot_general(
            sel_f, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return out.reshape((max_keep,) + src.shape[1:]).astype(src.dtype)

    num_kept = jnp.sum(keep_ranked.astype(jnp.int32))
    out_valid = jnp.arange(max_keep) < jnp.minimum(num_kept, max_keep)
    return Detections(
        poses=compact(sorted_poses),
        boxes=compact(sorted_boxes),
        scores=compact(sorted_scores),
        valid=out_valid,
    )
