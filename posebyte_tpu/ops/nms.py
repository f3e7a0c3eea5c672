"""Device-resident pose NMS.

TPU-native reformulation of the reference's NMS chain
(reference: src/cuda/gpu_postprocess.cu:88-242): a symmetric pairwise
overlap matrix (IoU + OKS rules) computed as one broadcast VPU pass,
then a score-ordered greedy sweep as a bounded `lax.fori_loop` carrying
a suppression vector — the same serial semantics the reference runs on
a single GPU thread to stay on-device (gpu_postprocess.cu:209-242),
expressed compiler-natively.

Suppression rule between detections i and j (gpu_postprocess.cu:134-168):
  - IoU > iou_threshold, OR
  - (>= 3 co-visible keypoints at conf > 0.2) AND
    (OKS > oks_threshold OR (OKS > 0.4 AND IoU > 0.2))
with OKS scale^2 = max(area_i, area_j, 32^2) over *bbox* areas and
falloff exp(-d^2 / (2 * scale^2 * 4 * sigma^2)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.structs import Detections
from .geometry import boxes_iou_matrix

_SIGMAS = jnp.asarray(C.COCO_SIGMAS)


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


@functools.partial(jax.jit, static_argnames=("max_keep",))
def pose_nms(det: Detections, iou_threshold: float = 0.55,
             oks_threshold: float = 0.55,
             max_keep: int = C.DEFAULT_MAX_DETECTIONS) -> Detections:
    """Greedy score-ordered NMS; returns a compacted, score-descending
    Detections of capacity `max_keep` (reference pipeline:
    kernelSortByScore -> kernelApplyNMSMask -> kernelCompactDetections,
    gpu_postprocess.cu:178-313; the reference keeps at most 256 then the
    tracker consumes at most 64)."""
    N = det.capacity
    overlap = nms_overlap_matrix(det, iou_threshold, oks_threshold)
    order = jnp.argsort(-jnp.where(det.valid, det.scores, -jnp.inf))

    def body(rank, carry):
        suppressed, keep, kept = carry
        i = order[rank]
        ok = (~suppressed[i]) & det.valid[i] & (kept < max_keep)
        keep = keep.at[i].set(ok)
        suppressed = jnp.where(ok, suppressed | overlap[i], suppressed)
        return suppressed, keep, kept + ok.astype(jnp.int32)

    _, keep, _ = jax.lax.fori_loop(
        0, N, body,
        (jnp.zeros((N,), bool), jnp.zeros((N,), bool), jnp.int32(0)))

    # Compact survivors to the front in score order (kernelCompactDetections).
    keep_ranked = keep[order]                                  # score order
    pos = jnp.cumsum(keep_ranked.astype(jnp.int32)) - 1        # [N]
    dest = jnp.where(keep_ranked & (pos < max_keep), pos, max_keep)

    def scatter(src):
        out = jnp.zeros((max_keep + 1,) + src.shape[1:], src.dtype)
        return out.at[dest].set(src[order], mode="drop")[:max_keep]

    num_kept = jnp.sum(keep_ranked.astype(jnp.int32))
    out_valid = jnp.arange(max_keep) < jnp.minimum(num_kept, max_keep)
    return Detections(
        poses=scatter(det.poses),
        boxes=scatter(det.boxes),
        scores=scatter(det.scores),
        valid=out_valid,
    )
