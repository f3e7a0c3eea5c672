"""Legacy pose NMS (the reference's CPU postprocess path).

Port of NMSCuda::apply (reference: src/cuda/nms.cu:142-306), used by the
legacy detect()/detectBatch() entry points (yolo_pose_engine.cpp:765-775).
Its suppression rules differ from the device-resident NMS in ops/nms.py
(SURVEY.md §2.2 "Two independent NMS implementations"):

  suppress j (lower score) against kept i when ANY of
    1. IoU > 0.55
    2. OKS > 0.5        (NOTE: the reference hardcodes 0.5 and silently
                         ignores its oks_threshold parameter,
                         nms.cu:242; reproduced here, with the same
                         parameter accepted-and-ignored)
    3. IoU > 0.2  and OKS > 0.4
    4. center distance < 0.3 * max(w_i, h_i, 32) and OKS > 0.15

  OKS here uses the LARGER of the two visible-keypoint bbox areas
  (floor 32^2), needs >= 3 visible keypoints on EACH side, k = 2*sigma.

Implemented the same way as ops/nms.py: one broadcast pass builds the
pairwise suppression matrix, then the exact greedy solution comes from
the Jacobi fixed point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.structs import Detections
from .geometry import boxes_iou_matrix
from .nms import _greedy_keep

# numpy on purpose — no backend init at import (see ops/oks.py note)
_SIGMAS = np.asarray(C.COCO_SIGMAS, np.float32)


def legacy_oks_pair_matrix(poses: jnp.ndarray) -> jnp.ndarray:
    """Symmetric [N, N] OKS matrix with the legacy path's semantics
    (reference: computeOKS lambda, nms.cu:185-236)."""
    xy = poses[..., :2]
    conf = poses[..., 2]
    vis = conf > 0.2                                   # [N,17]
    big = jnp.float32(1e9)
    mn = jnp.min(jnp.where(vis[..., None], xy, big), axis=-2)
    mx = jnp.max(jnp.where(vis[..., None], xy, -big), axis=-2)
    count = jnp.sum(vis, axis=-1)                      # [N]
    area = jnp.where(count >= 1,
                     (mx[..., 0] - mn[..., 0]) * (mx[..., 1] - mn[..., 1]),
                     0.0)
    scale_sq = jnp.maximum(jnp.maximum(area[:, None], area[None, :]),
                           32.0 * 32.0)                # [N,N]

    diff = xy[:, None, :, :] - xy[None, :, :, :]
    dist_sq = jnp.sum(diff * diff, axis=-1)            # [N,N,17]
    oks_kp = jnp.exp(-dist_sq / (2.0 * scale_sq[..., None]
                                 * 4.0 * _SIGMAS ** 2))
    covis = vis[:, None, :] & vis[None, :, :]
    n_pair = jnp.sum(covis, axis=-1)
    oks = jnp.where(n_pair >= 3,
                    jnp.sum(jnp.where(covis, oks_kp, 0.0), axis=-1)
                    / jnp.maximum(n_pair, 1),
                    0.0)
    both_valid = (count >= 3)[:, None] & (count >= 3)[None, :]
    return jnp.where(both_valid, oks, 0.0)


@functools.partial(jax.jit, static_argnames=("max_keep",))
def legacy_pose_nms(det: Detections, oks_threshold: float = 0.5,
                    score_threshold: float = 0.0,
                    max_keep: int = C.DEFAULT_MAX_DETECTIONS) -> Detections:
    """Legacy-path NMS over a padded Detections set.

    `oks_threshold` is accepted for API parity but — exactly like the
    reference — not applied (the hardcoded 0.5 is used, nms.cu:242).
    """
    del oks_threshold   # reference quirk: parameter silently ignored
    N = det.capacity
    valid = det.valid & (det.scores >= score_threshold)

    iou = boxes_iou_matrix(det.boxes, det.boxes)
    oks = legacy_oks_pair_matrix(det.poses)

    cx = (det.boxes[:, 0] + det.boxes[:, 2]) * 0.5
    cy = (det.boxes[:, 1] + det.boxes[:, 3]) * 0.5
    dist = jnp.sqrt((cx[:, None] - cx[None, :]) ** 2
                    + (cy[:, None] - cy[None, :]) ** 2)
    # scale from the KEEPER's bbox (row i = higher-scoring detection)
    scale_i = jnp.maximum(jnp.maximum(det.boxes[:, 2] - det.boxes[:, 0],
                                      det.boxes[:, 3] - det.boxes[:, 1]),
                          32.0)[:, None]

    suppress = ((iou > 0.55)
                | (oks > 0.5)
                | ((iou > 0.2) & (oks > 0.4))
                | ((dist / scale_i < 0.3) & (oks > 0.15)))
    pair_ok = valid[:, None] & valid[None, :]
    suppress = suppress & pair_ok & ~jnp.eye(N, dtype=bool)

    order = jnp.argsort(-jnp.where(valid, det.scores, -jnp.inf))
    # NOTE: the suppression matrix is row->column directional (rule 4
    # uses the keeper's scale), so permute rows/cols consistently.
    sup_sorted = suppress[order][:, order]
    keep_ranked = _greedy_keep(sup_sorted, valid[order])

    pos = jnp.cumsum(keep_ranked.astype(jnp.int32)) - 1
    dest = jnp.where(keep_ranked & (pos < max_keep), pos, max_keep)

    def scatter(src):
        out = jnp.zeros((max_keep + 1,) + src.shape[1:], src.dtype)
        return out.at[dest].set(src[order], mode="drop")[:max_keep]

    num_kept = jnp.sum(keep_ranked.astype(jnp.int32))
    return Detections(
        poses=scatter(det.poses),
        boxes=scatter(det.boxes),
        scores=scatter(det.scores),
        valid=jnp.arange(max_keep) < jnp.minimum(num_kept, max_keep),
    )
