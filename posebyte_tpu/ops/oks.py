"""Object-Keypoint-Similarity cost matrices.

TPU-native reformulation of the reference's OKS kernels as broadcast
reductions over [T, D, 17] tensors — one fused VPU pass per matrix
instead of one CUDA thread per (track, det) cell.

Reference semantics reproduced exactly:
- visibility-masked OKS with relaxed 2*sigma and mean-area scale floored
  at 1000 px^2, >= 3 co-visible keypoints (src/cuda/gpu_tracker.cu:333-425
  kernelOKSWithGating);
- torso-only OKS fallback with 3*sigma, fixed scale^2 = 10000, >= 2
  co-visible torso keypoints (src/cuda/gpu_tracker.cu:429-490
  kernelTorsoOKS);
- standalone OKS distance with per-pair area scale and a conf > 0.05
  retry when fewer than 3 pairs pass 0.2 (src/cuda/oks_distance.cu:78-163
  kernelOKSDistance).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import constants as C

# numpy (not jnp) on purpose: a module-level jnp.asarray initializes
# the device backend at import time (which dials the TPU relay before
# any user code runs); a float32 numpy constant folds identically
# under jit.
_SIGMAS = np.asarray(C.COCO_SIGMAS, np.float32)
_TORSO = np.asarray(C.TORSO_KEYPOINTS)


def _masked_area(poses: jnp.ndarray, conf_thresh: float = 0.1) -> jnp.ndarray:
    """Visible-keypoint bbox area per pose [..., 17, 3] -> [...]."""
    xy = poses[..., :2]
    mask = poses[..., 2] > conf_thresh
    big = jnp.float32(1e9)
    mn = jnp.min(jnp.where(mask[..., None], xy, big), axis=-2)
    mx = jnp.max(jnp.where(mask[..., None], xy, -big), axis=-2)
    any_valid = jnp.any(mask, axis=-1)
    area = (mx[..., 0] - mn[..., 0]) * (mx[..., 1] - mn[..., 1])
    return jnp.where(any_valid, jnp.maximum(area, 0.0), 0.0)


def oks_matrix(track_poses: jnp.ndarray, det_poses: jnp.ndarray,
               visibility_threshold: float = C.VISIBILITY_THRESHOLD,
               sigma_scale: float = 2.0,
               min_scale_sq: float = 1000.0,
               min_count: int = 3) -> jnp.ndarray:
    """Visibility-masked OKS similarity: [T,17,3] x [D,17,3] -> [T,D].

    scale^2 = max(mean of the two visible-kp bbox areas, min_scale_sq);
    per-kp OKS = exp(-d^2 / (2 * scale^2 * (sigma_scale*sigma)^2)); the
    mean over co-visible keypoints counts only pairs where both sides
    exceed visibility_threshold, and fewer than min_count pairs yields 0.
    """
    t_xy = track_poses[:, None, :, :2]            # [T,1,17,2]
    d_xy = det_poses[None, :, :, :2]              # [1,D,17,2]
    t_conf = track_poses[:, None, :, 2]
    d_conf = det_poses[None, :, :, 2]

    t_area = _masked_area(track_poses)            # [T]
    d_area = _masked_area(det_poses)              # [D]
    scale_sq = jnp.maximum((t_area[:, None] + d_area[None, :]) * 0.5,
                           min_scale_sq)          # [T,D]

    diff = t_xy - d_xy
    dist_sq = jnp.sum(diff * diff, axis=-1)       # [T,D,17]
    sig = (_SIGMAS * sigma_scale) ** 2            # [17]
    oks_kp = jnp.exp(-dist_sq / (2.0 * scale_sq[..., None] * sig))

    vis = (t_conf > visibility_threshold) & (d_conf > visibility_threshold)
    count = jnp.sum(vis, axis=-1)
    total = jnp.sum(jnp.where(vis, oks_kp, 0.0), axis=-1)
    oks = jnp.where(count >= min_count, total / jnp.maximum(count, 1), 0.0)
    return oks


def torso_oks_matrix(track_poses: jnp.ndarray, det_poses: jnp.ndarray,
                     conf_thresh: float = 0.1,
                     sigma_scale: float = 3.0,
                     scale_sq: float = 10000.0,
                     min_count: int = 2) -> jnp.ndarray:
    """Torso-only OKS similarity [T,D] for the low-confidence tier
    (keypoints 5, 6, 11, 12; reference: kernelTorsoOKS)."""
    tp = track_poses[:, _TORSO, :]                # [T,4,3]
    dp = det_poses[:, _TORSO, :]                  # [D,4,3]
    diff = tp[:, None, :, :2] - dp[None, :, :, :2]
    dist_sq = jnp.sum(diff * diff, axis=-1)       # [T,D,4]
    sig = (_SIGMAS[_TORSO] * sigma_scale) ** 2
    oks_kp = jnp.exp(-dist_sq / (2.0 * scale_sq * sig))
    vis = (tp[:, None, :, 2] > conf_thresh) & (dp[None, :, :, 2] > conf_thresh)
    count = jnp.sum(vis, axis=-1)
    total = jnp.sum(jnp.where(vis, oks_kp, 0.0), axis=-1)
    return jnp.where(count >= min_count, total / jnp.maximum(count, 1), 0.0)


def oks_distance_matrix(track_poses: jnp.ndarray, det_poses: jnp.ndarray,
                        sigma_scale: float = 2.0) -> jnp.ndarray:
    """Standalone OKS *cost* matrix (1 - OKS) with the low-confidence
    retry of the legacy component (reference: kernelOKSDistance,
    oks_distance.cu:78-163): if fewer than 3 keypoint pairs pass
    conf > 0.2, retry with conf > 0.05 before giving up."""
    strict = oks_matrix(track_poses, det_poses, visibility_threshold=0.2,
                        sigma_scale=sigma_scale)
    relaxed = oks_matrix(track_poses, det_poses, visibility_threshold=0.05,
                         sigma_scale=sigma_scale)
    t_conf = track_poses[:, None, :, 2]
    d_conf = det_poses[None, :, :, 2]
    strict_count = jnp.sum((t_conf > 0.2) & (d_conf > 0.2), axis=-1)
    oks = jnp.where(strict_count >= 3, strict, relaxed)
    return 1.0 - oks


def combine_costs(oks_cost: jnp.ndarray, iou_cost: jnp.ndarray,
                  alpha: float = 0.7) -> jnp.ndarray:
    """Alpha-blend of OKS and IoU costs (reference: kernelCombineCosts,
    oks_distance.cu:248-261)."""
    return alpha * oks_cost + (1.0 - alpha) * iou_cost
