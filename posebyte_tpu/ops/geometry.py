"""Pose geometry primitives: masked keypoint bboxes, centers, IoU matrices.

TPU-native reformulation of the reference's per-thread geometry kernels
(reference: src/cuda/gpu_tracker.cu:196-237 kernelComputeBboxCenters,
src/cuda/gpu_tracker.cu:788-857 kernelTrackIoU,
src/cuda/oks_distance.cu:167-245 kernelIoUDistance/kernelExtractBboxes).
All functions are vectorized over the slot axis so the VPU processes
whole pools at once; nothing is data-dependently shaped.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e9


def masked_pose_bbox(poses: jnp.ndarray, conf_thresh: float = 0.1,
                     min_valid: int = 2):
    """Keypoint-confidence-masked bounding box per pose.

    poses: [..., 17, 3]. Returns (bbox_xyxy [..., 4], valid [...]) where
    valid requires >= min_valid keypoints above conf_thresh
    (reference: kernelComputeBboxCenters, gpu_tracker.cu:210-229).
    """
    xy = poses[..., :2]
    conf = poses[..., 2]
    mask = conf > conf_thresh
    big = jnp.float32(_BIG)
    mx = jnp.where(mask[..., None], xy, big)
    mn_xy = jnp.min(mx, axis=-2)
    mx2 = jnp.where(mask[..., None], xy, -big)
    mx_xy = jnp.max(mx2, axis=-2)
    valid = jnp.sum(mask, axis=-1) >= min_valid
    bbox = jnp.concatenate([mn_xy, mx_xy], axis=-1)
    bbox = jnp.where(valid[..., None], bbox, 0.0)
    return bbox, valid


def pose_centers(poses: jnp.ndarray, conf_thresh: float = 0.1):
    """Center-format boxes (cx, cy, w, h) from keypoints; zeros when fewer
    than 2 visible keypoints (reference: gpu_tracker.cu:223-236)."""
    bbox, valid = masked_pose_bbox(poses, conf_thresh)
    cx = (bbox[..., 0] + bbox[..., 2]) * 0.5
    cy = (bbox[..., 1] + bbox[..., 3]) * 0.5
    w = bbox[..., 2] - bbox[..., 0]
    h = bbox[..., 3] - bbox[..., 1]
    centers = jnp.stack([cx, cy, w, h], axis=-1)
    return jnp.where(valid[..., None], centers, 0.0)


def pose_area(poses: jnp.ndarray, conf_thresh: float = 0.1) -> jnp.ndarray:
    """Area of the visible-keypoint bbox; 0 with < 2 visible keypoints
    (reference: PoseDetection::getPoseArea, types.h:74-91)."""
    bbox, valid = masked_pose_bbox(poses, conf_thresh)
    area = (bbox[..., 2] - bbox[..., 0]) * (bbox[..., 3] - bbox[..., 1])
    return jnp.where(valid, area, 0.0)


def boxes_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: a [M,4] x b [N,4] -> [M,N]
    (reference: kernelIoUDistance, oks_distance.cu:167-210)."""
    ax1, ay1, ax2, ay2 = (a[:, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b[None, :, i] for i in range(4))
    ix = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    iy = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    inter = ix * iy
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def centers_iou_matrix(centers: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU over center-format (cx, cy, w, h) boxes [T,4] -> [T,T]
    (reference: kernelTrackIoU corner conversion, gpu_tracker.cu:826-855)."""
    half = centers[:, 2:4] * 0.5
    xyxy = jnp.concatenate([centers[:, :2] - half, centers[:, :2] + half],
                           axis=-1)
    return boxes_iou_matrix(xyxy, xyxy)
