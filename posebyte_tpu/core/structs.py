"""Core pytree structures.

The reference keeps a fixed-capacity slot pool of track state in device
memory (reference: include/cuda/gpu_tracker.h:129-177). Here the same
slot pool is a pytree of fixed-shape arrays that lives in HBM and is
threaded through a pure, jitted `tracker_step`; XLA keeps it resident
via buffer donation, which is the TPU-native analogue of the reference's
persistent cudaMalloc buffers.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import constants as C


@struct.dataclass
class Detections:
    """Padded detection set (reference: PoseDetection, types.h:68-106).

    Arrays are fixed-capacity; `valid` masks real entries. `poses` is
    [N, 17, 3] (x, y, conf); `boxes` is [N, 4] xyxy.
    """
    poses: jnp.ndarray   # [N, 17, 3] float32
    boxes: jnp.ndarray   # [N, 4] float32 xyxy
    scores: jnp.ndarray  # [N] float32
    valid: jnp.ndarray   # [N] bool

    @property
    def capacity(self) -> int:
        return self.poses.shape[-3]

    @staticmethod
    def empty(capacity: int) -> "Detections":
        return Detections(
            poses=jnp.zeros((capacity, C.NUM_KEYPOINTS, 3), jnp.float32),
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )


@struct.dataclass
class TrackerState:
    """Persistent track slot pool (reference: gpu_tracker.h:129-177).

    One row per slot; `active` marks live tracks. All integer state is
    int32. `next_id` / `frame` are scalar carries replacing the
    reference's device-side atomic counters (d_next_track_id_ etc.).
    """
    poses: jnp.ndarray        # [T, 17, 3] float32 - Kalman-smoothed
    velocities: jnp.ndarray   # [T, 17, 2] float32
    scores: jnp.ndarray       # [T] float32
    ids: jnp.ndarray          # [T] int32
    states: jnp.ndarray       # [T] int32 (0 tent / 1 confirmed / 2 lost)
    hits: jnp.ndarray         # [T] int32
    ages: jnp.ndarray         # [T] int32
    last_frame: jnp.ndarray   # [T] int32
    active: jnp.ndarray       # [T] bool
    next_id: jnp.ndarray      # [] int32, starts at 1 (gpu_tracker.cu:987)
    frame: jnp.ndarray        # [] int32

    # Per-frame association output carried for getActiveTracks()-style
    # host extraction (reference: d_col_assignments_, gpu_tracker.cu:1559).
    det_track_slot: jnp.ndarray  # [D] int32, detection -> track slot or -1

    # Third-order Kalman state, used when TrackerConfig.motion_model ==
    # "kalman136" (the reference constructs KalmanFilterCUDA but its
    # shipping path never calls it, SURVEY.md §2.2; here it is a usable
    # motion model). Zero-cost when unused (~140 KB of HBM).
    kf_mean: jnp.ndarray      # [T, 136] float32
    kf_cov: jnp.ndarray       # [T, 136] float32 (diagonal)

    # Per-track appearance embedding (EMA of matched detections' Re-ID
    # descriptors; ops/reid.py). Active when TrackerConfig.reid_weight
    # > 0 — an appearance surface the reference does not have. ~25 KB.
    embeddings: jnp.ndarray   # [T, REID_DIM] float32

    @property
    def capacity(self) -> int:
        return self.poses.shape[0]

    @staticmethod
    def init(max_tracks: int = C.DEFAULT_MAX_TRACKS,
             max_detections: int = C.DEFAULT_MAX_DETECTIONS) -> "TrackerState":
        T = max_tracks
        return TrackerState(
            poses=jnp.zeros((T, C.NUM_KEYPOINTS, 3), jnp.float32),
            velocities=jnp.zeros((T, C.NUM_KEYPOINTS, 2), jnp.float32),
            scores=jnp.zeros((T,), jnp.float32),
            ids=jnp.zeros((T,), jnp.int32),
            states=jnp.zeros((T,), jnp.int32),
            hits=jnp.zeros((T,), jnp.int32),
            ages=jnp.zeros((T,), jnp.int32),
            last_frame=jnp.zeros((T,), jnp.int32),
            active=jnp.zeros((T,), bool),
            next_id=jnp.asarray(1, jnp.int32),
            frame=jnp.asarray(0, jnp.int32),
            det_track_slot=jnp.full((max_detections,), -1, jnp.int32),
            kf_mean=jnp.zeros((T, C.TOTAL_STATE_DIM), jnp.float32),
            kf_cov=jnp.ones((T, C.TOTAL_STATE_DIM), jnp.float32),
            embeddings=jnp.zeros((T, C.NUM_KEYPOINTS * 3), jnp.float32),
        )


@struct.dataclass
class KalmanState136:
    """Batched third-order Kalman state (reference: types.h:126-132).

    Full 136-D per-track state with diagonal-structured covariance usage
    (the reference's fast kernels only ever touch the diagonal:
    kalman_filter.cu:138-167), so we store mean [T,136] and the
    covariance diagonal [T,136].
    """
    mean: jnp.ndarray       # [T, 136]
    cov_diag: jnp.ndarray   # [T, 136]

    @staticmethod
    def init(max_tracks: int) -> "KalmanState136":
        return KalmanState136(
            mean=jnp.zeros((max_tracks, C.TOTAL_STATE_DIM), jnp.float32),
            cov_diag=jnp.ones((max_tracks, C.TOTAL_STATE_DIM), jnp.float32),
        )
