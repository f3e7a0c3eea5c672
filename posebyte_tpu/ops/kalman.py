"""Kalman filters: constant-velocity hot path + full third-order model.

Two motion models, exactly as the reference ships (SURVEY.md §2.2):

1. `cv_predict` / `cv_update` — the simplified constant-velocity model
   the GPU-native tracker actually uses in production
   (reference: src/cuda/gpu_tracker.cu:102-189 kernelKalmanPredict /
   kernelKalmanUpdate): position += velocity, lost-track velocity decay
   0.95, constant gain K = R/(R+Q) with Q=0.1 / R=0.3, exponential
   velocity smoothing alpha=0.3.

2. `Kalman136` — the batched third-order (pos/vel/acc/jerk) 136-D
   filter (reference: src/cuda/kalman_filter.cu:24-237). The reference
   only ever reads/writes the covariance diagonal in its fast kernels,
   so the state here stores mean [T,136] + diagonal [T,136]; semantics
   are identical, memory drops from 136^2 to 136 floats per track.

All functions are batched over the track-slot axis (VPU-shaped) and
jit-safe (no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.structs import KalmanState136

# Constant-gain parameters (reference: gpu_tracker.cu:1452-1453, 158-160)
CV_PROCESS_NOISE = 0.1
CV_MEASUREMENT_NOISE = 0.3
CV_VELOCITY_ALPHA = 0.3
CV_LOST_DECAY = 0.95


def cv_predict(poses: jnp.ndarray, velocities: jnp.ndarray,
               active: jnp.ndarray, states: jnp.ndarray,
               dt: float = 1.0):
    """Constant-velocity predict for the whole slot pool.

    poses [T,17,3], velocities [T,17,2] -> (predicted_poses, velocities).
    Lost tracks decay their velocity by 0.95 per frame
    (reference: kernelKalmanPredict, gpu_tracker.cu:102-138).
    """
    act = active[:, None, None]
    pred_xy = poses[..., :2] + velocities * dt
    predicted = jnp.concatenate([
        jnp.where(act, pred_xy, poses[..., :2]),
        poses[..., 2:3],
    ], axis=-1)
    lost = (states == C.TRACK_STATE_LOST) & active
    new_vel = jnp.where(lost[:, None, None], velocities * CV_LOST_DECAY,
                        velocities)
    return predicted, new_vel


def cv_update(poses: jnp.ndarray, velocities: jnp.ndarray,
              det_poses: jnp.ndarray, row_assign: jnp.ndarray,
              active: jnp.ndarray,
              process_noise: float = CV_PROCESS_NOISE,
              measurement_noise: float = CV_MEASUREMENT_NOISE,
              alpha: float = CV_VELOCITY_ALPHA):
    """Constant-gain measurement update for matched tracks.

    K = R/(R+Q) (the reference's convention, gpu_tracker.cu:159: gain
    multiplies the innovation toward the detection), velocity via
    exponential smoothing of the innovation; track conf <- det conf
    (reference: kernelKalmanUpdate, gpu_tracker.cu:141-189).
    """
    T = poses.shape[0]
    D = det_poses.shape[0]
    K = measurement_noise / (measurement_noise + process_noise)

    matched = (row_assign >= 0) & active                   # [T]
    det_idx = jnp.clip(row_assign, 0, D - 1)
    det = det_poses[det_idx]                               # [T,17,3]

    innov = det[..., :2] - poses[..., :2]                  # [T,17,2]
    new_xy = poses[..., :2] + K * innov
    new_vel = alpha * innov + (1.0 - alpha) * velocities
    new_conf = det[..., 2:3]

    m = matched[:, None, None]
    out_poses = jnp.concatenate([
        jnp.where(m, new_xy, poses[..., :2]),
        jnp.where(m, new_conf, poses[..., 2:3]),
    ], axis=-1)
    out_vel = jnp.where(m, new_vel, velocities)
    return out_poses, out_vel


# ---------------------------------------------------------------------------
# Third-order 136-D filter (legacy / benchmark component)
# ---------------------------------------------------------------------------

# Per-order process noise stddevs (reference: kalman_filter.cu:152-163)
# numpy on purpose — no backend init at import (see ops/oks.py note)
_ORDER_NOISE = np.repeat(
    np.asarray([1.0, 0.5, 0.1, 0.05], np.float32), 2)       # [8]
_PROCESS_NOISE_DIAG = np.tile(_ORDER_NOISE ** 2, (C.NUM_KEYPOINTS,))  # [136]


def _split(mean: jnp.ndarray):
    """[T?,136] -> [..., 17, 8] view as (px,py,vx,vy,ax,ay,jx,jy)."""
    return mean.reshape(*mean.shape[:-1], C.NUM_KEYPOINTS, 8)


class Kalman136:
    """Batched third-order Kalman filter over the track pool.

    Stateless namespace of pure functions over KalmanState136; mirrors
    KalmanFilterCUDA (reference: include/cuda/kalman_filter.h:19-56).
    """

    @staticmethod
    def initiate(state: KalmanState136, detections: jnp.ndarray,
                 slots: jnp.ndarray, valid: jnp.ndarray) -> KalmanState136:
        """Initialize slots from detections [N,17,3]
        (reference: kernelBatchInitiate, kalman_filter.cu:24-82):
        mean <- detection xy, derivatives 0; diagonal covariance with
        pos_var 10 (1000 when conf <= 0), vel/acc/jerk var 100."""
        N = detections.shape[0]
        xy = detections[..., :2]                              # [N,17,2]
        conf = detections[..., 2]                              # [N,17]
        zeros = jnp.zeros((N, C.NUM_KEYPOINTS, 6), jnp.float32)
        new_mean = jnp.concatenate([xy, zeros], axis=-1)       # [N,17,8]
        new_mean = new_mean.reshape(N, C.TOTAL_STATE_DIM)

        pos_var = jnp.where(conf > 0.0, 10.0, 1000.0)          # [N,17]
        per_kp = jnp.concatenate([
            jnp.repeat(pos_var[..., None], 2, axis=-1),
            jnp.full((N, C.NUM_KEYPOINTS, 6), 100.0),
        ], axis=-1)                                            # [N,17,8]
        new_cov = per_kp.reshape(N, C.TOTAL_STATE_DIM)

        # Invalid entries scatter out of bounds and are dropped (never
        # clip-then-overwrite: duplicate clipped indices could clobber a
        # real write in indeterminate scatter order).
        T = state.mean.shape[0]
        idx = jnp.where(valid, slots, T)
        mean = state.mean.at[idx].set(new_mean, mode="drop")
        cov = state.cov_diag.at[idx].set(new_cov, mode="drop")
        return KalmanState136(mean=mean, cov_diag=cov)

    @staticmethod
    def predict(state: KalmanState136,
                accel_memory: float = 0.9,
                jerk_memory: float = 0.9) -> KalmanState136:
        """Closed-form third-order transition + diagonal process noise
        (reference: kernelPredictMean/kernelPredictCovariance,
        kalman_filter.cu:86-167)."""
        s = _split(state.mean)                                 # [T,17,8]
        p, v, a, j = s[..., 0:2], s[..., 2:4], s[..., 4:6], s[..., 6:8]
        new_p = p + v + 0.5 * a + (1.0 / 6.0) * j
        new_v = v + a + 0.5 * j
        new_a = a * accel_memory
        new_j = j * jerk_memory
        mean = jnp.concatenate([new_p, new_v, new_a, new_j], axis=-1)
        mean = mean.reshape(state.mean.shape)
        cov = state.cov_diag + _PROCESS_NOISE_DIAG
        return KalmanState136(mean=mean, cov_diag=cov)

    @staticmethod
    def update(state: KalmanState136, detections: jnp.ndarray,
               track_slots: jnp.ndarray, det_indices: jnp.ndarray,
               valid: jnp.ndarray) -> KalmanState136:
        """Per-axis scalar-gain update for matched (slot, det) pairs
        (reference: kernelBatchUpdate, kalman_filter.cu:171-237):
        R = 5/(conf+0.1); keypoints with conf < 0.1 are skipped;
        coupled velocity gain K_v = 0.5*K; P <- (1-K) P."""
        T = state.mean.shape[0]
        safe_slot = jnp.clip(track_slots, 0, T - 1)
        safe_det = jnp.clip(det_indices, 0, detections.shape[0] - 1)

        mean_kp = _split(state.mean)[safe_slot]                # [M,17,8]
        cov_kp = _split(state.cov_diag)[safe_slot]             # [M,17,8]
        det = detections[safe_det]                             # [M,17,3]

        z = det[..., :2]
        conf = det[..., 2]
        use = (conf >= 0.1) & valid[:, None]                   # [M,17]

        innov = z - mean_kp[..., 0:2]                          # [M,17,2]
        P_pos = cov_kp[..., 0:2]
        R = (5.0 / (conf + 0.1))[..., None]
        K = P_pos / (P_pos + R)

        u = use[..., None]
        new_pos = mean_kp[..., 0:2] + jnp.where(u, K * innov, 0.0)
        K_v = 0.5 * K[..., 0:1]
        new_vel = mean_kp[..., 2:4] + jnp.where(u, K_v * innov, 0.0)
        new_mean_kp = jnp.concatenate(
            [new_pos, new_vel, mean_kp[..., 4:8]], axis=-1)
        new_P_pos = jnp.where(u, (1.0 - K) * P_pos, P_pos)
        new_cov_kp = jnp.concatenate([new_P_pos, cov_kp[..., 2:8]], axis=-1)

        flat_mean = new_mean_kp.reshape(-1, C.TOTAL_STATE_DIM)
        flat_cov = new_cov_kp.reshape(-1, C.TOTAL_STATE_DIM)
        idx = jnp.where(valid, track_slots, T)
        mean = state.mean.at[idx].set(flat_mean, mode="drop")
        cov = state.cov_diag.at[idx].set(flat_cov, mode="drop")
        return KalmanState136(mean=mean, cov_diag=cov)

    @staticmethod
    def extract_poses(state: KalmanState136) -> jnp.ndarray:
        """[T,136] -> [T,17,3] with conf = 1.0
        (reference: kernelExtractPosesToDevice, kalman_filter.cu:241-264)."""
        s = _split(state.mean)
        conf = jnp.ones((*s.shape[:-1], 1), jnp.float32)
        return jnp.concatenate([s[..., 0:2], conf], axis=-1)
