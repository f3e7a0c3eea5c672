"""Velocity-adaptive spatial gating.

TPU-native reformulation of kernelSpatialGate
(reference: src/cuda/gpu_tracker.cu:241-317): pairwise center-distance
ratio test with a velocity-adaptive threshold, computed as one broadcast
pass over the [T, D] pair grid.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import constants as C

_TORSO = np.asarray(C.TORSO_KEYPOINTS)


def spatial_gate(track_centers: jnp.ndarray, det_centers: jnp.ndarray,
                 track_velocities: jnp.ndarray, track_active: jnp.ndarray,
                 track_states: jnp.ndarray,
                 gate_threshold: float = C.GATE_THRESHOLD) -> jnp.ndarray:
    """[T,4] x [D,4] -> [T,D] bool gate mask.

    Semantics (reference: gpu_tracker.cu:259-316):
      - inactive track rows gate to False;
      - degenerate centers (any of w/h < 1 px) gate to True, deferring
        the decision to OKS;
      - otherwise ratio = center_dist / avg_size must be under
        gate_threshold * (1 + min(torso_velocity / avg_size, 2)),
        doubled for LOST tracks.
    """
    t_c = track_centers[:, None, :]                       # [T,1,4]
    d_c = det_centers[None, :, :]                         # [1,D,4]

    degenerate = ((t_c[..., 2] < 1.0) | (t_c[..., 3] < 1.0)
                  | (d_c[..., 2] < 1.0) | (d_c[..., 3] < 1.0))

    diff = t_c[..., :2] - d_c[..., :2]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))        # [T,D]
    avg_size = (t_c[..., 2] + t_c[..., 3]
                + d_c[..., 2] + d_c[..., 3]) * 0.25       # [T,D]
    ratio = dist / (avg_size + 1e-6)

    torso_vel = track_velocities[:, _TORSO, :]            # [T,4,2]
    speed = jnp.mean(jnp.linalg.norm(torso_vel, axis=-1), axis=-1)  # [T]
    velocity_factor = 1.0 + jnp.minimum(
        speed[:, None] / (avg_size + 1e-6), 2.0)          # [T,D]
    threshold = gate_threshold * velocity_factor
    threshold = jnp.where(
        (track_states == C.TRACK_STATE_LOST)[:, None], threshold * 2.0,
        threshold)

    gate = jnp.where(degenerate, True, ratio < threshold)
    return gate & track_active[:, None]
