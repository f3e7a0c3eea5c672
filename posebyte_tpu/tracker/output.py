"""Track output extraction — the single device-to-host copy per frame.

Equivalent of GPUTracker::getActiveTracks
(reference: src/cuda/gpu_tracker.cu:1559-1639): for each matched
detection, emit the Kalman-smoothed track pose, the track id, the
detection score, and a keypoint-derived bbox with 10% padding. The
filtering (drop tentative below min_hits, drop lost) happens on-device
so only the compact output tensor crosses to the host.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.config import TrackerConfig
from ..core.structs import TrackerState


@dataclasses.dataclass
class TrackOutput:
    """Host-side track record (reference: TrackOutput, types.h:169-174)."""
    track_id: int
    score: float
    bbox: np.ndarray        # [4] xyxy
    keypoints: np.ndarray   # [17, 3]


@functools.partial(jax.jit, static_argnames=("config",))
def extract_outputs_device(state: TrackerState, det_scores: jnp.ndarray,
                           config: TrackerConfig = TrackerConfig()):
    """Device-side assembly of the per-frame output tensor.

    Returns (ids [D], scores [D], poses [D,17,3], boxes [D,4], valid [D])
    aligned with the detection slots, mirroring the reference's loop over
    col_assignments (gpu_tracker.cu:1595-1636).
    """
    D = config.max_detections
    slot = state.det_track_slot                       # [D]
    safe = jnp.clip(slot, 0, config.max_tracks - 1)

    st = state.states[safe]
    hits = state.hits[safe]
    emit = (slot >= 0) & state.active[safe]
    emit &= ~((st == C.TRACK_STATE_TENTATIVE) & (hits < config.min_hits))
    emit &= st != C.TRACK_STATE_LOST

    poses = state.poses[safe]                         # [D,17,3]
    ids = jnp.where(emit, state.ids[safe], -1)
    scores = jnp.where(emit, det_scores, 0.0)

    # bbox from keypoints with conf > 0.2, padded 10% per side
    # (gpu_tracker.cu:1617-1633)
    xy = poses[..., :2]
    mask = poses[..., 2] > 0.2
    big = jnp.float32(1e9)
    mn = jnp.min(jnp.where(mask[..., None], xy, big), axis=-2)
    mx = jnp.max(jnp.where(mask[..., None], xy, -big), axis=-2)
    pad = (mx - mn) * 0.1
    boxes = jnp.concatenate([mn - pad, mx + pad], axis=-1)
    boxes = jnp.where(jnp.any(mask, axis=-1)[..., None], boxes, 0.0)

    return ids, scores, poses, boxes, emit


def get_active_tracks(state: TrackerState, det_scores,
                      config: TrackerConfig = TrackerConfig()):
    """Host-side list of TrackOutput (the visualization D2H boundary)."""
    ids, scores, poses, boxes, emit = extract_outputs_device(
        state, jnp.asarray(det_scores), config)
    ids, scores, poses, boxes, emit = jax.device_get(
        (ids, scores, poses, boxes, emit))
    out = []
    for d in range(len(ids)):
        if not emit[d]:
            continue
        out.append(TrackOutput(track_id=int(ids[d]), score=float(scores[d]),
                               bbox=boxes[d], keypoints=poses[d]))
    return out
