"""PoseBYTE tracker step: the full 8-stage two-tier ByteTrack update as a
single pure function.

TPU-native re-design of GPUTracker::update
(reference: src/cuda/gpu_tracker.cu:1057-1557, SURVEY.md §3.2). The
reference dispatches ~25 CUDA kernels per frame over persistent device
buffers with two host count-syncs; here the entire update is ONE jitted
pure function over the TrackerState pytree — XLA fuses the stages, the
state stays in HBM via donation, and there are zero host syncs inside
the step.

Stage map (reference line refs):
  1. predict            kernelKalmanPredict             gpu_tracker.cu:102
  2. spatial gating     kernelComputeBboxCenters/SpatialGate        :196/:241
  3. high-conf assoc    kernelOKSWithGating + auction + lock        :333/:540
  4. low-conf assoc     kernelTorsoOKS + auction + merge            :429/:575
  5. lost-track assoc   fresh gate(x1.3) + OKS + auction + merge    :1337
  6. update matched     kernelKalmanUpdate/UpdateMatchedTracks      :141/:612
  7. age unmatched      kernelAgeUnmatchedTracks                    :651
  8. new tracks         kernelAllocateNewTrackSlots/InitNewTracks   :695/:727
  9. dedup              kernelTrackIoU/RemoveDuplicates             :788/:861

Documented intentional divergences from the CUDA reference (each keeps
aggregate behavior; see SURVEY.md §7 "Atomics -> deterministic"):
  * The reference computes high/low confidence split masks but never
    applies them to association (gpu_tracker.cu:1217-1224; the masks are
    written and unread) — the tiers differ by cost function and locking
    only. We reproduce that actual behavior.
  * The reference's device auction would let rows "win" locked 1e9
    pairs when nothing else is available (its cost threshold argument is
    ignored, hungarian.cu:358-405); we suppress bids whose best value is
    a lock sentinel, which prevents those degenerate matches and is
    otherwise identical.
  * Slot allocation / track IDs: atomicAdd order (nondeterministic in
    CUDA) becomes detection-index order, which is score-descending after
    NMS. Duplicate removal's racy sequential sweep becomes the
    deterministic dominance rule "drop t iff some overlapping eligible u
    has more hits (or equal hits and a smaller id)" — the same keep-rule
    the reference applies pairwise (gpu_tracker.cu:885-892).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.config import TrackerConfig
from ..core.structs import Detections, TrackerState
from ..ops.assignment import auction_assign
from ..ops.gating import spatial_gate
from ..ops.geometry import pose_centers, centers_iou_matrix
from ..ops.kalman import cv_predict, cv_update
from ..ops.oks import oks_matrix, torso_oks_matrix

LOCK_COST = 1e9


def _auction(cost: jnp.ndarray, active: jnp.ndarray):
    """Auction dispatch: the fused Pallas kernel on TPU (all rounds in
    VMEM, one HBM read/write — ops/pallas_kernels.py), the XLA fori_loop
    version elsewhere. Identical results (tests/test_pallas_kernels.py)."""
    if jax.default_backend() == "tpu":
        from ..ops.pallas_kernels import auction_assign_pallas
        return auction_assign_pallas(cost, active)
    return auction_assign(cost, active)


def _tier_assign(cost: jnp.ndarray, active: jnp.ndarray,
                 row_assign: jnp.ndarray, col_assign: jnp.ndarray):
    """Run one auction tier on `cost`, then merge so prior assignments
    win (kernelMergeAssignments, gpu_tracker.cu:575-588). Pairs already
    matched must carry LOCK_COST in `cost`."""
    new_row, new_col = _auction(cost, active)
    row = jnp.where(row_assign >= 0, row_assign, new_row)
    col = jnp.where(col_assign >= 0, col_assign, new_col)
    return row, col


def _lock(cost: jnp.ndarray, row_assign: jnp.ndarray,
          col_assign: jnp.ndarray) -> jnp.ndarray:
    """Lock matched rows/columns to LOCK_COST
    (kernelLockMatchedPairs, gpu_tracker.cu:540-567)."""
    locked = (row_assign >= 0)[:, None] | (col_assign >= 0)[None, :]
    return jnp.where(locked, LOCK_COST, cost)


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def tracker_step(state: TrackerState, det: Detections,
                 config: TrackerConfig = TrackerConfig(),
                 det_embeddings=None):
    """One tracking frame: (state, detections) -> (state', aux).

    `det` must be the (padded, score-descending) output of pose_nms with
    capacity == config.max_detections. `aux` carries the per-frame
    telemetry the reference exposes through counters.

    det_embeddings: optional [D, E] appearance descriptors (ops/reid.py);
    with config.reid_weight > 0 they blend into the high-confidence and
    lost-recovery association costs and maintain per-track EMA
    embeddings — an appearance surface beyond the reference.
    """
    T = config.max_tracks
    D = config.max_detections
    frame = state.frame + 1
    act = state.active
    states = state.states
    dvalid = det.valid

    num_active_in = jnp.sum(act.astype(jnp.int32))
    use_kf136 = config.motion_model == "kalman136"

    # ---- Stage 1: predict --------------------------------------------------
    if use_kf136:
        from ..core.structs import KalmanState136
        from ..ops.kalman import Kalman136
        kf = KalmanState136(mean=state.kf_mean, cov_diag=state.kf_cov)
        kf = Kalman136.predict(kf, config.accel_memory, config.jerk_memory)
        kf_split = kf.mean.reshape(T, C.NUM_KEYPOINTS, 8)
        pred_xy = kf_split[..., 0:2]
        velocities = kf_split[..., 2:4]
        a = act[:, None, None]
        predicted = jnp.concatenate(
            [jnp.where(a, pred_xy, state.poses[..., :2]),
             state.poses[..., 2:3]], axis=-1)
    else:
        predicted, velocities = cv_predict(state.poses, state.velocities,
                                           act, states)

    # ---- Stage 2: spatial gating ------------------------------------------
    track_centers = pose_centers(predicted)          # [T,4]
    det_centers = pose_centers(det.poses)            # [D,4]
    gate = spatial_gate(track_centers, det_centers, velocities, act, states,
                        config.gate_threshold)       # [T,D]
    gate = gate & dvalid[None, :]

    use_reid = config.reid_weight > 0.0 and det_embeddings is not None
    if use_reid:
        from ..ops.reid import blend_reid_cost, cosine_cost_matrix
        reid_cost = cosine_cost_matrix(state.embeddings, det_embeddings)

    # ---- Stage 3: high-confidence tier (full OKS, non-LOST tracks) --------
    non_lost = act & (states != C.TRACK_STATE_LOST)
    gate1 = gate & non_lost[:, None]
    oks1 = oks_matrix(predicted, det.poses, config.visibility_threshold)
    cost = jnp.where(gate1, 1.0 - oks1, LOCK_COST)
    if use_reid:
        cost = blend_reid_cost(cost, reid_cost, config.reid_weight)
    row_assign, col_assign = _tier_assign(
        cost, act, jnp.full((T,), -1, jnp.int32), jnp.full((D,), -1,
                                                           jnp.int32))

    # ---- Stage 4: low-confidence tier (torso OKS fallback) ----------------
    if config.torso_tier:     # ablation knob; production default True
        cost2 = jnp.where(gate1,
                          1.0 - torso_oks_matrix(predicted, det.poses),
                          LOCK_COST)
        cost2 = _lock(cost2, row_assign, col_assign)
        row_assign, col_assign = _tier_assign(cost2, act, row_assign,
                                              col_assign)

    # ---- Stage 5: lost-track recovery -------------------------------------
    lost_gate = spatial_gate(track_centers, det_centers, velocities, act,
                             states,
                             config.gate_threshold * C.LOST_GATE_SCALE)
    only_lost = act & (states == C.TRACK_STATE_LOST)
    lost_gate = lost_gate & only_lost[:, None] & dvalid[None, :]
    oks3 = oks_matrix(predicted, det.poses, 0.2)
    cost3 = jnp.where(lost_gate, 1.0 - oks3, LOCK_COST)
    if use_reid:   # appearance helps re-acquire lost tracks
        cost3 = blend_reid_cost(cost3, reid_cost, config.reid_weight)
    cost3 = _lock(cost3, row_assign, col_assign)
    row_assign, col_assign = _tier_assign(cost3, act, row_assign, col_assign)

    # ---- Stage 6: update matched tracks -----------------------------------
    matched = (row_assign >= 0) & act
    det_idx = jnp.clip(row_assign, 0, D - 1)
    if use_kf136:
        kf = Kalman136.update(kf, det.poses,
                              jnp.arange(T, dtype=jnp.int32), row_assign,
                              matched)
        kf_xy = kf.mean.reshape(T, C.NUM_KEYPOINTS, 8)[..., 0:2]
        det_conf = det.poses[det_idx][..., 2:3]
        m3 = matched[:, None, None]
        poses = jnp.concatenate(
            [jnp.where(m3, kf_xy, state.poses[..., :2]),
             jnp.where(m3, det_conf, state.poses[..., 2:3])], axis=-1)
        velocities = kf.mean.reshape(T, C.NUM_KEYPOINTS, 8)[..., 2:4]
    else:
        poses, velocities = cv_update(state.poses, velocities, det.poses,
                                      row_assign, act)
    scores = jnp.where(matched, det.scores[det_idx], state.scores)
    hits = jnp.where(matched, state.hits + 1, state.hits)
    ages = jnp.where(matched, 0, state.ages)
    last_frame = jnp.where(matched, frame, state.last_frame)
    # tentative -> confirmed at min_hits; lost -> confirmed on reactivation
    promote = matched & (states == C.TRACK_STATE_TENTATIVE) & \
        (hits >= config.min_hits)
    reactivate = matched & (states == C.TRACK_STATE_LOST)
    states = jnp.where(promote | reactivate, C.TRACK_STATE_CONFIRMED, states)

    # ---- Stage 7: age unmatched tracks ------------------------------------
    unmatched = (~matched) & act
    ages = jnp.where(unmatched, ages + 1, ages)
    tent_dead = unmatched & (states == C.TRACK_STATE_TENTATIVE) & \
        (ages > C.TENTATIVE_MAX_AGE)
    to_lost = unmatched & (states == C.TRACK_STATE_CONFIRMED) & \
        (ages > config.max_age)
    lost_dead = unmatched & (states == C.TRACK_STATE_LOST) & \
        (ages > config.max_age + config.lost_window)
    states = jnp.where(to_lost, C.TRACK_STATE_LOST, states)
    active = act & ~(tent_dead | lost_dead)

    # ---- Stage 8: create new tracks ---------------------------------------
    new_det = dvalid & (col_assign < 0) & \
        (det.scores >= config.new_track_thresh)               # [D]
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1       # [D]
    free = ~active                                             # [T]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1         # [T]
    num_free = jnp.sum(free.astype(jnp.int32))
    # free_slots[r] = index of the r-th free slot
    slot_ids = jnp.arange(T, dtype=jnp.int32)
    free_slots = jnp.full((T,), T, jnp.int32).at[
        jnp.where(free, free_rank, T)].set(slot_ids, mode="drop")
    can_alloc = new_det & (det_rank < num_free)
    slot_for_det = jnp.where(
        can_alloc, free_slots[jnp.clip(det_rank, 0, T - 1)], -1)  # [D]

    ok = can_alloc
    # Non-allocated detections scatter out of bounds and are dropped.
    scatter_slot = jnp.where(ok, slot_for_det, T)
    new_ids = state.next_id + det_rank

    def init_at(arr, values):
        return arr.at[scatter_slot].set(values, mode="drop")

    poses = init_at(poses, det.poses)
    velocities = init_at(velocities, jnp.zeros((D, C.NUM_KEYPOINTS, 2)))
    scores = init_at(scores, det.scores)
    ids = init_at(state.ids, new_ids)
    hits = init_at(hits, jnp.ones((D,), jnp.int32))
    ages = init_at(ages, jnp.zeros((D,), jnp.int32))
    states = init_at(states, jnp.full((D,), C.TRACK_STATE_TENTATIVE,
                                      jnp.int32))
    last_frame = init_at(last_frame, jnp.full((D,), 1, jnp.int32) * frame)
    active = init_at(active, jnp.ones((D,), bool))
    col_assign = jnp.where(ok, slot_for_det, col_assign)
    # advance the id counter only for tracks actually allocated
    # (reference: atomicAdd happens inside kernelInitNewTracks, i.e. only
    # for detections that won a slot, gpu_tracker.cu:757)
    next_id = state.next_id + jnp.sum(ok.astype(jnp.int32))

    if use_kf136:
        kf = Kalman136.initiate(kf, det.poses, scatter_slot, ok)
        kf_mean, kf_cov = kf.mean, kf.cov_diag
    else:
        kf_mean, kf_cov = state.kf_mean, state.kf_cov

    if use_reid:
        from ..ops.reid import ema_update
        det_emb_at = det_embeddings[det_idx]                   # [T,E]
        embeddings = ema_update(state.embeddings, det_emb_at, matched,
                                gamma=config.reid_ema)
        embeddings = init_at(embeddings, det_embeddings)
    else:
        embeddings = state.embeddings

    # ---- Stage 9: duplicate suppression -----------------------------------
    # Centers come from gating time, as in the reference (stale for tracks
    # born this frame, which are excluded by the hits >= min_hits rule).
    eligible = active & (states != C.TRACK_STATE_LOST) & \
        (hits >= config.min_hits)
    iou = centers_iou_matrix(track_centers)                    # [T,T]
    pair = eligible[:, None] & eligible[None, :] & \
        ~jnp.eye(T, dtype=bool)
    dup = pair & (iou > config.dedup_iou_threshold)
    hl = hits[:, None] < hits[None, :]
    tie = (hits[:, None] == hits[None, :]) & (ids[:, None] > ids[None, :])
    dominated = jnp.any(dup & (hl | tie), axis=1)
    active = active & ~dominated

    new_state = TrackerState(
        poses=poses, velocities=velocities, scores=scores, ids=ids,
        states=states, hits=hits, ages=ages, last_frame=last_frame,
        active=active, next_id=next_id, frame=frame,
        det_track_slot=col_assign, kf_mean=kf_mean, kf_cov=kf_cov,
        embeddings=embeddings,
    )
    aux = {
        "num_active_in": num_active_in,
        "num_active": jnp.sum(active.astype(jnp.int32)),
        "num_matched": jnp.sum(matched.astype(jnp.int32)),
        "num_new": jnp.sum(ok.astype(jnp.int32)),
        "predicted_poses": predicted,
    }
    return new_state, aux
