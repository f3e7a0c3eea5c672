"""Scenario tests for the 8-stage tracker step.

These mirror the behavioral contract of GPUTracker::update
(reference: src/cuda/gpu_tracker.cu:1057-1557): track birth/confirmation,
identity persistence, occlusion -> lost -> reactivation, two-tier
low-confidence association, duplicate suppression, and capacity limits.
"""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core import constants as C
from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.tracker import tracker_step, get_active_tracks

CFG = TrackerConfig(max_tracks=16, max_detections=8)


def make_dets(poses_scores, capacity=CFG.max_detections):
    poses = np.zeros((capacity, 17, 3), np.float32)
    boxes = np.zeros((capacity, 4), np.float32)
    scores = np.zeros((capacity,), np.float32)
    valid = np.zeros((capacity,), bool)
    for i, (p, s) in enumerate(poses_scores):
        poses[i] = p
        boxes[i] = [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(),
                    p[:, 1].max()]
        scores[i] = s
        valid[i] = True
    return Detections(poses=jnp.asarray(poses), boxes=jnp.asarray(boxes),
                      scores=jnp.asarray(scores), valid=jnp.asarray(valid))


def step(state, poses_scores):
    return tracker_step(state, make_dets(poses_scores), CFG)


def moving_pose(base, t, vx=3.0):
    p = base.copy()
    p[:, 0] += vx * t
    return p


def test_track_birth_and_confirmation(random_pose_factory):
    base = random_pose_factory()
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    for t in range(4):
        state, aux = step(state, [(moving_pose(base, t), 0.9)])
    assert int(aux["num_active"]) == 1
    # confirmed after min_hits
    st = np.asarray(state.states)
    act = np.asarray(state.active)
    assert st[act][0] == C.TRACK_STATE_CONFIRMED
    assert np.asarray(state.hits)[act][0] == 4
    # id assignment starts at 1
    assert np.asarray(state.ids)[act][0] == 1

    outs = get_active_tracks(state, np.asarray(make_dets(
        [(moving_pose(base, 3), 0.9)]).scores), CFG)
    assert len(outs) == 1 and outs[0].track_id == 1


def test_identity_persistence_two_people(random_pose_factory):
    a = random_pose_factory()
    b = a.copy()
    b[:, 0] += 350.0
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    ids_seen = []
    for t in range(6):
        det = [(moving_pose(a, t), 0.9), (moving_pose(b, t, -3.0), 0.85)]
        if t % 2:
            det = det[::-1]     # shuffle detection order
        state, _ = step(state, det)
        slot = np.asarray(state.det_track_slot)
        ids = np.asarray(state.ids)
        got = sorted(ids[slot[d]] for d in range(2))
        ids_seen.append(got)
    # same two ids throughout, regardless of detection order
    assert all(x == ids_seen[0] for x in ids_seen)
    assert len(set(ids_seen[0])) == 2


def test_lost_and_reactivation(random_pose_factory):
    base = random_pose_factory()
    cfg = TrackerConfig(max_tracks=16, max_detections=8, max_age=2)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    for t in range(4):
        state, _ = tracker_step(state, make_dets([(moving_pose(base, t),
                                                   0.9)]), cfg)
    act = np.asarray(state.active)
    tid = np.asarray(state.ids)[act][0]

    # occlusion: no detections for max_age+1 frames -> LOST
    empty = make_dets([])
    for _ in range(3):
        state, _ = tracker_step(state, empty, cfg)
    act = np.asarray(state.active)
    assert act.sum() == 1
    assert np.asarray(state.states)[act][0] == C.TRACK_STATE_LOST

    # reappears near the predicted location -> reactivated with SAME id
    state, _ = tracker_step(state, make_dets([(moving_pose(base, 4), 0.9)]),
                            cfg)
    act = np.asarray(state.active)
    assert np.asarray(state.states)[act][0] == C.TRACK_STATE_CONFIRMED
    assert np.asarray(state.ids)[act][0] == tid

    # long occlusion -> removed entirely
    for _ in range(cfg.max_age + cfg.lost_window + 2):
        state, _ = tracker_step(state, empty, cfg)
    assert np.asarray(state.active).sum() == 0


def test_tentative_track_dies_quickly(random_pose_factory):
    base = random_pose_factory()
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    state, _ = step(state, [(base, 0.9)])     # 1 hit, tentative
    empty = make_dets([])
    for _ in range(3):                        # age 3 > TENTATIVE_MAX_AGE
        state, _ = tracker_step(state, empty, CFG)
    assert np.asarray(state.active).sum() == 0


def test_low_confidence_keeps_track_alive(random_pose_factory):
    base = random_pose_factory()
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    for t in range(3):
        state, _ = step(state, [(moving_pose(base, t), 0.9)])
    # low-confidence detection (below high_thresh 0.3, above low 0.15):
    # associated via the torso-OKS tier, ages reset
    state, aux = step(state, [(moving_pose(base, 3), 0.2)])
    assert int(aux["num_matched"]) == 1
    act = np.asarray(state.active)
    assert np.asarray(state.ages)[act][0] == 0
    # and does NOT spawn a new track (0.2 < new_track_thresh 0.3)
    assert int(aux["num_new"]) == 0


def test_new_track_threshold(random_pose_factory):
    base = random_pose_factory()
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    state, aux = step(state, [(base, 0.2)])   # below new_track_thresh
    assert int(aux["num_new"]) == 0
    assert np.asarray(state.active).sum() == 0


def test_duplicate_suppression(random_pose_factory):
    base = random_pose_factory()
    cfg = TrackerConfig(max_tracks=16, max_detections=8, min_hits=1)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    # Seed two overlapping tracks manually (same location)
    near = base.copy()
    near[:, 0] += 1.0
    state, _ = tracker_step(state, make_dets([(base, 0.9)]), cfg)
    # Force a second track by making the first unmatched-but-kept: feed
    # both poses while first track exists; second det overlaps heavily ->
    # it matches the existing track OR creates a duplicate, which dedup
    # must then remove. After a few frames exactly one track survives.
    for t in range(4):
        state, _ = tracker_step(
            state, make_dets([(base, 0.9), (near, 0.88)]), cfg)
    act = np.asarray(state.active)
    st = np.asarray(state.states)
    confirmed = act & (st != C.TRACK_STATE_LOST)
    assert confirmed.sum() <= 2   # at most one per detection
    # the two dets overlap > 0.7 IoU, so dedup keeps a single confirmed
    # track lineage with the most hits
    hits = np.asarray(state.hits)[act]
    assert hits.max() >= 4


def test_capacity_limits(random_pose_factory):
    cfg = TrackerConfig(max_tracks=4, max_detections=8)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    dets = []
    for i in range(8):
        p = random_pose_factory()
        p[:, 0] = (p[:, 0] % 100) + i * 500.0   # all far apart
        dets.append((p, 0.9))
    state, aux = tracker_step(state, make_dets(dets), cfg)
    # only max_tracks slots available
    assert int(aux["num_new"]) == 4
    assert np.asarray(state.active).sum() == 4


def test_jit_stability_no_retrace(random_pose_factory):
    # same shapes -> one compilation; frame counter advances
    base = random_pose_factory()
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    for t in range(3):
        state, _ = step(state, [(moving_pose(base, t), 0.9)])
    assert int(state.frame) == 3


def test_identity_through_crossing(random_pose_factory):
    """Two people walking through each other: IDs must survive the
    approach and separation (the velocity-adaptive gate + OKS shape
    matching carry identity through the near-overlap frames)."""
    a = random_pose_factory()
    a[:, 0] = (a[:, 0] % 80) + 100.0          # left, moving right
    b = random_pose_factory()
    b[:, 0] = (b[:, 0] % 80) + 400.0          # right, moving left
    b[:, 1] = a[:, 1] + 40.0                  # slight vertical offset

    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    id_a = id_b = None
    for t in range(30):
        pa = a.copy(); pa[:, 0] += 10.0 * t
        pb = b.copy(); pb[:, 0] -= 10.0 * t
        state, _ = step(state, [(pa, 0.9), (pb, 0.88)])
        slot = np.asarray(state.det_track_slot)
        ids = np.asarray(state.ids)
        cur_a, cur_b = ids[slot[0]], ids[slot[1]]
        if t == 3:
            id_a, id_b = cur_a, cur_b
            assert id_a != id_b
        if t >= 3:
            assert cur_a == id_a, f"id A switched at t={t}"
            assert cur_b == id_b, f"id B switched at t={t}"


def test_kalman136_motion_model(random_pose_factory):
    """The third-order Kalman motion model: track birth, smoothing, and
    identity persistence under accelerating motion."""
    cfg = TrackerConfig(max_tracks=16, max_detections=8,
                        motion_model="kalman136")
    base = random_pose_factory()
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    for t in range(8):
        p = base.copy()
        p[:, 0] += 2.0 * t + 0.5 * t * t      # accelerating
        state, aux = tracker_step(state, make_dets([(p, 0.9)]), cfg)
    assert int(aux["num_active"]) == 1
    act = np.asarray(state.active)
    assert np.asarray(state.hits)[act][0] == 8
    assert np.asarray(state.ids)[act][0] == 1
    # kalman state populated: velocity and acceleration learned
    kf = np.asarray(state.kf_mean).reshape(cfg.max_tracks, 17, 8)
    slot = int(np.asarray(state.det_track_slot)[0])
    assert abs(kf[slot, :, 2].mean()) > 0.5    # vx learned
    # smoothed positions track the detections closely
    p_final = base.copy()
    p_final[:, 0] += 2.0 * 7 + 0.5 * 49
    err = np.abs(np.asarray(state.poses)[slot, :, 0] - p_final[:, 0]).mean()
    assert err < 10.0
