"""Edge-case robustness: empty frames, saturation, determinism."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.tracker import tracker_step
from posebyte_tpu.ops import pose_nms, auction_assign

CFG = TrackerConfig(max_tracks=8, max_detections=4)


def test_empty_detections_whole_sequence():
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    empty = Detections.empty(CFG.max_detections)
    for _ in range(5):
        state, aux = tracker_step(state, empty, CFG)
    assert int(aux["num_active"]) == 0
    assert int(state.frame) == 5


def test_nms_all_invalid():
    det = Detections.empty(16)
    out = pose_nms(det, max_keep=4)
    assert not np.asarray(out.valid).any()


def test_nms_single_detection(random_pose_factory):
    p = random_pose_factory()
    det = Detections.empty(16)
    det = det.replace(poses=det.poses.at[0].set(jnp.asarray(p)),
                      scores=det.scores.at[0].set(0.9),
                      valid=det.valid.at[0].set(True))
    out = pose_nms(det, max_keep=4)
    assert np.asarray(out.valid).sum() == 1


def test_auction_empty_cost():
    cost = jnp.full((4, 4), 1e9, jnp.float32)
    r, c = auction_assign(cost)
    assert (np.asarray(r) == -1).all() and (np.asarray(c) == -1).all()


def test_tracker_determinism(random_pose_factory):
    p = random_pose_factory()
    det = Detections.empty(CFG.max_detections)
    det = det.replace(poses=det.poses.at[0].set(jnp.asarray(p)),
                      scores=det.scores.at[0].set(0.9),
                      valid=det.valid.at[0].set(True))

    def run():
        s = TrackerState.init(CFG.max_tracks, CFG.max_detections)
        for _ in range(4):
            s, _ = tracker_step(s, det, CFG)
        return s

    s1, s2 = run(), run()
    np.testing.assert_array_equal(np.asarray(s1.ids), np.asarray(s2.ids))
    np.testing.assert_array_equal(np.asarray(s1.poses),
                                  np.asarray(s2.poses))


def test_more_detections_than_tracks(random_pose_factory):
    # saturation beyond capacity must not corrupt state
    cfg = TrackerConfig(max_tracks=2, max_detections=4)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    poses = np.zeros((4, 17, 3), np.float32)
    for i in range(4):
        pp = random_pose_factory()
        pp[:, 0] = (pp[:, 0] % 100) + i * 400
        poses[i] = pp
    det = Detections(poses=jnp.asarray(poses), boxes=jnp.zeros((4, 4)),
                     scores=jnp.full((4,), 0.9),
                     valid=jnp.ones((4,), bool))
    for _ in range(3):
        state, aux = tracker_step(state, det, cfg)
    assert int(aux["num_active"]) == 2
    ids = np.asarray(state.ids)[np.asarray(state.active)]
    assert (ids > 0).all()
