"""Tests for the OKS-mAP and tracking-quality evaluators, including an
end-to-end tracker-quality check on synthetic sequences."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.tracker import tracker_step, get_active_tracks
from posebyte_tpu.utils.evaluation import (oks_similarity, match_detections,
                                           keypoint_map, TrackingEvaluator)


def test_oks_similarity_basics(random_pose_factory):
    p = random_pose_factory()
    assert oks_similarity(p, p) > 0.999
    far = p.copy()
    far[:, 0] += 500
    assert oks_similarity(p, far) < 0.01


def test_match_detections_greedy(random_pose_factory):
    a = random_pose_factory()
    b = random_pose_factory()
    b[:, 0] += 400
    preds = [a.copy(), b.copy(), a.copy()]   # duplicate of a
    scores = [0.9, 0.8, 0.95]
    m, ug, up = match_detections([a, b], preds, scores)
    assert len(m) == 2 and not ug
    # highest-scoring duplicate (index 2) takes GT a
    assert (0, 2) in [(g, p) for g, p, _ in m]
    assert up == [0]


def test_keypoint_map_perfect_and_degraded(random_pose_factory):
    gts = [[random_pose_factory() for _ in range(3)] for _ in range(4)]
    preds = [[p.copy() for p in f] for f in gts]
    scores = [[0.9] * 3 for _ in gts]
    r = keypoint_map(gts, preds, scores)
    assert r["mAP"] > 0.99 and r["AP50"] > 0.99

    # shift half the predictions far away -> mAP drops
    for f in preds[:2]:
        for p in f:
            p[:, 0] += 300
    r2 = keypoint_map(gts, preds, scores)
    assert r2["mAP"] < 0.6


def test_tracking_evaluator_on_synthetic_sequence(random_pose_factory):
    """The full tracker must hold MOTA=1.0 (zero switches/misses) on a
    clean 2-person synthetic sequence."""
    cfg = TrackerConfig(max_tracks=16, max_detections=8, min_hits=1)
    a = random_pose_factory()
    b = random_pose_factory()
    b[:, 0] = a[:, 0] + 350

    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    ev = TrackingEvaluator()
    for t in range(8):
        ga = a.copy(); ga[:, 0] += 3 * t
        gb = b.copy(); gb[:, 0] -= 3 * t
        poses = np.zeros((8, 17, 3), np.float32)
        poses[0], poses[1] = ga, gb
        det = Detections(
            poses=jnp.asarray(poses), boxes=jnp.zeros((8, 4)),
            scores=jnp.asarray([0.9, 0.85] + [0.0] * 6, jnp.float32),
            valid=jnp.asarray([True, True] + [False] * 6))
        state, _ = tracker_step(state, det, cfg)
        tracks = get_active_tracks(state, np.asarray(det.scores), cfg)
        ev.update({"a": ga, "b": gb}, tracks)

    s = ev.summary()
    assert s["id_switches"] == 0
    assert s["misses"] == 0 and s["false_positives"] == 0
    assert s["MOTA"] == 1.0
