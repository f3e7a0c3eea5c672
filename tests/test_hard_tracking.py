"""Hard-scenario tracking: generator + IDF1 metric unit tests, and the
CI bars over the crowded held-out clip (bars added once measured on
the r5 eval artifact — see scripts/eval_hard_tracking.py).
"""
import numpy as np
import pytest

from posebyte_tpu.utils.evaluation import TrackingEvaluator
from posebyte_tpu.utils.synthetic import POSE_OFFSETS, CrowdedScene


class _T:
    def __init__(self, tid, pose, score=0.9):
        self.track_id = tid
        self.keypoints = pose
        self.score = score
        self.bbox = np.zeros(4, np.float32)


def _pose(cx, cy, scale=100.0):
    p = np.ones((17, 3), np.float32)
    p[:, :2] = np.asarray([cx, cy], np.float32) + POSE_OFFSETS * scale
    return p


def test_idf1_perfect_tracking():
    ev = TrackingEvaluator()
    for t in range(10):
        gt = {0: _pose(100 + 4 * t, 100), 1: _pose(400, 300 + 4 * t)}
        tracks = [_T(7, gt[0]), _T(9, gt[1])]
        ev.update(gt, tracks)
    s = ev.summary()
    assert s["MOTA"] == 1.0
    assert s["IDF1"] == 1.0
    assert s["id_switches"] == 0


def test_idf1_punishes_persistent_swap_more_than_mota():
    """Two identities swap track ids halfway: MOTA counts 2 switch
    events (2/40 = 0.95) while IDF1 caps at 0.5 — every frame after
    the swap is under a wrong identity. This asymmetry is why the hard
    eval reports IDF1."""
    ev = TrackingEvaluator()
    for t in range(20):
        gt = {0: _pose(100, 100), 1: _pose(400, 300)}
        if t < 10:
            tracks = [_T(7, gt[0]), _T(9, gt[1])]
        else:
            tracks = [_T(9, gt[0]), _T(7, gt[1])]
        ev.update(gt, tracks)
    s = ev.summary()
    assert s["id_switches"] == 2
    assert s["MOTA"] == 0.95
    assert abs(s["IDF1"] - 0.5) < 1e-6


def test_idf1_fragmentation():
    """One identity served by two disjoint track ids (a lost track that
    re-spawned instead of reactivating): zero MOTA switches counted at
    the handover... but IDF1 credits only the longer fragment."""
    ev = TrackingEvaluator()
    for t in range(10):
        gt = {0: _pose(100, 100)}
        tracks = [_T(7 if t < 6 else 8, gt[0])]
        ev.update(gt, tracks)
    s = ev.summary()
    assert s["id_switches"] == 1
    assert abs(s["IDF1"] - 0.6) < 1e-6   # 2*6/(10+10)


def test_crowded_scene_deterministic_and_crossing():
    a = CrowdedScene(n_persons=8, seed=3, clip_len=96)
    b = CrowdedScene(n_persons=8, seed=3, clip_len=96)
    mind = []
    acts = []
    for (pa, aa), (pb, ab) in zip(a.frames(96), b.frames(96)):
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(aa, ab)
        c = pa[aa][:, :, :2].mean(1)
        if len(c) >= 2:
            d = np.linalg.norm(c[:, None] - c[None], axis=-1)
            mind.append(d[np.triu_indices(len(c), 1)].min())
        acts.append(int(aa.sum()))
    # the clip must contain REAL close interactions (occlusion at
    # person scale ~100px) and staggered entry/exit
    assert min(mind) < 60.0
    assert sum(1 for d in mind if d < 80.0) >= 10
    assert min(acts) < 8 and max(acts) == 8


def test_crowded_scene_stays_in_frame():
    sc = CrowdedScene(n_persons=6, seed=11, clip_len=64,
                      width=640, height=360)
    for poses, active in sc.frames(64):
        c = poses[:, :, :2].mean(1)
        assert (c[:, 0] >= 0).all() and (c[:, 0] <= 640).all()
        assert (c[:, 1] >= 0).all() and (c[:, 1] <= 360).all()
