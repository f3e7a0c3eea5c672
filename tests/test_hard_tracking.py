"""Hard-scenario tracking: generator + IDF1 metric unit tests, and the
CI bars over the crowded held-out clip (bars added once measured on
the r5 eval artifact — see scripts/eval_hard_tracking.py).
"""
import os

import numpy as np
import pytest

from posebyte_tpu.utils.evaluation import TrackingEvaluator
from posebyte_tpu.utils.synthetic import (POSE_OFFSETS, CrowdedScene,
                                          render_frame)


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


# ---------------------------------------------------------------------
# CI bars over a crowded held-out clip (VERDICT r4 item 3): the full
# production pipeline (pixels -> letterbox -> trained net -> decode ->
# NMS -> tracker) on an 8-person crossing/occlusion clip, wired exactly
# like scripts/eval_hard_tracking.py's "full" config (decode floor =
# low_thresh = conf*0.5, the ByteTrack wiring). Bars are ~5% under the
# values measured IN THIS conftest environment (8-virtual-device CPU,
# fp32, seed 86002): MOTA 0.5404, IDF1 0.4991, 24 id switches —
# matching EVAL_HARD_r05.json's "full" per-seed entry exactly. (A
# single-device CPU process measures 0.5684/0.6192/21 on the same
# clip: sub-ulp float divergence cascades through the track
# recurrence, so the bars are pinned to the environment CI runs in.)
# Unlike the easy 3-person clip (MOTA 1.0 — a bar the detector alone
# clears), these scores DEGRADE if coasting/lost-recovery regress: the
# coast0_nolost ablation drops IDF1 to 0.3961 on the same clips.

_HARD_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets",
                           "yolov8n-pose-synthetic256.safetensors")


@pytest.mark.skipif(not os.path.exists(_HARD_ASSET),
                    reason="trained synthetic checkpoint not present")
def test_hard_clip_ci_bars():
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.models.weights import load_params
    from posebyte_tpu.pipeline import PosePipeline

    W, H, S, seed, n = 640, 360, 256, 86002, 96
    params, name = load_params(_HARD_ASSET)
    scene = CrowdedScene(n_persons=8, width=W, height=H, seed=seed,
                         scale_range=(80.0, 130.0), speed=5.0,
                         entry_exit=True, clip_len=n)
    gts = [(p.copy(), a.copy()) for p, a in scene.frames(n)]
    palette = [(60 + (60 * i) % 196, 200, 255 - (50 * i) % 200)
               for i in range(8)]
    frames = []
    for poses, active in gts:
        idx = [i for i in range(8) if active[i]]
        frames.append(render_frame(
            poses[idx], W, H,
            colors=np.asarray([palette[i] for i in idx])))

    num_anchors = sum((S // s) ** 2 for s in (8, 16, 32))
    cfg = PipelineConfig(
        detector=DetectorConfig(input_size=S, num_anchors=num_anchors,
                                conf_threshold=0.15),
        tracker=TrackerConfig.from_conf_threshold(0.30),
        model_name=name, precision="fp32")
    pipe = PosePipeline(cfg, params=params)
    ev = TrackingEvaluator(oks_threshold=0.5)
    for f, (frame, (poses, active)) in enumerate(zip(frames, gts)):
        out = pipe.process_frame(frame)
        tracks = pipe.fetch_outputs(out, W, H)
        if f >= cfg.tracker.min_hits:
            ev.update({i: poses[i] for i in range(len(poses))
                       if active[i]}, tracks)
    s = ev.summary()
    assert s["MOTA"] >= 0.51, s
    assert s["IDF1"] >= 0.47, s
    assert s["id_switches"] <= 29, s
