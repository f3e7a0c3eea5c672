"""Tests for debug introspection, telemetry, and checkpoint/resume."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.tracker import tracker_step
from posebyte_tpu.tracker.debug import (tracker_step_debug, dump_detections,
                                        get_track_states)
from posebyte_tpu.utils.checkpoint import (save_tracker_state,
                                           load_tracker_state,
                                           save_kalman_state,
                                           load_kalman_state)
from posebyte_tpu.core.structs import KalmanState136
from posebyte_tpu.utils.profiling import FrameTiming, TrackerTiming

CFG = TrackerConfig(max_tracks=16, max_detections=8)


def make_det(pose, score=0.9, capacity=8):
    poses = np.zeros((capacity, 17, 3), np.float32)
    poses[0] = pose
    scores = np.zeros((capacity,), np.float32)
    scores[0] = score
    valid = np.zeros((capacity,), bool)
    valid[0] = True
    return Detections(poses=jnp.asarray(poses),
                      boxes=jnp.zeros((capacity, 4)),
                      scores=jnp.asarray(scores), valid=jnp.asarray(valid))


def test_tracker_step_debug_intermediates(random_pose_factory):
    det = make_det(random_pose_factory())
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    state, _ = tracker_step(state, det, CFG)
    dbg = tracker_step_debug(state, det, CFG)
    assert dbg["gate_mask"].shape == (16, 8)
    assert dbg["cost_high"].shape == (16, 8)
    # the just-created track should gate and match its own detection
    slot = int(np.asarray(state.det_track_slot)[0])
    assert dbg["gate_mask"][slot, 0]
    assert dbg["row_assign_final"][slot] == 0


def test_dump_and_track_states(random_pose_factory):
    det = make_det(random_pose_factory())
    s = dump_detections(det)
    assert "det[0]" in s and "left_shoulder" in s
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    state, _ = tracker_step(state, det, CFG)
    ts = get_track_states(state)
    assert len(ts) == 1 and ts[0]["track_id"] == 1 and ts[0]["hits"] == 1


def test_timing_reports():
    ft = FrameTiming(preprocess_ms=10, detect_ms=20, track_ms=5,
                     total_ms=40, frames=10)
    r = ft.report()
    assert "250.0 FPS" in r and "Detect" in r
    tt = TrackerTiming(predict_us=100, total_us=1000, frame_count=10)
    tt.print_stats()   # smoke: no crash


def test_tracker_checkpoint_roundtrip(tmp_path, random_pose_factory):
    det = make_det(random_pose_factory())
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    for _ in range(3):
        state, _ = tracker_step(state, det, CFG)
    path = str(tmp_path / "tracker.safetensors")
    save_tracker_state(state, path)
    loaded = load_tracker_state(path)
    np.testing.assert_array_equal(np.asarray(state.ids),
                                  np.asarray(loaded.ids))
    assert int(loaded.frame) == 3
    # resumed state continues identically
    s1, _ = tracker_step(state, det, CFG)
    s2, _ = tracker_step(loaded, det, CFG)
    np.testing.assert_allclose(np.asarray(s1.poses), np.asarray(s2.poses),
                               rtol=1e-6)


def test_kalman_checkpoint_roundtrip(tmp_path):
    ks = KalmanState136.init(4)
    path = str(tmp_path / "k.safetensors")
    save_kalman_state(ks, path)
    loaded = load_kalman_state(path)
    np.testing.assert_array_equal(np.asarray(ks.mean),
                                  np.asarray(loaded.mean))


def test_profile_tracker_stages(random_pose_factory):
    from posebyte_tpu.utils.profiling import profile_tracker_stages
    det = make_det(random_pose_factory())
    state = TrackerState.init(CFG.max_tracks, CFG.max_detections)
    state, _ = tracker_step(state, det, CFG)
    t = profile_tracker_stages(state, det, CFG, iters=2)
    assert t.frame_count == 2
    assert t.predict_us > 0 and t.high_assoc_us > 0 and t.total_us > 0
    t.print_stats()
