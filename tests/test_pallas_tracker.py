"""Fused tracker chunk kernel vs the lax.scan reference: exact
equivalence over multi-frame scenarios (interpret mode on the CPU
backend; the same comparison runs on real TPU via the benchmark)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.ops.pallas_tracker import tracker_chunk_pallas
from posebyte_tpu.tracker.output import extract_outputs_device
from posebyte_tpu.tracker.step import tracker_step
from posebyte_tpu.utils.synthetic import SyntheticScene, poses_to_detections

CFG = TrackerConfig(max_tracks=128, max_detections=64)


def _scan_reference(state, dets, cfg):
    def track_one(state, det):
        state, aux = tracker_step(state, det, cfg)
        ids, scores, poses, boxes, emit = extract_outputs_device(
            state, det.scores, cfg)
        return state, {"ids": ids, "scores": scores, "poses": poses,
                       "boxes": boxes, "emit": emit,
                       "num_active": aux["num_active"]}
    return jax.lax.scan(track_one, state, dets)


def _stack_dets(det_list):
    return Detections(
        poses=jnp.stack([d.poses for d in det_list]),
        boxes=jnp.stack([d.boxes for d in det_list]),
        scores=jnp.stack([d.scores for d in det_list]),
        valid=jnp.stack([d.valid for d in det_list]),
    )


def _compare(state0, dets, cfg, frames_note=""):
    ref_state, ref_out = jax.jit(
        lambda s, d: _scan_reference(s, d, cfg))(state0, dets)
    got_state, got_out = tracker_chunk_pallas(
        TrackerState.init(cfg.max_tracks, cfg.max_detections)
        if state0 is None else state0, dets, cfg, interpret=True)

    ref_out, got_out = jax.device_get((ref_out, got_out))
    np.testing.assert_array_equal(ref_out["emit"], got_out["emit"],
                                  err_msg=f"emit {frames_note}")
    np.testing.assert_array_equal(ref_out["ids"], got_out["ids"],
                                  err_msg=f"ids {frames_note}")
    np.testing.assert_allclose(ref_out["scores"], got_out["scores"],
                               atol=1e-5)
    np.testing.assert_allclose(ref_out["poses"], got_out["poses"],
                               atol=1e-3)
    np.testing.assert_allclose(ref_out["boxes"], got_out["boxes"],
                               atol=1e-2)
    np.testing.assert_array_equal(ref_out["num_active"],
                                  got_out["num_active"])

    ref_state, got_state = jax.device_get((ref_state, got_state))
    np.testing.assert_array_equal(ref_state.ids, got_state.ids)
    np.testing.assert_array_equal(ref_state.states, got_state.states)
    np.testing.assert_array_equal(ref_state.hits, got_state.hits)
    np.testing.assert_array_equal(ref_state.ages, got_state.ages)
    np.testing.assert_array_equal(ref_state.active, got_state.active)
    np.testing.assert_array_equal(ref_state.last_frame,
                                  got_state.last_frame)
    assert int(ref_state.next_id) == int(got_state.next_id)
    assert int(ref_state.frame) == int(got_state.frame)
    np.testing.assert_array_equal(ref_state.det_track_slot,
                                  got_state.det_track_slot)
    np.testing.assert_allclose(ref_state.poses, got_state.poses,
                               atol=1e-3)
    np.testing.assert_allclose(ref_state.velocities,
                               got_state.velocities, atol=1e-3)
    np.testing.assert_allclose(ref_state.scores, got_state.scores,
                               atol=1e-5)


def test_chunk_kernel_matches_scan_moving_scene():
    """6 frames of 5 moving figures: identical ids/emit/poses/state."""
    scene = SyntheticScene(5, 1280, 720, seed=3)
    dets = _stack_dets([poses_to_detections(gt, 64)
                        for gt in scene.frames(6)])
    _compare(TrackerState.init(128, 64), dets, CFG, "moving")


def test_chunk_kernel_matches_scan_with_dropouts():
    """Appear / disappear / reappear: exercises aging, lost recovery,
    new-track allocation, and dedup against the scan path."""
    scene = SyntheticScene(6, 960, 540, seed=9)
    rng = np.random.default_rng(4)
    det_list = []
    for f, gt in enumerate(scene.frames(10)):
        keep = rng.random(len(gt)) > 0.3        # random dropouts
        subset = gt[keep] if keep.any() else gt[:1]
        det_list.append(poses_to_detections(subset, 64,
                                            score=0.4 + 0.5 * rng.random()))
    _compare(TrackerState.init(128, 64), _stack_dets(det_list), CFG,
             "dropouts")


def test_chunk_kernel_empty_and_crowded_frames():
    """Empty frames interleaved with a crowded frame (40 people)."""
    scene = SyntheticScene(40, 3840, 2160, seed=5,
                           scale_range=(60.0, 90.0))
    crowded = [poses_to_detections(gt, 64) for gt in scene.frames(3)]
    empty = Detections.empty(64)
    dets = _stack_dets([empty, crowded[0], crowded[1], empty,
                        crowded[2]])
    _compare(TrackerState.init(128, 64), dets, CFG, "empty+crowded")


def test_chunk_kernel_continues_from_state():
    """Chunk-to-chunk state threading matches one long scan."""
    scene = SyntheticScene(4, 640, 480, seed=11)
    all_dets = [poses_to_detections(gt, 64) for gt in scene.frames(8)]
    full = _stack_dets(all_dets)
    ref_state, _ = jax.jit(
        lambda s, d: _scan_reference(s, d, CFG))(
            TrackerState.init(128, 64), full)

    state = TrackerState.init(128, 64)
    for half in (all_dets[:4], all_dets[4:]):
        state, _ = tracker_chunk_pallas(state, _stack_dets(half), CFG,
                                        interpret=True)
    ref_state, state = jax.device_get((ref_state, state))
    np.testing.assert_array_equal(ref_state.ids, state.ids)
    np.testing.assert_array_equal(ref_state.active, state.active)
    np.testing.assert_array_equal(ref_state.hits, state.hits)
    assert int(ref_state.next_id) == int(state.next_id)
    np.testing.assert_allclose(ref_state.poses, state.poses, atol=1e-3)


def test_chunk_kernel_vmaps_over_streams():
    """vmap over a stream axis (the multi-stream chunk pipeline's use)
    matches per-stream sequential application."""
    streams = 3
    state0 = jax.vmap(lambda _: TrackerState.init(128, 64))(
        jnp.arange(streams))
    det_sets = []
    for s in range(streams):
        scene = SyntheticScene(3 + s, 640, 480, seed=20 + s)
        det_sets.append(_stack_dets([poses_to_detections(gt, 64)
                                     for gt in scene.frames(5)]))
    dets_b = Detections(
        poses=jnp.stack([d.poses for d in det_sets]),
        boxes=jnp.stack([d.boxes for d in det_sets]),
        scores=jnp.stack([d.scores for d in det_sets]),
        valid=jnp.stack([d.valid for d in det_sets]),
    )

    vstate, vout = jax.vmap(
        lambda s, d: tracker_chunk_pallas(s, d, CFG, interpret=True)
    )(state0, dets_b)

    for s in range(streams):
        rstate, rout = tracker_chunk_pallas(
            jax.tree.map(lambda a: a[s], state0), det_sets[s], CFG,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(vout["ids"][s]),
                                      np.asarray(rout["ids"]))
        np.testing.assert_array_equal(np.asarray(vout["emit"][s]),
                                      np.asarray(rout["emit"]))
        np.testing.assert_array_equal(np.asarray(vstate.ids[s]),
                                      np.asarray(rstate.ids))
        np.testing.assert_allclose(np.asarray(vstate.poses[s]),
                                   np.asarray(rstate.poses), atol=1e-3)


@pytest.mark.parametrize("cfg", [
    TrackerConfig(max_tracks=64, max_detections=32, min_hits=1),
    TrackerConfig(max_tracks=128, max_detections=64, match_threshold=0.3,
                  high_thresh=0.5, new_track_thresh=0.6, max_age=3,
                  lost_window=2, gate_threshold=2.0,
                  dedup_iou_threshold=0.5),
])
def test_chunk_kernel_config_variations(cfg):
    """Equivalence holds across pool sizes and threshold settings."""
    scene = SyntheticScene(5, 800, 600, seed=13)
    rng = np.random.default_rng(2)
    det_list = []
    for gt in scene.frames(7):
        keep = rng.random(len(gt)) > 0.25
        subset = gt[keep] if keep.any() else gt[:1]
        det_list.append(poses_to_detections(
            subset, cfg.max_detections, score=0.3 + 0.7 * rng.random()))
    _compare(TrackerState.init(cfg.max_tracks, cfg.max_detections),
             _stack_dets(det_list), cfg, "config-var")


def test_chunk_kernel_slot_exhaustion():
    """More new detections than free slots: allocation must cap at
    num_free with identical slot/id assignment to the scan path."""
    cfg = TrackerConfig(max_tracks=8, max_detections=16, min_hits=1)
    scene = SyntheticScene(12, 1920, 1080, seed=6,
                           scale_range=(60.0, 90.0))
    dets = _stack_dets([poses_to_detections(gt, 16)
                        for gt in scene.frames(4)])
    _compare(TrackerState.init(8, 16), dets, cfg, "exhaustion")


def test_chunk_kernel_kalman136():
    """kalman136 motion model in the fused kernel matches the scan path
    (third-order predict, per-kp scalar-gain update, initiate), incl.
    the kf_mean/kf_cov state round trip."""
    cfg = TrackerConfig(max_tracks=128, max_detections=64,
                        motion_model="kalman136")
    scene = SyntheticScene(5, 1280, 720, seed=8)
    rng = np.random.default_rng(3)
    det_list = []
    for gt in scene.frames(8):
        keep = rng.random(len(gt)) > 0.25
        subset = gt[keep] if keep.any() else gt[:1]
        det_list.append(poses_to_detections(subset, 64))
    dets = _stack_dets(det_list)
    state0 = TrackerState.init(128, 64)

    ref_state, ref_out = jax.jit(
        lambda s, d: _scan_reference(s, d, cfg))(state0, dets)
    got_state, got_out = tracker_chunk_pallas(
        TrackerState.init(128, 64), dets, cfg, interpret=True)

    ref_out, got_out = jax.device_get((ref_out, got_out))
    np.testing.assert_array_equal(ref_out["emit"], got_out["emit"])
    np.testing.assert_array_equal(ref_out["ids"], got_out["ids"])
    np.testing.assert_allclose(ref_out["poses"], got_out["poses"],
                               atol=1e-2)
    ref_state, got_state = jax.device_get((ref_state, got_state))
    np.testing.assert_array_equal(ref_state.ids, got_state.ids)
    np.testing.assert_array_equal(ref_state.active, got_state.active)
    np.testing.assert_allclose(ref_state.kf_mean, got_state.kf_mean,
                               atol=1e-2)
    np.testing.assert_allclose(ref_state.kf_cov, got_state.kf_cov,
                               atol=1e-3)
    np.testing.assert_allclose(ref_state.poses, got_state.poses,
                               atol=1e-2)


def test_chunk_kernel_all_empty_from_fresh_state():
    """A chunk of entirely empty frames from a fresh state: no tracks,
    no id movement, state stays pristine (degenerate-input guard)."""
    empty = _stack_dets([Detections.empty(64) for _ in range(6)])
    state, outs = tracker_chunk_pallas(TrackerState.init(128, 64),
                                       empty, CFG, interpret=True)
    outs, state = jax.device_get((outs, state))
    assert not outs["emit"].any()
    assert (outs["num_active"] == 0).all()
    assert int(state.next_id) == 1
    assert not state.active.any()
    assert int(state.frame) == 6


def _make_embeddings(Kf, D, seed=7, occl=0.3):
    """Synthetic keypoint-blocked appearance descriptors matching the
    pose_color_embedding convention: zero 3-blocks for occluded
    keypoints, L2-normalized over all 51 components."""
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(Kf, D, 17, 3)).astype(np.float32)
    e[rng.random((Kf, D, 17)) < occl] = 0.0
    e = e.reshape(Kf, D, 51)
    n = np.linalg.norm(e, axis=-1, keepdims=True)
    return jnp.asarray(e / np.maximum(n, 1e-6))


def test_chunk_kernel_reid_matches_scan():
    """reid_weight > 0: the cosine blend, EMA embedding update, and
    alloc-takes-detection-embedding all run in-kernel and match the
    scan path exactly on ids/emit, closely on poses/embeddings."""
    cfg = TrackerConfig(max_tracks=128, max_detections=64,
                        reid_weight=0.4, reid_ema=0.85)
    scene = SyntheticScene(5, 1280, 720, seed=17)
    rng = np.random.default_rng(6)
    det_list = []
    for gt in scene.frames(8):
        keep = rng.random(len(gt)) > 0.25
        subset = gt[keep] if keep.any() else gt[:1]
        det_list.append(poses_to_detections(subset, 64))
    dets = _stack_dets(det_list)
    embs = _make_embeddings(8, 64)

    def track_one(state, det_emb):
        det, emb = det_emb
        state, aux = tracker_step(state, det, cfg, det_embeddings=emb)
        ids, scores, poses, boxes, emit = extract_outputs_device(
            state, det.scores, cfg)
        return state, {"ids": ids, "emit": emit,
                       "num_active": aux["num_active"], "poses": poses}

    ref_state, ref_out = jax.jit(
        lambda s, d, e: jax.lax.scan(track_one, s, (d, e)))(
            TrackerState.init(128, 64), dets, embs)
    got_state, got_out = tracker_chunk_pallas(
        TrackerState.init(128, 64), dets, cfg, det_embeddings=embs,
        interpret=True)

    ref_out, got_out = jax.device_get((ref_out, got_out))
    np.testing.assert_array_equal(ref_out["ids"], got_out["ids"])
    np.testing.assert_array_equal(ref_out["emit"], got_out["emit"])
    np.testing.assert_array_equal(ref_out["num_active"],
                                  got_out["num_active"])
    np.testing.assert_allclose(ref_out["poses"], got_out["poses"],
                               atol=1e-3)
    ref_state, got_state = jax.device_get((ref_state, got_state))
    np.testing.assert_array_equal(ref_state.ids, got_state.ids)
    np.testing.assert_array_equal(ref_state.active, got_state.active)
    np.testing.assert_allclose(ref_state.embeddings,
                               got_state.embeddings, atol=1e-4)
    np.testing.assert_allclose(ref_state.poses, got_state.poses,
                               atol=1e-3)


def _gated_scan_reference(state, dets, advance, cfg):
    """The serving scan semantics (pipeline/serving._gated_stream_chunk):
    per-frame advance gating via state blend."""
    def track_one(state, det_adv):
        det, adv = det_adv
        new_state, aux = tracker_step(state, det, cfg)
        state = jax.tree.map(lambda n, o: jnp.where(adv, n, o),
                             new_state, state)
        ids, scores, poses, boxes, emit = extract_outputs_device(
            state, det.scores, cfg)
        return state, {"ids": ids, "scores": scores, "poses": poses,
                       "emit": emit & adv,
                       "num_active": jnp.where(adv, aux["num_active"],
                                               0)}
    return jax.lax.scan(track_one, state, (dets, advance))


def test_chunk_kernel_advance_gating_matches_gated_scan():
    """Starvation pattern (holes in the advance mask): non-advanced
    frames leave state untouched and emit nothing; state and
    advanced-frame outputs match the serving scan path."""
    scene = SyntheticScene(4, 960, 540, seed=23)
    dets = _stack_dets([poses_to_detections(gt, 64)
                        for gt in scene.frames(8)])
    advance = jnp.asarray([True, True, False, True, False, False,
                           True, True])

    ref_state, ref_out = jax.jit(
        lambda s, d, a: _gated_scan_reference(s, d, a, CFG))(
            TrackerState.init(128, 64), dets, advance)
    got_state, got_out = tracker_chunk_pallas(
        TrackerState.init(128, 64), dets, CFG, advance=advance,
        interpret=True)

    ref_out, got_out = jax.device_get((ref_out, got_out))
    adv = np.asarray(advance)
    np.testing.assert_array_equal(ref_out["emit"], got_out["emit"])
    np.testing.assert_array_equal(ref_out["num_active"],
                                  got_out["num_active"])
    np.testing.assert_array_equal(ref_out["ids"][adv],
                                  got_out["ids"][adv])
    np.testing.assert_allclose(ref_out["poses"][adv],
                               got_out["poses"][adv], atol=1e-3)
    assert not got_out["emit"][~adv].any()
    assert (got_out["ids"][~adv] == -1).all()

    ref_state, got_state = jax.device_get((ref_state, got_state))
    np.testing.assert_array_equal(ref_state.ids, got_state.ids)
    np.testing.assert_array_equal(ref_state.states, got_state.states)
    np.testing.assert_array_equal(ref_state.hits, got_state.hits)
    np.testing.assert_array_equal(ref_state.ages, got_state.ages)
    np.testing.assert_array_equal(ref_state.active, got_state.active)
    assert int(ref_state.frame) == int(got_state.frame)
    assert int(ref_state.next_id) == int(got_state.next_id)
    np.testing.assert_array_equal(ref_state.det_track_slot,
                                  got_state.det_track_slot)
    np.testing.assert_allclose(ref_state.poses, got_state.poses,
                               atol=1e-3)


def test_chunk_kernel_advance_all_true_is_identity():
    """advance=all-True must be bit-identical to passing no mask."""
    scene = SyntheticScene(3, 640, 480, seed=29)
    dets = _stack_dets([poses_to_detections(gt, 64)
                        for gt in scene.frames(5)])
    s_a, o_a = tracker_chunk_pallas(
        TrackerState.init(128, 64), dets, CFG,
        advance=jnp.ones(5, bool), interpret=True)
    s_b, o_b = tracker_chunk_pallas(
        TrackerState.init(128, 64), dets, CFG, interpret=True)
    o_a, o_b = jax.device_get((o_a, o_b))
    for k in o_a:
        np.testing.assert_array_equal(np.asarray(o_a[k]),
                                      np.asarray(o_b[k]))
    s_a, s_b = jax.device_get((s_a, s_b))
    np.testing.assert_array_equal(s_a.ids, s_b.ids)
    np.testing.assert_array_equal(np.asarray(s_a.poses),
                                  np.asarray(s_b.poses))


def test_chunk_kernel_starved_chunk_then_resume():
    """A fully starved chunk is a no-op on state; tracking resumes
    cleanly in the next chunk (slot-reuse / reopen scenario)."""
    scene = SyntheticScene(3, 640, 480, seed=31)
    all_dets = [poses_to_detections(gt, 64) for gt in scene.frames(8)]
    state = TrackerState.init(128, 64)
    state, _ = tracker_chunk_pallas(state, _stack_dets(all_dets[:4]),
                                    CFG, interpret=True)
    frame_before = int(state.frame)
    starved, out = tracker_chunk_pallas(
        state, _stack_dets(all_dets[4:]), CFG,
        advance=jnp.zeros(4, bool), interpret=True)
    out = jax.device_get(out)
    assert not out["emit"].any()
    assert int(starved.frame) == frame_before
    np.testing.assert_array_equal(np.asarray(starved.ids),
                                  np.asarray(state.ids))
    # resume: same detections now advance and continue identities
    resumed, out2 = tracker_chunk_pallas(
        starved, _stack_dets(all_dets[4:]), CFG,
        advance=jnp.ones(4, bool), interpret=True)
    assert int(resumed.frame) == frame_before + 4
    assert jax.device_get(out2)["emit"].any()


def test_chunk_kernel_dedup_stress():
    """Many heavily-overlapping figures force the dedup stage to drop
    duplicates — still exactly equal to the scan path."""
    base = SyntheticScene(1, 640, 480, seed=30,
                          scale_range=(100.0, 120.0)).step()[0]
    rng = np.random.default_rng(5)
    det_list = []
    for f in range(6):
        # 10 near-identical copies, tiny jitter: dedup-heavy frames
        poses = np.stack([base + rng.normal(0, 1.5, base.shape)
                          .astype(np.float32) for _ in range(10)])
        poses[:, :, 2] = 1.0
        det_list.append(poses_to_detections(
            poses, 64, score=0.5 + 0.5 * rng.random()))
    _compare(TrackerState.init(128, 64), _stack_dets(det_list), CFG,
             "dedup-stress")


def test_chunk_kernel_large_detection_pool():
    """D = 128 detections (twice the default) with a big crowd —
    [T, D] = [128, 128] tiles exercise full-lane shapes."""
    cfg = TrackerConfig(max_tracks=128, max_detections=128)
    scene = SyntheticScene(50, 3840, 2160, seed=21,
                           scale_range=(50.0, 80.0))
    dets = _stack_dets([poses_to_detections(gt, 128)
                        for gt in scene.frames(4)])
    _compare(TrackerState.init(128, 128), dets, cfg, "large-D")
