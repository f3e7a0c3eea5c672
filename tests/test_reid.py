"""Appearance Re-ID hook (ops/reid.py): descriptor, cost blend, EMA,
and association behavior in tracker_step."""
import jax
import jax.numpy as jnp
import numpy as np

from posebyte_tpu.core.config import TrackerConfig
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.ops.reid import (REID_DIM, blend_reid_cost,
                                   cosine_cost_matrix,
                                   ema_update, pose_color_embedding)
from posebyte_tpu.tracker.step import tracker_step
from posebyte_tpu.utils.synthetic import poses_to_detections


def _pose_at(cx, cy, scale=60.0):
    from posebyte_tpu.utils.synthetic import POSE_OFFSETS
    pose = np.ones((17, 3), np.float32)
    pose[:, 0] = cx + POSE_OFFSETS[:, 0] * scale
    pose[:, 1] = cy + POSE_OFFSETS[:, 1] * scale
    return pose


def test_pose_color_embedding_samples_image():
    """Descriptor reflects the colors under the keypoints and is
    L2-normalized; invisible keypoints contribute nothing."""
    S = 64
    img = np.zeros((S, S, 3), np.float32)
    img[:, :32] = [1.0, 0.0, 0.0]       # left half red
    img[:, 32:] = [0.0, 0.0, 1.0]       # right half blue
    poses = np.stack([_pose_at(16, 32, 10), _pose_at(48, 32, 10)])
    emb = np.asarray(pose_color_embedding(jnp.asarray(img),
                                          jnp.asarray(poses)))
    assert emb.shape == (2, REID_DIM)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               atol=1e-5)
    # red-region pose has energy in channel 0, blue-region in channel 2
    assert emb[0, 0::3].sum() > 0.9 and emb[0, 2::3].sum() < 0.1
    assert emb[1, 2::3].sum() > 0.9 and emb[1, 0::3].sum() < 0.1
    # cross-cost far exceeds self-cost
    cost = np.asarray(cosine_cost_matrix(jnp.asarray(emb),
                                         jnp.asarray(emb)))
    assert cost[0, 0] < 0.01 and cost[1, 1] < 0.01
    assert cost[0, 1] > 0.9 and cost[1, 0] > 0.9

    # occluded keypoints drop out of the descriptor
    poses_occ = poses.copy()
    poses_occ[0, :8, 2] = 0.0
    emb_occ = np.asarray(pose_color_embedding(jnp.asarray(img),
                                              jnp.asarray(poses_occ)))
    assert np.asarray(cosine_cost_matrix(
        jnp.asarray(emb_occ[:1]), jnp.asarray(emb[:1])))[0, 0] < 0.05


def test_blend_preserves_locks_and_ema_normalizes():
    geom = jnp.asarray([[0.2, 1e9], [1e9, 0.4]])
    reid = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(blend_reid_cost(geom, reid, 0.5))
    assert out[0, 1] == 1e9 and out[1, 0] == 1e9
    np.testing.assert_allclose(out[0, 0], 0.6, atol=1e-6)

    te = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    de = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
    upd = np.asarray(ema_update(te, de, jnp.asarray([True, False])))
    np.testing.assert_allclose(np.linalg.norm(upd, axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(upd[1], [0.0, 1.0], atol=1e-6)  # unmatched

def test_reid_resolves_ambiguous_association():
    """Two tracks at the SAME predicted location (geometric tie): the
    appearance term must pick the color-consistent detection, and with
    reid off the assignment is geometry-arbitrary but still 1-1."""
    cfg = TrackerConfig(max_tracks=8, max_detections=4, min_hits=1,
                        reid_weight=0.4)
    state = TrackerState.init(8, 4)

    pose = _pose_at(100, 100)
    ea = np.zeros(REID_DIM, np.float32); ea[0::3] = 1.0   # "red" track
    eb = np.zeros(REID_DIM, np.float32); eb[2::3] = 1.0   # "blue" track
    ea /= np.linalg.norm(ea); eb /= np.linalg.norm(eb)

    # seed two tracks at the same place with distinct appearances
    det0 = poses_to_detections(np.stack([pose, pose]), 4)
    emb0 = jnp.asarray(np.stack([ea, eb, np.zeros(REID_DIM),
                                 np.zeros(REID_DIM)], 0).astype(np.float32))
    state, _ = tracker_step(state, det0, cfg, det_embeddings=emb0)
    ids0 = np.asarray(state.ids[:2])

    # next frame: detections at the same location, colors SWAPPED in
    # detection order — geometry ties, appearance disambiguates
    det1 = poses_to_detections(np.stack([pose, pose]), 4)
    emb1 = jnp.asarray(np.stack([eb, ea, np.zeros(REID_DIM),
                                 np.zeros(REID_DIM)], 0).astype(np.float32))
    state, _ = tracker_step(state, det1, cfg, det_embeddings=emb1)
    slot = np.asarray(state.det_track_slot)
    # detection 0 carries eb -> must match the "blue" track (slot 1)
    assert slot[0] == 1 and slot[1] == 0, slot


def test_pipeline_runs_with_reid():
    """Full PosePipeline with reid_weight > 0 (scan path) end to end."""
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig)
    from posebyte_tpu.pipeline import PosePipeline
    cfg = PipelineConfig(
        detector=DetectorConfig(input_size=192, num_anchors=756,
                                max_candidates=32, max_detections=8),
        tracker=TrackerConfig(max_tracks=16, max_detections=8,
                              reid_weight=0.3),
        model_name="yolov8n-pose", precision="fp32")
    pipe = PosePipeline(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 240, 320, 3), dtype=np.uint8)
    for f in frames:
        out = pipe.process_frame(f)
    assert out["emit"].shape == (8,)
    # chunk mode (scan path, embeddings threaded through the scan)
    outs = pipe.process_chunk(frames)
    assert outs["emit"].shape == (3, 8)
    assert bool(jnp.isfinite(pipe.state.embeddings).all())


def test_reid_lost_recovery_prefers_matching_appearance():
    """A lost track reappearing among two geometrically-equivalent
    candidates re-acquires via the appearance term in the lost tier."""
    cfg = TrackerConfig(max_tracks=8, max_detections=4, min_hits=1,
                        max_age=1, reid_weight=0.4)
    state = TrackerState.init(8, 4)

    ea = np.zeros(REID_DIM, np.float32); ea[0::3] = 1.0
    eb = np.zeros(REID_DIM, np.float32); eb[2::3] = 1.0
    ea /= np.linalg.norm(ea); eb /= np.linalg.norm(eb)
    zero2 = np.zeros((2, REID_DIM), np.float32)

    # establish a confirmed "red" track
    pose = _pose_at(200, 200)
    for _ in range(3):
        det = poses_to_detections(np.stack([pose]), 4)
        emb = jnp.asarray(np.concatenate([ea[None], np.zeros((3, REID_DIM),
                                                             np.float32)]))
        state, _ = tracker_step(state, det, cfg, det_embeddings=emb)
    tid = int(np.asarray(state.ids)[0])
    assert int(np.asarray(state.states)[0]) == 1      # confirmed

    # occlusion: miss until the track goes LOST
    from posebyte_tpu.core.structs import Detections
    empty = Detections.empty(4)
    none = jnp.asarray(np.zeros((4, REID_DIM), np.float32))
    for _ in range(3):
        state, _ = tracker_step(state, empty, cfg, det_embeddings=none)
    assert int(np.asarray(state.states)[0]) == 2      # lost

    # reappearance: two candidates at the SAME predicted location, one
    # red one blue — the lost tier must pick the red one for the old id
    det = poses_to_detections(np.stack([pose, pose]), 4)
    emb = jnp.asarray(np.concatenate([np.stack([eb, ea]), zero2]))
    state, _ = tracker_step(state, det, cfg, det_embeddings=emb)
    slot = np.asarray(state.det_track_slot)
    assert slot[1] == 0, slot          # red detection -> old track slot
    assert int(np.asarray(state.ids)[0]) == tid
    assert int(np.asarray(state.states)[0]) == 1      # reactivated
