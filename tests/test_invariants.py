"""Property/fuzz tests: tracker invariants under random detection
streams, and the int8 engine through the full pipeline."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core import constants as C
from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                      TrackerConfig)
from posebyte_tpu.core.structs import Detections, TrackerState
from posebyte_tpu.tracker import tracker_step


def _random_detections(rng, capacity, p_present=0.7):
    n = rng.integers(0, capacity + 1)
    poses = np.zeros((capacity, 17, 3), np.float32)
    scores = np.zeros((capacity,), np.float32)
    valid = np.zeros((capacity,), bool)
    for i in range(n):
        if rng.uniform() > p_present:
            continue
        cx, cy = rng.uniform(50, 600, 2)
        s = rng.uniform(30, 120)
        poses[i, :, 0] = cx + rng.normal(0, 0.3, 17) * s
        poses[i, :, 1] = cy + rng.normal(0, 0.5, 17) * s
        poses[i, :, 2] = rng.uniform(0, 1, 17)
        scores[i] = rng.uniform(0.05, 1.0)
        valid[i] = True
    return Detections(poses=jnp.asarray(poses), boxes=jnp.zeros(
        (capacity, 4)), scores=jnp.asarray(scores),
        valid=jnp.asarray(valid))


def test_tracker_invariants_random_stream():
    cfg = TrackerConfig(max_tracks=12, max_detections=6)
    rng = np.random.default_rng(1234)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    for frame in range(1, 31):
        state, aux = tracker_step(state, _random_detections(
            rng, cfg.max_detections), cfg)
        active = np.asarray(state.active)
        ids = np.asarray(state.ids)[active]
        states = np.asarray(state.states)[active]
        hits = np.asarray(state.hits)[active]
        ages = np.asarray(state.ages)[active]
        last = np.asarray(state.last_frame)[active]
        slot = np.asarray(state.det_track_slot)

        # ids unique and positive among active tracks
        assert len(np.unique(ids)) == len(ids)
        assert (ids >= 1).all()
        # states in range; hits/ages sane
        assert np.isin(states, [C.TRACK_STATE_TENTATIVE,
                                C.TRACK_STATE_CONFIRMED,
                                C.TRACK_STATE_LOST]).all()
        assert (hits >= 1).all() and (hits <= frame).all()
        assert (ages >= 0).all()
        assert (last <= frame).all()
        # lifecycle bounds (post-step, matched tracks have age 0)
        tent = states == C.TRACK_STATE_TENTATIVE
        assert (ages[tent] <= C.TENTATIVE_MAX_AGE).all()
        lost = states == C.TRACK_STATE_LOST
        assert (ages[lost] <= cfg.max_age + cfg.lost_window).all()
        # det->slot links point at active tracks only
        linked = slot[slot >= 0]
        assert np.asarray(state.active)[linked].all()
        # a track slot is linked by at most one detection
        assert len(np.unique(linked)) == len(linked)
        # counters monotonic
        assert int(state.next_id) >= 1
        assert int(state.frame) == frame


def test_int8_engine_through_pipeline():
    from posebyte_tpu.models import build_model
    from posebyte_tpu.models.quant import calibrate_and_quantize
    from posebyte_tpu.pipeline import PosePipeline

    _, init_fn = build_model("yolov8n-pose")
    params = init_fn(__import__("jax").random.PRNGKey(0))
    q = calibrate_and_quantize(params, "yolov8n-pose", input_size=192,
                               synthetic_fallback=True, n_synthetic=2)
    cfg = PipelineConfig(
        detector=DetectorConfig(input_size=192, max_candidates=32,
                                max_detections=8),
        tracker=TrackerConfig(max_tracks=16, max_detections=8),
        model_name="yolov8n-pose",
        precision="int8",
    )
    pipe = PosePipeline(cfg, params=q)
    frame = np.random.default_rng(0).integers(0, 255, (240, 320, 3),
                                              dtype=np.uint8)
    out = pipe.process_frame(frame, block=True)
    assert out["emit"].shape == (8,)
    assert bool(jnp.isfinite(out["poses"]).all())


def test_tracker_invariants_random_stream_with_reid():
    """Same invariants with the appearance term active (random unit
    embeddings): the Re-ID blend must never break 1-1 assignment,
    lifecycle bounds, or id uniqueness, and track embeddings stay
    finite and (for matched tracks) unit-norm."""
    cfg = TrackerConfig(max_tracks=12, max_detections=6,
                        reid_weight=0.35)
    rng = np.random.default_rng(77)
    state = TrackerState.init(cfg.max_tracks, cfg.max_detections)
    E = state.embeddings.shape[1]
    for frame in range(1, 21):
        det = _random_detections(rng, cfg.max_detections)
        emb = rng.normal(size=(cfg.max_detections, E)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        state, aux = tracker_step(state, det, cfg,
                                  det_embeddings=jnp.asarray(emb))
        active = np.asarray(state.active)
        ids = np.asarray(state.ids)[active]
        slot = np.asarray(state.det_track_slot)

        assert len(np.unique(ids)) == len(ids)
        assert (ids >= 1).all()
        linked = slot[slot >= 0]
        assert np.asarray(state.active)[linked].all()
        assert len(np.unique(linked)) == len(linked)
        te = np.asarray(state.embeddings)
        assert np.isfinite(te).all()
        norms = np.linalg.norm(te[active], axis=1)
        # every active track was seeded from a unit detection embedding
        assert ((norms < 1e-6) | (np.abs(norms - 1.0) < 1e-3)).all()
        assert int(state.frame) == frame
