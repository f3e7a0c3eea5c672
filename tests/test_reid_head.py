"""Learned Re-ID head (models/reid_head.py): output contract, identity
learning on the synthetic renderer, and pipeline integration.

Beyond the reference's surface (gpu_tracker.cu associates purely on
geometry); the head plugs into the same appearance seam as the
training-free descriptor (ops/reid.py)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from posebyte_tpu.models.reid_head import (REID_DIM, apply_reid_head,
                                           init_reid_head,
                                           load_reid_head,
                                           save_reid_head)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


def test_head_output_contract():
    """[N,51] L2-normalized, keypoint-blocked, invisible keypoints emit
    zero blocks (the co-visibility convention of ops/reid.py)."""
    params = init_reid_head(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    poses = np.ones((3, 17, 3), np.float32)
    poses[:, :, :2] = rng.uniform(5, 59, (3, 17, 2))
    poses[1, 4:9, 2] = 0.0                      # occlude keypoints 4-8
    emb = np.asarray(apply_reid_head(params, img, jnp.asarray(poses)))
    assert emb.shape == (3, REID_DIM)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               atol=1e-5)
    blocks = emb.reshape(3, 17, 3)
    assert np.all(blocks[1, 4:9] == 0.0)        # occluded -> zero block
    assert np.all(np.abs(blocks[0]).sum(axis=-1) > 0)


def test_head_learns_identity_separation():
    """A short in-test training run on identity-colored synthetic pairs
    must separate identities: top-1 retrieval across a time gap and a
    clear same-vs-different cosine margin on held-out scenes."""
    import optax
    from train_reid import eval_separation, info_nce_loss, make_pairs

    train = make_pairs(40, 192, seed0=11)
    val = make_pairs(12, 192, seed0=77_000)
    params = init_reid_head(jax.random.PRNGKey(0))
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    data = {k: jnp.asarray(v) for k, v in train.items()}

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.choice(key, 40, (10,), replace=False)
        batch = {k: v[idx] for k, v in data.items()}
        loss, grads = jax.value_and_grad(info_nce_loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    first = None
    for _ in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.6, (first, float(loss))
    m = eval_separation(params, val)
    assert m["top1_acc"] >= 0.8, m
    assert m["same_id_cos"] > m["diff_id_cos"] + 0.3, m


def test_checkpoint_roundtrip(tmp_path):
    params = init_reid_head(jax.random.PRNGKey(3))
    path = str(tmp_path / "head.safetensors")
    save_reid_head(jax.device_get(params), path)
    loaded = load_reid_head(path)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(loaded[k]))


def test_pipeline_with_learned_head():
    """PosePipeline with reid_params: per-frame and chunk (scan) paths
    run end to end and maintain finite embedding state."""
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(input_size=192, num_anchors=756,
                                max_candidates=32, max_detections=8),
        tracker=TrackerConfig(max_tracks=16, max_detections=8,
                              reid_weight=0.3),
        model_name="yolov8n-pose", precision="fp32")
    head = init_reid_head(jax.random.PRNGKey(0))
    pipe = PosePipeline(cfg, reid_params=head)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 240, 320, 3), dtype=np.uint8)
    for f in frames:
        out = pipe.process_frame(f)
    assert out["emit"].shape == (8,)
    outs = pipe.process_chunk(frames)
    assert outs["emit"].shape == (3, 8)
    assert bool(jnp.isfinite(pipe.state.embeddings).all())
