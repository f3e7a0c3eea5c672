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


def _edge_stress_poses(rng, n, size):
    """Poses stressing every sampling edge case: interior, straddling
    all four image edges, far outside the image (clamping), and
    coordinates epsilon-close to integers (f32 rounding of
    coord + integer patch offset)."""
    poses = np.ones((n, 17, 3), np.float32)
    poses[:, :, :2] = rng.uniform(-30, size + 30, (n, 17, 2))
    poses[0, :, :2] = rng.uniform(10, size - 10, (17, 2))    # interior
    poses[1, :, 0] = rng.uniform(-6, 6, 17)                  # left edge
    poses[2, :, 1] = size - rng.uniform(-6, 6, 17)           # bottom
    near = rng.integers(1, size - 1, (17, 2)).astype(np.float32)
    poses[3, :, :2] = near - np.float32(1e-6)                # eps-near
    poses[4, :, :2] = near                                   # exact ints
    return poses


def test_sample_impl_block_matches_direct():
    """sample_impl='block' (one contiguous-block gather per keypoint +
    one-hot corner selection — the TPU lowering) must match the direct
    advanced-indexing formulation to f32 rounding, on u8 AND f32
    images, raw and normalized, including edge-clamped and
    near-integer coordinates."""
    from posebyte_tpu.models.reid_head import _sample_patches

    rng = np.random.default_rng(7)
    S = 96
    img_u8 = jnp.asarray(rng.integers(0, 255, (S, S, 3), dtype=np.uint8))
    img_f32 = img_u8.astype(jnp.float32) / 255.0
    poses = jnp.asarray(_edge_stress_poses(rng, 8, S))
    for img, raw in ((img_f32, False), (img_u8, True)):
        d = np.asarray(_sample_patches(img, poses, raw_input=raw,
                                       sample_impl="direct"))
        b = np.asarray(_sample_patches(img, poses, raw_input=raw,
                                       sample_impl="block"))
        np.testing.assert_allclose(b, d, rtol=0, atol=2e-4)

    params = init_reid_head(jax.random.PRNGKey(2))
    ed = np.asarray(apply_reid_head(params, img_u8, poses, raw_input=True,
                                    sample_impl="direct"))
    eb = np.asarray(apply_reid_head(params, img_u8, poses, raw_input=True,
                                    sample_impl="block"))
    np.testing.assert_allclose(eb, ed, rtol=0, atol=1e-4)


def test_pose_color_block_bit_exact():
    """The free descriptor's block lowering is BIT-exact vs direct:
    identical corner values, identical bilinear expression."""
    from posebyte_tpu.ops.reid import pose_color_embedding

    rng = np.random.default_rng(11)
    S = 80
    img_u8 = jnp.asarray(rng.integers(0, 255, (S, S, 3), dtype=np.uint8))
    img_f32 = img_u8.astype(jnp.float32) / 255.0
    poses = jnp.asarray(_edge_stress_poses(rng, 8, S))
    for img, raw in ((img_f32, False), (img_u8, True)):
        d = np.asarray(pose_color_embedding(img, poses, raw_input=raw,
                                            sample_impl="direct"))
        b = np.asarray(pose_color_embedding(img, poses, raw_input=raw,
                                            sample_impl="block"))
        np.testing.assert_array_equal(b, d)


def test_block_tap_indices_in_bounds():
    """Audit of the BLOCK=12 bound: every per-tap corner index lands
    inside [start, start+BLOCK-1] for adversarial coordinates."""
    from posebyte_tpu.models.reid_head import BLOCK, PATCH, SPACING

    S = 64
    reach = int((PATCH - 1) / 2 * SPACING)
    off = (np.arange(PATCH, dtype=np.float32) - (PATCH - 1) / 2.0) \
        * SPACING
    grid = np.stack(np.meshgrid(off, off), -1).reshape(-1, 2)
    rng = np.random.default_rng(3)
    coords = np.concatenate([
        rng.uniform(-50, S + 50, 4000).astype(np.float32),
        np.arange(0, S, 0.25, dtype=np.float32),
        (np.arange(S) - 1e-6).astype(np.float32),
        (np.arange(S) + 1e-6).astype(np.float32),
    ])
    base = np.floor(np.clip(coords, 0.0, S - 1.001)).astype(np.int64)
    start = np.clip(base - reach, 0, S - BLOCK)
    for o in np.unique(grid[:, 0]):
        t = np.clip(coords + np.float32(o), 0.0,
                    np.float32(S - 1.001)).astype(np.float32)
        t0 = np.floor(t).astype(np.int64)
        rel = t0 - start
        assert rel.min() >= 0 and (rel + 1).max() <= BLOCK - 1, o


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
