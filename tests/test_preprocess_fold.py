"""Raw-ingest preprocessing fold (DetectorConfig.raw_preproc).

Contract under test: letterbox(raw=True) + fold_stem_preprocess(params)
computes the SAME model outputs as the normalized letterbox + original
params — the BGR->RGB flip and /255 normalization move out of the
per-frame graph and into the stem conv weights (exact by linearity of
the convolution; reference pays neither in its fused CUDA kernel,
preprocess.cu:50-77).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posebyte_tpu.core import constants as C
from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                      TrackerConfig)
from posebyte_tpu.models.weights import fold_stem_preprocess
from posebyte_tpu.models.yolo_pose import build_model_heads, init_params
from posebyte_tpu.ops.preprocess import letterbox_flat_nhwc

# Exact integer-decimation geometry (selection path) at a small target
# so the conv model is cheap on CPU: 128x72 -> 64 is scale 0.5.
W, H, S = 128, 72, 64


def _frame(rng):
    return rng.integers(0, 256, (H * W * 3,), np.uint8)


# ---------------------------------------------------------------------------
# letterbox raw mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("selection", [True, False])
def test_raw_letterbox_matches_normalized(selection):
    rng = np.random.default_rng(0)
    f = jnp.asarray(_frame(rng))
    norm = np.asarray(letterbox_flat_nhwc(f, W, H, S,
                                          selection=selection))
    raw = np.asarray(letterbox_flat_nhwc(f, W, H, S, selection=selection,
                                         raw=True))
    if selection:
        assert raw.dtype == np.uint8
    # raw is BGR 0..255: flip + scale reproduces the normalized output
    recon = raw[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(recon, norm, atol=1e-6)


def test_raw_letterbox_pad_value():
    rng = np.random.default_rng(1)
    f = jnp.asarray(_frame(rng))
    raw = np.asarray(letterbox_flat_nhwc(f, W, H, S, raw=True))
    # 128x72 -> 64: content rows [14, 50), full-width; pad rows are gray
    assert (raw[:14] == C.LETTERBOX_PAD_RAW).all()
    assert (raw[50:] == C.LETTERBOX_PAD_RAW).all()


def test_general_bilinear_raw_matches():
    # non-decimation geometry -> the matmul path (raw => norm=1.0)
    w_in, h_in = 100, 70
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.integers(0, 256, (h_in * w_in * 3,), np.uint8))
    norm = np.asarray(letterbox_flat_nhwc(f, w_in, h_in, S))
    raw = np.asarray(letterbox_flat_nhwc(f, w_in, h_in, S, raw=True))
    np.testing.assert_allclose(raw[..., ::-1] / 255.0, norm, atol=2e-5)


# ---------------------------------------------------------------------------
# stem fold
# ---------------------------------------------------------------------------

def test_fold_exact_f32_model():
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    heads_fn, _ = build_model_heads("yolov8n-pose", jnp.float32)
    folded = fold_stem_preprocess(params)

    rng = np.random.default_rng(3)
    f = jnp.asarray(_frame(rng))
    img_norm = letterbox_flat_nhwc(f, W, H, S)
    img_raw = letterbox_flat_nhwc(f, W, H, S, raw=True)

    ref = heads_fn(params, img_norm[None])
    out = heads_fn(folded, img_raw[None])
    for a, b in zip(ref, out):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def test_fold_bf16_model_close():
    params = init_params(jax.random.PRNGKey(1), "yolov8n-pose")
    heads_fn, _ = build_model_heads("yolov8n-pose", jnp.bfloat16)
    folded = fold_stem_preprocess(params)

    rng = np.random.default_rng(4)
    f = jnp.asarray(_frame(rng))
    img_norm = letterbox_flat_nhwc(f, W, H, S, out_dtype=jnp.bfloat16)
    img_raw = letterbox_flat_nhwc(f, W, H, S, raw=True)   # uint8

    ref = heads_fn(params, img_norm[None])
    out = heads_fn(folded, img_raw[None])
    # bf16 weights round W/255 once; the normalized path instead rounds
    # every input pixel to bf16 — the two paths agree to bf16 precision
    for a, b in zip(ref, out):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        assert np.max(np.abs(a - b)) / scale < 0.02


def test_fold_rejects_quantized_stem():
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    params["b0"] = {"w": jnp.zeros((3, 3, 3, 16), jnp.int8),
                    "scale": jnp.ones((16,)), "b": jnp.zeros((16,))}
    with pytest.raises(ValueError):
        fold_stem_preprocess(params)


# ---------------------------------------------------------------------------
# embeddings under raw input
# ---------------------------------------------------------------------------

def _poses(rng, n=4):
    p = rng.uniform(2, S - 3, (n, 17, 3)).astype(np.float32)
    p[..., 2] = rng.uniform(0, 1, (n, 17))
    return jnp.asarray(p)


def test_pose_color_embedding_raw_matches():
    from posebyte_tpu.ops.reid import pose_color_embedding
    rng = np.random.default_rng(5)
    f = jnp.asarray(_frame(rng))
    poses = _poses(rng)
    img_norm = letterbox_flat_nhwc(f, W, H, S)
    img_raw = letterbox_flat_nhwc(f, W, H, S, raw=True)
    e0 = np.asarray(pose_color_embedding(img_norm, poses))
    e1 = np.asarray(pose_color_embedding(img_raw, poses, raw_input=True))
    np.testing.assert_allclose(e1, e0, atol=1e-5)


def test_learned_head_raw_matches():
    from posebyte_tpu.models.reid_head import (apply_reid_head,
                                               init_reid_head)
    rng = np.random.default_rng(6)
    head = init_reid_head(jax.random.PRNGKey(2))
    f = jnp.asarray(_frame(rng))
    poses = _poses(rng)
    img_norm = letterbox_flat_nhwc(f, W, H, S)
    img_raw = letterbox_flat_nhwc(f, W, H, S, raw=True)
    e0 = np.asarray(apply_reid_head(head, img_norm, poses))
    e1 = np.asarray(apply_reid_head(head, img_raw, poses,
                                    raw_input=True))
    np.testing.assert_allclose(e1, e0, atol=1e-5)


# ---------------------------------------------------------------------------
# pipeline-level
# ---------------------------------------------------------------------------

def _pipe_cfg(raw, reid=0.0):
    return PipelineConfig(
        detector=DetectorConfig(input_size=S, conf_threshold=0.1,
                                raw_preproc=raw),
        tracker=TrackerConfig(reid_weight=reid),
        model_name="yolov8n-pose", precision="fp32")


@pytest.mark.parametrize("reid", [0.0, 0.3])
def test_pipeline_raw_agrees(reid):
    """Same frames, same seed: raw_preproc on/off produce matching
    tracker outputs (f32; random weights, so detections are arbitrary
    but deterministic)."""
    from posebyte_tpu.pipeline.runner import PosePipeline
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (4, H, W, 3), np.uint8)

    outs = {}
    for raw in (False, True):
        pipe = PosePipeline(_pipe_cfg(raw, reid), seed=0,
                            dtype=jnp.float32)
        got = []
        for t in range(frames.shape[0]):
            out = pipe.process_frame(frames[t], block=True)
            got.append(jax.device_get(
                {k: out[k] for k in ("ids", "scores", "poses", "emit")}))
        outs[raw] = got

    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a["emit"], b["emit"])
        np.testing.assert_array_equal(a["ids"], b["ids"])
        m = a["emit"].astype(bool)
        np.testing.assert_allclose(b["poses"][m], a["poses"][m],
                                   rtol=1e-3, atol=1e-3)


def test_pipeline_oracle_forces_raw_off():
    """An injected detector has no stem weights: raw_preproc must be
    forced off (normalized letterbox) instead of feeding the oracle
    raw pixels."""
    from posebyte_tpu.pipeline.runner import PosePipeline

    def fake_heads(params, imgs):
        B = imgs.shape[0]
        A = (S // 8) ** 2 + (S // 16) ** 2 + (S // 32) ** 2
        return (jnp.zeros((B, A, 64)), jnp.full((B, A, 1), -9.0),
                jnp.zeros((B, A, 51)))

    pipe = PosePipeline(_pipe_cfg(True), params={}, heads_fn=fake_heads,
                        dtype=jnp.float32)
    assert pipe.config.detector.raw_preproc is False
    pipe.process_frame(np.zeros((H, W, 3), np.uint8), block=True)


# ---------------------------------------------------------------------------
# selection-path retile lowering (r5: BENCH_INGEST_AB_r05.json)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h,s", [(128, 72, 64),      # 720p-proportioned
                                   (192, 108, 64),     # 1080p-proportioned
                                   (1280, 720, 640)])  # production geometry
@pytest.mark.parametrize("raw", [True, False])
def test_split_retile_bit_identical(w, h, s, raw, monkeypatch):
    """The split retile (row-decimate before the minor-dim-3 reshape)
    selects exactly the same bytes as the full-frame retile, in both
    raw-u8 and normalized-f32 modes, single-frame and vmapped."""
    from posebyte_tpu.ops import preprocess as P

    assert P._selection_strides(w, h, s) is not None
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.integers(0, 256, (3, h * w * 3), np.uint8))

    outs = {}
    for mode in ("full", "split"):
        monkeypatch.setenv("POSEBYTE_INGEST_RETILE", mode)
        fn = jax.jit(lambda f: P.letterbox_flat_nhwc.__wrapped__(
            f, w, h, s, raw=raw))
        outs[mode] = (np.asarray(fn(frames[0])),
                      np.asarray(jax.vmap(fn)(frames)))
    np.testing.assert_array_equal(outs["full"][0], outs["split"][0])
    np.testing.assert_array_equal(outs["full"][1], outs["split"][1])


def test_split_retile_default_on():
    """Default (no env override) takes the measured winner: split."""
    import os as _os
    from posebyte_tpu.ops.preprocess import ingest_retile_override
    assert _os.environ.get("POSEBYTE_INGEST_RETILE", "") == ""
    assert ingest_retile_override() is None  # code default is split
