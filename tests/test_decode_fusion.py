"""Tail-fused decode (decode_topk_levels) equivalence.

DetectorConfig.decode_fusion == "tail" runs candidate selection per
pyramid level on the conv-native layout and merges exactly
(ops/decode.py::decode_topk_levels). The contract is BIT-IDENTICAL
Detections to the post-concat decode_topk for topk_impl in
{sort, bisect} and both gather_impls — these tests pin it at the op
level (including adversarial ties and the nothing-passes fill path)
and at the pipeline level (full chunk step, tail vs post).

Reference parity anchor: both paths implement the same candidate
contract as gpu_postprocess.cu:30-81 + :178-203.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from posebyte_tpu.ops.decode import decode_topk, decode_topk_levels

S = 64           # pyramid 8x8 / 4x4 / 2x2 -> A = 84
LEVEL_AS = [(S // 8) ** 2, (S // 16) ** 2, (S // 32) ** 2]


def _random_levels(rng, mode="normal"):
    levels = []
    for A in LEVEL_AS:
        b = rng.normal(0, 1, (A, 64)).astype(np.float32)
        c = rng.normal(0, 2, (A, 1)).astype(np.float32)
        k = rng.normal(0, 1, (A, 51)).astype(np.float32)
        if mode == "ties":        # every anchor ties at one logit
            c[:] = np.float32(0.3)
        elif mode == "sparse":    # only a handful pass the threshold
            c[:] = -10.0
            c[rng.integers(0, A, 3), 0] = 2.0
        elif mode == "none":      # nothing passes -> all-filler top-K
            c[:] = -10.0
        levels.append((jnp.asarray(b), jnp.asarray(c), jnp.asarray(k)))
    return tuple(levels)


@pytest.mark.parametrize("mode", ["normal", "ties", "sparse", "none"])
@pytest.mark.parametrize("gather_impl", ["index", "onehot"])
@pytest.mark.parametrize("topk_impl", ["sort", "bisect"])
def test_levels_bit_identical_to_concat(mode, gather_impl, topk_impl):
    # zlib.crc32, not hash(): Python string hashing is salted per
    # process, which would make any bit-identity failure irreproducible.
    import zlib
    seed = zlib.crc32(f"{mode}/{gather_impl}/{topk_impl}".encode())
    rng = np.random.default_rng(seed)
    levels = _random_levels(rng, mode)
    box = jnp.concatenate([l[0] for l in levels])
    cls = jnp.concatenate([l[1] for l in levels])
    kpt = jnp.concatenate([l[2] for l in levels])

    d0 = decode_topk(box, cls, kpt, 0.25, 32, S,
                     topk_impl=topk_impl, gather_impl=gather_impl)
    d1 = decode_topk_levels(levels, 0.25, 32, S,
                            topk_impl=topk_impl, gather_impl=gather_impl)
    for f in ("poses", "boxes", "scores", "valid"):
        a, b = np.asarray(getattr(d0, f)), np.asarray(getattr(d1, f))
        assert np.array_equal(a, b), (f, mode, gather_impl, topk_impl)


def test_levels_bf16_heads_bit_identical():
    """bf16 head maps (the production dtype): the payload widening
    happens before vs after the gather on the two paths — must still
    be bit-identical (incl. the onehot subnormal-flush caveat, which
    applies to both)."""
    rng = np.random.default_rng(11)
    levels = tuple(
        (jnp.asarray(b).astype(jnp.bfloat16),
         jnp.asarray(c).astype(jnp.bfloat16),
         jnp.asarray(k).astype(jnp.bfloat16))
        for b, c, k in _random_levels(rng))
    box = jnp.concatenate([l[0] for l in levels])
    cls = jnp.concatenate([l[1] for l in levels])
    kpt = jnp.concatenate([l[2] for l in levels])
    for gi in ("index", "onehot"):
        d0 = decode_topk(box, cls, kpt, 0.25, 32, S, gather_impl=gi)
        d1 = decode_topk_levels(levels, 0.25, 32, S, gather_impl=gi)
        for f in ("poses", "boxes", "scores", "valid"):
            assert np.array_equal(np.asarray(getattr(d0, f)),
                                  np.asarray(getattr(d1, f))), (f, gi)


def test_pipeline_chunk_tail_matches_post():
    """Full chunk step with decode_fusion='tail' vs 'post' on the real
    yolov8n graph (random weights): identical outputs."""
    import dataclasses
    import jax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    K, H, W = 3, 96, 128
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (K, H * W * 3), dtype=np.uint8)

    outs = {}
    for fusion in ("post", "tail"):
        cfg = PipelineConfig(
            detector=DetectorConfig(input_size=64, num_anchors=84,
                                    conf_threshold=0.01,
                                    max_detections=8,
                                    decode_fusion=fusion),
            tracker=TrackerConfig(max_tracks=8, max_detections=8),
        )
        pipe = PosePipeline(cfg, seed=3)
        body = pipe.chunk_body(K, H, W)
        _, outs[fusion] = jax.jit(body)(pipe.params, pipe.state,
                                        jnp.asarray(frames))
    for key in ("ids", "scores", "poses", "boxes", "emit", "num_active"):
        assert np.array_equal(np.asarray(outs["post"][key]),
                              np.asarray(outs["tail"][key])), key


def test_pipeline_frame_tail_matches_post():
    """Single-frame fused step, tail vs post."""
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    H, W = 96, 128
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    outs = {}
    for fusion in ("post", "tail"):
        cfg = PipelineConfig(
            detector=DetectorConfig(input_size=64, num_anchors=84,
                                    conf_threshold=0.01,
                                    max_detections=8,
                                    decode_fusion=fusion),
            tracker=TrackerConfig(max_tracks=8, max_detections=8),
        )
        pipe = PosePipeline(cfg, seed=3)
        outs[fusion] = pipe.process_frame(frame, block=True)
    for key in ("ids", "scores", "poses", "boxes", "emit", "num_active"):
        assert np.array_equal(np.asarray(outs["post"][key]),
                              np.asarray(outs["tail"][key])), key
