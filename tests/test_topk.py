"""Exactness of the sort-free decode top-k (ops/topk.py).

The bisect implementation must be bit-identical to jax.lax.top_k —
values AND indices, including stable tie-breaks — on the decode
domain (entries are exactly -1.0 or non-negative sigmoid outputs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posebyte_tpu.ops.topk import topk_confidence, topk_masked_bisect


def _ranked(rng, a, fill_frac, quantize=None):
    """Decode-domain vector: sigmoid-like positives + -1.0 fillers."""
    conf = rng.uniform(0.0, 1.0, a).astype(np.float32)
    if quantize:
        conf = np.round(conf * quantize) / quantize  # force heavy ties
    mask = rng.uniform(0, 1, a) < fill_frac
    return jnp.asarray(np.where(mask, -1.0, conf).astype(np.float32))


@pytest.mark.parametrize("a,k", [(8400, 256), (8400, 64), (1000, 256),
                                 (257, 256), (8400, 1)])
@pytest.mark.parametrize("fill_frac", [0.0, 0.5, 0.97, 1.0])
def test_bisect_matches_lax_topk(a, k, fill_frac):
    rng = np.random.default_rng(a * 1000 + k + int(fill_frac * 100))
    r = _ranked(rng, a, fill_frac)
    ev, ei = jax.lax.top_k(r, k)
    bv, bi = topk_masked_bisect(r, k)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))


@pytest.mark.parametrize("quantize", [4, 16, 2])
def test_bisect_tie_breaks(quantize):
    # Heavily quantized scores straddle the k-th-largest boundary with
    # long runs of equal values; order must still match lax.top_k's
    # stable lowest-index-first policy exactly.
    rng = np.random.default_rng(quantize)
    r = _ranked(rng, 4096, 0.3, quantize=quantize)
    ev, ei = jax.lax.top_k(r, 256)
    bv, bi = topk_masked_bisect(r, 256)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))


def test_bisect_all_fillers_and_subnormal_edge():
    # All -1.0 fillers: both return -1.0 values (invalid downstream).
    r = jnp.full((512,), -1.0, jnp.float32)
    ev, ei = jax.lax.top_k(r, 64)
    bv, bi = topk_masked_bisect(r, 64)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))
    # Zeros, subnormals, and tiny normal positives: all comparisons
    # ride the integer total-order key, so even subnormal magnitudes
    # (which float comparators may flush) order exactly as top_k's
    # bit-level comparator does.
    r = jnp.asarray([0.0, 2e-38, -1.0, 1.5e-38, 0.0, -1.0, 1e-39,
                     5e-39], jnp.float32)
    ev, ei = jax.lax.top_k(r, 4)
    bv, bi = topk_masked_bisect(r, 4)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))
    # -0.0 ties with +0.0 (not with the fillers): the key mapping must
    # unify zeros before the sign test, since bits(-0.0) is negative.
    r = jnp.asarray([0.5, -0.0, -1.0, 0.25, 0.0], jnp.float32)
    ev, ei = jax.lax.top_k(r, 4)
    bv, bi = topk_masked_bisect(r, 4)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))


def test_decode_topk_bisect_end_to_end():
    # Full decode on random head outputs: bisect == sort exactly.
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.ops.decode import decode_topk

    cfg = DetectorConfig()
    rng = np.random.default_rng(7)
    A = cfg.num_anchors
    box = jnp.asarray(rng.normal(0, 1, (A, 64)).astype(np.float32))
    cls = jnp.asarray(rng.normal(-2, 2, (A, 1)).astype(np.float32))
    kpt = jnp.asarray(rng.normal(0, 1, (A, 51)).astype(np.float32))
    a = decode_topk(box, cls, kpt, cfg.conf_threshold,
                    cfg.max_candidates, cfg.input_size, topk_impl="sort")
    b = decode_topk(box, cls, kpt, cfg.conf_threshold,
                    cfg.max_candidates, cfg.input_size,
                    topk_impl="bisect")
    for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_decode_gather_onehot_end_to_end(dtype):
    # One-hot MXU gathers == XLA index gathers, bit-identical final
    # Detections, for both head dtypes (bf16 is the production path).
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.ops.decode import decode_topk

    cfg = DetectorConfig()
    rng = np.random.default_rng(11)
    A = cfg.num_anchors
    dt = jnp.dtype(dtype)
    box = jnp.asarray(rng.normal(0, 1, (A, 64)).astype(np.float32)) \
        .astype(dt)
    cls = jnp.asarray(rng.normal(-2, 2, (A, 1)).astype(np.float32)) \
        .astype(dt)
    kptn = rng.normal(0, 1, (A, 51)).astype(np.float32)
    # Inject subnormal magnitudes. NOTE: on CPU (where this suite
    # runs) the one-hot matmul preserves subnormals, so this only
    # checks the plumbing; the MXU-flush rounding argument in
    # decode_topk's docstring is analytic, not exercised here.
    kptn[::97] = 1e-40
    kpt = jnp.asarray(kptn).astype(dt)
    a = decode_topk(box, cls, kpt, cfg.conf_threshold,
                    cfg.max_candidates, cfg.input_size,
                    gather_impl="index")
    b = decode_topk(box, cls, kpt, cfg.conf_threshold,
                    cfg.max_candidates, cfg.input_size,
                    gather_impl="onehot")
    for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_decode_variants_vmapped_chunk():
    # The production chunk path vmaps decode over frames; all exact
    # variant combinations must agree elementwise under vmap.
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.ops.decode import decode_topk

    cfg = DetectorConfig(num_anchors=1344, input_size=256)
    rng = np.random.default_rng(3)
    K, A = 4, cfg.num_anchors
    box = jnp.asarray(rng.normal(0, 1, (K, A, 64)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    cls = jnp.asarray(rng.normal(-2, 2, (K, A, 1)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    kpt = jnp.asarray(rng.normal(0, 1, (K, A, 51)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def run(ti, gi):
        return jax.vmap(lambda b, c, k: decode_topk(
            b, c, k, cfg.conf_threshold, cfg.max_candidates,
            cfg.input_size, topk_impl=ti, gather_impl=gi))(box, cls, kpt)

    ref = run("sort", "index")
    for ti in ("sort", "bisect"):
        for gi in ("index", "onehot"):
            got = run(ti, gi)
            for fa, fb in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb))


def test_decode_gather_impl_validation():
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.ops.decode import decode_topk

    cfg = DetectorConfig()
    z = jnp.zeros((cfg.num_anchors, 64))
    with pytest.raises(ValueError):
        decode_topk(z, jnp.zeros((cfg.num_anchors, 1)),
                    jnp.zeros((cfg.num_anchors, 51)), 0.25, 16,
                    cfg.input_size, gather_impl="bogus")


def test_pipeline_chunk_identical_under_decode_variants():
    # Full production chunk path (letterbox -> forward -> decode -> NMS
    # -> fused tracker) must produce identical tracking outputs with
    # the alternative decode lowerings — the pre-flip contract for
    # making bisect/onehot the default.
    import dataclasses

    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    base = PipelineConfig(
        detector=DetectorConfig(input_size=192, num_anchors=756,
                                max_candidates=32, max_detections=8),
        tracker=TrackerConfig(max_tracks=16, max_detections=8),
        model_name="yolov8n-pose", precision="fp32")
    variant = dataclasses.replace(
        base, detector=dataclasses.replace(
            base.detector, topk_impl="bisect", gather_impl="onehot"))

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 120, 160, 3), dtype=np.uint8)
    pa = PosePipeline(base, seed=3)
    pb = PosePipeline(variant, seed=3)
    oa = pa.process_chunk(frames)
    ob = pb.process_chunk(frames)
    for ka in sorted(oa.keys()):
        np.testing.assert_array_equal(np.asarray(oa[ka]),
                                      np.asarray(ob[ka]), err_msg=ka)


def test_topk_confidence_dispatch():
    r = _ranked(np.random.default_rng(0), 512, 0.5)
    for impl in ("sort", "bisect", "approx"):
        v, i = topk_confidence(r, 32, impl)
        assert v.shape == (32,) and i.shape == (32,)
    with pytest.raises(ValueError):
        topk_confidence(r, 32, "nope")
