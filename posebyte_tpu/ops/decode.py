"""YOLO-pose raw-output decoding.

TPU-native reformulation of the reference's decode kernel
(reference: src/cuda/gpu_postprocess.cu:30-81 kernelDecodeAndFilter):
the raw head output is a [56, A] tensor (rows 0-3 bbox cxcywh, row 4
confidence, rows 5-55 the 17*3 keypoints). The CUDA kernel filters by
confidence with atomic slot grabbing (arbitrary candidate order); here
the same filter is a masked `top_k` over the confidence row — a single
fused sort-free reduction on TPU — which yields a deterministic,
score-descending candidate set (a strict improvement with identical
aggregate behavior; the reference sorts by score immediately after
anyway, gpu_postprocess.cu:178-203).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.structs import Detections


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def decode_yolo_output(raw: jnp.ndarray, conf_threshold: float,
                       max_candidates: int = 256) -> Detections:
    """Decode [56, A] raw output into a padded candidate Detections set.

    Candidates are the top-`max_candidates` anchors by confidence among
    those >= conf_threshold; bbox cxcywh -> xyxy; keypoints unpacked to
    [K, 17, 3] (reference: kernelDecodeAndFilter, gpu_postprocess.cu:49-80).
    """
    num_anchors = raw.shape[-1]
    conf = raw[4]                                        # [A]
    passing = conf >= conf_threshold
    ranked = jnp.where(passing, conf, -1.0)
    k = min(max_candidates, num_anchors)
    top_conf, top_idx = jax.lax.top_k(ranked, k)          # [K]
    valid = top_conf > 0.0

    sel = raw[:, top_idx]                                 # [56, K]
    cx, cy, w, h = sel[0], sel[1], sel[2], sel[3]
    boxes = jnp.stack([cx - w * 0.5, cy - h * 0.5,
                       cx + w * 0.5, cy + h * 0.5], axis=-1)  # [K,4]
    kpts = sel[5:5 + C.NUM_KEYPOINTS * 3]                 # [51, K]
    poses = jnp.transpose(kpts, (1, 0)).reshape(k, C.NUM_KEYPOINTS, 3)

    z = valid[:, None]
    return Detections(
        poses=jnp.where(z[..., None], poses, 0.0),
        boxes=jnp.where(z, boxes, 0.0),
        scores=jnp.where(valid, sel[4], 0.0),
        valid=valid,
    )


def decode_yolo_output_batch(raw: jnp.ndarray, conf_threshold: float,
                             max_candidates: int = 256) -> Detections:
    """Batched decode: [B, 56, A] -> Detections with leading batch axis
    (reference batch path: detectBatch, yolo_pose_engine.cpp:648-703)."""
    return jax.vmap(
        lambda r: decode_yolo_output(r, conf_threshold, max_candidates)
    )(raw)


@functools.partial(jax.jit, static_argnames=("max_candidates",
                                             "input_size", "topk_impl",
                                             "gather_impl"))
def decode_topk(box_logits: jnp.ndarray, cls_logits: jnp.ndarray,
                kpt_raw: jnp.ndarray, conf_threshold: float,
                max_candidates: int, input_size: int,
                topk_impl: str = "sort",
                gather_impl: str = "index") -> Detections:
    """Sparse decode: select top-K anchors on confidence FIRST, then run
    the DFL softmax and keypoint decode only for those K.

    Numerically identical to decode_yolo_output(forward_raw(...)) — the
    confidence ranking uses the same sigmoid values, and per-anchor
    decode math is unchanged — but does 8400/K times less decode-tail
    work (the dense tail measured ~24% of the whole model pass at
    batch 128). Single-image: box [A,64], cls [A,1], kpt [A,51].

    `topk_impl` selects the candidate-ranking lowering (ops/topk.py):
    "sort" (lax.top_k) and "bisect" (radix-select) are bit-identical;
    "approx" (lax.approx_max_k) is opt-in and approximate.

    `gather_impl` selects the candidate-row extraction: "index" uses
    XLA gathers; "onehot" replaces them with one-hot selection matmuls
    on the MXU (the megakernel's scatter-free idiom). Final Detections
    are bit-identical between the two for normal-range head outputs:
    one-hot entries are exactly 0/1 under Precision.HIGHEST, and where
    the MXU flushes a subnormal payload entry the downstream consumers
    round it to the same result (exp(x)==1.0 and sigmoid(x)==0.5 in
    f32 for |x| < 2^-126; sub-threshold conf slots are zeroed by the
    `valid` mask). Sole exception: a subnormal keypoint-xy logit on a
    candidate whose anchor sits at grid offset exactly 0.5 (the corner
    cell) shifts that keypoint by < 2e-38 px — physically impossible
    output of a trained conv, noted for the fidelity contract
    (tests/test_topk.py).
    """
    from ..models.yolo_pose import REG_MAX, make_anchors
    from .topk import topk_confidence

    A = box_logits.shape[0]
    conf = jax.nn.sigmoid(cls_logits[:, 0].astype(jnp.float32))   # [A]
    passing = conf >= conf_threshold
    ranked = jnp.where(passing, conf, -1.0)
    k = min(max_candidates, A)
    top_conf, top_idx = topk_confidence(ranked, k, topk_impl)
    valid = top_conf > 0.0

    anchors_np, strides_np = make_anchors(input_size)
    if gather_impl == "onehot":
        from .topk import onehot_select
        onehot = top_idx[:, None] == jnp.arange(A, dtype=jnp.int32)

        def og(payload):                                  # [A,C]->[K,C]
            return onehot_select(onehot, payload)

        asc = og(jnp.concatenate(
            [jnp.asarray(anchors_np, jnp.float32),
             jnp.asarray(strides_np, jnp.float32)[:, None],
             conf[:, None]], axis=1))                     # [K, 4]
        anchors, strides, conf_sel = asc[:, :2], asc[:, 2], asc[:, 3]
        bl = og(box_logits)                               # [K, 64] f32
        kpt_sel = og(kpt_raw)                             # [K, 51] f32
    elif gather_impl == "index":
        anchors = jnp.asarray(anchors_np)[top_idx]        # [K, 2]
        strides = jnp.asarray(strides_np)[top_idx]        # [K]
        conf_sel = conf[top_idx]
        bl = box_logits[top_idx].astype(jnp.float32)      # [K, 64]
        kpt_sel = kpt_raw[top_idx].astype(jnp.float32)    # [K, 51]
    else:
        raise ValueError(f"unknown gather_impl {gather_impl!r} "
                         "(expected index|onehot)")

    prob = jax.nn.softmax(bl.reshape(k, 4, REG_MAX), axis=-1)
    d = jnp.einsum("kfr,r->kf", prob,
                   jnp.arange(REG_MAX, dtype=jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    lt, rb = d[:, :2], d[:, 2:]
    x1y1 = (anchors - lt) * strides[:, None]
    x2y2 = (anchors + rb) * strides[:, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)        # [K,4] xyxy

    k3 = kpt_sel.reshape(k, C.NUM_KEYPOINTS, 3)
    kxy = (k3[..., :2] * 2.0 + (anchors[:, None, :] - 0.5)) \
        * strides[:, None, None]
    kconf = jax.nn.sigmoid(k3[..., 2:3])
    poses = jnp.concatenate([kxy, kconf], axis=-1)        # [K,17,3]

    z = valid[:, None]
    scores = jnp.where(valid, conf_sel, 0.0)
    return Detections(
        poses=jnp.where(z[..., None], poses, 0.0),
        boxes=jnp.where(z, boxes, 0.0),
        scores=scores,
        valid=valid,
    )
