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

    return _decode_candidate_tail(valid, conf_sel, bl, kpt_sel,
                                  anchors, strides, k)


@functools.partial(jax.jit, static_argnames=("max_candidates",
                                             "input_size", "topk_impl",
                                             "gather_impl"))
def decode_topk_levels(levels, conf_threshold, max_candidates: int,
                       input_size: int, topk_impl: str = "sort",
                       gather_impl: str = "onehot") -> Detections:
    """Tail-fused sparse decode (r4, VERDICT r3 item 4 / ROADMAP #2):
    candidate selection runs PER PYRAMID LEVEL on the conv-native
    layout, before any cross-level concatenation — the [A, 64/51] head
    tensors decode_topk selects from are never materialized.

    `levels` is the forward_head_maps output for ONE image: a tuple of
    (box_logits [A_l, 64], cls_logits [A_l, 1], kpt_raw [A_l, 51]) per
    level. Per level: confidence ranking + top-min(K, A_l) + candidate
    row extraction (one fused payload gather of
    [anchors | stride | conf | box_logits | kpt_raw]). The <= 3K
    survivors then merge with ONE small two-key sort ordered by
    (bit-total-order key desc, global anchor index asc) — exactly
    lax.top_k's order on the concatenated ranking — and the top K rows
    feed the shared decode tail.

    EXACTNESS (topk_impl "sort"/"bisect"): an anchor outside its
    level's top-K has K same-level anchors strictly ahead of it in the
    total order, hence K global anchors ahead of it — it cannot be in
    the global top-K, so the global top-K is a subset of the union of
    per-level top-Ks; the merge sort reproduces lax.top_k's exact
    (descending value, ascending index, bit-level -0.0 < +0.0) order,
    including the all-filler tail when fewer than K anchors pass the
    threshold. Output Detections are bit-identical to
    decode_topk(concat(levels)) for both gather_impls (the onehot
    subnormal-flush caveat applies identically: a bf16-subnormal
    payload entry flushes in the first selection matmul on either
    path, and a flushed zero stays zero through the merge matmul).
    Equivalence is pinned by tests/test_decode_fusion.py.
    topk_impl "approx" composes per level (a different approximation
    than global approx_max_k; still opt-in, outside the fidelity
    contract).

    Reference parity: same candidate contract as decode_topk
    (gpu_postprocess.cu:30-81 kernelDecodeAndFilter + the :178-203
    score sort); the per-level formulation is a TPU layout choice with
    identical aggregate behavior.
    """
    from ..models.yolo_pose import make_anchors_levels
    from .topk import onehot_select, topk_confidence, total_order_key

    per = make_anchors_levels(input_size)
    if len(per) != len(levels):
        raise ValueError(f"expected {len(per)} levels, got {len(levels)}")
    A_total = sum(b.shape[0] for b, _, _ in levels)
    k = min(max_candidates, A_total)

    tc_parts, gidx_parts, pay_parts = [], [], []
    offset = 0
    for (bl_l, cls_l, kpt_l), (anch_np, str_np) in zip(levels, per):
        A_l = bl_l.shape[0]
        conf = jax.nn.sigmoid(cls_l[:, 0].astype(jnp.float32))  # [A_l]
        ranked = jnp.where(conf >= conf_threshold, conf, -1.0)
        kl = min(k, A_l)
        tc, ti = topk_confidence(ranked, kl, topk_impl)
        payload = jnp.concatenate(
            [jnp.asarray(anch_np, jnp.float32),
             jnp.asarray(str_np, jnp.float32)[:, None],
             conf[:, None],
             bl_l.astype(jnp.float32),
             kpt_l.astype(jnp.float32)], axis=1)       # [A_l, 119]
        if gather_impl == "onehot":
            onehot = ti[:, None] == jnp.arange(A_l, dtype=jnp.int32)
            rows = onehot_select(onehot, payload)      # [kl, 119]
        elif gather_impl == "index":
            rows = payload[ti]
        else:
            raise ValueError(f"unknown gather_impl {gather_impl!r} "
                             "(expected index|onehot)")
        tc_parts.append(tc)
        gidx_parts.append(ti + jnp.int32(offset))
        pay_parts.append(rows)
        offset += A_l

    tc_m = jnp.concatenate(tc_parts)                   # [M], M <= 3K
    gidx_m = jnp.concatenate(gidx_parts)               # [M]
    pay_m = jnp.concatenate(pay_parts, axis=0)         # [M, 119]
    m = tc_m.shape[0]

    _, _, tc_sorted, pos_sorted = jax.lax.sort(
        (-total_order_key(tc_m), gidx_m, tc_m,
         jnp.arange(m, dtype=jnp.int32)), num_keys=2)
    top_conf, sel_pos = tc_sorted[:k], pos_sorted[:k]
    valid = top_conf > 0.0
    if gather_impl == "onehot":
        oh = sel_pos[:, None] == jnp.arange(m, dtype=jnp.int32)
        rows = onehot_select(oh, pay_m)                # [k, 119]
    else:
        rows = pay_m[sel_pos]
    anchors, strides = rows[:, :2], rows[:, 2]
    conf_sel = rows[:, 3]
    bl, kpt_sel = rows[:, 4:68], rows[:, 68:]
    return _decode_candidate_tail(valid, conf_sel, bl, kpt_sel,
                                  anchors, strides, k)


def _decode_candidate_tail(valid, conf_sel, bl, kpt_sel, anchors,
                           strides, k: int) -> Detections:
    """Shared per-candidate decode tail (DFL softmax expectation, box
    assembly, keypoint decode, validity masking) for the post-concat
    (decode_topk) and tail-fused (decode_topk_levels) selection paths —
    identical math on identical candidate rows by construction."""
    from ..models.yolo_pose import REG_MAX

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
