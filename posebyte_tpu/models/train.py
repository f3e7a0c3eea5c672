"""Training on synthetic scenes: YOLO-pose losses in functional JAX.

The reference consumes ultralytics-pretrained checkpoints and never
trains (SURVEY.md §2; scripts/setup_model.py downloads .pt files). On a
host with no network egress the only way to put REAL weights through
the pixels → letterbox → forward → decode → NMS → track contract
(the implicit contract of yolo_pose_engine.cpp:183-411 — that a built
engine detects actual figures) is to train them: the models are pure
JAX (models/yolo_pose.py), so they are differentiable for free, and the
synthetic renderer (utils/synthetic.py) supplies unlimited exactly
labeled data.

This module implements the supervised side:

  * `assign_targets` — a simplified static task assignment: each GT box
    takes the 3×3 cell neighborhood around its center at ONE pyramid
    level chosen by box size (ultralytics' TAL is a dynamic top-k over
    IoU×cls scores; a fixed center-neighborhood is the classic
    YOLO/FCOS-style assignment and is entirely sufficient for the
    synthetic domain — same simplification models/oracle.py makes for
    encoding, taken here for training).
  * `pose_loss` — the YOLOv8-pose loss family over the raw head
    outputs: BCE on class logits (all anchors), distribution-focal loss
    on the box DFL bins + L1 on the decoded expectation, L1 on raw
    keypoint offsets + BCE on keypoint confidence (positives only).
  * `make_train_step` — one jitted optax update, scannable on device
    so a whole training segment runs as a single executable (the only
    sane shape on a relay-tunneled TPU — see docs/DEVELOPMENT.md).

Everything is static-shape: GT rides as padded [P,*] arrays with a
valid mask, so one compiled step serves the whole run.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .yolo_pose import MODEL_CONFIGS, REG_MAX, forward_heads, make_anchors

NUM_KPT = 17
NEIGHBORS = tuple((dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

# Box-size thresholds (input px) for pyramid-level selection: boxes
# smaller than LEVEL_EDGES[0] supervise stride 8, then 16, else 32.
LEVEL_EDGES = (96.0, 192.0)


def _level_tables(input_size: int):
    ns = [input_size // s for s in (8, 16, 32)]
    offsets = [0, ns[0] ** 2, ns[0] ** 2 + ns[1] ** 2]
    return (jnp.asarray([8.0, 16.0, 32.0], jnp.float32),
            jnp.asarray(ns, jnp.int32),
            jnp.asarray(offsets, jnp.int32))


def assign_targets(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                   input_size: int):
    """GT boxes [P,4] xyxy (input coords) + valid [P] ->
    (idx [P,9] int32 flat anchor ids, mask [P,9] bool).

    Positives are the 3×3 cells around the box-center cell at the
    size-selected level, restricted to cells whose center lies inside
    the box and inside the grid."""
    strides, ns, offs = _level_tables(input_size)
    m = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0],
                    gt_boxes[:, 3] - gt_boxes[:, 1])          # [P]
    lvl = ((m >= LEVEL_EDGES[0]).astype(jnp.int32)
           + (m >= LEVEL_EDGES[1]).astype(jnp.int32))         # [P]
    s = strides[lvl]                                          # [P]
    n = ns[lvl]
    off = offs[lvl]
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    icx = jnp.floor(cx / s).astype(jnp.int32)                 # center cell
    icy = jnp.floor(cy / s).astype(jnp.int32)

    dxs = jnp.asarray([d[0] for d in NEIGHBORS], jnp.int32)   # [9]
    dys = jnp.asarray([d[1] for d in NEIGHBORS], jnp.int32)
    ix = icx[:, None] + dxs[None, :]                          # [P,9]
    iy = icy[:, None] + dys[None, :]
    inb = (ix >= 0) & (ix < n[:, None]) & (iy >= 0) & (iy < n[:, None])
    axc = (ix.astype(jnp.float32) + 0.5) * s[:, None]         # cell centers
    ayc = (iy.astype(jnp.float32) + 0.5) * s[:, None]
    in_box = ((axc >= gt_boxes[:, 0:1]) & (axc <= gt_boxes[:, 2:3])
              & (ayc >= gt_boxes[:, 1:2]) & (ayc <= gt_boxes[:, 3:4]))
    mask = inb & in_box & gt_valid[:, None]
    idx = off[:, None] + jnp.clip(iy, 0, n[:, None] - 1) * n[:, None] \
        + jnp.clip(ix, 0, n[:, None] - 1)
    return idx, mask


def _dfl_ce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss: CE of the two integer bins bracketing
    the fractional target distance (Generalized Focal Loss, as in
    ultralytics' DFLoss). logits [..., REG_MAX], target [...] in
    [0, REG_MAX-1]. Returns [...]."""
    t = jnp.clip(target, 0.0, REG_MAX - 1.001)
    lo = jnp.floor(t).astype(jnp.int32)
    hi = lo + 1
    wl = hi.astype(jnp.float32) - t
    wh = t - lo.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    take = lambda i: jnp.take_along_axis(logp, i[..., None],
                                         axis=-1)[..., 0]
    return -(wl * take(lo) + wh * take(jnp.clip(hi, 0, REG_MAX - 1)))


def pose_loss(box_l: jnp.ndarray, cls_l: jnp.ndarray, kpt_r: jnp.ndarray,
              gt_poses: jnp.ndarray, gt_boxes: jnp.ndarray,
              gt_valid: jnp.ndarray, input_size: int,
              w_cls: float = 1.0, w_dfl: float = 0.5, w_box: float = 0.05,
              w_kpt: float = 2.0, w_kobj: float = 0.5):
    """One image's loss over raw head outputs.

    box_l [A, 4*REG_MAX], cls_l [A, 1], kpt_r [A, 51];
    gt_poses [P,17,3] (input coords, conf>0 = labeled),
    gt_boxes [P,4] xyxy, gt_valid [P]. Returns (total, dict)."""
    anchors_np, strides_np = make_anchors(input_size)
    anchors = jnp.asarray(anchors_np)            # [A,2] grid units
    strides = jnp.asarray(strides_np)            # [A]
    A = anchors.shape[0]
    P = gt_boxes.shape[0]

    idx, mask = assign_targets(gt_boxes, gt_valid, input_size)   # [P,9]
    num_pos = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

    # -- classification: BCE over every anchor ------------------------------
    scatter = jnp.where(mask, idx, A)
    tcls = jnp.zeros((A,), jnp.float32).at[scatter.reshape(-1)] \
        .max(1.0, mode="drop")
    cls_bce = optax_sigmoid_bce(cls_l[:, 0].astype(jnp.float32), tcls)
    cls_loss = jnp.sum(cls_bce) / num_pos

    # -- per-candidate gathers ---------------------------------------------
    flat = jnp.clip(idx, 0, A - 1).reshape(-1)                # [P*9]
    a_sel = anchors[flat].reshape(P, 9, 2)                    # grid units
    s_sel = strides[flat].reshape(P, 9)
    pb = box_l[flat].reshape(P, 9, 4, REG_MAX).astype(jnp.float32)
    pk = kpt_r[flat].reshape(P, 9, NUM_KPT, 3).astype(jnp.float32)
    fmask = mask.astype(jnp.float32)

    # -- box: DFL + L1 on the decoded expectation --------------------------
    # target distances in stride units from each candidate cell center
    x1 = gt_boxes[:, None, 0] / s_sel
    y1 = gt_boxes[:, None, 1] / s_sel
    x2 = gt_boxes[:, None, 2] / s_sel
    y2 = gt_boxes[:, None, 3] / s_sel
    td = jnp.stack([a_sel[..., 0] - x1, a_sel[..., 1] - y1,
                    x2 - a_sel[..., 0], y2 - a_sel[..., 1]], axis=-1)
    td = jnp.clip(td, 0.0, REG_MAX - 1.001)                   # [P,9,4]
    dfl = jnp.sum(_dfl_ce(pb, td), axis=-1)                   # [P,9]
    dfl_loss = jnp.sum(dfl * fmask) / num_pos
    exp_d = jnp.einsum("pqfr,r->pqf", jax.nn.softmax(pb, axis=-1),
                       jnp.arange(REG_MAX, dtype=jnp.float32))
    box_l1 = jnp.sum(jnp.abs(exp_d - td), axis=-1)            # [P,9]
    box_loss = jnp.sum(box_l1 * fmask) / num_pos

    # -- keypoints: L1 on raw offsets + BCE on kpt confidence --------------
    # decode is kxy = (raw*2 + (anchor-0.5)) * stride  (yolo_pose.py), so
    # raw target = (kxy/stride - anchor + 0.5) / 2
    t_raw = (gt_poses[:, None, :, :2] / s_sel[..., None, None]
             - (a_sel[:, :, None, :] - 0.5)) / 2.0            # [P,9,17,2]
    kvis = (gt_poses[:, :, 2] > 0.0).astype(jnp.float32)      # [P,17]
    kv = kvis[:, None, :] * fmask[..., None]                  # [P,9,17]
    kpt_l1 = jnp.sum(jnp.abs(pk[..., :2] - t_raw), axis=-1)   # [P,9,17]
    kpt_loss = jnp.sum(kpt_l1 * kv) / jnp.maximum(jnp.sum(kv), 1.0)
    kobj = optax_sigmoid_bce(pk[..., 2], kvis[:, None, :])
    kobj_loss = jnp.sum(kobj * fmask[..., None]) \
        / jnp.maximum(jnp.sum(fmask) * NUM_KPT, 1.0)

    total = (w_cls * cls_loss + w_dfl * dfl_loss + w_box * box_loss
             + w_kpt * kpt_loss + w_kobj * kobj_loss)
    return total, {"cls": cls_loss, "dfl": dfl_loss, "box": box_loss,
                   "kpt": kpt_loss, "kobj": kobj_loss}


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid BCE (optax.sigmoid_binary_cross_entropy
    inlined to keep this module import-light)."""
    return jnp.maximum(logits, 0.0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def batch_loss(params, batch, model_name: str, input_size: int):
    """Mean pose_loss over a batch dict: img [B,S,S,3] uint8 (RGB,
    already letterboxed), poses [B,P,17,3], boxes [B,P,4], valid [B,P]."""
    family = MODEL_CONFIGS[model_name].family
    imgs = batch["img"].astype(jnp.float32) / 255.0
    box, cls, kpt = forward_heads(params, imgs, family)

    def one(b, c, k, gp, gb, gv):
        return pose_loss(b, c, k, gp, gb, gv, input_size)

    totals, parts = jax.vmap(one)(box, cls, kpt, batch["poses"],
                                  batch["boxes"], batch["valid"])
    return jnp.mean(totals), {k: jnp.mean(v) for k, v in parts.items()}


def make_train_step(model_name: str, input_size: int, optimizer):
    """Returns step(params, opt_state, batch) -> (params, opt_state,
    loss, parts) — pure, jittable, scannable."""

    def step(params, opt_state, batch):
        (loss, parts), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, batch, model_name,
                                      input_size)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, parts

    return step


def make_scan_train(model_name: str, input_size: int, optimizer,
                    batch_size: int):
    """Returns run(params, opt_state, data, keys) that executes
    len(keys) optimization steps as ONE lax.scan over device-resident
    data (the relay-tunnel-friendly shape: a single dispatch per
    segment, no per-step host round trips).

    data: dict of [N,...] device arrays; each step draws a random
    batch of `batch_size` indices from its PRNG key."""
    step = make_train_step(model_name, input_size, optimizer)

    def run(params, opt_state, data, keys):
        N = jax.tree.leaves(data)[0].shape[0]

        def body(carry, key):
            params, opt_state = carry
            sel = jax.random.randint(key, (batch_size,), 0, N)
            batch = {k: v[sel] for k, v in data.items()}
            params, opt_state, loss, parts = step(params, opt_state,
                                                  batch)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state, losses

    return run
