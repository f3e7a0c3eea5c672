"""Appearance Re-ID hook: pose-aligned color descriptors + cosine
association term.

Beyond the reference's surface (it associates purely on OKS/IoU
geometry — gpu_tracker.cu has no appearance term): an optional
appearance embedding per detection, blended into the high-confidence
association tier and maintained per track by exponential moving
average. The seam accepts embeddings from ANY source (a learned
projection head, crops through a Re-ID network); the built-in
training-free source is a pose-aligned color descriptor — the
letterboxed image bilinearly sampled at each keypoint, confidence
weighted — which is weight-free, device-resident, and O(17) gathers
per detection.

Everything is fixed-shape and jit-safe; cost is a handful of [T,D]
broadcasts + one [N,17] bilinear gather pass, negligible next to the
detector.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import constants as C

# Embedding dimensionality of the built-in descriptor: 17 keypoints x 3
# channels (pose-aligned color signature).
REID_DIM = C.NUM_KEYPOINTS * 3


def make_embed_fn(reid_params=None, raw_input: bool = False):
    """(image_hwc, poses) -> [N, 51] appearance embeddings.

    The single selection point for the appearance source, shared by
    PosePipeline and every serving class (StreamServer /
    ChunkedStreamServer / MultiStream*Pipeline): the LEARNED head
    (models/reid_head.py, trained by scripts/train_reid.py) when
    `reid_params` is given, else the training-free pose-color
    descriptor. Identical [N, 51] keypoint-blocked output layout either
    way, so tracker association and the fused Pallas kernel are
    agnostic to the source.

    raw_input: the image is the raw-mode letterbox (BGR, 0..255 —
    DetectorConfig.raw_preproc). Both sources then flip+scale the
    SAMPLED values (tiny [N,17,...] tensors) so embeddings match the
    normalized-RGB path — the full image is never re-normalized.
    """
    if reid_params is not None:
        from ..models.reid_head import apply_reid_head
        return lambda img, poses: apply_reid_head(reid_params, img, poses,
                                                  raw_input=raw_input)
    if raw_input:
        return lambda img, poses: pose_color_embedding(img, poses,
                                                       raw_input=True)
    return pose_color_embedding


def pose_color_embedding(image_hwc: jnp.ndarray,
                         poses: jnp.ndarray,
                         raw_input: bool = False) -> jnp.ndarray:
    """Training-free appearance descriptor.

    image_hwc: [S, S, 3] float (letterboxed model input, 0..1), or the
    raw-mode letterbox (BGR 0..255, possibly uint8) with raw_input=True;
    poses: [N, 17, 3] (x, y in the same coords, conf). Returns
    L2-normalized [N, 51]: the image bilinearly sampled at each
    keypoint, weighted by keypoint confidence (invisible keypoints
    contribute zeros, so two poses are compared only where both are
    visible — mirroring the OKS visibility convention).
    """
    S = image_hwc.shape[0]
    xy = poses[..., :2]                                     # [N,17,2]
    conf = poses[..., 2]                                    # [N,17]

    x = jnp.clip(xy[..., 0], 0.0, S - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, S - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(yi, xi):
        return image_hwc[yi, xi]                            # [N,17,3]

    c = (at(y0, x0) * (1 - fx) * (1 - fy)
         + at(y0, x0 + 1) * fx * (1 - fy)
         + at(y0 + 1, x0) * (1 - fx) * fy
         + at(y0 + 1, x0 + 1) * fx * fy)                    # [N,17,3]
    if raw_input:
        # flip+scale the sampled colors (not the image): matches the
        # normalized-RGB descriptor (the 1/255 cancels in the L2 norm
        # but keeps pre-norm values comparable across paths)
        c = c[..., ::-1] * jnp.float32(1.0 / 255.0)
    c = c * (conf > 0.2)[..., None]
    emb = c.reshape(poses.shape[0], REID_DIM)
    norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True))
    return emb / jnp.maximum(norm, 1e-6)


def cosine_cost_matrix(track_emb: jnp.ndarray,
                       det_emb: jnp.ndarray) -> jnp.ndarray:
    """Occlusion-invariant appearance cost: 1 - cosine restricted to
    CO-VISIBLE keypoints, [T,E] x [D,E] -> [T,D] in [0, 2].

    Embeddings are keypoint-blocked ([..., 17, 3] flattened); a
    keypoint whose 3-block is all zero is invisible (the descriptor
    zeroes occluded keypoints). Plain cosine would penalize partial
    visibility by sqrt(visible energy); restricting both the dot
    product and the norms to keypoints visible on BOTH sides makes two
    appearances compare only where they overlap — mirroring OKS's
    co-visibility convention. Pairs with no co-visible keypoint (or
    uninitialized tracks) cost 1.0 (neutral)."""
    KP = C.NUM_KEYPOINTS
    t = track_emb.reshape(-1, KP, 3)
    d = det_emb.reshape(-1, KP, 3)
    t_e = jnp.sum(t * t, axis=-1)                           # [T,17]
    d_e = jnp.sum(d * d, axis=-1)                           # [D,17]
    vis = (t_e[:, None, :] > 1e-12) & (d_e[None, :, :] > 1e-12)  # [T,D,17]
    dot_kp = jnp.einsum("tkc,dkc->tdk", t, d)               # [T,D,17]
    num = jnp.sum(jnp.where(vis, dot_kp, 0.0), axis=-1)     # [T,D]
    # +eps INSIDE the sqrt: sqrt(0) has an infinite derivative, and the
    # masked-out dead pairs would otherwise poison gradients with
    # 0 * inf = NaN when this matrix is differentiated through (Re-ID
    # head training, scripts/train_reid.py). Live-pair values are
    # unchanged (energies >> 1e-12).
    tn = jnp.sqrt(jnp.sum(jnp.where(vis, t_e[:, None, :], 0.0),
                          axis=-1) + 1e-12)
    dn = jnp.sqrt(jnp.sum(jnp.where(vis, d_e[None, :, :], 0.0),
                          axis=-1) + 1e-12)
    cos = num / jnp.maximum(tn * dn, 1e-6)
    dead = ~jnp.any(vis, axis=-1)
    return jnp.where(dead, 1.0, 1.0 - cos)


def blend_reid_cost(geom_cost: jnp.ndarray, reid_cost: jnp.ndarray,
                    weight: float, lock: float = 1e9) -> jnp.ndarray:
    """cost' = (1-w)*geometry + w*appearance, preserving lock
    sentinels (locked/gated pairs stay locked)."""
    blended = (1.0 - weight) * geom_cost + weight * reid_cost
    return jnp.where(geom_cost >= lock / 2, geom_cost, blended)


def ema_update(track_emb: jnp.ndarray, det_emb_at_track: jnp.ndarray,
               matched: jnp.ndarray, alloc: jnp.ndarray | None = None,
               gamma: float = 0.9) -> jnp.ndarray:
    """EMA of matched tracks' embeddings toward their detections;
    newly allocated tracks take the detection embedding outright.
    track_emb [T,E], det_emb_at_track [T,E], matched [T] bool."""
    upd = gamma * track_emb + (1.0 - gamma) * det_emb_at_track
    norm = jnp.sqrt(jnp.sum(upd ** 2, axis=-1, keepdims=True))
    upd = upd / jnp.maximum(norm, 1e-6)
    out = jnp.where(matched[:, None], upd, track_emb)
    if alloc is not None:
        out = jnp.where(alloc[:, None], det_emb_at_track, out)
    return out
