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


def corner_blocks(image_hwc: jnp.ndarray, y0: jnp.ndarray,
                  x0: jnp.ndarray, size: int = 2) -> jnp.ndarray:
    """[N,17] int32 block starts -> [N,17,size,size,3] image blocks via
    ONE (double-vmapped) dynamic_slice — i.e. a single XLA gather of
    contiguous blocks.

    Why this exists: the four-corner advanced-indexing form
    (`image[yi, xi]` x 4) lowers to four point gathers with N*17 scalar
    index rows EACH, and TPU gathers pay per-index overhead — measured
    as the entire 26% reid-on cost at the headline shape and the 7.7x
    slowdown of the learned patch head (BENCH_REID_r05.json,
    PROFILE_REID_*_r05.json). Fetching each keypoint's neighborhood as
    one contiguous block cuts the index count by size*size*4 while
    returning the SAME corner values, so the bilinear expression built
    on top is arithmetically identical. Starts must be pre-clamped to
    [0, S-size] (dynamic_slice would clamp identically anyway)."""
    import jax
    from jax import lax

    def blk(y, x):
        return lax.dynamic_slice(image_hwc, (y, x, jnp.int32(0)),
                                 (size, size, 3))

    return jax.vmap(jax.vmap(blk))(y0, x0)


def make_embed_fn(reid_params=None, raw_input: bool = False,
                  sample_impl: str = "direct"):
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

    sample_impl: image-sampling lowering, "direct" (advanced-indexing
    point gathers, the reference formulation), "block" (one
    contiguous-block gather per keypoint + in-register corner
    selection — see corner_blocks), or "auto" (the measured winner per
    source: direct for the 1-tap free descriptor, block for the 25-tap
    learned patches — TrackerConfig.reid_sample_impl for the numbers).
    """
    if sample_impl == "auto":
        sample_impl = "block" if reid_params is not None else "direct"
    if reid_params is not None:
        from ..models.reid_head import apply_reid_head
        return lambda img, poses: apply_reid_head(reid_params, img, poses,
                                                  raw_input=raw_input,
                                                  sample_impl=sample_impl)
    return lambda img, poses: pose_color_embedding(
        img, poses, raw_input=raw_input, sample_impl=sample_impl)


def pose_color_embedding(image_hwc: jnp.ndarray,
                         poses: jnp.ndarray,
                         raw_input: bool = False,
                         sample_impl: str = "direct") -> jnp.ndarray:
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

    if sample_impl == "block":
        # one gather of contiguous 2x2x3 blocks (x0,y0 <= S-2 by the
        # clip above, so the block always fits); corners come out as
        # static slices of the block — bit-identical values to the
        # direct path's four point gathers
        blk = corner_blocks(image_hwc, y0, x0, size=2)  # [N,17,2,2,3]
        c00, c01 = blk[:, :, 0, 0], blk[:, :, 0, 1]
        c10, c11 = blk[:, :, 1, 0], blk[:, :, 1, 1]
    else:
        def at(yi, xi):
            return image_hwc[yi, xi]                        # [N,17,3]

        c00, c01 = at(y0, x0), at(y0, x0 + 1)
        c10, c11 = at(y0 + 1, x0), at(y0 + 1, x0 + 1)

    c = (c00 * (1 - fx) * (1 - fy)
         + c01 * fx * (1 - fy)
         + c10 * (1 - fx) * fy
         + c11 * fx * fy)                                   # [N,17,3]
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
