"""Learned appearance Re-ID head: pose-aligned patches -> embedding.

The tracker's appearance seam (ops/reid.py) accepts embeddings from any
source; the built-in source is a training-free 1-pixel color sample per
keypoint. This module is the LEARNED source (beyond the reference's
surface — gpu_tracker.cu associates purely on geometry): a shared
per-keypoint MLP over a PxP pixel patch centered on each keypoint,
producing a 3-D code per keypoint.

Design constraints that shape it:
  * Output layout is [17, 3] flattened to REID_DIM=51 with invisible
    keypoints zeroed — the exact block structure ops/reid.py's
    co-visibility cosine and the fused tracker kernel's embedding
    planes already speak, so learned embeddings drop into the per-frame
    path, the scan path, AND the Pallas megakernel unchanged.
  * The MLP is shared across keypoints (weight-tied like a 1x1 conv):
    2.7k params, a few microseconds per frame on the VPU/MXU — the
    detector stays >99% of the compute.
  * Pure-JAX params pytree, trainable with the same optax/safetensors
    machinery as the detector (scripts/train_reid.py trains it on the
    synthetic renderer's identity-colored figures with an InfoNCE
    objective over identity pairs across frames).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..ops.reid import REID_DIM

# Patch geometry: PATCH x PATCH samples, SPACING px apart, centered on
# each keypoint (in model-input pixel coordinates).
PATCH = 5
SPACING = 2.0
IN_DIM = PATCH * PATCH * 3
HIDDEN = 32


def init_reid_head(key, hidden: int = HIDDEN) -> dict:
    """Initialize the shared per-keypoint MLP: IN_DIM -> hidden -> 3."""
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / np.sqrt(IN_DIM)
    s2 = 1.0 / np.sqrt(hidden)
    return {
        "w1": jax.random.uniform(k1, (IN_DIM, hidden), jnp.float32,
                                 -s1, s1),
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.uniform(k2, (hidden, 3), jnp.float32, -s2, s2),
        "b2": jnp.zeros((3,), jnp.float32),
    }


# Block-gather geometry (sample_impl="block"): the 5x5 taps at SPACING
# 2 span +-4 px around the keypoint, +1 for the bilinear upper corner
# and +-1 slack for f32 rounding of (coord + integer offset) — a 12x12
# block per keypoint always contains every (possibly edge-clamped)
# corner index. Bound audited in tests/test_reid_head.py.
BLOCK = 12


def _sample_patches(image_hwc: jnp.ndarray,
                    poses: jnp.ndarray,
                    raw_input: bool = False,
                    sample_impl: str = "direct") -> jnp.ndarray:
    """Bilinear PxP patch per keypoint: [N, 17, PATCH*PATCH*3] f32.

    Same sampling scheme as ops/reid.pose_color_embedding, widened to a
    patch; coordinates clamp to the image so edge poses stay valid.

    raw_input: the image is the raw-mode letterbox (BGR, 0..255,
    possibly uint8 — see ops/preprocess.py raw=True). The flip+scale
    are applied to the SAMPLED values ([N,17,PP,3], a few KB) instead
    of the full image, so the MLP sees the same normalized-RGB patches
    it was trained on.

    sample_impl "direct" fetches each tap's four bilinear corners by
    advanced indexing — N*17*PATCH^2*4 point gathers, the measured
    7.7x-slowdown path on TPU (BENCH_REID_r05.json). "block" gathers
    ONE contiguous BLOCKxBLOCKx3 neighborhood per keypoint
    (ops.reid.corner_blocks) and picks the tap corners out of it with
    exact one-hot row/column contractions (~25 MFLOP/frame), agreeing
    with "direct" to f32 rounding of the regrouped bilinear blend.
    """
    S = image_hwc.shape[0]
    N = poses.shape[0]
    xy = poses[..., :2]                                     # [N,17,2]
    off = (np.arange(PATCH, dtype=np.float32) - (PATCH - 1) / 2.0) \
        * SPACING
    ox, oy = np.meshgrid(off, off)                          # [P,P]
    offs = np.stack([ox.ravel(), oy.ravel()], -1)           # [P*P,2]
    pts = xy[:, :, None, :] + jnp.asarray(offs)[None, None]  # [N,17,PP,2]

    x = jnp.clip(pts[..., 0], 0.0, S - 1.001)
    y = jnp.clip(pts[..., 1], 0.0, S - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    if sample_impl == "block":
        from ..ops.reid import corner_blocks
        reach = int((PATCH - 1) / 2 * SPACING)              # 4 px
        base = jnp.floor(jnp.clip(xy, 0.0, S - 1.001)).astype(jnp.int32)
        bx = jnp.clip(base[..., 0] - reach, 0, S - BLOCK)   # [N,17]
        by = jnp.clip(base[..., 1] - reach, 0, S - BLOCK)
        blk = corner_blocks(image_hwc, by, bx, size=BLOCK)
        blk = blk.astype(jnp.float32)           # [N,17,B,B,3]
        ry = y0 - by[..., None]                 # [N,17,PP] in [0,B-2]
        rx = x0 - bx[..., None]
        iot = jnp.arange(BLOCK, dtype=jnp.int32)
        # separable bilinear as exact one-hot selections premixed with
        # the fractional weights; HIGHEST keeps the f32 weights out of
        # bf16 MXU rounding (FLOPs here are negligible)
        wy = ((ry[..., None] == iot) * (1.0 - fy)
              + ((ry + 1)[..., None] == iot) * fy)          # [N,17,PP,B]
        wx = ((rx[..., None] == iot) * (1.0 - fx)
              + ((rx + 1)[..., None] == iot) * fx)
        rows = jnp.einsum("nktb,nkbwc->nktwc", wy, blk,
                          precision=jax.lax.Precision.HIGHEST)
        c = jnp.einsum("nktw,nktwc->nktc", wx, rows,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        img = image_hwc.astype(jnp.float32)

        def at(yi, xi):
            return img[yi, xi]                              # [N,17,PP,3]

        c = (at(y0, x0) * (1 - fx) * (1 - fy)
             + at(y0, x0 + 1) * fx * (1 - fy)
             + at(y0 + 1, x0) * (1 - fx) * fy
             + at(y0 + 1, x0 + 1) * fx * fy)                # [N,17,PP,3]
    if raw_input:
        c = c[..., ::-1] * jnp.float32(1.0 / 255.0)
    return c.reshape(N, C.NUM_KEYPOINTS, IN_DIM)


def apply_reid_head(params: dict, image_hwc: jnp.ndarray,
                    poses: jnp.ndarray,
                    conf_gate: float = 0.2,
                    raw_input: bool = False,
                    sample_impl: str = "direct") -> jnp.ndarray:
    """[S,S,3] image + [N,17,3] poses -> L2-normalized [N, REID_DIM].

    Drop-in replacement for ops.reid.pose_color_embedding with the same
    visibility convention: keypoints with confidence <= conf_gate emit
    zero blocks, so the co-visibility cosine compares only shared
    keypoints. raw_input / sample_impl: see _sample_patches.
    """
    feats = _sample_patches(image_hwc, poses, raw_input,
                            sample_impl=sample_impl)        # [N,17,IN]
    h = jax.nn.relu(feats @ params["w1"] + params["b1"])
    code = h @ params["w2"] + params["b2"]                  # [N,17,3]
    # tanh bounds the code so one keypoint cannot dominate the cosine
    code = jnp.tanh(code)
    code = code * (poses[..., 2] > conf_gate)[..., None]
    emb = code.reshape(poses.shape[0], REID_DIM)
    # eps inside the sqrt keeps the all-invisible (zero) embedding's
    # gradient finite (sqrt(0) backward is inf; 0*inf = NaN in training)
    norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True) + 1e-12)
    return emb / jnp.maximum(norm, 1e-6)


def save_reid_head(params: dict, path: str) -> None:
    from safetensors.numpy import save_file
    save_file({k: np.asarray(v) for k, v in params.items()}, path)


def load_reid_head(path: str) -> dict:
    from safetensors.numpy import load_file
    return {k: jnp.asarray(v) for k, v in load_file(path).items()}
