"""Device-side letterbox preprocessing.

TPU-native reformulation of the reference's fused preprocess kernel
(reference: src/cuda/preprocess.cu:19-83 kernelPreprocess and host
wrapper at 107-153): letterbox resize with bilinear interpolation,
gray-114 padding, BGR->RGB, /255 normalize, HWC->CHW.

Two TPU-specific design decisions (measured on v5e):
  * The frame crosses host->device as FLAT bytes [H*W*3]: transferring
    a shaped [H, W, 3] uint8 array forces a tiled-layout conversion that
    is ~35x slower than the raw byte copy; the reshape happens on
    device, where relayout is effectively free.
  * Bilinear resampling is expressed as two separable MATMULS with
    precomputed (static) interpolation matrices, so the resample runs on
    the MXU instead of as gathers on the VPU — the gather formulation
    measured ~30 ms/frame, the matmul formulation is sub-millisecond.
    The interpolation weights encode exactly the reference kernel's
    sampling: src = (t - pad) / scale clamped to [0, dim - 1.001],
    two-tap bilinear (preprocess.cu:50-77). The /255 normalization is
    folded into the row matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C


def letterbox_params(input_width: int, input_height: int,
                     target: int = C.DEFAULT_INPUT_SIZE):
    """Static letterbox geometry (reference: preprocess.cu:117-127)."""
    scale = min(target / input_width, target / input_height)
    new_w = int(input_width * scale)
    new_h = int(input_height * scale)
    pad_x = (target - new_w) // 2
    pad_y = (target - new_h) // 2
    return scale, new_w, new_h, pad_x, pad_y


@functools.lru_cache(maxsize=16)
def _interp_matrices(input_width: int, input_height: int, target: int):
    """Static separable bilinear weights + content mask.

    Returns (Wy [target, H] f32 with 1/255 folded in, Wx [target, W] f32,
    content_mask [target, target] bool) as numpy constants.
    """
    scale, new_w, new_h, pad_x, pad_y = letterbox_params(
        input_width, input_height, target)

    def axis_matrix(n_out, n_in, pad, norm):
        t = np.arange(n_out, dtype=np.float64)
        src = np.clip((t - pad) / scale, 0.0, n_in - 1.001)
        i0 = src.astype(np.int64)
        i1 = np.minimum(i0 + 1, n_in - 1)
        w1 = src - i0
        M = np.zeros((n_out, n_in), np.float32)
        M[np.arange(n_out), i0] += ((1.0 - w1) * norm).astype(np.float32)
        M[np.arange(n_out), i1] += (w1 * norm).astype(np.float32)
        return M

    Wy = axis_matrix(target, input_height, pad_y, 1.0 / 255.0)
    Wx = axis_matrix(target, input_width, pad_x, 1.0)

    tx = np.arange(target)
    in_content = ((tx[None, :] >= pad_x) & (tx[None, :] < pad_x + new_w)
                  & (tx[:, None] >= pad_y) & (tx[:, None] < pad_y + new_h))
    return Wy, Wx, in_content


@functools.partial(jax.jit,
                   static_argnames=("input_width", "input_height", "target",
                                    "bgr_to_rgb", "out_dtype"))
def letterbox_flat_nhwc(frame_flat: jnp.ndarray, input_width: int,
                        input_height: int,
                        target: int = C.DEFAULT_INPUT_SIZE,
                        bgr_to_rgb: bool = True,
                        out_dtype=jnp.float32) -> jnp.ndarray:
    """Flat uint8 [H*W*3] frame -> [target, target, 3] HWC float.

    The production path: flat-byte H2D, two MXU matmuls, and the output
    already in the model's NHWC layout (no extra transpose pass).

    out_dtype: interpolation always runs in f32; a bf16 out_dtype
    rounds only the FINAL pixel values — exactly the rounding the bf16
    model's own input cast would apply — while halving the materialized
    [target, target, 3] intermediate (pipeline callers pass the model
    compute dtype).
    """
    Wy_np, Wx_np, mask_np = _interp_matrices(input_width, input_height,
                                             target)
    Wy = jnp.asarray(Wy_np)
    Wx = jnp.asarray(Wx_np)
    mask = jnp.asarray(mask_np)

    img = frame_flat.reshape(input_height, input_width, 3) \
        .astype(jnp.float32)
    # rows: [target, H] @ [H, W*3]
    a = (Wy @ img.reshape(input_height, input_width * 3)) \
        .reshape(target, input_width, 3)
    # cols: contract W -> einsum on MXU
    out = jnp.einsum("ywc,xw->yxc", a, Wx,
                     preferred_element_type=jnp.float32)
    if bgr_to_rgb:
        out = out[..., ::-1]
    out = jnp.where(mask[..., None], out, C.LETTERBOX_PAD_VALUE)
    return out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("input_width", "input_height", "target",
                                    "bgr_to_rgb"))
def letterbox_flat(frame_flat: jnp.ndarray, input_width: int,
                   input_height: int, target: int = C.DEFAULT_INPUT_SIZE,
                   bgr_to_rgb: bool = True) -> jnp.ndarray:
    """Flat uint8 [H*W*3] frame -> float32 [3, target, target] CHW
    (the reference kernel's output layout; preprocess.cu:19-83)."""
    out = letterbox_flat_nhwc(frame_flat, input_width, input_height,
                              target, bgr_to_rgb)
    return jnp.transpose(out, (2, 0, 1))


def letterbox_image(image: jnp.ndarray, target: int = C.DEFAULT_INPUT_SIZE,
                    bgr_to_rgb: bool = True) -> jnp.ndarray:
    """uint8 HWC image -> float32 [3, target, target] letterboxed CHW.

    Convenience wrapper over letterbox_flat for already-shaped images.
    """
    H, W = image.shape[0], image.shape[1]
    return letterbox_flat(image.reshape(-1), W, H, target, bgr_to_rgb)


def unletterbox_coords(xy: jnp.ndarray, input_width: int, input_height: int,
                       target: int = C.DEFAULT_INPUT_SIZE) -> jnp.ndarray:
    """Map [..., 2] model-space coordinates back to original image space
    (reference: scaleDetections, src/utils/video_utils.cpp:339-359 and
    scaleTrackOutputs, src/main.cpp:48-68)."""
    scale, _, _, pad_x, pad_y = letterbox_params(input_width, input_height,
                                                 target)
    pad = jnp.asarray([pad_x, pad_y], jnp.float32)
    return (xy - pad) / scale
