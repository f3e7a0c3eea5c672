"""Device-side letterbox preprocessing.

TPU-native reformulation of the reference's fused preprocess kernel
(reference: src/cuda/preprocess.cu:19-83 kernelPreprocess and host
wrapper at 107-153): letterbox resize with bilinear interpolation,
gray-114 padding, BGR->RGB, /255 normalize, HWC->CHW.

The CUDA kernel maps one thread per output pixel; here the whole
resample is expressed as two separable gathers + lerps over the image
tensor, which XLA fuses into one pass. Shapes are static per (input
resolution -> target) pair, so each camera geometry compiles once.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


@functools.partial(jax.jit, static_argnames=("target", "bgr_to_rgb"))
def letterbox_image(image: jnp.ndarray, target: int = C.DEFAULT_INPUT_SIZE,
                    bgr_to_rgb: bool = True) -> jnp.ndarray:
    """uint8 HWC image -> float32 [3, target, target] letterboxed CHW.

    Matches the reference kernel's sampling exactly: for output pixel
    (tx, ty) inside the content region, src = (t - pad) / scale clamped
    to [0, dim - 1.001], bilinear; padding is 114/255 gray
    (reference: preprocess.cu:39-82).
    """
    H, W = image.shape[0], image.shape[1]
    scale, new_w, new_h, pad_x, pad_y = letterbox_params(W, H, target)

    tx = jnp.arange(target, dtype=jnp.float32)
    ty = jnp.arange(target, dtype=jnp.float32)
    src_x = jnp.clip((tx - pad_x) / scale, 0.0, W - 1.001)
    src_y = jnp.clip((ty - pad_y) / scale, 0.0, H - 1.001)

    x0 = src_x.astype(jnp.int32)
    y0 = src_y.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (src_x - x0)[None, :, None]            # [1, target, 1]
    wy = (src_y - y0)[:, None, None]            # [target, 1, 1]

    img = image.astype(jnp.float32)
    # Separable gather: rows then columns.
    row0 = img[y0]                               # [target, W, 3]
    row1 = img[y1]
    v00 = row0[:, x0]                            # [target, target, 3]
    v01 = row0[:, x1]
    v10 = row1[:, x0]
    v11 = row1[:, x1]
    out = ((1 - wx) * (1 - wy) * v00 + wx * (1 - wy) * v01
           + (1 - wx) * wy * v10 + wx * wy * v11) / 255.0

    if bgr_to_rgb:
        out = out[..., ::-1]

    in_content = ((tx[None, :] >= pad_x) & (tx[None, :] < pad_x + new_w)
                  & (ty[:, None] >= pad_y) & (ty[:, None] < pad_y + new_h))
    out = jnp.where(in_content[..., None], out, C.LETTERBOX_PAD_VALUE)
    return jnp.transpose(out, (2, 0, 1))


def unletterbox_coords(xy: jnp.ndarray, input_width: int, input_height: int,
                       target: int = C.DEFAULT_INPUT_SIZE) -> jnp.ndarray:
    """Map [..., 2] model-space coordinates back to original image space
    (reference: scaleDetections, src/utils/video_utils.cpp:339-359 and
    scaleTrackOutputs, src/main.cpp:48-68)."""
    scale, _, _, pad_x, pad_y = letterbox_params(input_width, input_height,
                                                 target)
    pad = jnp.asarray([pad_x, pad_y], jnp.float32)
    return (xy - pad) / scale
