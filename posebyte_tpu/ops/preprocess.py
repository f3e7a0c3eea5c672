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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C


def ingest_retile_override() -> str | None:
    """Debug hook for the selection-path retile A/B (r5).

    The selection letterbox must turn flat [H*W*3] bytes into a sliced
    [nh, nw, 3] content block; HOW the minor-dim-3 retile is scheduled
    is a measured lowering choice (BENCH_INGEST_AB_r05.json):
      "full"  reshape [H, W, 3] first, then slice rows+cols — the whole
              frame pays the flat->tiled minor-dim-3 relayout
              (reshape.522/copy.811 = 0.027 ms/frame in PROFILE_r05).
      "split" reshape [H, W*3] (rows only), slice rows (stride sy),
              THEN reshape [nh, W, 3] and slice cols — only 1/sy of the
              bytes pay the minor-dim-3 retile. Same elements selected,
              bit-identical output; measured -5.1% on letterbox+forward
              at chunk 128.
    Returns the POSEBYTE_INGEST_RETILE env value ("full"/"split") for
    clean-process A/B legs, or None to take the measured default."""
    v = os.environ.get("POSEBYTE_INGEST_RETILE", "")
    return v if v in ("full", "split") else None


def batch1_selection_override() -> bool:
    """Debug hook for letterbox-lowering A/B probes.

    Single-frame call sites (runner._make_step, engine batch-1 paths)
    pass selection=False because the strided-slice lowering is a
    measured batch-1 pessimization (4.00 vs 1.64 ms fused step,
    scripts/bench_frame_exec_ab.py). Setting
    POSEBYTE_DEBUG_BATCH1_SELECTION=1 re-enables the strided-slice
    lowering at those sites so the A/B can be re-run in a clean
    process per leg — no monkeypatching, no shared jit caches."""
    return os.environ.get("POSEBYTE_DEBUG_BATCH1_SELECTION", "") == "1"


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
def _interp_matrices(input_width: int, input_height: int, target: int,
                     norm: float = 1.0 / 255.0):
    """Static separable bilinear weights + content mask.

    Returns (Wy [target, H] f32 with `norm` folded in, Wx [target, W]
    f32, content_mask [target, target] bool) as numpy constants.
    norm=1/255 for the normalized path; 1.0 for the raw path (the /255
    lives in the folded stem weights instead — see `raw` in
    letterbox_flat_nhwc).
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

    Wy = axis_matrix(target, input_height, pad_y, norm)
    Wx = axis_matrix(target, input_width, pad_x, 1.0)

    tx = np.arange(target)
    in_content = ((tx[None, :] >= pad_x) & (tx[None, :] < pad_x + new_w)
                  & (tx[:, None] >= pad_y) & (tx[:, None] < pad_y + new_h))
    return Wy, Wx, in_content


@functools.lru_cache(maxsize=16)
def _selection_strides(input_width: int, input_height: int, target: int):
    """Detect the pure-selection degenerate case of the bilinear
    letterbox: when every output sample lands EXACTLY on an input pixel
    (fractional weight 0) with a uniform stride on both axes, the
    resample is a strided slice, not an interpolation.

    This covers every canonical video geometry — 1280x720, 1920x1080,
    and 3840x2160 into a 640 (or 256/320) square are exact integer
    decimations (e.g. 720p->640: scale=0.5, src_y=2(y-140)) — where the
    dense interpolation matmuls of the general path spend ~6.7 GFLOPs
    per frame computing a selection. Returns ((y0, sy), (x0, sx)) or
    None if genuine interpolation is required.
    """
    scale, new_w, new_h, pad_x, pad_y = letterbox_params(
        input_width, input_height, target)

    def axis_sel(n_in, pad, n_content):
        t = np.arange(target, dtype=np.float64)
        src = np.clip((t - pad) / scale, 0.0, n_in - 1.001)
        i0 = src.astype(np.int64)
        w1 = src - i0
        c = slice(pad, pad + n_content)
        if not np.all(w1[c] < 1e-9):
            return None
        idx = i0[c]
        if n_content == 1:
            return int(idx[0]), 1
        steps = np.diff(idx)
        if steps[0] < 1 or not np.all(steps == steps[0]):
            return None
        return int(idx[0]), int(steps[0])

    ysel = axis_sel(input_height, pad_y, new_h)
    xsel = axis_sel(input_width, pad_x, new_w)
    if ysel is None or xsel is None:
        return None
    return ysel, xsel


@functools.partial(jax.jit,
                   static_argnames=("input_width", "input_height", "target",
                                    "bgr_to_rgb", "out_dtype", "selection",
                                    "raw"))
def letterbox_flat_nhwc(frame_flat: jnp.ndarray, input_width: int,
                        input_height: int,
                        target: int = C.DEFAULT_INPUT_SIZE,
                        bgr_to_rgb: bool = True,
                        out_dtype=jnp.float32,
                        selection: bool = True,
                        raw: bool = False) -> jnp.ndarray:
    """Flat uint8 [H*W*3] frame -> [target, target, 3] HWC float.

    The production path: flat-byte H2D, then EITHER a strided slice
    (when the geometry is an exact integer decimation — all canonical
    video sizes; bandwidth-bound, no FLOPs) or two MXU matmuls (the
    general bilinear case), with the output already in the model's NHWC
    layout (no extra transpose pass). The two formulations compute the
    same sampling (reference: preprocess.cu:50-77) — at integer source
    positions bilinear IS selection — and agree exactly in f32.

    out_dtype: interpolation always runs in f32; a bf16 out_dtype
    rounds only the FINAL pixel values — exactly the rounding the bf16
    model's own input cast would apply — while halving the materialized
    [target, target, 3] intermediate (pipeline callers pass the model
    compute dtype).

    selection: allow the strided-slice lowering. It wins when the
    letterbox is vmapped over a chunk (0.057 -> 0.0002 ms/frame at
    K=128, headline 3514 -> 3719 FPS) but LOSES at batch 1, where the
    strided uint8 slice lowers to a slow copy: the single-frame fused
    step measured 4.00 ms with it vs 1.64 ms via the matmul path
    (scripts/bench_frame_exec_ab.py, v5e). Single-frame callers pass
    selection=False; both lowerings are bit-identical.

    raw: emit the UN-normalized, UN-flipped letterbox — BGR channel
    order, 0..255 value scale, gray-114 padding. Pairs with stem
    weights transformed by models.weights.fold_stem_preprocess (input
    channels reversed, scaled by 1/255): the conv is linear in its
    input, so folded-weights(raw) == original-weights(normalized)
    exactly in f32. This deletes the materialized full-tensor channel
    reverse (0.016 ms/frame in PROFILE_r04.json) and the /255 multiply
    from the per-frame graph, and lets the selection path emit uint8 —
    the model's own input cast does the (exact: ints < 256) u8->bf16
    convert. bgr_to_rgb is ignored when raw=True (the flip lives in
    the folded weights). The raw selection path returns uint8
    regardless of out_dtype; the matmul path returns out_dtype
    (interpolated values are fractional).
    """
    sel = (_selection_strides(input_width, input_height, target)
           if selection else None)
    if sel is not None:
        (y0, sy), (x0, sx) = sel
        _, new_w, new_h, pad_x, pad_y = letterbox_params(
            input_width, input_height, target)
        retile = ingest_retile_override() or "split"
        if retile == "split" and sy > 1:
            # Row-decimate BEFORE the minor-dim-3 retile: the flat->
            # [*, W, 3] relayout (the largest surviving preprocessing
            # op, 0.027 ms/frame per PROFILE_r05.json reshape.522/
            # copy.811) then touches only 1/sy of the frame's bytes.
            # Identical elements to the full-retile formulation;
            # measured -5.1% on letterbox+forward at chunk 128
            # (BENCH_INGEST_AB_r05.json; e2e GO in BENCH_RETILE_AB_r05).
            img2d = frame_flat.reshape(input_height, input_width * 3)
            rows = jax.lax.slice(
                img2d, (y0, 0),
                (y0 + sy * (new_h - 1) + 1, input_width * 3),
                (sy, 1))                                 # [nh, W*3]
            content = jax.lax.slice(
                rows.reshape(new_h, input_width, 3), (0, x0, 0),
                (new_h, x0 + sx * (new_w - 1) + 1, 3), (1, sx, 1))
        else:
            img = frame_flat.reshape(input_height, input_width, 3)
            content = jax.lax.slice(
                img, (y0, x0, 0),
                (y0 + sy * (new_h - 1) + 1, x0 + sx * (new_w - 1) + 1, 3),
                (sy, sx, 1))
        if raw:
            # uint8 end-to-end: pad with the un-normalized gray value;
            # no flip (folded into stem weights), no convert/multiply
            # (the model's input cast converts; /255 is in the weights).
            return jnp.pad(
                content,
                ((pad_y, target - new_h - pad_y),
                 (pad_x, target - new_w - pad_x), (0, 0)),
                constant_values=np.uint8(C.LETTERBOX_PAD_RAW))
        if bgr_to_rgb:
            # flip channels on the u8 content, BEFORE the f32 convert:
            # XLA materializes this reverse either way (minor-dim-3
            # tiled layout), but on u8 content it moves 4x fewer bytes
            # than on the f32 tensor it used to sit after — the reverse
            # was 0.016 ms/frame of the chunk step, 2nd-largest non-conv
            # op in the r4 device profile (PROFILE_r04.json). Identical
            # output (the flip commutes with the elementwise convert).
            content = content[..., ::-1]
        content = content.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        out = jnp.pad(
            content,
            ((pad_y, target - new_h - pad_y),
             (pad_x, target - new_w - pad_x), (0, 0)),
            constant_values=C.LETTERBOX_PAD_VALUE)
        return out.astype(out_dtype)

    Wy_np, Wx_np, mask_np = _interp_matrices(
        input_width, input_height, target,
        norm=1.0 if raw else 1.0 / 255.0)
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
    if raw:
        out = jnp.where(mask[..., None], out,
                        jnp.float32(C.LETTERBOX_PAD_RAW))
        return out.astype(out_dtype)
    if bgr_to_rgb:
        out = out[..., ::-1]
    out = jnp.where(mask[..., None], out, C.LETTERBOX_PAD_VALUE)
    return out.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("input_width", "input_height", "target",
                                    "bgr_to_rgb", "selection"))
def letterbox_flat(frame_flat: jnp.ndarray, input_width: int,
                   input_height: int, target: int = C.DEFAULT_INPUT_SIZE,
                   bgr_to_rgb: bool = True,
                   selection: bool = True) -> jnp.ndarray:
    """Flat uint8 [H*W*3] frame -> float32 [3, target, target] CHW
    (the reference kernel's output layout; preprocess.cu:19-83).
    selection: see letterbox_flat_nhwc (single-frame callers pass
    False)."""
    out = letterbox_flat_nhwc(frame_flat, input_width, input_height,
                              target, bgr_to_rgb, selection=selection)
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
