#!/usr/bin/env python
"""Ingest/retile lowering probe (r5 phase 2 of the preprocessing
attack; PROFILE_r04.json: the flat->shaped u8 retile is
reshape.522/copy.811 = ~0.027 ms/frame of the chunk step).

Measures letterbox variant + FULL model forward (the conv input layout
propagates into the stem, so forward must be included for a fair A/B)
over a chunk-128 scan with in-graph-varied u8 frames and a value
fetch. All variants run RAW mode (stem-folded weights, u8 letterbox)
and are bit-identical in output up to layout:

  base    production: flat [K,H*W*3] -> reshape [K,H,W,3] -> strided
          slice rows+cols -> pad        (one retile of the full frame)
  split   reshape [K,H,W*3] (2-D rows) -> row slice (stride sy) ->
          reshape [K,nh,W,3] -> col slice -> pad   (the minor-dim-3
          retile happens AFTER row decimation: 1/sy of the bytes)
  planes  reshape [K,H,W*3] -> row slice -> THREE lane-strided slices
          (start 3*x0+c, stride 3*sx) -> [K,nh,nw] per channel ->
          stack -> pad        (no [*,W,3] tensor ever materializes;
          the only minor-dim-3 tensor is the final content)
  planar  like planes but emits [K,3,S,S] planar u8 (pad per plane,
          stack axis 1) and the stem conv consumes NCHW directly
          (dimension_numbers) — NO minor-dim-3 tensor anywhere

One variant per process:
  python scripts/bench_ingest_ab.py --variant base|split|planes|planar
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

K, H, W, S = 128, 720, 1280, 640


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant",
                   choices=["base", "split", "planes", "planar"],
                   required=True)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from posebyte_tpu.core import constants as C
    from posebyte_tpu.models import build_model_heads
    from posebyte_tpu.models.weights import fold_stem_preprocess
    from posebyte_tpu.models.yolo_pose import init_params
    from posebyte_tpu.ops.preprocess import (_selection_strides,
                                             letterbox_flat_nhwc,
                                             letterbox_params)

    params = fold_stem_preprocess(
        init_params(jax.random.PRNGKey(0), "yolov8n-pose"))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, params)
    heads_fn, _ = build_model_heads("yolov8n-pose", jnp.bfloat16)

    (y0, sy), (x0, sx) = _selection_strides(W, H, S)
    _, new_w, new_h, pad_x, pad_y = letterbox_params(W, H, S)
    PAD = np.uint8(C.LETTERBOX_PAD_RAW)

    def lb_base(frames):                       # [K, H*W*3] u8
        return jax.vmap(
            lambda f: letterbox_flat_nhwc(f, W, H, S, raw=True))(frames)

    def _rows(frames):
        img = frames.reshape(K, H, W * 3)
        return lax.slice(img, (0, y0, 0),
                         (K, y0 + sy * (new_h - 1) + 1, W * 3),
                         (1, sy, 1))           # [K, nh, W*3]

    def lb_split(frames):
        rows = _rows(frames).reshape(K, new_h, W, 3)
        content = lax.slice(rows, (0, 0, x0, 0),
                            (K, new_h, x0 + sx * (new_w - 1) + 1, 3),
                            (1, 1, sx, 1))
        return jnp.pad(content,
                       ((0, 0), (pad_y, S - new_h - pad_y),
                        (pad_x, S - new_w - pad_x), (0, 0)),
                       constant_values=PAD)

    def _chan_planes(frames):
        rows = _rows(frames)                   # [K, nh, W*3]
        chans = [lax.slice(rows, (0, 0, 3 * x0 + c),
                           (K, new_h, 3 * (x0 + sx * (new_w - 1)) + c + 1),
                           (1, 1, 3 * sx))     # [K, nh, nw]
                 for c in range(3)]
        return chans

    def lb_planes(frames):
        content = jnp.stack(_chan_planes(frames), axis=-1)
        return jnp.pad(content,
                       ((0, 0), (pad_y, S - new_h - pad_y),
                        (pad_x, S - new_w - pad_x), (0, 0)),
                       constant_values=PAD)

    def lb_planar(frames):                     # -> [K, 3, S, S] u8
        chans = _chan_planes(frames)
        padded = [jnp.pad(c, ((0, 0), (pad_y, S - new_h - pad_y),
                              (pad_x, S - new_w - pad_x)),
                          constant_values=PAD) for c in chans]
        return jnp.stack(padded, axis=1)

    def forward_nhwc(imgs):
        b, c, k = heads_fn(params, imgs)
        return (b.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()
                + k.astype(jnp.float32).sum())

    def forward_planar(imgs_nchw):
        # stem conv consumes planar u8 directly: NCHW in, NHWC out —
        # no minor-dim-3 tensor anywhere in the graph
        from posebyte_tpu.models import layers as L
        from posebyte_tpu.models.yolo_pose import (_backbone_neck_v8,
                                                   _head_level)
        x = imgs_nchw.astype(jnp.bfloat16)
        b0 = params["b0"]
        y = lax.conv_general_dilated(
            x, b0["w"].astype(jnp.bfloat16),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "HWIO", "NHWC"))
        y = L.silu(y + b0["b"].astype(jnp.bfloat16))
        y = L.conv_block(params["b1"], y, 2)
        feats = _backbone_neck_v8(params, y, stem_done=True)
        tot = jnp.float32(0.0)
        for i, f in enumerate(feats):
            b, c, k = _head_level(params["head"], i, f, "v8")
            tot = (tot + b.astype(jnp.float32).sum()
                   + c.astype(jnp.float32).sum()
                   + k.astype(jnp.float32).sum())
        return tot

    variant = args.variant
    lb = {"base": lb_base, "split": lb_split, "planes": lb_planes,
          "planar": lb_planar}[variant]
    fwd = forward_planar if variant == "planar" else forward_nhwc

    rng = np.random.default_rng(5)
    base_frames = jnp.asarray(
        rng.integers(0, 255, (K, H * W * 3), dtype=np.uint8))

    def loop(params_, frames0, salt):
        def body(carry, i):
            f = jnp.bitwise_xor(frames0, (i + salt).astype(jnp.uint8))
            return carry, fwd(lb(f))
        return lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))

    jl = jax.jit(loop)
    _, v = jl(params, base_frames, jnp.uint8(3))
    _ = float(jax.device_get(v)[-1])
    best = 1e30
    for rep in range(args.reps):
        t0 = time.perf_counter()
        _, v = jl(params, base_frames, jnp.uint8(4 + rep))
        _ = float(jax.device_get(v)[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / (args.iters * K) * 1e3
    print(json.dumps({
        f"lb_fwd_ms_per_frame_{variant}": round(ms, 4),
        "fps_equiv": round(1e3 / ms, 1),
        "iters": args.iters, "chunk": K,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
