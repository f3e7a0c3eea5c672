#!/usr/bin/env python
"""Where does int8 time go? Microbenchmark for the w8a8 conv path.

Measures, per representative yolov8 layer shape and for a 4-conv chain:
  bf16       — plain bf16 conv+silu chain (the baseline the int8 path
               must beat);
  int8       — the current per-conv w8a8 formulation (quantize input,
               int8 MXU conv, dequant+bias+silu in f32, back to bf16);
  int8chain  — int8-in/int8-out: each conv's epilogue requantizes
               directly to the NEXT conv's activation scale, so the
               inter-conv activation tensor is int8 (half the HBM bytes
               of bf16) and no separate quantize pass exists
               (ROADMAP #3 / VERDICT r2 item 3).

Relay-proof: each variant runs as one scan executable over in-graph
varied inputs with a final value fetch (docs/DEVELOPMENT.md).

Usage: python scripts/bench_int8_micro.py [-b 32] [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# (spatial, channels) of representative trunk stages: yolov8 s/m/l at
# 640 input spend most time at these shapes.
SHAPES = [(80, 128), (40, 256), (20, 512)]
DEPTH = 4   # convs per chain


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    def silu(x):
        return x * jax.nn.sigmoid(x)

    conv_kw = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
                   dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rng = np.random.default_rng(0)
    results = []
    for spatial, C in SHAPES:
        B = args.batch
        ws = [rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32)
              for _ in range(DEPTH)]
        bs = [rng.normal(0, 0.01, (C,)).astype(np.float32)
              for _ in range(DEPTH)]
        wq = []
        for w in ws:
            amax = np.abs(w).max(axis=(0, 1, 2))
            scale = np.where(amax > 0, amax / 127.0, 1.0)
            wq.append((np.clip(np.round(w / scale), -127, 127)
                       .astype(np.int8), scale.astype(np.float32)))
        a_scales = [np.float32(0.05)] * (DEPTH + 1)

        x0 = jnp.asarray(rng.normal(0, 1, (B, spatial, spatial, C))
                         .astype(np.float32), jnp.bfloat16)

        wsj = [jnp.asarray(w, jnp.bfloat16) for w in ws]
        bsj = [jnp.asarray(b, jnp.bfloat16) for b in bs]
        wqj = [(jnp.asarray(q), jnp.asarray(s)) for q, s in wq]

        def chain_bf16(x):
            for w, b in zip(wsj, bsj):
                x = lax.conv_general_dilated(
                    x, w, preferred_element_type=jnp.bfloat16, **conv_kw)
                x = silu(x + b)
            return x

        def conv_i8(xq, w_q):
            return lax.conv_general_dilated(
                xq, w_q, preferred_element_type=jnp.int32, **conv_kw)

        def chain_int8(x):
            # current formulation: bf16 between convs
            for i, ((q, s), b) in enumerate(zip(wqj, bsj)):
                s_x = a_scales[i]
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                              -127, 127).astype(jnp.int8)
                y = conv_i8(xq, q)
                x = silu((y.astype(jnp.float32) * (s_x * s)
                          + b.astype(jnp.float32)).astype(jnp.bfloat16))
            return x

        def chain_int8_chained(x):
            # int8-in/int8-out: epilogue requantizes straight to the
            # next conv's activation scale; inter-conv tensors are int8
            s0 = a_scales[0]
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s0),
                          -127, 127).astype(jnp.int8)
            for i, ((q, s), b) in enumerate(zip(wqj, bsj)):
                y = conv_i8(xq, q)
                f = silu(y.astype(jnp.float32) * (a_scales[i] * s)
                         + b.astype(jnp.float32))
                if i < DEPTH - 1:
                    xq = jnp.clip(jnp.round(f / a_scales[i + 1]),
                                  -127, 127).astype(jnp.int8)
            return f.astype(jnp.bfloat16)

        flops = DEPTH * 2 * B * spatial * spatial * 9 * C * C
        row = {"shape": f"{spatial}x{spatial}x{C}"}
        for label, fn in (("bf16", chain_bf16), ("int8", chain_int8),
                          ("int8chain", chain_int8_chained)):
            def loop(x0, salt):
                def body(x, i):
                    xx = x0 + (salt + i).astype(jnp.bfloat16) * 1e-3
                    return x, fn(xx)[0, 0, 0, 0].astype(jnp.float32)
                return lax.scan(body, x0, jnp.arange(args.iters))

            jl = jax.jit(loop)
            _, v = jl(x0, jnp.float32(1.0))
            _ = float(jax.device_get(v)[-1])
            t0 = time.perf_counter()
            _, v = jl(x0, jnp.float32(2.0))
            _ = float(jax.device_get(v)[-1])
            dt = (time.perf_counter() - t0) / args.iters
            row[label + "_ms"] = round(dt * 1e3, 4)
            row[label + "_tflops"] = round(flops / dt / 1e12, 1)
        row["int8_speedup"] = round(row["bf16_ms"] / row["int8_ms"], 3)
        row["chain_speedup"] = round(row["bf16_ms"]
                                     / row["int8chain_ms"], 3)
        print(row, flush=True)
        results.append(row)

    import json
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
