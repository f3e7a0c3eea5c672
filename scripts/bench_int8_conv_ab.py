#!/usr/bin/env python
"""int8 conv lowering A/B (VERDICT r3 item 5): can anything beat XLA's
int8 conv_general_dilated, whose measured ceiling (~36-39% of v5e int8
peak, scripts/bench_int8_micro.py) caps the w8a8 e2e win?

Variants per trunk shape (all computing the same int8 3x3 conv with
int32 accumulation + f32 dequant epilogue to bf16):

  bf16        — bf16 conv (the bar int8 must clear)
  xla_conv    — XLA int8 conv lowering (current w8a8 path)
  xla_taps    — nine shifted int8 dot_generals ([B*H*W, C] @ [C, O]
                per tap, accumulated): XLA's int8 MATMUL path instead
                of its conv path; slices re-read the input 9x but the
                MXU sees pure int8 GEMMs
  pallas      — ops/pallas_conv.py: one VMEM-resident input tile per
                frame, nine in-kernel int8 matmuls, fused dequant

Relay-proof: one scan executable per variant, in-graph varied inputs,
final device_get value fetch (docs/DEVELOPMENT.md quirks). One process
per run recommended for clean jit universes; variants here live in
separate executables which has been adequate for micro A/Bs
(matches bench_int8_micro.py precedent).

Usage: python scripts/bench_int8_conv_ab.py [-b 32] [--iters 30]
       [--shapes 40x256,20x512]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--shapes", default="40x256,20x512")
    p.add_argument("--variants", default="bf16,xla_conv,xla_taps,pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from posebyte_tpu.ops.pallas_conv import conv3x3_int8_pallas

    conv_kw = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rng = np.random.default_rng(0)
    results = []
    variants = args.variants.split(",")

    for shape in args.shapes.split(","):
        spatial, C = (int(v) for v in shape.split("x"))
        B = args.batch
        w = rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32)
        amax = np.abs(w).max(axis=(0, 1, 2))
        w_scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        s_x = np.float32(0.05)
        scale = (s_x * w_scale).astype(np.float32)

        xq0 = jnp.asarray(
            rng.integers(-127, 128, (B, spatial, spatial, C))
            .astype(np.int8))
        x0_bf = (xq0.astype(jnp.float32) * s_x).astype(jnp.bfloat16)
        wq_j = jnp.asarray(wq)
        w_bf = jnp.asarray(w, jnp.bfloat16)
        scale_j = jnp.asarray(scale)

        def v_bf16(x):
            return lax.conv_general_dilated(
                x, w_bf, preferred_element_type=jnp.bfloat16, **conv_kw)

        def v_xla_conv(xq):
            y = lax.conv_general_dilated(
                xq, wq_j, preferred_element_type=jnp.int32, **conv_kw)
            return (y.astype(jnp.float32) * scale_j).astype(jnp.bfloat16)

        def v_xla_taps(xq):
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B, spatial, spatial, C), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    xs = lax.slice(
                        xp, (0, dy, dx, 0),
                        (B, dy + spatial, dx + spatial, C))
                    acc = acc + jnp.einsum(
                        "bhwc,co->bhwo", xs, wq_j[dy, dx],
                        preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * scale_j).astype(jnp.bfloat16)

        def v_pallas(xq):
            return conv3x3_int8_pallas(xq, wq_j, scale_j)

        fns = {"bf16": (v_bf16, x0_bf, jnp.bfloat16),
               "xla_conv": (v_xla_conv, xq0, jnp.int8),
               "xla_taps": (v_xla_taps, xq0, jnp.int8),
               "pallas": (v_pallas, xq0, jnp.int8)}

        flops = 2 * B * spatial * spatial * 9 * C * C
        row = {"shape": f"{spatial}x{spatial}x{C}", "batch": B}
        for label in variants:
            fn, x0, dt_in = fns[label]

            def loop(x0, salt):
                def body(x, i):
                    if dt_in == jnp.int8:
                        xx = jnp.bitwise_xor(
                            x0, (salt + i).astype(jnp.int8) & 7)
                    else:
                        xx = x0 + (salt + i).astype(jnp.bfloat16) * 1e-3
                    # consume a FULL reduction of the output: a single
                    # sliced element would let XLA legally
                    # strength-reduce the conv/einsum variants while the
                    # opaque pallas_call cannot be shrunk, biasing the
                    # A/B against the Pallas kernel
                    return x, fn(xx).astype(jnp.float32).sum()
                return lax.scan(body, x0, jnp.arange(args.iters))

            jl = jax.jit(loop)
            try:
                _, v = jl(x0, jnp.int32(1))
                _ = float(jax.device_get(v)[-1])
                t0 = time.perf_counter()
                _, v = jl(x0, jnp.int32(2))
                _ = float(jax.device_get(v)[-1])
                dt = (time.perf_counter() - t0) / args.iters
                row[label + "_ms"] = round(dt * 1e3, 4)
                row[label + "_tops"] = round(flops / dt / 1e12, 1)
            except Exception as e:  # noqa: BLE001 — record lowering failures
                row[label + "_error"] = str(e)[:300]
        if "bf16_ms" in row:
            for label in ("xla_conv", "xla_taps", "pallas"):
                if label + "_ms" in row:
                    row[label + "_vs_bf16"] = round(
                        row["bf16_ms"] / row[label + "_ms"], 3)
        print(json.dumps(row), flush=True)
        results.append(row)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
