#!/usr/bin/env python
"""Model-forward benchmark across families and precisions on the TPU.

Produces the bf16-vs-int8 rows for docs/BENCHMARKS.md (the analog of
the reference's FP16/INT8 tables, README.md:203-221). Free-running
dispatch loops with a single final sync so the tunnel RPC floor
amortizes away; batch 32 (the detector batch the chunked pipeline
uses after splitting a 128-chunk across decode).

Usage: python scripts/bench_precision.py [-m n,s,m,l,x] [-b 32]
       [--iters 20] [--size 640]
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

GFLOPS = {"n": 9.2, "s": 30.2, "m": 81.0, "l": 168.6, "x": 263.2}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--models", default="n,s,m")
    p.add_argument("-b", "--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--precisions", default="bf16,int8")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from posebyte_tpu.models import build_model_heads
    from posebyte_tpu.models.quant import conv_paths, quantize_params

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (args.batch, args.size, args.size,
                                       3)).astype(np.float32))
    x = jax.device_put(x)
    jax.block_until_ready(x)

    rows = []
    for size in args.models.split(","):
        name = f"yolov8{size}-pose"
        heads_fn, init_fn = build_model_heads(name, jnp.bfloat16)
        params = init_fn(jax.random.PRNGKey(0))
        variants = {}
        if "bf16" in args.precisions:
            variants["bf16"] = params
        if "int8" in args.precisions:
            # fixed act_scales: numerically arbitrary but perf-identical
            # to calibrated ones (calibration quality is covered by
            # tests/test_accuracy_loop.py); avoids eager calibration
            # passes, which are pathological through the TPU relay
            q = quantize_params(params)
            for node in conv_paths(q).values():
                if "scale" in node:
                    node["act_scale"] = jnp.asarray(0.05, jnp.float32)
            variants["int8"] = q

        times = {}
        for prec, pv in variants.items():
            fn = jax.jit(heads_fn)
            out = fn(pv, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(pv, x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            ms_frame = dt * 1e3 / args.batch
            fps = args.batch / dt
            tflops = GFLOPS[size] / ms_frame
            times[prec] = ms_frame
            rows.append({"model": name, "precision": prec,
                         "ms_per_frame": round(ms_frame, 4),
                         "fps": round(fps, 1),
                         "eff_tflops": round(tflops, 1)})
            print(f"{name:14s} {prec:5s} {ms_frame:8.4f} ms/frame "
                  f"{fps:8.1f} fps  {tflops:6.1f} TFLOP/s-effective",
                  flush=True)
        if "bf16" in times and "int8" in times:
            gain = times["bf16"] / times["int8"] - 1.0
            print(f"{name:14s} int8 vs bf16: {gain:+.1%}", flush=True)

    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
