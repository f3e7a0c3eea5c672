#!/usr/bin/env python
"""End-to-end tracked FPS per model family on the TPU (BENCHMARKS.md
main-table rows), with the fused tracker chunk kernel.

Same relay-proof methodology as bench.py: the chunk loop runs as ONE
scan executable (chunks derived in-graph, state threaded), timed as a
single dispatch + value fetch.

Usage: python scripts/bench_families.py [-m n,s,m,l,x] [-k 64]
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

REF_FPS = {"yolov8n-pose": 420, "yolov8s-pose": 327, "yolov8m-pose": 196,
           "yolov8l-pose": 136, "yolov8x-pose": 84,
           "yolo11n-pose": None, "yolo11x-pose": None}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--models", default="s,m")
    p.add_argument("-k", "--chunk", type=int, default=128)
    p.add_argument("--n-chunks", type=int, default=8)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "int8"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    K, H, W = args.chunk, 720, 1280
    n_chunks = args.n_chunks
    rng = np.random.default_rng(42)
    rows = []
    for size in args.models.split(","):
        name = f"yolov8{size}-pose" if len(size) == 1 else size
        config = PipelineConfig(
            detector=DetectorConfig(input_size=640, num_anchors=8400),
            tracker=TrackerConfig(), model_name=name,
            precision=args.precision)
        pipe = PosePipeline(config)
        if args.precision == "int8":
            # fixed act_scales: perf-identical to calibrated ones
            from posebyte_tpu.models.quant import (conv_paths,
                                                   quantize_params)
            q = quantize_params(pipe.params)
            for node in conv_paths(q).values():
                if "scale" in node:
                    node["act_scale"] = jnp.asarray(0.05, jnp.float32)
            pipe.params = q
        bases = jnp.stack([pipe.stage_chunk(
            rng.integers(0, 255, (K, H, W, 3), dtype=np.uint8))
            for _ in range(2)])
        jax.block_until_ready(bases)
        body_fn = pipe.chunk_body(K, H, W)

        def bench_loop(params, state, bases, salt):
            def body(state, i):
                f = lax.dynamic_index_in_dim(bases, i % 2, 0,
                                             keepdims=False)
                f = jnp.bitwise_xor(f, (i + salt).astype(jnp.uint8))
                state, outs = body_fn(params, state, f)
                return state, outs["num_active"][-1]
            return lax.scan(body, state, jnp.arange(n_chunks))

        bj = jax.jit(bench_loop, donate_argnums=(1,))
        salt = int(np.random.randint(0, 200))
        st, na = bj(pipe.params, pipe.state, bases, jnp.uint8(salt))
        _ = int(jax.device_get(na)[-1])
        t0 = time.perf_counter()
        _, na = bj(pipe.params, st, bases, jnp.uint8(salt + 1))
        _ = int(jax.device_get(na)[-1])
        dt = time.perf_counter() - t0
        fps = n_chunks * K / dt
        ref = REF_FPS.get(name)
        rows.append({"model": name, "fps": round(fps, 1),
                     "ms_per_frame": round(1e3 * dt / (n_chunks * K), 4),
                     "vs_ref": round(fps / ref, 2) if ref else None})
        print(f"{name:14s} {fps:8.1f} fps  "
              f"{1e3 * dt / (n_chunks * K):7.4f} ms/frame"
              + (f"  {fps / ref:5.2f}x ref" if ref else ""), flush=True)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
