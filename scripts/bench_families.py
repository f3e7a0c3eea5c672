#!/usr/bin/env python
"""End-to-end tracked FPS per model family on the TPU (BENCHMARKS.md
main-table rows), with the fused tracker chunk kernel.

Same relay-proof methodology as bench.py: the chunk loop runs as ONE
scan executable (chunks derived in-graph, state threaded), timed as a
single dispatch + value fetch.

Usage: python scripts/bench_families.py [-m n,s,m,l,x] [-k 64]
       python scripts/bench_families.py -m all --precisions bf16,int8 \
           --artifact BENCH_FAMILIES_r03.json   # the one-blob artifact
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

ALL_FAMILIES = ["yolov8n-pose", "yolov8s-pose", "yolov8m-pose",
                "yolov8l-pose", "yolov8x-pose", "yolo11n-pose",
                "yolo11s-pose", "yolo11m-pose", "yolo11l-pose",
                "yolo11x-pose"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--models", default="s,m",
                   help="comma list of sizes/names, or 'all' for every "
                        "v8+v11 family")
    p.add_argument("-k", "--chunk", type=int, default=128)
    p.add_argument("--n-chunks", type=int, default=8)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "int8"])
    p.add_argument("--precisions", default="",
                   help="comma list overriding --precision (runs each)")
    p.add_argument("--artifact", default="",
                   help="write all rows to this JSON file (the "
                        "regression-visible blob BENCHMARKS.md cites)")
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
    if args.models == "all":
        names = ALL_FAMILIES
    else:
        names = [f"yolov8{s}-pose" if len(s) == 1 else s
                 for s in args.models.split(",")]
    precisions = (args.precisions.split(",") if args.precisions
                  else [args.precision])
    rows = []
    for name, precision in [(n, pr) for n in names for pr in precisions]:
        config = PipelineConfig(
            detector=DetectorConfig(
                input_size=640, num_anchors=8400,
                topk_impl=os.environ.get("POSEBYTE_TOPK_IMPL",
                                         "sort"),
                gather_impl=os.environ.get("POSEBYTE_GATHER_IMPL",
                                           "onehot")),
            tracker=TrackerConfig(), model_name=name,
            precision=precision)
        pipe = PosePipeline(config)
        if precision == "int8":
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
        rows.append({"model": name, "precision": precision,
                     "fps": round(fps, 1),
                     "ms_per_frame": round(1e3 * dt / (n_chunks * K), 4),
                     "vs_ref": round(fps / ref, 2) if ref else None})
        print(f"{name:14s} {precision:5s} {fps:8.1f} fps  "
              f"{1e3 * dt / (n_chunks * K):7.4f} ms/frame"
              + (f"  {fps / ref:5.2f}x ref" if ref else ""), flush=True)
        del pipe
    print(json.dumps(rows))
    if args.artifact:
        import jax as _jax
        blob = {"metric": "e2e_tracked_fps_640", "chunk": K,
                "n_chunks": n_chunks, "frame_geometry": [H, W],
                "device": str(_jax.devices()[0]), "rows": rows,
                "ref_fps_fp16": REF_FPS,
                "note": "one scan executable per row, chunks derived "
                        "in-graph, state threaded, single value-fetch "
                        "timing (relay-proof; see bench.py)"}
        with open(args.artifact, "w") as f:
            json.dump(blob, f, indent=1)
        print(f"wrote {args.artifact}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
