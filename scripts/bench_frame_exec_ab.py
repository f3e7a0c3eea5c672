#!/usr/bin/env python
"""A/B the single-frame executable vs the letterbox lowering.

p50_frame_exec_ms regressed 1.62 -> ~4.0 between BENCH runs that
bracket commit 4701d51 (letterbox strided-slice fast path) while the
chunk-128 headline IMPROVED 3506 -> 3719+. This probe times the exact
bench.py leg-4 pattern (free-running single-frame steps over a 4-buffer
device-resident ring, one final value fetch; docs/DEVELOPMENT.md
quirks) twice in separate jit universes:

  A: production letterbox (strided-slice fast path active at 720p->640)
  B: fast path force-disabled (dense interpolation matmuls, the r2 path)

If B ~1.6 ms and A ~4.0 ms, the strided slice is a batch-1 pessimization
(it wins at chunk 128) and the single-frame pipeline should gate on
batch; if both are ~4.0, the regression is elsewhere (or the relay's
post-outage behavior changed) and the fast path is innocent.

RESOLVED (r3): measured A=4.001 / B=1.641 — the strided slice IS the
batch-1 pessimization. runner._make_step and engine._native_fn now pass
selection=False; with the fix the production "fast" leg re-measures
1.629 ms. The chunk path keeps the selection lowering (where it wins).

r4 (ADVICE): ONE PROCESS PER LEG — in-process jit caches contaminate
A/Bs (see bench_serving_letterbox_ab.py), so the old --leg both was
dropped. The "selection" leg re-enables the strided-slice lowering via
the supported POSEBYTE_DEBUG_BATCH1_SELECTION=1 hook
(ops.preprocess.batch1_selection_override) instead of monkeypatching a
detector the production path no longer consults.

Usage (run each in its own process):
  python scripts/bench_frame_exec_ab.py --leg production [--iters 64]
  python scripts/bench_frame_exec_ab.py --leg selection  [--iters 64]
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


def measure(pipe, rng, np, jax, iters, H, W):
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    pipe.process_frame(frame, block=True)     # compile + warm
    ring = [jax.device_put(
        np.ascontiguousarray(rng.integers(0, 255, (H, W, 3),
                                          dtype=np.uint8)).reshape(-1))
        for _ in range(4)]
    jax.block_until_ready(ring)
    best = 1e30
    for _rep in range(3):
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = pipe.process_frame_device(ring[i % 4], H, W)
        _ = int(jax.device_get(last["num_active"]))
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--leg", choices=["production", "selection"],
                   default="production",
                   help="production = shipped dense-matmul batch-1 "
                        "letterbox; selection = strided-slice lowering "
                        "re-enabled via the debug env hook. Run ONE "
                        "leg per process.")
    p.add_argument("--gather", choices=["onehot", "index"],
                   default="onehot",
                   help="decode gather_impl for this leg (ADVICE r3: "
                        "the onehot default was validated only at "
                        "chunk 128; A/B it at batch 1 here, one "
                        "process per value)")
    p.add_argument("--topk", choices=["sort", "bisect", "approx"],
                   default="sort")
    p.add_argument("--raw", type=int, default=None, choices=[0, 1],
                   help="DetectorConfig.raw_preproc: stem-folded raw "
                        "BGR u8 ingest (r5). Default: the config "
                        "default. One process per value.")
    p.add_argument("--fusion", choices=["post", "tail"], default="post",
                   help="decode_fusion placement (r4 VERDICT item 4): "
                        "post = select after level concat; tail = "
                        "per-level top-K fused into the model tail "
                        "(ops/decode.py::decode_topk_levels). One "
                        "process per value.")
    args = p.parse_args()

    if args.leg == "selection":
        os.environ["POSEBYTE_DEBUG_BATCH1_SELECTION"] = "1"

    import jax
    import numpy as np
    from posebyte_tpu.core.config import DetectorConfig, PipelineConfig
    from posebyte_tpu.pipeline import PosePipeline

    H, W = 720, 1280
    rng = np.random.default_rng(7)
    det_kw = {}
    if args.raw is not None:
        det_kw["raw_preproc"] = bool(args.raw)
    cfg = PipelineConfig(detector=DetectorConfig(
        gather_impl=args.gather, topk_impl=args.topk,
        decode_fusion=args.fusion, **det_kw))
    pipe = PosePipeline(cfg)
    rows = {f"frame_exec_ms_{args.leg}": round(
        measure(pipe, rng, np, jax, args.iters, H, W), 3),
        "gather_impl": args.gather, "topk_impl": args.topk,
        "decode_fusion": args.fusion,
        "raw_preproc": cfg.detector.raw_preproc}
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
