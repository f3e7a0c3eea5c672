#!/usr/bin/env python
"""A/B the per-frame StreamServer executable vs the letterbox lowering
at batch = n_streams.

The strided-slice letterbox lowering loses at batch 1 (4.00 vs 1.64 ms
fused step, BENCH_FRAME_EXEC_AB_r03.json) and wins at chunk 128; the
per-frame multi-stream server sits between (vmap over n_streams frames
per dispatch). This probe times the server's jitted step executable
directly — staged device inputs, free-running dispatch loop threading
the states carry, one final value fetch, min over reps — with the
selection lowering active (default) or force-disabled (--dense, which
monkeypatches the selection detector before the server traces, exactly
the non-decimating-geometry path; bit-identical outputs).

Run each leg as its OWN process (jit caches contaminate in-process
A/Bs): --leg fast, then --leg dense.

Usage: python scripts/bench_serving_letterbox_ab.py --leg fast|dense
           [--streams 8] [--iters 256]
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
    p.add_argument("--leg", choices=["fast", "dense"], required=True)
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--iters", type=int, default=256)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--gather", choices=["onehot", "index"],
                   default="onehot",
                   help="decode gather_impl (ADVICE r3: validate the "
                        "onehot default at the 8-stream serving shape; "
                        "one process per value). NOTE: production "
                        "_single_stream_step forces the dense letterbox "
                        "(selection=False) since r3, so --leg fast IS "
                        "the production lowering here.")
    p.add_argument("--raw", type=int, default=None, choices=[0, 1],
                   help="DetectorConfig.raw_preproc: stem-folded raw "
                        "BGR u8 ingest (r5). Default: the config "
                        "default. One process per value.")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from posebyte_tpu.ops import preprocess
    if args.leg == "dense":
        preprocess._selection_strides.cache_clear()
        preprocess._selection_strides = lambda *a: None

    from posebyte_tpu.core.config import DetectorConfig, PipelineConfig
    from posebyte_tpu.pipeline.serving import StreamServer

    H, W, N = 720, 1280, args.streams
    det_kw = {}
    if args.raw is not None:
        det_kw["raw_preproc"] = bool(args.raw)
    srv = StreamServer(num_streams=N, frame_shape=(H, W),
                       config=PipelineConfig(detector=DetectorConfig(
                           gather_impl=args.gather, **det_kw)))

    rng = np.random.default_rng(11)
    # 4 staged input banks (distinct content so the relay can't memoize
    # a (executable, buffers) pairing across the whole loop; the states
    # carry threads genuine freshness through every call anyway)
    banks = [jax.device_put(
        jnp.asarray(rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)),
        srv._frame_sharding) for _ in range(4)]
    adv = jax.device_put(jnp.ones((N,), bool), srv._frame_sharding)
    rst = jax.device_put(jnp.zeros((N,), bool), srv._frame_sharding)
    jax.block_until_ready((banks, adv, rst))

    states = srv.states
    # compile + warm (also absorbs per-(executable, bank) pairings)
    for b in banks:
        states, out = srv._step(srv.params, states, b, adv, rst)
    _ = int(jax.device_get(out["num_active"][0]))

    best = 1e30
    for _rep in range(args.reps):
        t0 = time.perf_counter()
        for i in range(args.iters):
            states, out = srv._step(srv.params, states,
                                    banks[i % 4], adv, rst)
        _ = int(jax.device_get(out["num_active"][0]))
        best = min(best, (time.perf_counter() - t0) * 1e3 / args.iters)

    print(json.dumps({
        f"serving_step_ms_{args.leg}": round(best, 3),
        "gather_impl": args.gather,
        "raw_preproc": srv.config.detector.raw_preproc,
        "streams": N, "iters": args.iters,
        "per_stream_frame_ms": round(best / N, 4),
        "fps_per_stream": round(1e3 / best, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
