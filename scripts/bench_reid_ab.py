#!/usr/bin/env python
"""Re-ID cost at the HEADLINE shape (r5 VERDICT item 2).

Every previous headline/serving artifact ran reid_weight=0.0, so the
in-kernel Re-ID planes and the embed fn had never executed in a timed
TPU run while the docs claimed they "cost nothing". This probe runs
the exact bench.py chunk-128 scan loop (in-graph varied inputs, value
fetch, min over reps — docs/DEVELOPMENT.md quirks) with:

  off      reid_weight 0.0 (production default; control)
  free     reid_weight 0.3, training-free pose-color descriptor
  learned  reid_weight 0.3, trained MLP head (assets/reid-head-synthetic.*)

One leg per process (jit caches contaminate in-process A/Bs):
  python scripts/bench_reid_ab.py --leg off|free|learned [--raw 0|1]
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
    p.add_argument("--leg", choices=["off", "free", "learned"],
                   required=True)
    p.add_argument("--sample-impl",
                   choices=["auto", "direct", "block"],
                   default="auto",
                   help="embedding image-sampling lowering "
                        "(TrackerConfig.reid_sample_impl)")
    p.add_argument("--raw", type=int, default=None, choices=[0, 1])
    p.add_argument("--chunks", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    det_kw = {}
    if args.raw is not None:
        det_kw["raw_preproc"] = bool(args.raw)
    trk = TrackerConfig() if args.leg == "off" \
        else TrackerConfig(reid_weight=0.3,
                           reid_sample_impl=args.sample_impl)
    config = PipelineConfig(detector=DetectorConfig(**det_kw),
                            tracker=trk, model_name="yolov8n-pose",
                            precision="bf16")
    reid_params = None
    if args.leg == "learned":
        from posebyte_tpu.models.reid_head import load_reid_head
        reid_params = load_reid_head(os.path.join(
            os.path.dirname(__file__), "..", "assets",
            "reid-head-synthetic.safetensors"))
    pipe = PosePipeline(config, reid_params=reid_params)

    rng = np.random.default_rng(17)
    K, H, W = 128, 720, 1280
    n_staged = 4
    staged = [pipe.stage_chunk(rng.integers(0, 255, (K, H, W, 3),
                                            dtype=np.uint8))
              for _ in range(n_staged)]
    for s in staged:
        out = pipe.process_chunk_device(s, H, W)
    jax.block_until_ready(out["emit"])

    n_chunks = args.chunks

    def bench_loop(params, state, bases, salt):
        body_fn = pipe.chunk_body(K, H, W)

        def body(state, i):
            f = lax.dynamic_index_in_dim(bases, i % n_staged, 0,
                                         keepdims=False)
            f = jnp.bitwise_xor(f, (i + salt).astype(jnp.uint8))
            state, outs = body_fn(params, state, f)
            return state, outs["num_active"][-1]

        return lax.scan(body, state, jnp.arange(n_chunks))

    bench_jit = jax.jit(bench_loop, donate_argnums=(1,))
    bases = jnp.stack(staged)
    salt = int(rng.integers(0, 200))
    state, na = bench_jit(pipe.params, pipe.state, bases, jnp.uint8(salt))
    _ = int(jax.device_get(na)[-1])
    best = 1e30
    for rep in range(1, args.reps + 1):
        t0 = time.perf_counter()
        state, na = bench_jit(pipe.params, state, bases,
                              jnp.uint8(salt + rep))
        _ = int(jax.device_get(na)[-1])
        best = min(best, time.perf_counter() - t0)
    n_frames = n_chunks * K
    print(json.dumps({
        f"fps_{args.leg}": round(n_frames / best, 1),
        "ms_per_frame": round(best / n_frames * 1e3, 4),
        "sample_impl": args.sample_impl,
        "reid_weight": trk.reid_weight,
        "raw_preproc": config.detector.raw_preproc,
        "chunk": K, "frames": n_frames,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
