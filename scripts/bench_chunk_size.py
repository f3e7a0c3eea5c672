#!/usr/bin/env python
"""Headline-throughput probe at alternative chunk sizes.

The headline (bench.py) runs 128-frame chunks. This probe times the
same one-scan-executable pattern (in-graph XOR-varied chunks, threaded
donated state, single device_get value fetch; docs/DEVELOPMENT.md
quirks) at a caller-chosen K, to test whether a bigger dispatch
amortizes per-chunk overhead into more FPS or hits a VMEM/HBM knee.

Usage: python scripts/bench_chunk_size.py -k 256 [--chunks 8]
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
    p.add_argument("-k", "--chunk", type=int, default=256)
    p.add_argument("--chunks", type=int, default=8,
                   help="scan length (chunks per timed dispatch)")
    p.add_argument("--staged", type=int, default=2)
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from posebyte_tpu.core.config import PipelineConfig
    from posebyte_tpu.pipeline import PosePipeline

    K, H, W = args.chunk, 720, 1280
    pipe = PosePipeline(PipelineConfig())
    rng = np.random.default_rng(5)

    t0 = time.perf_counter()
    staged = [pipe.stage_chunk(rng.integers(0, 255, (K, H, W, 3),
                                            dtype=np.uint8))
              for _ in range(args.staged)]
    print(f"staged {args.staged}x{K} frames in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    for s in staged:
        out = pipe.process_chunk_device(s, H, W)
    jax.block_until_ready(out["emit"])

    n_staged, n_chunks = args.staged, args.chunks

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
    salt = int(np.random.randint(0, 200))
    t0 = time.perf_counter()
    state, na = bench_jit(pipe.params, pipe.state, bases,
                          jnp.uint8(salt))       # compile + warm
    _ = int(jax.device_get(na)[-1])
    print(f"compile+warm {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    best_fps = 0.0
    for rep in range(args.reps):
        t0 = time.perf_counter()
        state, na = bench_jit(pipe.params, state, bases,
                              jnp.uint8(salt + 1 + rep))
        _ = int(jax.device_get(na)[-1])
        total = time.perf_counter() - t0
        best_fps = max(best_fps, n_chunks * K / total)

    print(json.dumps({
        "chunk": K, "frames": n_chunks * K,
        "fps": round(best_fps, 1),
        "ms_per_frame": round(1e3 / best_fps, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
