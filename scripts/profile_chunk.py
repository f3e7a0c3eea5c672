#!/usr/bin/env python
"""Op-level device profile of the headline chunk-scan executable.

The instrument of record for "where the time goes" (round 4). The
scan-prefix decomposition (bench_slices_scan.py) needs six COLD
compiles of model-scale scan graphs and the remote compile service
drops the connection on any compile longer than ~25-35 min
(docs/DEVELOPMENT.md quirk 13), so it has never completed. This
script instead reuses bench.py's EXACT headline construction — same
shapes, same config, so the executable comes from the persistent
compile cache — and wraps one timed dispatch in jax.profiler.trace.
The relay forwards device traces (verified r4): the xplane carries
per-HLO device durations from device counters, which decompose the
production step without a single new compile.

Attribution: each trace event's `long_name` is the full HLO
instruction; ops are bucketed into pipeline slices by name/shape
(convolutions -> model forward, tracker_chunk_pallas/nms_keep_pallas
custom-calls -> tracker/NMS, sort -> decode top-K, the
reverse/convert/reshape chain on [K,H',W',3] tensors -> preprocess,
the XOR/dynamic-slice frame-synthesis fusions -> bench instrument,
rest -> decode/glue). Device durations are authoritative
(device_duration_ps); the traced dispatch's wall time is NOT used.

Writes PROFILE_r04.json at the repo root. Usage:
  python scripts/profile_chunk.py [--out PROFILE_r04.json]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def capture_trace(logdir: str) -> str:
    """Run bench.py's headline loop once under jax.profiler.trace.

    Returns the path of the trace.json.gz that materialized.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    config = PipelineConfig(
        detector=DetectorConfig(
            input_size=640, num_anchors=8400,
            topk_impl=os.environ.get("POSEBYTE_TOPK_IMPL", "sort"),
            gather_impl=os.environ.get("POSEBYTE_GATHER_IMPL", "onehot"),
            decode_fusion=os.environ.get("POSEBYTE_DECODE_FUSION", "post"),
            # default follows the production default (raw ingest ON
            # since r5); POSEBYTE_RAW_PREPROC=0 profiles the float path
            raw_preproc=os.environ.get("POSEBYTE_RAW_PREPROC",
                                       "1") == "1"),
        # POSEBYTE_REID=free|learned profiles the reid-on executable
        # (r5: decomposing the measured 26% reid-on cost)
        tracker=TrackerConfig(
            reid_weight=0.3 if os.environ.get("POSEBYTE_REID") else 0.0,
            reid_sample_impl=os.environ.get("POSEBYTE_REID_SAMPLE",
                                            "auto")),
        model_name="yolov8n-pose",
        precision="bf16",
    )
    reid_params = None
    if os.environ.get("POSEBYTE_REID") == "learned":
        from posebyte_tpu.models.reid_head import load_reid_head
        reid_params = load_reid_head(os.path.join(
            os.path.dirname(__file__), "..", "assets",
            "reid-head-synthetic.safetensors"))
    pipe = PosePipeline(config, reid_params=reid_params)

    rng = np.random.default_rng(42)
    K, H, W = 128, 720, 1280
    n_staged = 4
    staged = [pipe.stage_chunk(rng.integers(0, 255, (K, H, W, 3),
                                            dtype=np.uint8))
              for _ in range(n_staged)]
    for s in staged:
        out = pipe.process_chunk_device(s, H, W)
    jax.block_until_ready(out["emit"])

    n_chunks = 16

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
    t0 = time.perf_counter()
    state, na = bench_jit(pipe.params, pipe.state, bases, jnp.uint8(37))
    _ = int(jax.device_get(na)[-1])
    print(f"warm dispatch (cache hit + first-touch): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    with jax.profiler.trace(logdir):
        state, na = bench_jit(pipe.params, state, bases, jnp.uint8(91))
        _ = int(jax.device_get(na)[-1])
    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise RuntimeError(f"no trace materialized under {logdir}")
    return traces[-1], n_chunks * K


# slice attribution: hlo_category (authoritative, from XLA) for the
# broad buckets, name-based splits for the known hot ops. Checked in
# order.
def classify(name: str, category: str) -> str:
    if name.startswith("while"):
        return "_outer_loop_wrapper"  # contains everything; excluded
    if "tracker_chunk_pallas" in name:
        return "tracker_megakernel"
    if "nms_keep_pallas" in name or "auction" in name:
        return "nms_kernel"
    if category == "sort":
        return "decode_topk_sort"
    if "gather" in name or name.startswith("transpose_gather"):
        return "reid_embed_gathers"   # pose-color / patch sampling
    if name.startswith(("broadcast_xor", "constant_dynamic-slice")):
        return "bench_instrument"
    if category == "convolution fusion":
        return "model_convs"
    if category == "reverse" or name.startswith(
            ("reverse", "slice_convert", "multiply_convert")):
        return "preprocess_content"   # slice+convert+scale+BGR reverse
    if category == "data formatting":
        return "data_formatting"      # flat->shaped u8 retile, copies
    if category in ("copy-start", "copy-done", "async-start",
                    "async-done"):
        return "param_prefetch"
    return "decode_glue_other"


def aggregate(trace_path: str, n_frames: int) -> dict:
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e["name"] == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
            elif e["name"] == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = [p for p, n in pnames.items() if "TPU" in n]
    ops = [e for e in ev
           if e.get("ph") == "X" and e["pid"] in dev_pids
           and tnames.get((e["pid"], e["tid"])) == "XLA Ops"]
    mods = [e for e in ev
            if e.get("ph") == "X" and e["pid"] in dev_pids
            and tnames.get((e["pid"], e["tid"])) == "XLA Modules"]
    module_ms = max((m["dur"] for m in mods), default=0.0) / 1e3

    slices = collections.Counter()
    top_ops = collections.Counter()
    cats = collections.Counter()
    for e in ops:
        s = classify(e["name"], e["args"].get("hlo_category", "?"))
        if s == "_outer_loop_wrapper":
            continue
        slices[s] += e["dur"]
        cats[e["args"].get("hlo_category", "?")] += e["dur"]
        top_ops[e["name"]] += e["dur"]

    def per_frame(us):
        return round(us / 1e3 / n_frames, 5)

    return {
        "n_frames": n_frames,
        "module_total_ms": round(module_ms, 3),
        "module_ms_per_frame": round(module_ms / n_frames, 5),
        "device_fps_implied": round(n_frames / module_ms * 1e3, 1),
        "slices_ms_per_frame": {k: per_frame(v)
                                for k, v in slices.most_common()},
        "hlo_category_ms_per_frame": {k: per_frame(v)
                                      for k, v in cats.most_common()},
        "top_ops_ms_per_frame": {k: per_frame(v)
                                 for k, v in top_ops.most_common(24)},
        "note": ("device_duration from TPU counters; excludes relay/host "
                 "overhead. bench_instrument is the XOR frame synthesis "
                 "(not production work). module total < sum of slices is "
                 "impossible; small gaps are inter-op bubbles."),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PROFILE_r04.json"))
    p.add_argument("--logdir", default="/tmp/jaxprof_chunk")
    p.add_argument("--trace", default=None,
                   help="re-aggregate an existing trace.json.gz "
                        "(assumes the standard 16x128-frame capture) "
                        "instead of capturing a new one")
    args = p.parse_args()
    if args.trace:
        trace_path, n_frames = args.trace, 2048
    else:
        trace_path, n_frames = capture_trace(args.logdir)
    print(f"trace: {trace_path}", flush=True)
    agg = aggregate(trace_path, n_frames)
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=1)
    print(json.dumps(agg, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
