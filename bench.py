#!/usr/bin/env python
"""PoseBYTE-TPU headline benchmark.

Measures end-to-end tracked FPS at 640x640 with yolov8n-pose — the
reference's headline number (420 FPS FP16 on RTX 3080 Ti Laptop,
reference README.md:205; BASELINE.md) — on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/420, ...}

The measured loop is the full production path: letterbox -> yolov8n-pose
forward (bf16, batched over a 32-frame chunk) -> decode -> OKS pose-NMS
-> 8-stage tracker recurrence (lax.scan) -> device-side output assembly,
with the tracker state threaded (donated) between chunks. Frames are
pre-staged into device buffers, mirroring the reference's preallocated
pinned staging buffers (gpu_tracker.cu:977-980); on this measurement
host, ingest of *new* host buffers into a large executable goes through
a slow relay path that is an artifact of the tunneled-TPU setup, so the
steady-state loop cycles staged buffers (distinct content per chunk).
Synthetic weights + synthetic frames (perf is weight-independent).
"""
import json
import os
import time

import numpy as np

# Persistent XLA compile cache: first run pays compilation (~minutes on
# a remote-compile host), reruns start hot.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

BASELINE_FPS = 420.0   # reference README.md:205 (yolov8n-pose FP16 e2e)


def main():
    import jax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    config = PipelineConfig(
        detector=DetectorConfig(
            input_size=640, num_anchors=8400,
            # A/B knobs for the decode lowering (ops/topk.py,
            # ops/decode.py): sort|bisect|approx and index|onehot.
            topk_impl=os.environ.get("POSEBYTE_TOPK_IMPL", "sort"),
            gather_impl=os.environ.get("POSEBYTE_GATHER_IMPL", "onehot"),
            decode_fusion=os.environ.get("POSEBYTE_DECODE_FUSION",
                                         "post"),
            raw_preproc=os.environ.get(
                "POSEBYTE_RAW_PREPROC",
                "1") == "1"),   # r5 default: GO, BENCH_RAW_AB_r05
        tracker=TrackerConfig(),
        model_name="yolov8n-pose",
        precision="bf16",
    )
    # Explicit params (same seed-0 init PosePipeline would generate):
    # the int8 leg below must quantize the UNFOLDED form — each
    # pipeline applies the raw-ingest stem fold itself at construction
    # when raw_preproc is on, so handing it pipe.params (already
    # folded) would double-fold.
    import jax.numpy as _jnp
    from posebyte_tpu.models import build_model
    _, _init_fn = build_model(config.model_name, _jnp.bfloat16)
    params0 = _init_fn(jax.random.PRNGKey(0))
    pipe = PosePipeline(config, params=params0)

    rng = np.random.default_rng(42)
    K, H, W = 128, 720, 1280
    n_staged = 4

    # Stage distinct-content chunks on device and warm each through the
    # executable once (compile + first-touch ingest are off the timed
    # region, like any engine warmup).
    staged = [pipe.stage_chunk(rng.integers(0, 255, (K, H, W, 3),
                                            dtype=np.uint8))
              for _ in range(n_staged)]
    for s in staged:
        out = pipe.process_chunk_device(s, H, W)
    jax.block_until_ready(out["emit"])

    # Throughput: the steady-state chunk loop runs as ONE executable —
    # a lax.scan over n_chunks, each chunk derived IN-GRAPH from a
    # staged base XOR (loop index + per-run salt), tracker state
    # threaded through the scan. Rationale (docs/DEVELOPMENT.md quirks,
    # all verified this round): the relay (a) memoizes repeated
    # (executable, buffers) dispatches, (b) runs a multi-second slow
    # path for each never-seen input buffer, and (c) sometimes returns
    # early from block_until_ready on device-lineage buffers — so any
    # host-side dispatch loop either measures nothing or measures relay
    # pathology. One dispatch + one device_get value fetch (which must
    # materialize real bytes) sidesteps all three; the per-run salt
    # defeats cross-run whole-executable memoization.
    import jax.numpy as jnp
    from jax import lax
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
    salt = np.random.randint(0, 200)
    state, na = bench_jit(pipe.params, pipe.state, bases,
                          jnp.uint8(salt))        # compile + warm
    _ = int(jax.device_get(na)[-1])
    pipe.state = state
    # min over 3 timed reps (distinct salts -> distinct traffic, so the
    # relay can't memoize across reps): the relay intermittently
    # degrades for minutes at a time (multi-second fetch stalls were
    # observed mid-r4 inflating this leg 4x); min-over-reps is the same
    # defense the frame_exec leg below has always used.
    total = 1e30
    for rep in range(1, 4):
        t_start = time.perf_counter()
        pipe.state, na = bench_jit(pipe.params, pipe.state, bases,
                                   jnp.uint8(salt + rep))
        _ = int(jax.device_get(na)[-1])
        total = min(total, time.perf_counter() - t_start)
    n_frames = n_chunks * K
    fps = n_frames / total

    # -- Per-frame latency, four views ------------------------------------
    # On this measurement host the TPU sits behind a relay tunnel whose
    # RPC round trip is ~28 ms; ANY synchronous block_until_ready pays it
    # (sync_floor_ms measures it directly with a trivial kernel). The
    # pipelined cadence — the number comparable to the reference's
    # 2.32 ms/frame one-sync-per-frame loop (README.md:205) — hides the
    # floor the same way the reference hides PCIe: by keeping frames in
    # flight.
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    pipe.process_frame(frame, block=True)     # compile + warm

    def p50(ts):
        return round(float(np.percentile(np.asarray(ts), 50)), 3)

    # (1) sync floor: trivial jit roundtrip (host artifact, not pipeline)
    tiny = jax.jit(lambda x: x + 1)
    z = np.zeros((4,), np.float32)
    tiny(z).block_until_ready()
    floor = []
    for _ in range(10):
        t0 = time.perf_counter()
        tiny(z).block_until_ready()
        floor.append((time.perf_counter() - t0) * 1e3)

    # (1b) single quiesced H2D of one 2.7MB frame — measured while the
    # relay queue is quiet (ingest itself is cheap; queued transfers
    # congest it and it recovers slowly, so take min over probes)
    h2d = []
    for i in range(8):
        time.sleep(0.3)
        f2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8).reshape(-1)
        t0 = time.perf_counter()
        jax.device_put(f2).block_until_ready()
        h2d.append((time.perf_counter() - t0) * 1e3)

    # (2) fully synchronous fresh-host-buffer per-frame (worst case)
    lat_stream = []
    for i in range(10):
        f2 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        pipe.process_frame(f2, block=True)
        lat_stream.append((time.perf_counter() - t0) * 1e3)

    # (3) synchronous device-resident per-frame
    dflat = jax.device_put(np.ascontiguousarray(frame).reshape(-1))
    dflat.block_until_ready()
    lat_res = []
    for _ in range(10):
        t0 = time.perf_counter()
        pipe.process_frame_device(dflat, H, W, block=True)
        lat_res.append((time.perf_counter() - t0) * 1e3)

    # (4) per-frame executable time: free-running single-frame steps on
    # a small ring of device-resident frames (distinct content), timing
    # ended by a value fetch. (A scan formulation would dodge the relay
    # entirely but puts the conv net inside a loop body — quirk 5's
    # ~40x-slower compilation — so this one stays a host loop; the
    # single-frame executable has never shown the chunk loop's memo /
    # slow-path pathology.) This is the per-frame compute cost a
    # non-tunneled deployment pays (plus its own sub-ms H2D + sync).
    ring = [jax.device_put(
        np.ascontiguousarray(rng.integers(0, 255, (H, W, 3),
                                          dtype=np.uint8)).reshape(-1))
        for _ in range(4)]
    jax.block_until_ready(ring)
    # min over 3 passes: the FIRST pass pays the per-(executable,
    # buffer) first-pairing slow path for each ring buffer (quirk 2) —
    # one 64-iter pass measured 2.3 ms/frame where the steady state is
    # 1.63 (BENCH_FRAME_EXEC_AB_r03.json uses the same min-of-reps).
    n_exec = 64
    exec_ms = 1e30
    for _rep in range(3):
        t0 = time.perf_counter()
        last = None
        for i in range(n_exec):
            last = pipe.process_frame_device(ring[i % 4], H, W)
        _ = int(jax.device_get(last["num_active"]))
        exec_ms = min(exec_ms,
                      (time.perf_counter() - t0) * 1e3 / n_exec)

    # (5) SUSTAINED bulk H2D bandwidth (VERDICT r2 item 2a): stage
    # several whole chunks back-to-back and time first-put ->
    # all-complete; the relay floor amortizes over ~350 MB per put.
    # ingest_bound_fps = that bandwidth / one frame. Runs AFTER the
    # latency probes — bulk puts congest the relay and it recovers
    # slowly (DEVELOPMENT.md quirk 9), so these legs must not precede
    # any timing-sensitive measurement.
    bulk_np = [np.ascontiguousarray(
        rng.integers(0, 255, (K, H * W * 3), dtype=np.uint8))
        for _ in range(4)]
    warm = jax.device_put(bulk_np[0])           # connection warm-up
    warm.block_until_ready()
    del warm
    t0 = time.perf_counter()
    handles = [jax.device_put(b) for b in bulk_np]
    jax.block_until_ready(handles)
    bulk_s = time.perf_counter() - t0
    bulk_bytes = sum(b.nbytes for b in bulk_np)
    h2d_gbps = bulk_bytes / bulk_s / 1e9
    frame_bytes = H * W * 3
    ingest_bound_fps = bulk_bytes / frame_bytes / bulk_s
    del handles, bulk_np

    # (6) process_stream end-to-end (VERDICT r2 item 2b): the
    # production depth-pipelined ingest loop over 512 FRESH host frames
    # (new buffers, distinct content), H2D overlapping compute with
    # backpressure. On this host each 2.7 MB put rides the ~35 MB/s
    # relay link and every yield pays the RPC floor, so the result is
    # ingest/floor-dominated (quantified in the note); a
    # direct-attached deployment pays GB/s DMA + sub-ms syncs instead.
    n_stream = 512
    base_frames = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                   for _ in range(16)]

    def fresh_frames():
        for i in range(n_stream):
            yield np.bitwise_xor(base_frames[i % 16], np.uint8(i & 0xFF))

    # warm the (H, W) single-frame executable path
    for _ in pipe.process_stream(iter(base_frames[:2]), sync_depth=2):
        pass
    t0 = time.perf_counter()
    n_yield = 0
    for out in pipe.process_stream(fresh_frames(), sync_depth=4):
        n_yield += 1
    stream_s = time.perf_counter() - t0
    stream_fps = n_yield / stream_s


    # -- INT8 leg: same chunk loop with a w8a8-quantized engine --------
    # (act_scale values don't affect throughput; calibration quality is
    # covered by tests/test_accuracy_loop.py's agreement metric)
    int8_fields = {}
    try:
        import jax.numpy as jnp
        from posebyte_tpu.models.quant import conv_paths, quantize_params
        qparams = quantize_params(params0)   # unfolded; qpipe folds
        for node in conv_paths(qparams).values():
            if "scale" in node:
                node["act_scale"] = jnp.asarray(0.05, jnp.float32)
        qconfig = PipelineConfig(
            detector=config.detector, tracker=config.tracker,
            model_name=config.model_name, precision="int8")
        qpipe = PosePipeline(qconfig, params=qparams)

        def qbench_loop(params, state, bases, salt):
            body_fn = qpipe.chunk_body(K, H, W)

            def body(state, i):
                f = lax.dynamic_index_in_dim(bases, i % n_staged, 0,
                                             keepdims=False)
                f = jnp.bitwise_xor(f, (i + salt).astype(jnp.uint8))
                state, outs = body_fn(params, state, f)
                return state, outs["num_active"][-1]

            return lax.scan(body, state, jnp.arange(n_chunks))

        qbench_jit = jax.jit(qbench_loop, donate_argnums=(1,))
        qstate, qna = qbench_jit(qpipe.params, qpipe.state, bases,
                                 jnp.uint8(salt + 31))   # compile+warm
        _ = int(jax.device_get(qna)[-1])
        qtotal = 1e30                    # min over 2 reps (see above)
        for rep in range(32, 34):
            t0 = time.perf_counter()
            qstate, qna = qbench_jit(qpipe.params, qstate, bases,
                                     jnp.uint8(salt + rep))
            _ = int(jax.device_get(qna)[-1])
            qtotal = min(qtotal, time.perf_counter() - t0)
        int8_fps = n_frames / qtotal
        int8_fields = {
            "int8_fps": round(float(int8_fps), 2),
            "int8_vs_bf16": round(float(int8_fps / fps), 4),
            "int8_note": ("act_scales synthetic (uniform 0.05), "
                          "throughput-only; accuracy-calibrated int8 is "
                          "covered by tests/test_trained_pixels.py"),
        }
    except Exception as e:   # int8 leg must not kill the headline
        int8_fields = {"int8_error": f"{type(e).__name__}: {e}"[:120]}

    result = {
        "metric": "e2e_tracked_fps_yolov8n_640",
        "value": round(float(fps), 2),
        "unit": "fps",
        "vs_baseline": round(float(fps / BASELINE_FPS), 4),
        **int8_fields,
        "p50_frame_exec_ms": round(exec_ms, 3),
        "h2d_GBps": round(float(h2d_gbps), 3),
        "ingest_bound_fps": round(float(ingest_bound_fps), 1),
        "stream_pipelined_fps": round(float(stream_fps), 1),
        "stream_frames": n_yield,
        "h2d_min_ms": round(float(np.min(h2d)), 3),
        "p50_stream_ms": p50(lat_stream),
        "p50_resident_ms": p50(lat_res),
        "sync_floor_ms": p50(floor),
        "frames": n_frames,
        "chunk": K,
        "note": (f"steady-state {K}-frame chunks, staged device buffers. "
                 "Per-frame streaming decomposition: frame_exec_ms = "
                 "free-running single-frame step (the compute a real "
                 "deployment pays, ref contract 2.32ms); h2d_GBps = "
                 "sustained bulk staging bandwidth (4x ~350MB puts), "
                 "ingest_bound_fps = h2d_GBps / one 2.7MB 720p frame — "
                 "the honest ingest ceiling ON THIS HOST, where the "
                 "relay tunnel caps H2D at ~0.04 GB/s (same ~35MB/s "
                 "whether one 2.7MB frame or a 350MB chunk — a tunnel "
                 "artifact; direct-attached v5e ingest is GB/s DMA, "
                 "under which the chunk loop remains compute-bound); "
                 "stream_pipelined_fps = process_stream over 512 fresh "
                 "host frames, bounded by that same link (2.7MB/frame "
                 "over ~35MB/s -> ~13fps) plus the per-yield RPC floor "
                 "(sync_floor_ms); h2d_min_ms = one quiesced 2.7MB "
                 "frame put; any synchronous block adds the floor -> "
                 "stream/resident p50s likewise"),
        "device": str(jax.devices()[0]),
        "precision": "bf16",
        "topk_impl": config.detector.topk_impl,
        "gather_impl": config.detector.gather_impl,
        "decode_fusion": config.detector.decode_fusion,
        "raw_preproc": config.detector.raw_preproc,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
