#!/usr/bin/env python
"""Chunk-step MFU decomposition on the TPU (VERDICT r1 item 5).

Times each slice of the 128-frame chunk step separately — letterbox,
model forward, decode+NMS, tracker scan — plus the fused whole, with
free-running dispatch loops (single final sync) so the tunnel RPC
floor amortizes. Prints per-frame ms and the implied share of the
fused step, identifying where the non-MXU time goes.

Usage: python scripts/bench_stages.py [-k 128] [--iters 10]
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
    p.add_argument("-k", "--chunk", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model", default="yolov8n-pose")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.core.structs import TrackerState
    from posebyte_tpu.ops.decode import decode_topk
    from posebyte_tpu.ops.nms import pose_nms
    from posebyte_tpu.ops.preprocess import letterbox_flat_nhwc
    from posebyte_tpu.pipeline import PosePipeline
    from posebyte_tpu.tracker.output import extract_outputs_device
    from posebyte_tpu.tracker.step import tracker_step

    K, H, W = args.chunk, 720, 1280
    config = PipelineConfig(
        detector=DetectorConfig(
            input_size=640, num_anchors=8400,
            topk_impl=os.environ.get("POSEBYTE_TOPK_IMPL", "sort"),
            gather_impl=os.environ.get("POSEBYTE_GATHER_IMPL", "onehot")),
        tracker=TrackerConfig(), model_name=args.model, precision="bf16")
    pipe = PosePipeline(config)
    det_cfg, trk_cfg = config.detector, config.tracker
    S = det_cfg.input_size

    rng = np.random.default_rng(0)
    flat = jax.device_put(rng.integers(
        0, 255, (K, H * W * 3), dtype=np.uint8))
    jax.block_until_ready(flat)

    lb = jax.jit(lambda f: jax.vmap(
        lambda x: letterbox_flat_nhwc(x, W, H, S))(f))
    imgs = lb(flat)

    heads = jax.jit(lambda p, im: pipe.heads_fn(p, im))
    box, cls, kpt = heads(pipe.params, imgs)

    def _dec(b, c, k):
        d = decode_topk(b, c, k, det_cfg.conf_threshold,
                        det_cfg.max_candidates, S,
                        topk_impl=det_cfg.topk_impl,
                        gather_impl=det_cfg.gather_impl)
        return pose_nms(d, det_cfg.iou_threshold, det_cfg.oks_threshold,
                        det_cfg.max_detections, presorted=True)

    dec = jax.jit(lambda b, c, k: jax.vmap(_dec)(b, c, k))
    dets = dec(box, cls, kpt)

    def _track(state, dets):
        def one(state, det):
            state, aux = tracker_step(state, det, trk_cfg)
            outs = extract_outputs_device(state, det.scores, trk_cfg)
            return state, outs
        return jax.lax.scan(one, state, dets)

    track = jax.jit(_track)
    state0 = TrackerState.init(trk_cfg.max_tracks, trk_cfg.max_detections)

    # The relay memoizes (executable, input-buffer) pairings, including
    # previously seen staged buffers (docs/DEVELOPMENT.md quirk 1) —
    # every timed loop must make its input content genuinely fresh. A
    # threaded counter perturbs the input inside the jitted function
    # (the add fuses into the consumer; counter buffer changes per call)
    # so nothing memoizes while the measured op dominates.
    def timeit_fresh(make_fn, *xs):
        f = jax.jit(make_fn)
        c = jnp.int32(0)
        for _ in range(2):
            c, out = f(c, *xs)
            jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c, out = f(c, *xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3 / args.iters / K

    rows = {}
    rows["letterbox"] = timeit_fresh(
        lambda c, f: (c + 1, jax.vmap(
            lambda x: letterbox_flat_nhwc(x, W, H, S)
        )(jnp.bitwise_xor(f, c.astype(jnp.uint8)))), flat)
    rows["model_forward"] = timeit_fresh(
        lambda c, im: (c + 1, pipe.heads_fn(
            pipe.params, im + c.astype(imgs.dtype) * 1e-6)[0]), imgs)
    rows["decode_nms"] = timeit_fresh(
        lambda c, b, cl, k: (c + 1, jax.vmap(_dec)(
            b + c.astype(b.dtype) * 1e-6, cl, k).scores),
        box, cls, kpt)

    # tracker scan / fused step: state threading already defeats the memo
    st = [state0]

    def track_threaded(d):
        new_state, outs = track(st[0], d)
        st[0] = new_state
        return outs

    def timeit_threaded(fn, *a):
        for _ in range(2):
            jax.block_until_ready(jax.tree.leaves(fn(*a))[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) * 1e3 / args.iters / K

    rows["tracker_scan"] = timeit_threaded(track_threaded, dets)

    # production tracker: the fused VMEM chunk kernel, state threaded
    from posebyte_tpu.ops.pallas_tracker import tracker_chunk_pallas
    kst = [TrackerState.init(trk_cfg.max_tracks, trk_cfg.max_detections)]
    kfn = jax.jit(lambda s, d: tracker_chunk_pallas(s, d, trk_cfg))

    def kernel_threaded(d):
        new_state, outs = kfn(kst[0], d)
        kst[0] = new_state
        return outs["num_active"]

    rows["tracker_kernel"] = timeit_threaded(kernel_threaded, dets)

    rows["fused_step"] = timeit_threaded(
        lambda f: pipe.process_chunk_device(f, H, W)["emit"], flat)

    # sum uses the production tracker (kernel); the scan row is the
    # diagnostic comparison and would double-count
    total_slices = sum(v for k, v in rows.items()
                       if k not in ("fused_step", "tracker_scan"))
    print(f"{'slice':15s} ms/frame   share-of-fused")
    for k, v in rows.items():
        share = v / rows["fused_step"] if k != "fused_step" else 1.0
        print(f"{k:15s} {v:8.4f}   {share:6.1%}")
    print(f"{'sum(slices)':15s} {total_slices:8.4f}   "
          f"{total_slices / rows['fused_step']:6.1%} "
          f"(fusion saves the rest)")
    gflops = 9.2
    print(f"model MFU: {gflops / rows['model_forward'] / 1e3:.3f} "
          f"PFLOP-frac... {gflops / rows['model_forward']:.1f} TFLOP/s "
          f"effective of ~197 peak "
          f"({gflops / rows['model_forward'] / 197:.1%})")
    print(json.dumps({k: round(v, 4) for k, v in rows.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
