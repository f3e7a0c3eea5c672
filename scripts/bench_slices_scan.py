#!/usr/bin/env python
"""Trustworthy chunk-step slice decomposition: marginal costs measured
with the canonical in-graph scan pattern (docs/DEVELOPMENT.md quirks).

bench_stages.py times each slice with free-running host dispatch loops;
for the cheap slices (letterbox ~0.03 ms/chunk, decode+NMS) the whole
timed loop lands near the relay RPC floor (~28-50 ms), so those rows
measure the tunnel, not the op. This script instead times NESTED
prefixes of the production chunk step —

  A: letterbox
  B: letterbox + model forward
  C: letterbox + forward + decode + pose-NMS
  D: the full production chunk body (C + fused tracker kernel)

— each as ONE lax.scan executable over n iterations with the frame
content derived in-graph (staged-base XOR loop index + per-run salt,
exactly bench.py's headline pattern), ended by a device_get value
fetch. Each stage runs at TWO scan lengths and reports the SLOPE
(T(n2)-T(n1))/(n2-n1), which cancels the constant dispatch + RPC
overhead. Marginal slice costs are then stage differences measured
INSIDE the same fused context the production step compiles to:

  letterbox = A, forward = B - A, decode+NMS = C - B, tracker = D - C.

Usage: python scripts/bench_slices_scan.py [-k 128] [--model ...]
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
    p.add_argument("--model", default="yolov8n-pose")
    p.add_argument("--single", type=int, default=0, metavar="N",
                   help="time each stage at ONE scan length N instead "
                        "of the two-length slope (3 compiles instead "
                        "of 8 — the remote compile service serializes "
                        "and model-scale scan programs take it tens of "
                        "minutes each). Constant dispatch+RPC overhead "
                        "then rides every stage equally and still "
                        "cancels in the stage DIFFERENCES, which are "
                        "the quantities of interest.")
    p.add_argument("--stages", default="",
                   help="comma subset of A,B,C,D (default: all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.ops.decode import decode_topk
    from posebyte_tpu.ops.nms import pose_nms
    from posebyte_tpu.ops.preprocess import letterbox_flat_nhwc
    from posebyte_tpu.pipeline import PosePipeline

    K, H, W = args.chunk, 720, 1280
    config = PipelineConfig(
        detector=DetectorConfig(
            input_size=640, num_anchors=8400,
            topk_impl=os.environ.get("POSEBYTE_TOPK_IMPL", "sort"),
            gather_impl=os.environ.get("POSEBYTE_GATHER_IMPL", "onehot")),
        tracker=TrackerConfig(), model_name=args.model, precision="bf16")
    pipe = PosePipeline(config)
    det_cfg = config.detector
    S = det_cfg.input_size

    rng = np.random.default_rng(0)
    n_staged = 4
    bases = jnp.stack([
        jax.device_put(rng.integers(0, 255, (K, H * W * 3),
                                    dtype=np.uint8))
        for _ in range(n_staged)])
    jax.block_until_ready(bases)

    def frames_at(i, salt):
        f = lax.dynamic_index_in_dim(bases, i % n_staged, 0,
                                     keepdims=False)
        return jnp.bitwise_xor(f, (i + salt).astype(jnp.uint8))

    def lb(frames):
        return jax.vmap(lambda f: letterbox_flat_nhwc(
            f, W, H, S, out_dtype=jnp.bfloat16))(frames)

    def stage_a(params, state, i, salt):
        imgs = lb(frames_at(i, salt))
        return state, imgs.astype(jnp.float32).sum()

    def stage_b(params, state, i, salt):
        imgs = lb(frames_at(i, salt))
        box, cls, kpt = pipe.heads_fn(params, imgs)
        # consume all three heads so none is dead-code-eliminated
        return state, (box.astype(jnp.float32).sum()
                       + cls.astype(jnp.float32).sum()
                       + kpt.astype(jnp.float32).sum())

    def _dec(b, c, k):
        d = decode_topk(b, c, k, det_cfg.conf_threshold,
                        det_cfg.max_candidates, S,
                        topk_impl=det_cfg.topk_impl,
                        gather_impl=det_cfg.gather_impl)
        return pose_nms(d, det_cfg.iou_threshold, det_cfg.oks_threshold,
                        det_cfg.max_detections, presorted=True)

    def stage_c(params, state, i, salt):
        imgs = lb(frames_at(i, salt))
        box, cls, kpt = pipe.heads_fn(params, imgs)
        dets = jax.vmap(_dec)(box, cls, kpt)
        return state, (dets.scores.sum() + dets.boxes.sum()
                       + dets.poses.sum())

    # decode-internal prefixes (r4, VERDICT item 4): C1 stops after the
    # confidence top-K; C2 after the full sparse decode (gathers + DFL
    # + keypoint math), before NMS. Marginals: topk = C1 - B,
    # gather+DFL = C2 - C1, NMS = C - C2.
    from posebyte_tpu.ops.topk import topk_confidence

    def stage_c1(params, state, i, salt):
        imgs = lb(frames_at(i, salt))
        box, cls, kpt = pipe.heads_fn(params, imgs)

        def tk(c, b, k):
            conf = jax.nn.sigmoid(c[:, 0].astype(jnp.float32))
            ranked = jnp.where(conf >= det_cfg.conf_threshold, conf, -1.0)
            tc, ti = topk_confidence(ranked, det_cfg.max_candidates,
                                     det_cfg.topk_impl)
            # consume box/kpt FULLY so no slice of the forward can be
            # strength-reduced (a [0, 0] probe would let XLA legally
            # shrink the head convs feeding it)
            return (tc.sum() + ti.sum().astype(jnp.float32)
                    + b.astype(jnp.float32).sum()
                    + k.astype(jnp.float32).sum())

        return state, jax.vmap(tk)(cls, box, kpt).sum()

    def stage_c2(params, state, i, salt):
        imgs = lb(frames_at(i, salt))
        box, cls, kpt = pipe.heads_fn(params, imgs)

        def dec_only(b, c, k):
            return decode_topk(b, c, k, det_cfg.conf_threshold,
                               det_cfg.max_candidates, S,
                               topk_impl=det_cfg.topk_impl,
                               gather_impl=det_cfg.gather_impl)

        dets = jax.vmap(dec_only)(box, cls, kpt)
        return state, (dets.scores.sum() + dets.boxes.sum()
                       + dets.poses.sum())

    body_fn = pipe.chunk_body(K, H, W)

    def stage_d(params, state, i, salt):
        state, outs = body_fn(params, state, frames_at(i, salt))
        return state, outs["num_active"][-1].astype(jnp.float32)

    def make_bench(stage_fn, n):
        def loop(params, state, salt):
            def body(carry, i):
                state, acc = carry
                state, v = stage_fn(params, state, i, salt)
                return (state, acc + v), None
            (state, acc), _ = lax.scan(body, (state, jnp.float32(0.0)),
                                       jnp.arange(n))
            return acc
        return jax.jit(loop)

    def run_stage(name, stage_fn, n1, n2, salt0):
        lengths = (args.single,) if args.single else (n1, n2)
        fns = {n: make_bench(stage_fn, n) for n in lengths}
        state0 = pipe.state
        times = {}
        reps = lengths * 3 if args.single else (n1, n2, n1, n2)
        for rep, n in enumerate(reps):
            salt = jnp.int32(salt0 + rep * 7 + 1)
            fn = fns[n]
            if rep < len(reps) // 2:     # first touch: compile + warm
                t0 = time.perf_counter()
                _ = float(jax.device_get(fn(pipe.params, state0, salt)))
                print(f"[{name}] n={n} compile+warm "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            v = float(jax.device_get(fn(pipe.params, state0, salt)))
            times[n] = min(times.get(n, 1e30),
                           time.perf_counter() - t0)
        if args.single:
            n = args.single
            ms_per_frame = times[n] * 1e3 / n / K
            row = {"ms_per_frame": round(ms_per_frame, 5),
                   "t_s": round(times[n], 3), "n": n,
                   "mode": "single (constant overhead included; "
                           "cancels in stage differences)"}
        else:
            per_iter = (times[n2] - times[n1]) / (n2 - n1)
            ms_per_frame = per_iter * 1e3 / K
            row = {"ms_per_frame": round(ms_per_frame, 5),
                   "t_n1_s": round(times[n1], 3),
                   "t_n2_s": round(times[n2], 3), "n1": n1, "n2": n2}
        print(f"[{name}] {json.dumps(row)}", flush=True)
        return row

    salt_base = int(np.random.randint(0, 10000))
    want = [s for s in args.stages.upper().split(",") if s] or None
    rows = {}
    # decisive stages first (decode marginal = C - B, tracker = D - C);
    # the letterbox-only scan compiles disproportionately slowly at its
    # long lengths, so it runs last and partial output still decides
    # the decode question if the relay compile service wedges again.
    plan = [("B", "B_lb_forward", stage_b, 24, 96, 100),
            ("C", "C_lb_fwd_decode_nms", stage_c, 24, 96, 200),
            ("C1", "C1_lb_fwd_topk", stage_c1, 24, 96, 400),
            ("C2", "C2_lb_fwd_decode", stage_c2, 24, 96, 500),
            ("D", "D_full_chunk", stage_d, 24, 96, 300),
            ("A", "A_letterbox", stage_a, 1024, 4096, 0)]
    for tag, key, fn, n1, n2, ds in plan:
        if want is None or tag in want:
            rows[key] = run_stage(tag, fn, n1, n2, salt_base + ds)

    g = lambda k: rows.get(k, {}).get("ms_per_frame")
    a, b, c, d = (g("A_letterbox"), g("B_lb_forward"),
                  g("C_lb_fwd_decode_nms"), g("D_full_chunk"))
    c1, c2 = g("C1_lb_fwd_topk"), g("C2_lb_fwd_decode")
    marg = {}
    if a is not None:
        marg["letterbox"] = round(a, 5)
    if b is not None:
        marg["model_forward_plus_lb"] = round(b - (a or 0.0), 5)
    if b is not None and c is not None:
        marg["decode_nms"] = round(c - b, 5)
    if b is not None and c1 is not None:
        marg["topk_only"] = round(c1 - b, 5)
    if c1 is not None and c2 is not None:
        marg["gather_dfl"] = round(c2 - c1, 5)
    if c2 is not None and c is not None:
        marg["nms_only"] = round(c - c2, 5)
    if c is not None and d is not None:
        marg["tracker_kernel_plus_outputs"] = round(d - c, 5)
    if d is not None:
        marg["full_chunk_step"] = round(d, 5)
        marg["implied_fps"] = round(1e3 / d, 1) if d > 0 else None
    print(json.dumps({"marginal_ms_per_frame": marg, "stages": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
