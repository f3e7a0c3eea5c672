#!/usr/bin/env python
"""Decompose the decode+NMS slice (~24% of the yolov8n chunk step) on
the TPU: top-k candidate select, gathers+DFL/keypoint math, pose NMS —
each timed with in-graph varied inputs and a free-running loop.

DEPRECATED for absolute numbers: at default iters the timed regions
land far below the relay RPC floor (docs/DEVELOPMENT.md quirk 8) and
`block_until_ready` under-reports on device-lineage buffers, so the
sub-floor rows here (e.g. 0.0002-0.0008 ms) are dispatch noise, not op
time. Use scripts/bench_slices_scan.py — one lax.scan executable per
nested pipeline prefix, device_get-fetched — for trustworthy decode
marginals. Kept for the relative real-vs-relaid layout probe only.

Usage: python scripts/bench_decode_micro.py [-k 128] [--iters 10]
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
    p.add_argument("--cand", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.ops.decode import decode_topk
    from posebyte_tpu.ops.nms import pose_nms

    det_cfg = DetectorConfig(max_candidates=args.cand)
    K, A, S = args.chunk, det_cfg.num_anchors, det_cfg.input_size
    CAND = det_cfg.max_candidates

    rng = np.random.default_rng(0)
    box = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (K, A, 64)).astype(np.float32), jnp.bfloat16))
    cls = jax.device_put(jnp.asarray(
        rng.normal(-3, 2, (K, A, 1)).astype(np.float32), jnp.bfloat16))
    kpt = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (K, A, 51)).astype(np.float32), jnp.bfloat16))
    jax.block_until_ready(kpt)

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

    # (1) confidence sigmoid + masked top-k alone
    def topk_only(c, cl):
        conf = jax.nn.sigmoid(
            (cl[..., 0] + c.astype(cl.dtype) * 1e-6).astype(jnp.float32))
        ranked = jnp.where(conf >= det_cfg.conf_threshold, conf, -1.0)
        tc, ti = jax.lax.top_k(ranked, CAND)
        return c + 1, tc.sum() + ti.sum()
    rows["topk_only"] = timeit_fresh(topk_only, cls)

    # (2) full sparse decode (top-k + gathers + DFL + kpt math)
    def dec_full(c, b, cl, k):
        d = jax.vmap(lambda bb, cc, kk: decode_topk(
            bb, cc, kk, det_cfg.conf_threshold, CAND, S))(
                b + c.astype(b.dtype) * 1e-6, cl, k)
        return c + 1, d.scores
    rows["decode_full"] = timeit_fresh(dec_full, box, cls, kpt)

    # (3) decode + NMS (the production slice)
    def dec_nms(c, b, cl, k):
        def one(bb, cc, kk):
            d = decode_topk(bb, cc, kk, det_cfg.conf_threshold, CAND, S)
            return pose_nms(d, det_cfg.iou_threshold,
                            det_cfg.oks_threshold,
                            det_cfg.max_detections, presorted=True)
        d = jax.vmap(one)(b + c.astype(b.dtype) * 1e-6, cl, k)
        return c + 1, d.scores
    rows["decode_nms"] = timeit_fresh(dec_nms, box, cls, kpt)

    rows["gather_dfl_kpt"] = rows["decode_full"] - rows["topk_only"]
    rows["nms_only"] = rows["decode_nms"] - rows["decode_full"]

    # Same legs on REAL detector-head outputs (conv-produced buffers):
    # bench_stages measures decode+NMS at ~0.06 ms/frame consuming head
    # outputs while the synthetic-tensor legs above measure ~0.0004 —
    # this pair separates "decode math" from "producer-layout cost".
    from posebyte_tpu.core.config import PipelineConfig
    from posebyte_tpu.pipeline import PosePipeline
    pipe = PosePipeline(PipelineConfig(detector=det_cfg,
                                       model_name="yolov8n-pose",
                                       precision="bf16"))
    imgs = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (K, S, S, 3)).astype(np.float32), jnp.bfloat16))
    heads = jax.jit(lambda p, im: pipe.heads_fn(p, im))
    rbox, rcls, rkpt = heads(pipe.params, imgs)
    jax.block_until_ready(rkpt)
    rows["topk_real"] = timeit_fresh(topk_only, rcls)
    rows["decode_nms_real"] = timeit_fresh(dec_nms, rbox, rcls, rkpt)

    # ...and the real head outputs forced into default (device_put)
    # layouts via a host round trip: isolates layout from content.
    hbox, hcls, hkpt = (jax.device_put(jax.device_get(t))
                        for t in (rbox, rcls, rkpt))
    jax.block_until_ready(hkpt)
    rows["decode_nms_real_relaid"] = timeit_fresh(dec_nms, hbox, hcls,
                                                  hkpt)

    print(json.dumps({k: round(v, 4) for k, v in rows.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
