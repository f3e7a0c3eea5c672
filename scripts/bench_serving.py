#!/usr/bin/env python
"""ChunkedStreamServer throughput on the TPU — the PRODUCTION serving
class (dynamic open/close/starvation lifecycle), now dispatching the
fused tracker chunk kernel with per-frame advance gating (VERDICT r2
item 5: previously the serving path silently scanned on TPU while the
headline chunk numbers came from the lifecycle-free pipeline).

Host-driven measurement: the server API is step()-based (device_put
frames in, device_get outputs back every step), so unlike bench.py's
in-graph loop this number INCLUDES per-step ingest + fetch through the
relay (quantified separately via steps/s vs sync_floor_ms). Fresh
frame content every step defeats relay memoization.

Usage: python scripts/bench_serving.py [-s 8] [-k 16] [--steps 12]
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
    p.add_argument("-s", "--streams", type=int, default=8)
    p.add_argument("-k", "--chunk", type=int, default=16)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--starve", action="store_true",
                   help="also run a leg with 2 of the streams starved "
                        "(advance-gating exercised on hardware)")
    args = p.parse_args()

    import numpy as np
    from posebyte_tpu.pipeline.serving import ChunkedStreamServer

    S, K, H, W = args.streams, args.chunk, args.height, args.width
    srv = ChunkedStreamServer(S, (H, W), chunk=K)
    sids = [srv.open_stream() for _ in range(S)]
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (K, H, W, 3), dtype=np.uint8)

    def feed(step_idx, skip=()):
        for si, sid in enumerate(sids):
            if sid in skip:
                continue
            for k in range(K):
                srv.submit(sid, np.bitwise_xor(
                    base[k], np.uint8((step_idx * 31 + si) & 0xFF)))

    # warm (compile) + one settle step
    feed(0)
    srv.step()
    for sid in sids:
        srv.poll(sid)

    t0 = time.perf_counter()
    served = 0
    for it in range(args.steps):
        feed(it + 1)
        served += srv.step()
        for sid in sids:
            srv.poll(sid)
    dt = time.perf_counter() - t0
    fps_total = served / dt

    # Decomposition — two direct measurements, no subtraction games:
    #  (a) ingest probe: a bare device_put of one step's exact payload
    #      ([S,K,H*W*3] u8) — quantifies the relay link share;
    #  (b) device probe: the SAME jitted serving executable free-run
    #      over n_dev dispatches with the frames already staged on
    #      device (tracker state threads through via donation, so the
    #      relay cannot memoize), one value fetch at the end — the
    #      per-step cost a direct-attached deployment's TPU would pay.
    import jax
    import jax.numpy as jnp
    payload = np.zeros((S, K, H * W * 3), np.uint8)
    payload ^= np.uint8(7)
    t0 = time.perf_counter()
    staged = jax.device_put(jnp.asarray(payload), srv._frame_sharding)
    staged.block_until_ready()
    ingest_ms = (time.perf_counter() - t0) * 1e3

    adv_dev = jnp.ones((S, K), bool)
    rst_dev = jnp.zeros(S, bool)
    states = srv.states
    # warm (already compiled from the loop above; this settles queues)
    states, out = srv._chunk_step(srv.params, states, staged, adv_dev,
                                  rst_dev)
    jax.block_until_ready(out)
    n_dev = max(args.steps, 12)
    t0 = time.perf_counter()
    for _ in range(n_dev):
        states, out = srv._chunk_step(srv.params, states, staged,
                                      adv_dev, rst_dev)
    _ = float(jax.device_get(out["num_active"]).sum())  # value fetch
    dev_dt = time.perf_counter() - t0
    srv.states = states
    device_step_ms = dev_dt / n_dev * 1e3

    step_ms = dt / args.steps * 1e3
    result = {
        "metric": "chunked_stream_server_fps",
        "streams": S, "chunk": K, "geometry": [H, W],
        "fps_total": round(fps_total, 1),
        "fps_per_stream": round(fps_total / S, 1),
        "ms_per_step": round(step_ms, 1),
        "ingest_probe_ms": round(ingest_ms, 1),
        "device_step_ms": round(device_step_ms, 1),
        "device_fps_total": round(S * K / device_step_ms * 1e3, 1),
        "frames": served,
        "note": "host-driven server API: ms_per_step includes H2D of "
                "S*K raw 1080p frames plus host assembly/fetch through "
                "the relay (~35-45 MB/s link — see BENCH_r03 h2d_GBps), "
                "which dominates. ingest_probe_ms is a bare device_put "
                "of the same payload; device_step_ms free-runs the same "
                "serving executable with frames staged (state threads "
                "through, final value fetch). Tracker runs as the fused "
                "chunk kernel with advance gating.",
    }

    if args.starve:
        starved = set(sids[:2])
        feed(100)   # everyone queued once more
        srv.step()
        for sid in sids:
            srv.poll(sid)
        t0 = time.perf_counter()
        served2 = 0
        for it in range(args.steps):
            feed(200 + it, skip=starved)
            served2 += srv.step()
            for sid in sids:
                srv.poll(sid)
        dt2 = time.perf_counter() - t0
        result["starved_leg"] = {
            "active_streams": S - 2,
            "fps_total": round(served2 / dt2, 1),
            "ms_per_step": round(dt2 / args.steps * 1e3, 1),
        }

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
