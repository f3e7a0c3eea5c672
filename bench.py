#!/usr/bin/env python
"""PoseBYTE-TPU headline benchmark.

Measures end-to-end tracked FPS at 640x640 with yolov8n-pose — the
reference's headline number (420 FPS FP16 on RTX 3080 Ti Laptop,
reference README.md:205; BASELINE.md) — on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/420, ...}

The measured loop is the full production path: uint8 frame H2D ->
letterbox -> yolov8n-pose forward (bf16) -> decode -> OKS pose-NMS ->
8-stage tracker step -> device-side output assembly -> host sync.
Synthetic weights + synthetic frames (perf is weight-independent).
"""
import json
import time

import numpy as np

BASELINE_FPS = 420.0   # reference README.md:205 (yolov8n-pose FP16 e2e)


def main():
    import jax
    from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                          TrackerConfig)
    from posebyte_tpu.pipeline import PosePipeline

    config = PipelineConfig(
        detector=DetectorConfig(input_size=640, num_anchors=8400),
        tracker=TrackerConfig(),
        model_name="yolov8n-pose",
        precision="bf16",
    )
    pipe = PosePipeline(config)

    rng = np.random.default_rng(42)
    # 720p synthetic frames (the reference demo video is a 720p dance
    # clip); a few distinct frames to defeat any value caching.
    frames = [rng.integers(0, 255, size=(720, 1280, 3), dtype=np.uint8)
              for _ in range(4)]

    import jax

    # Throughput: chunked video processing (K frames per dispatch via
    # lax.scan — one bulk H2D + one executable per chunk; the tracker
    # recurrence is the scan carry). This is the video-file workload the
    # reference's headline numbers measure.
    chunk = 32
    frames_np = np.stack([frames[i % len(frames)] for i in range(chunk)])
    out = pipe.process_chunk(frames_np)       # compile + warm
    jax.block_until_ready(out["emit"])
    n_chunks = 8
    t_start = time.perf_counter()
    for _ in range(n_chunks):
        out = pipe.process_chunk(frames_np)
    jax.block_until_ready(out["emit"])
    total = time.perf_counter() - t_start
    n_frames = n_chunks * chunk
    fps = n_frames / total

    # Latency: fully synchronous single-frame streaming steps.
    pipe.process_frame(frames[0], block=True)   # compile streaming path
    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        pipe.process_frame(frames[i % len(frames)], block=True)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    result = {
        "metric": "e2e_tracked_fps_yolov8n_640",
        "value": round(float(fps), 2),
        "unit": "fps",
        "vs_baseline": round(float(fps / BASELINE_FPS), 4),
        "p50_ms": round(float(np.percentile(lat, 50)), 3),
        "p90_ms": round(float(np.percentile(lat, 90)), 3),
        "frames": n_frames,
        "note": "throughput: 32-frame scan chunks; latency: sync streaming",
        "device": str(jax.devices()[0]),
        "precision": "bf16",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
