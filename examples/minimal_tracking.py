#!/usr/bin/env python
"""Minimal library-level usage of posebyte-tpu (no CLI).

Three patterns:
  1. per-frame streaming   — lowest latency, one fused dispatch/frame
  2. chunked processing    — highest throughput (fused tracker kernel)
  3. multi-stream serving  — many videos on one chip / mesh

Run: python examples/minimal_tracking.py  (synthetic frames, any host)
"""
import numpy as np

from posebyte_tpu.core.config import (DetectorConfig, PipelineConfig,
                                      TrackerConfig)
from posebyte_tpu.pipeline import PosePipeline


def main():
    # -- build a pipeline -------------------------------------------------
    # Production: load trained weights exported by the export CLI:
    #   from posebyte_tpu.models.weights import load_params
    #   params, name = load_params("yolov8n.safetensors")
    #   config = PipelineConfig(model_name=name, precision="bf16")
    #   pipe = PosePipeline(config, params=params)
    # Here: random weights + a small input geometry for a quick demo.
    config = PipelineConfig(
        detector=DetectorConfig(input_size=192, num_anchors=756,
                                max_candidates=32, max_detections=8),
        tracker=TrackerConfig(max_tracks=16, max_detections=8),
        model_name="yolov8n-pose",
    )
    pipe = PosePipeline(config)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 240, 320, 3), dtype=np.uint8)

    # -- 1. per-frame streaming ------------------------------------------
    for frame in frames[:4]:
        out = pipe.process_frame(frame)              # async dispatch
        tracks = pipe.fetch_outputs(out, 320, 240)   # the one D2H copy
        for t in tracks:
            print(f"frame {int(pipe.state.frame)}: track {t.track_id} "
                  f"score {t.score:.2f} bbox {t.bbox.round(1)}")
    print(f"streamed {int(pipe.state.frame)} frames")

    # depth-pipelined variant (ingest overlaps compute):
    #   for out in pipe.process_stream(frame_iter, sync_depth=2): ...

    # -- 2. chunked processing (fused tracker kernel on TPU) -------------
    pipe.reset()
    outs = pipe.process_chunk(frames)                # [K] leading axis
    import jax
    emit = jax.device_get(outs["emit"])
    print(f"chunk of {len(frames)}: emitted detections per frame = "
          f"{emit.sum(axis=1).tolist()}")

    # -- 3. multi-stream serving ------------------------------------------
    from posebyte_tpu.pipeline import StreamServer
    srv = StreamServer(num_streams=4, frame_shape=(240, 320),
                       config=config)
    a = srv.open_stream()
    b = srv.open_stream()
    srv.submit(a, frames[0])
    srv.submit(b, frames[1])
    srv.step()                                       # one lockstep dispatch
    print(f"stream a outputs: {len(srv.poll(a))}, "
          f"b outputs: {len(srv.poll(b))}")
    srv.close_stream(a)
    srv.close_stream(b)
    # throughput variant: from posebyte_tpu.pipeline import \
    #     ChunkedStreamServer  (chunk=K frames per stream per dispatch)

    # -- 4. TCP serving front-end ----------------------------------------
    # Any StreamServer/ChunkedStreamServer can be served over a socket
    # (stdlib binary protocol, per-stream queue bounds with BUSY
    # backpressure; outputs arrive in frame pixel coordinates).
    from posebyte_tpu.pipeline.frontend import (PoseClient,
                                                PoseServingFrontend)
    front = PoseServingFrontend(
        StreamServer(num_streams=2, frame_shape=(240, 320),
                     config=config),
        auto_step=False)                 # default True: background loop
    client = PoseClient(*front.address)
    sid = client.open_stream()
    client.send_frame(sid, frames[0])
    front.step_once()                    # explicit dispatch (auto_step=False)
    print(f"tcp front-end: {len(client.poll(sid))} tracks, "
          f"stats {client.stats()}")
    client.close_stream(sid)
    client.close()
    front.close()


if __name__ == "__main__":
    main()
