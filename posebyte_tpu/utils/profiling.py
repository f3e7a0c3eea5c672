"""Profiling and telemetry.

Parity with the reference's three tracing mechanisms (SURVEY.md §5):
  (a) per-stage tracker timing accumulated in TrackerTiming and printed
      by printTimingStats (reference: gpu_tracker.h:29-41,
      gpu_tracker.cu:1641-1658);
  (b) engine inference timing (CUDA events -> here wall-clock around
      the blocking dispatch, YoloPoseEngine.get_last_inference_time);
  (c) the demo's phase accumulators + end-of-run breakdown
      (reference: main.cpp:192-221, 298-303).

On TPU a fused step cannot be host-timed per stage, so per-stage numbers
come from `profile_tracker_stages`, which dispatches stage-granular
jitted slices (diagnostic mode), while production timing is whole-step.
`jax_trace` wraps jax.profiler for op-level traces viewable in
TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class FrameTiming:
    """Demo-loop phase accumulators (reference: main.cpp:192-221)."""
    preprocess_ms: float = 0.0
    detect_ms: float = 0.0
    track_ms: float = 0.0
    total_ms: float = 0.0
    frames: int = 0

    def report(self) -> str:
        n = max(self.frames, 1)
        fps = 1000.0 * n / self.total_ms if self.total_ms else 0.0
        return (f"\n=== Timing breakdown ({self.frames} frames) ===\n"
                f"  Preprocess: {self.preprocess_ms / n:7.2f} ms/frame\n"
                f"  Detect:     {self.detect_ms / n:7.2f} ms/frame\n"
                f"  Track:      {self.track_ms / n:7.2f} ms/frame\n"
                f"  TOTAL:      {self.total_ms / n:7.2f} ms/frame "
                f"({fps:.1f} FPS)")


@dataclasses.dataclass
class TrackerTiming:
    """Per-stage tracker telemetry (reference: TrackerTiming,
    gpu_tracker.h:29-41)."""
    predict_us: float = 0.0
    gate_us: float = 0.0
    high_assoc_us: float = 0.0
    low_assoc_us: float = 0.0
    lost_assoc_us: float = 0.0
    update_us: float = 0.0
    age_us: float = 0.0
    new_track_us: float = 0.0
    dedup_us: float = 0.0
    total_us: float = 0.0
    frame_count: int = 0

    def print_stats(self):
        """printTimingStats parity (gpu_tracker.cu:1641-1658)."""
        if self.frame_count == 0:
            return
        n = float(self.frame_count)
        print(f"\n=== Tracker Timing Stats ({self.frame_count} frames) ===")
        for label, v in [("Predict", self.predict_us),
                         ("Spatial gate", self.gate_us),
                         ("High assoc", self.high_assoc_us),
                         ("Low assoc", self.low_assoc_us),
                         ("Lost assoc", self.lost_assoc_us),
                         ("Update", self.update_us),
                         ("Age tracks", self.age_us),
                         ("New tracks", self.new_track_us),
                         ("Dedup", self.dedup_us)]:
            print(f"  {label:13s} {v / n:8.2f} us/frame")
        print("  " + "-" * 29)
        print(f"  {'TOTAL':13s} {self.total_us / n:8.2f} us/frame "
              f"({1e6 * n / max(self.total_us, 1e-9):.1f} FPS potential)")


def profile_tracker_stages(state, det, config, iters: int = 20
                           ) -> TrackerTiming:
    """Diagnostic per-stage timing by dispatching stage-granular slices.

    Stage boundaries mirror GPUTracker::update (SURVEY.md §3.2). Each
    slice is jitted separately and timed with a blocking sync, so the
    numbers include per-dispatch overhead the fused production step does
    not pay — treat them as relative weights, like the reference's
    host-side stamps around async kernel launches.
    """
    from ..core import constants as C
    from ..ops.assignment import auction_assign
    from ..ops.gating import spatial_gate
    from ..ops.geometry import pose_centers, centers_iou_matrix
    from ..ops.kalman import cv_predict, cv_update
    from ..ops.oks import oks_matrix, torso_oks_matrix

    t = TrackerTiming()

    predicted, vel = cv_predict(state.poses, state.velocities, state.active,
                                state.states)
    tc = pose_centers(predicted)
    dc = pose_centers(det.poses)
    gate = spatial_gate(tc, dc, vel, state.active, state.states,
                        config.gate_threshold)
    oks1 = oks_matrix(predicted, det.poses, config.visibility_threshold)
    cost = jnp.where(gate, 1.0 - oks1, 1e9)

    stages = {
        "predict_us": jax.jit(lambda: cv_predict(
            state.poses, state.velocities, state.active, state.states)),
        "gate_us": jax.jit(lambda: spatial_gate(
            tc, dc, vel, state.active, state.states,
            config.gate_threshold)),
        "high_assoc_us": jax.jit(lambda: auction_assign(
            cost, state.active)),
        "low_assoc_us": jax.jit(lambda: auction_assign(
            jnp.where(gate, 1.0 - torso_oks_matrix(predicted, det.poses),
                      1e9), state.active)),
        "lost_assoc_us": jax.jit(lambda: auction_assign(
            cost, state.active & (state.states == C.TRACK_STATE_LOST))),
        "update_us": jax.jit(lambda: cv_update(
            state.poses, vel, det.poses,
            jnp.full((config.max_tracks,), -1, jnp.int32), state.active)),
        "dedup_us": jax.jit(lambda: centers_iou_matrix(tc)),
    }
    total = 0.0
    for name, fn in stages.items():
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn())
        us = (time.perf_counter() - t0) / iters * 1e6
        setattr(t, name, us * iters)
        total += us * iters
    t.total_us = total
    t.frame_count = iters
    return t


def profile_frame_phases(pipe, frame_h: int, frame_w: int,
                         iters: int = 10) -> FrameTiming:
    """Populate FrameTiming with the demo's preprocess/detect/track
    split (reference: main.cpp:298-303) by dispatching phase-granular
    jitted slices of the pipeline on the given frame geometry.

    The production step is fused (one executable), so these are
    diagnostic dispatches: each blocking sync includes per-dispatch
    overhead the fused step does not pay — treat as relative weights,
    exactly like the reference's host stamps around async launches.
    `total_ms` is the real fused step, measured separately.
    """
    import numpy as np

    from ..ops.decode import decode_topk
    from ..ops.nms import pose_nms
    from ..ops.preprocess import letterbox_flat_nhwc
    from ..tracker.step import tracker_step

    det_cfg = pipe.config.detector
    trk_cfg = pipe.config.tracker
    S = det_cfg.input_size
    heads_fn = pipe.heads_fn

    pre = jax.jit(lambda f: letterbox_flat_nhwc(f, frame_w, frame_h, S))

    @jax.jit
    def detect(params, img):
        box, cls, kpt = heads_fn(params, img[None])
        d = decode_topk(box[0], cls[0], kpt[0], det_cfg.conf_threshold,
                        det_cfg.max_candidates, S,
                        topk_impl=det_cfg.topk_impl,
                        gather_impl=det_cfg.gather_impl)
        return pose_nms(d, det_cfg.iou_threshold, det_cfg.oks_threshold,
                        det_cfg.max_detections)

    track = jax.jit(lambda s, d: tracker_step(s, d, trk_cfg))

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 255, (frame_h * frame_w * 3,),
                                    dtype=np.uint8))
    img = pre(flat)
    det = detect(pipe.params, img)
    state = type(pipe.state).init(trk_cfg.max_tracks,
                                  trk_cfg.max_detections)
    jax.block_until_ready((img, det.scores))

    def timed(fn, *a):
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    t = FrameTiming(frames=iters)
    t.preprocess_ms = timed(pre, flat) * iters
    t.detect_ms = timed(detect, pipe.params, img) * iters
    t.track_ms = timed(lambda: track(state, det)[0].poses) * iters

    # real fused per-frame step (production path)
    frame = np.zeros((frame_h, frame_w, 3), np.uint8)
    pipe.process_frame(frame, block=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe.process_frame(frame)
    out["emit"].block_until_ready()
    t.total_ms = (time.perf_counter() - t0) * 1e3
    return t


@contextlib.contextmanager
def jax_trace(logdir: str = "/tmp/posebyte_trace"):
    """Op-level device trace (TensorBoard/Perfetto-viewable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
