"""The fused per-frame pipeline: preprocess -> detect -> decode/NMS ->
track, as a single jitted dispatch.

TPU-native equivalent of the reference's per-frame hot loop
(reference: src/main.cpp:194-281, SURVEY.md §3.1). The reference chains
preprocess kernel -> TensorRT enqueue -> postprocess kernels -> 25
tracker kernels with four host/device crossings per frame; here the
whole chain is ONE XLA executable per frame with donated tracker state
(HBM-resident), one small H2D (the frame, as flat bytes — see
ops/preprocess.py for why) and one small D2H (the track outputs) — the
"0 intermediate copies, 1 sync/frame" design target of
docs/GPU_NATIVE_ARCHITECTURE.md:299-303, reached by construction.

Dispatch is asynchronous: process_frame() enqueues and returns device
references immediately, so frame N+1's transfer/compute overlaps frame
N's host-side output fetch — the TPU analogue of the reference's CUDA
stream overlap.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DetectorConfig, PipelineConfig
from ..core.structs import TrackerState
from ..models import build_model, build_model_heads
from ..models.yolo_pose import build_model_head_maps
from ..ops.decode import decode_topk, decode_topk_levels
from ..ops.nms import pose_nms
from ..ops.preprocess import letterbox_flat_nhwc, letterbox_params
from ..tracker.output import extract_outputs_device, TrackOutput
from ..tracker.step import tracker_step


def detect_fn(params, image_hwc, det_cfg: DetectorConfig, heads_fn):
    """Single-image detect: [S, S, 3] float input -> NMS'd Detections.

    Equivalent of YoloPoseEngine::detectGPUNative
    (reference: yolo_pose_engine.cpp:610-646). Uses the sparse decode
    path: top-K candidate selection on confidence, then DFL/keypoint
    decode for only those K (numerically identical to the dense path,
    ~30x less decode work)."""
    box, cls, kpt = heads_fn(params, image_hwc[None])
    det = decode_topk(box[0], cls[0], kpt[0], det_cfg.conf_threshold,
                      det_cfg.max_candidates, det_cfg.input_size,
                      topk_impl=det_cfg.topk_impl,
                      gather_impl=det_cfg.gather_impl)
    return pose_nms(det, det_cfg.iou_threshold, det_cfg.oks_threshold,
                    det_cfg.max_detections, presorted=True)


def detect_fn_levels(params, image_hwc, det_cfg: DetectorConfig,
                     head_maps_fn):
    """Single-image detect via the tail-fused decode
    (DetectorConfig.decode_fusion == "tail"): per-level top-K on the
    conv-native head layout, exact merge, shared decode tail —
    bit-identical Detections to detect_fn (decode_topk_levels
    docstring has the proof; tests/test_decode_fusion.py pins it)."""
    maps = head_maps_fn(params, image_hwc[None])
    levels = tuple((b[0], c[0], k[0]) for b, c, k in maps)
    det = decode_topk_levels(levels, det_cfg.conf_threshold,
                             det_cfg.max_candidates, det_cfg.input_size,
                             topk_impl=det_cfg.topk_impl,
                             gather_impl=det_cfg.gather_impl)
    return pose_nms(det, det_cfg.iou_threshold, det_cfg.oks_threshold,
                    det_cfg.max_detections, presorted=True)


class PosePipeline:
    """End-to-end pose tracking pipeline (the `posebyte_demo` engine).

    Owns the model params, the tracker state (device-resident), and one
    jitted step function per input geometry. Host code only feeds uint8
    frames and receives compact per-frame track tensors.
    """

    def __init__(self, config: PipelineConfig = PipelineConfig(),
                 params=None, seed: int = 0, dtype=None, heads_fn=None,
                 reid_params=None):
        """heads_fn: optional detector override with the
        build_model_heads signature (params, images_nhwc) ->
        (box_logits, cls_logits, kpt_raw). Used by the accuracy loop to
        inject an oracle detector (models/oracle.py) or GT detections;
        pass `params` explicitly alongside it.

        reid_params: optional learned Re-ID head weights
        (models/reid_head.py, trained by scripts/train_reid.py). When
        set and config.tracker.reid_weight > 0, appearance embeddings
        come from the learned head instead of the training-free
        pose-color descriptor; both emit the same [N, 51]
        keypoint-blocked layout, so the tracker (scan and fused-kernel
        paths alike) is unchanged."""
        if heads_fn is not None and config.detector.raw_preproc:
            # injected detector (oracle/GT): no stem weights to fold —
            # force the normalized letterbox
            import dataclasses
            config = dataclasses.replace(
                config, detector=dataclasses.replace(
                    config.detector, raw_preproc=False))
        self.config = config
        self.reid_params = reid_params
        if dtype is None:
            dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16,
                     "int8": jnp.bfloat16}[config.precision]
        self.dtype = dtype
        self.head_maps_fn = None
        if heads_fn is not None:
            # injected detector (oracle/GT): no per-level surface, so
            # decode_fusion == "tail" silently falls back to "post"
            self.apply_fn = None
            self.heads_fn = heads_fn
        else:
            self.apply_fn, init_fn = build_model(config.model_name, dtype)
            self.heads_fn, _ = build_model_heads(config.model_name, dtype)
            self.head_maps_fn = build_model_head_maps(
                config.model_name, dtype)
            if params is None:
                params = init_fn(jax.random.PRNGKey(seed))
            if config.detector.raw_preproc:
                # raw-ingest mode: params passed in are ALWAYS the
                # standard (unfolded) checkpoint form; the BGR+1/255
                # fold is applied here, once, at construction
                from ..models.weights import fold_stem_preprocess
                params = fold_stem_preprocess(params)
        self.params = params
        self.state = TrackerState.init(config.tracker.max_tracks,
                                       config.tracker.max_detections)
        self._step_cache = {}
        self.timing = {"dispatch_ms": 0.0, "frames": 0}

    def _embed_fn(self):
        """(image_hwc, poses) -> [N, 51] appearance embeddings: the
        learned head when reid_params is loaded, else the training-free
        pose-color descriptor (identical output layout). Single shared
        selection point: ops.reid.make_embed_fn — the serving classes
        (StreamServer/ChunkedStreamServer/MultiStream*Pipeline) use the
        same helper, so demo and production serving can't diverge."""
        from ..ops.reid import make_embed_fn
        return make_embed_fn(
            self.reid_params,
            raw_input=self.config.detector.raw_preproc,
            sample_impl=self.config.tracker.reid_sample_impl)

    # -- fused step ---------------------------------------------------------
    def _make_step(self, h: int, w: int):
        det_cfg = self.config.detector
        trk_cfg = self.config.tracker
        heads_fn = self.heads_fn
        head_maps_fn = self.head_maps_fn
        use_tail = (det_cfg.decode_fusion == "tail"
                    and head_maps_fn is not None)

        # bf16 letterbox output halves the materialized image buffer;
        # identical model inputs (the model casts to bf16 anyway). The
        # Re-ID descriptor samples the image, so it keeps f32.
        lb_dtype = self.dtype if trk_cfg.reid_weight == 0.0 \
            else jnp.float32

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, state, frame_flat_u8):
            # selection=False: the strided-slice letterbox lowering is a
            # batch-1 pessimization (4.00 vs 1.64 ms/frame fused step on
            # v5e, scripts/bench_frame_exec_ab.py); the chunk path keeps
            # it, where it wins. Bit-identical either way. The env
            # override exists only for clean-process A/B probes.
            from ..ops.preprocess import batch1_selection_override
            img = letterbox_flat_nhwc(frame_flat_u8, w, h,
                                      det_cfg.input_size,
                                      out_dtype=lb_dtype,
                                      selection=batch1_selection_override(),
                                      raw=det_cfg.raw_preproc)
            if use_tail:
                det = detect_fn_levels(params, img, det_cfg,
                                       head_maps_fn)
            else:
                det = detect_fn(params, img, det_cfg, heads_fn)
            emb = None
            if trk_cfg.reid_weight > 0.0:
                emb = self._embed_fn()(img, det.poses)
            state, aux = tracker_step(state, det, trk_cfg,
                                      det_embeddings=emb)
            ids, scores, poses, boxes, emit = extract_outputs_device(
                state, det.scores, trk_cfg)
            out = {"ids": ids, "scores": scores, "poses": poses,
                   "boxes": boxes, "emit": emit,
                   "num_active": aux["num_active"],
                   "det_scores": det.scores, "det_valid": det.valid}
            return state, out

        return step

    # -- chunked mode -------------------------------------------------------
    def _make_chunk_step(self, k: int, h: int, w: int):
        """K frames per dispatch: batched detection + scanned tracking.

        Detection has no cross-frame dependency, so the whole chunk runs
        as ONE batched conv pass — K images through the MXU together
        (far better utilization than per-frame convs, and it sidesteps
        XLA's poor handling of conv nets inside loop bodies). Only the
        genuinely sequential part — the tracker recurrence — runs as a
        `lax.scan` over the per-frame detections (SURVEY.md §5 "the
        video-time recurrence maps to lax.scan"). One bulk H2D per
        chunk, one executable, one small D2H."""
        det_cfg = self.config.detector
        trk_cfg = self.config.tracker
        heads_fn = self.heads_fn
        head_maps_fn = self.head_maps_fn
        use_tail = (det_cfg.decode_fusion == "tail"
                    and head_maps_fn is not None)

        lb_dtype = self.dtype if trk_cfg.reid_weight == 0.0 \
            else jnp.float32

        def chunk_step(params, state, frames_flat_u8):
            # [K, H*W*3] -> [K, S, S, 3] letterboxed batch (NHWC direct;
            # bf16 output halves the materialized buffer, same model
            # inputs — see letterbox_flat_nhwc)
            imgs = jax.vmap(
                lambda f: letterbox_flat_nhwc(f, w, h,
                                              det_cfg.input_size,
                                              out_dtype=lb_dtype,
                                              raw=det_cfg.raw_preproc)
            )(frames_flat_u8)                          # [K, S, S, 3]

            if use_tail:
                maps = head_maps_fn(params, imgs)      # per-level K-maps

                def decode_one_lv(lv):
                    det = decode_topk_levels(
                        lv, det_cfg.conf_threshold,
                        det_cfg.max_candidates, det_cfg.input_size,
                        topk_impl=det_cfg.topk_impl,
                        gather_impl=det_cfg.gather_impl)
                    return pose_nms(det, det_cfg.iou_threshold,
                                    det_cfg.oks_threshold,
                                    det_cfg.max_detections,
                                    presorted=True)

                dets = jax.vmap(decode_one_lv)(maps)   # leading K axis
            else:
                box, cls, kpt = heads_fn(params, imgs)

                def decode_one(b, c, k):
                    det = decode_topk(b, c, k, det_cfg.conf_threshold,
                                      det_cfg.max_candidates,
                                      det_cfg.input_size,
                                      topk_impl=det_cfg.topk_impl,
                                      gather_impl=det_cfg.gather_impl)
                    return pose_nms(det, det_cfg.iou_threshold,
                                    det_cfg.oks_threshold,
                                    det_cfg.max_detections,
                                    presorted=True)

                dets = jax.vmap(decode_one)(box, cls, kpt)

            # TPU: the whole K-frame tracker recurrence as ONE fused
            # Pallas kernel with the state VMEM-resident across frames
            # (ops/pallas_tracker.py — removes the ~100-op/frame scan
            # overhead); handles both motion models AND the Re-ID
            # appearance blend (embedding planes in-kernel). Elsewhere:
            # the lax.scan path.
            if trk_cfg.reid_weight > 0.0:
                embs = jax.vmap(self._embed_fn())(imgs, dets.poses)
            else:
                embs = None

            if jax.default_backend() == "tpu":
                from ..ops.pallas_tracker import tracker_chunk_pallas
                return tracker_chunk_pallas(state, dets, trk_cfg,
                                            det_embeddings=embs)

            def track_one(state, det, emb=None):
                state, aux = tracker_step(state, det, trk_cfg,
                                          det_embeddings=emb)
                ids, scores, poses, boxes, emit = extract_outputs_device(
                    state, det.scores, trk_cfg)
                out = {"ids": ids, "scores": scores, "poses": poses,
                       "boxes": boxes, "emit": emit,
                       "num_active": aux["num_active"]}
                return state, out

            if embs is not None:
                return jax.lax.scan(
                    lambda s, de: track_one(s, de[0], de[1]),
                    state, (dets, embs))
            return jax.lax.scan(track_one, state, dets)

        return chunk_step

    def chunk_body(self, k: int, h: int, w: int):
        """The UNJITTED chunk-step function (params, state, frames_flat)
        -> (state, outs) — for callers composing it into larger traced
        programs (bench loops, serving graphs)."""
        key = ("chunk_body", k, h, w)
        fn = self._step_cache.get(key)
        if fn is None:
            fn = self._make_chunk_step(k, h, w)
            self._step_cache[key] = fn
        return fn

    def _chunk_step_for(self, k: int, h: int, w: int):
        key = ("chunk", k, h, w)
        step = self._step_cache.get(key)
        if step is None:
            step = jax.jit(self.chunk_body(k, h, w), donate_argnums=(1,))
            self._step_cache[key] = step
        return step

    def process_chunk(self, frames_bgr: np.ndarray):
        """Process a chunk of frames: [K, H, W, 3] uint8 -> stacked
        device outputs dict with leading K axis."""
        k, h, w = frames_bgr.shape[:3]
        step = self._chunk_step_for(k, h, w)
        flat = np.ascontiguousarray(frames_bgr).reshape(k, -1)
        self.state, outs = step(self.params, self.state, jnp.asarray(flat))
        self.timing["frames"] += k
        return outs

    def stage_chunk(self, frames_bgr: np.ndarray):
        """Transfer a chunk to the device ahead of time; the returned
        handle can be passed to process_chunk_device. The TPU analogue of
        the reference's preallocated pinned staging buffers
        (gpu_tracker.cu:977-980): ingest cost is paid once / off the
        critical path."""
        k = frames_bgr.shape[0]
        return jnp.asarray(np.ascontiguousarray(frames_bgr).reshape(k, -1))

    def process_chunk_device(self, frames_flat_dev, h: int, w: int):
        """Process a pre-staged (device-resident) chunk."""
        k = frames_flat_dev.shape[0]
        step = self._chunk_step_for(k, h, w)
        self.state, outs = step(self.params, self.state, frames_flat_dev)
        self.timing["frames"] += k
        return outs

    def process_frame(self, frame_bgr: np.ndarray, block: bool = False):
        """Enqueue one frame (uint8 HWC BGR); returns device outputs.

        Asynchronous by default — pass block=True (or call
        fetch_outputs) to synchronize."""
        h, w = frame_bgr.shape[:2]
        step = self._step_cache.get((h, w))
        if step is None:
            step = self._make_step(h, w)
            self._step_cache[(h, w)] = step
        t0 = time.perf_counter()
        # Hand the host buffer straight to the executable: the transfer
        # rides the dispatch instead of paying a separate device_put
        # round trip (measured faster on the tunneled-TPU host too).
        flat = np.ascontiguousarray(frame_bgr).reshape(-1)
        self.state, out = step(self.params, self.state, flat)
        if block:
            out["emit"].block_until_ready()
        self.timing["dispatch_ms"] += (time.perf_counter() - t0) * 1e3
        self.timing["frames"] += 1
        return out

    def prestage_frame(self, frame_bgr: np.ndarray):
        """Begin an async H2D transfer of one frame; returns a device
        handle for process_frame_device. The transfer overlaps whatever
        the device is currently computing (the TPU analogue of the
        reference's pinned staging buffers + async cudaMemcpyAsync,
        gpu_tracker.cu:977-980)."""
        flat = np.ascontiguousarray(frame_bgr).reshape(-1)
        return jax.device_put(flat)

    def process_frame_device(self, frame_flat_dev, h: int, w: int,
                             block: bool = False):
        """Run the fused step on a pre-staged (device-resident) frame."""
        step = self._step_cache.get((h, w))
        if step is None:
            step = self._make_step(h, w)
            self._step_cache[(h, w)] = step
        self.state, out = step(self.params, self.state, frame_flat_dev)
        if block:
            out["emit"].block_until_ready()
        self.timing["frames"] += 1
        return out

    def process_stream(self, frames, sync_depth: int = 2):
        """Depth-pipelined streaming: yields device outputs for each
        frame of an iterable, keeping up to `sync_depth` frames in
        flight. Frame N+1's H2D transfer is issued before frame N's
        output is awaited, so ingest hides behind compute (VERDICT r1
        item 2; reference contract: main.cpp:194-281's one-sync-per-frame
        loop). The sync on the oldest in-flight output applies
        backpressure, bounding device memory and transfer queueing —
        yielded outputs are always complete."""
        from collections import deque

        inflight: deque = deque()
        staged = None
        for frame in frames:
            h, w = frame.shape[:2]
            nxt = self.prestage_frame(frame)     # overlap transfer N+1
            if staged is not None:
                out = self.process_frame_device(staged[0], staged[1],
                                                staged[2])
                inflight.append(out)
                if len(inflight) > sync_depth:
                    ready = inflight.popleft()
                    ready["emit"].block_until_ready()
                    yield ready
            staged = (nxt, h, w)
        if staged is not None:
            inflight.append(self.process_frame_device(staged[0], staged[1],
                                                      staged[2]))
        while inflight:
            ready = inflight.popleft()
            ready["emit"].block_until_ready()
            yield ready

    def fetch_outputs(self, out, frame_w: int, frame_h: int):
        """The single D2H copy: device outputs -> host TrackOutput list,
        un-letterboxed to frame coordinates (reference:
        getActiveTracks + scaleTrackOutputs, main.cpp:48-68, 224)."""
        ids, scores, poses, boxes, emit = jax.device_get(
            (out["ids"], out["scores"], out["poses"], out["boxes"],
             out["emit"]))
        scale, _, _, pad_x, pad_y = letterbox_params(
            frame_w, frame_h, self.config.detector.input_size)
        pad = np.asarray([pad_x, pad_y], np.float32)
        results = []
        for d in range(len(ids)):
            if not emit[d]:
                continue
            kp = poses[d].copy()
            kp[:, :2] = (kp[:, :2] - pad) / scale
            bb = boxes[d].copy()
            bb[0:2] = (bb[0:2] - pad) / scale
            bb[2:4] = (bb[2:4] - pad) / scale
            results.append(TrackOutput(track_id=int(ids[d]),
                                       score=float(scores[d]),
                                       bbox=bb, keypoints=kp))
        return results

    def reset(self):
        self.state = TrackerState.init(self.config.tracker.max_tracks,
                                       self.config.tracker.max_detections)

    @property
    def mean_frame_ms(self) -> float:
        f = max(self.timing["frames"], 1)
        return self.timing["dispatch_ms"] / f
