"""Device-mesh sharding for batched / multi-stream serving.

The reference is strictly single-GPU (SURVEY.md §2.3); scaling beyond
one chip is new surface in this framework: N concurrent video streams
are tracked as a leading `stream` axis sharded over a 1-D device mesh
(pure data parallelism — per-stream tracker recurrences are independent,
so the only communication is initial dispersal; collectives ride ICI
automatically if a reduction is ever requested).

Weights are replicated; per-stream tracker state lives sharded in each
chip's HBM and is donated every step, so stream state never moves.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import PipelineConfig
from ..core.structs import TrackerState
from ..models import build_model_heads
from ..ops.decode import decode_topk
from ..ops.nms import pose_nms
from ..ops.preprocess import letterbox_flat_nhwc
from ..tracker.step import tracker_step
from ..tracker.output import extract_outputs_device


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "stream") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    mesh_devs = mesh_utils.create_device_mesh((n,), devices=devs[:n])
    return Mesh(mesh_devs, (axis_name,))


def _single_stream_step(params, state, frame_u8, config: PipelineConfig,
                        heads_fn, embed_fn=None):
    """Unbatched fused step (shared with PosePipeline semantics).

    embed_fn: appearance source when config.tracker.reid_weight > 0
    (ops.reid.make_embed_fn — the learned head when serving was built
    with reid_params, else the training-free descriptor)."""
    det_cfg = config.detector
    h, w = frame_u8.shape[0], frame_u8.shape[1]
    # selection=False: the strided-slice letterbox lowering loses at
    # small batch — even vmapped over 8 streams it measured 10.3 vs
    # 6.8 ms/step (scripts/bench_serving_letterbox_ab.py, v5e); only
    # the K-frame chunk paths keep it. Bit-identical either way.
    img = letterbox_flat_nhwc(frame_u8.reshape(-1), w, h,
                              det_cfg.input_size, selection=False,
                              raw=det_cfg.raw_preproc)
    box, cls, kpt = heads_fn(params, img[None])
    det = decode_topk(box[0], cls[0], kpt[0], det_cfg.conf_threshold,
                      det_cfg.max_candidates, det_cfg.input_size,
                      topk_impl=det_cfg.topk_impl,
                      gather_impl=det_cfg.gather_impl)
    det = pose_nms(det, det_cfg.iou_threshold, det_cfg.oks_threshold,
                   det_cfg.max_detections, presorted=True)
    emb = None
    if config.tracker.reid_weight > 0.0:
        if embed_fn is None:
            from ..ops.reid import make_embed_fn
            embed_fn = make_embed_fn(
                raw_input=det_cfg.raw_preproc,
                sample_impl=config.tracker.reid_sample_impl)
        emb = embed_fn(img, det.poses)
    state, aux = tracker_step(state, det, config.tracker,
                              det_embeddings=emb)
    ids, scores, poses, boxes, emit = extract_outputs_device(
        state, det.scores, config.tracker)
    out = {"ids": ids, "scores": scores, "poses": poses, "boxes": boxes,
           "emit": emit, "num_active": aux["num_active"]}
    return state, out


class MultiStreamPipeline:
    """Batched multi-stream tracking with per-stream HBM state.

    Serves the BASELINE "8x concurrent 1080p streams" configuration:
    frames arrive as [S, H, W, 3] uint8, the stream axis is sharded over
    the mesh, and each device runs its streams' full detect->track chain
    locally with zero cross-device traffic per frame.
    """

    def __init__(self, num_streams: int, config: PipelineConfig =
                 PipelineConfig(), mesh: Optional[Mesh] = None,
                 params=None, seed: int = 0, dtype=jnp.bfloat16,
                 reid_params=None):
        from ..ops.reid import make_embed_fn
        self.config = config
        self.num_streams = num_streams
        self.mesh = mesh if mesh is not None else make_mesh()
        self.heads_fn, init_fn = build_model_heads(config.model_name,
                                                   dtype)
        self.params = params if params is not None else \
            init_fn(jax.random.PRNGKey(seed))
        if config.detector.raw_preproc:
            from ..models.weights import fold_stem_preprocess
            self.params = fold_stem_preprocess(self.params)

        stream = NamedSharding(self.mesh, P("stream"))
        replicated = NamedSharding(self.mesh, P())

        init_state = jax.vmap(
            lambda _: TrackerState.init(config.tracker.max_tracks,
                                        config.tracker.max_detections)
        )(jnp.arange(num_streams))
        self.states = jax.device_put(init_state, stream)
        self.params = jax.device_put(self.params, replicated)

        vstep = jax.vmap(
            functools.partial(
                _single_stream_step, config=config,
                heads_fn=self.heads_fn,
                embed_fn=make_embed_fn(
                    reid_params,
                    raw_input=config.detector.raw_preproc,
                    sample_impl=config.tracker.reid_sample_impl)),
            in_axes=(None, 0, 0))
        self._step = jax.jit(
            vstep,
            in_shardings=(replicated, stream, stream),
            out_shardings=(stream, stream),
            donate_argnums=(1,),
        )
        self._frame_sharding = stream

    def process_frames(self, frames: np.ndarray):
        """frames: [num_streams, H, W, 3] uint8 -> per-stream outputs."""
        frames = jax.device_put(jnp.asarray(frames), self._frame_sharding)
        self.states, out = self._step(self.params, self.states, frames)
        return out


class MultiStreamChunkPipeline:
    """Chunked multi-stream processing: [S, K, H, W, 3] frames per
    dispatch — the stream axis shards over the mesh, detection batches
    over streams x frames, and each stream's tracker recurrence scans
    its K frames locally. The maximum-throughput configuration for
    video-farm workloads (offline transcoding / archive indexing)."""

    def __init__(self, num_streams: int, chunk: int,
                 config: PipelineConfig = PipelineConfig(),
                 mesh: Optional[Mesh] = None, params=None, seed: int = 0,
                 dtype=jnp.bfloat16, reid_params=None):
        from ..ops.preprocess import letterbox_flat_nhwc
        from ..ops.decode import decode_topk as _decode_topk
        from ..ops.nms import pose_nms as _pose_nms
        from ..ops.reid import make_embed_fn
        embed_fn = make_embed_fn(
            reid_params, raw_input=config.detector.raw_preproc,
            sample_impl=config.tracker.reid_sample_impl)

        self.config = config
        self.num_streams = num_streams
        self.chunk = chunk
        self.mesh = mesh if mesh is not None else make_mesh()
        self.heads_fn, init_fn = build_model_heads(config.model_name,
                                                   dtype)
        self.params = params if params is not None else \
            init_fn(jax.random.PRNGKey(seed))
        if config.detector.raw_preproc:
            from ..models.weights import fold_stem_preprocess
            self.params = fold_stem_preprocess(self.params)

        stream = NamedSharding(self.mesh, P("stream"))
        replicated = NamedSharding(self.mesh, P())
        det_cfg = config.detector
        trk_cfg = config.tracker
        heads_fn = self.heads_fn

        init_state = jax.vmap(
            lambda _: TrackerState.init(trk_cfg.max_tracks,
                                        trk_cfg.max_detections)
        )(jnp.arange(num_streams))
        self.states = jax.device_put(init_state, stream)
        self.params = jax.device_put(self.params, replicated)

        def per_stream(params, state, frames_flat, h, w):
            imgs = jax.vmap(
                lambda f: letterbox_flat_nhwc(f, w, h, det_cfg.input_size,
                                              raw=det_cfg.raw_preproc)
            )(frames_flat)                              # [K, S, S, 3]
            box, cls, kpt = heads_fn(params, imgs)

            def decode_one(b, c, k):
                det = _decode_topk(b, c, k, det_cfg.conf_threshold,
                                   det_cfg.max_candidates,
                                   det_cfg.input_size,
                                   topk_impl=det_cfg.topk_impl,
                                   gather_impl=det_cfg.gather_impl)
                return _pose_nms(det, det_cfg.iou_threshold,
                                 det_cfg.oks_threshold,
                                 det_cfg.max_detections, presorted=True)

            dets = jax.vmap(decode_one)(box, cls, kpt)

            if trk_cfg.reid_weight > 0.0:
                embs = jax.vmap(embed_fn)(imgs, dets.poses)
            else:
                embs = jnp.zeros((frames_flat.shape[0], 1))

            # TPU: the K-frame recurrence as one fused Pallas kernel
            # (ops/pallas_tracker.py) — legal here because shard_map
            # makes everything device-local; Re-ID runs in-kernel as
            # channel planes. The lax.scan path covers CPU/dryrun.
            if jax.default_backend() == "tpu":
                from ..ops.pallas_tracker import tracker_chunk_pallas
                # Full outs dict (ids/scores/poses/boxes/emit/num_active):
                # the published FPS/stream includes output assembly, like
                # the reference's getActiveTracks (gpu_tracker.cu:1559).
                return tracker_chunk_pallas(
                    state, dets, trk_cfg,
                    det_embeddings=embs if trk_cfg.reid_weight > 0.0
                    else None)

            def track_one(st, det_emb):
                det, emb = det_emb
                st, aux = tracker_step(
                    st, det, trk_cfg,
                    det_embeddings=emb if trk_cfg.reid_weight > 0.0
                    else None)
                ids, scores, poses, boxes, emit = extract_outputs_device(
                    st, det.scores, trk_cfg)
                return st, {"ids": ids, "scores": scores, "poses": poses,
                            "boxes": boxes, "emit": emit,
                            "num_active": aux["num_active"]}

            return jax.lax.scan(track_one, state, (dets, embs))

        self._steps = {}
        self._per_stream = per_stream
        self._stream_sharding = stream
        self._replicated = replicated

    def _step_for(self, h: int, w: int):
        fn = self._steps.get((h, w))
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec

            per_stream = functools.partial(self._per_stream, h=h, w=w)
            vstep = jax.vmap(per_stream, in_axes=(None, 0, 0))
            # shard_map (not jit+in_shardings): inside, every array is
            # the device-local stream shard, so the per-stream vmap —
            # including the fused Pallas tracker kernel — runs purely
            # locally; the partitioner never has to split a custom
            # call. Zero collectives: stream parallelism is embarrassing.
            P_ = PartitionSpec
            smap = shard_map(
                vstep, mesh=self.mesh,
                in_specs=(P_(), P_("stream"), P_("stream")),
                out_specs=(P_("stream"), P_("stream")),
                check_vma=False)
            fn = jax.jit(smap, donate_argnums=(1,))
            self._steps[(h, w)] = fn
        return fn

    def process_chunks(self, frames: np.ndarray):
        """frames: [num_streams, chunk, H, W, 3] uint8 -> per-stream,
        per-frame outputs with leading [S, K] axes."""
        s, k, h, w = frames.shape[:4]
        flat = np.ascontiguousarray(frames).reshape(s, k, -1)
        flat = jax.device_put(jnp.asarray(flat), self._stream_sharding)
        self.states, out = self._step_for(h, w)(self.params, self.states,
                                                flat)
        return out
