"""Multi-stream serving: dynamic stream lifecycle over the sharded
lockstep pipeline.

The reference is a single-video CLI (reference: src/main.cpp); serving
many independent videos is new surface in this framework. The design is
TPU-shaped: a fixed pool of S stream slots runs in SPMD lockstep (one
jitted dispatch advances every slot — the stream axis shards over the
device mesh exactly as in parallel/sharding.py), while stream dynamics
(open/close/starvation) are host-side masks fed into the step:

  * `reset[s]`  — slot s's tracker state is re-initialized in-graph
    before the step (stream open / slot reuse);
  * `advance[s]` — when False, slot s's state passes through unchanged
    (a starved stream does not age its tracks) and its outputs are
    masked out.

So idle slots burn compute (lockstep is the price of one executable)
but never corrupt state, and per-stream EOS / reopen never recompiles
or reshapes anything — the pool geometry is static for XLA.

The Re-ID appearance term (config.reid_weight > 0) is honored in every
serving mode: the per-frame gated step and the chunked step both
compute appearance embeddings and blend them into association, exactly
as PosePipeline does. Pass `reid_params` (the trained head from
scripts/train_reid.py) to use the LEARNED embedding; otherwise the
training-free pose-color descriptor is used. The selection point is
shared with PosePipeline (ops.reid.make_embed_fn), so demo and serving
cannot diverge.
"""
from __future__ import annotations

import collections
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PipelineConfig
from ..core.structs import TrackerState
from ..models import build_model_heads
from ..parallel.sharding import (Mesh, NamedSharding, P, make_mesh,
                                 _single_stream_step)


def _gated_stream_step(params, state, frame_u8, advance, reset,
                       config: PipelineConfig, heads_fn, embed_fn=None):
    """One stream slot's step with lifecycle gating (see module doc)."""
    fresh = TrackerState.init(config.tracker.max_tracks,
                              config.tracker.max_detections)
    state = jax.tree.map(lambda i, s: jnp.where(reset, i, s), fresh, state)
    new_state, out = _single_stream_step(params, state, frame_u8, config,
                                         heads_fn, embed_fn=embed_fn)
    state = jax.tree.map(lambda n, o: jnp.where(advance, n, o), new_state,
                         state)
    out = dict(out)
    out["emit"] = out["emit"] & advance
    out["num_active"] = jnp.where(advance, out["num_active"], 0)
    return state, out


def _gated_stream_chunk(params, state, frames_flat, advance, reset,
                        h, w, config: PipelineConfig, heads_fn,
                        embed_fn=None):
    """One stream slot's K-frame chunk with lifecycle gating: detection
    batches over all K frames (MXU-friendly, outside the scan); the
    tracker recurrence scans with a per-frame advance mask, so a slot
    holding fewer than K queued frames simply skips the padded tail.
    frames_flat [K, H*W*3], advance [K] bool, reset scalar bool."""
    from ..ops.decode import decode_topk
    from ..ops.nms import pose_nms
    from ..ops.preprocess import letterbox_flat_nhwc
    from ..tracker.output import extract_outputs_device
    from ..tracker.step import tracker_step

    det_cfg = config.detector
    trk_cfg = config.tracker
    fresh = TrackerState.init(trk_cfg.max_tracks, trk_cfg.max_detections)
    state = jax.tree.map(lambda i, s: jnp.where(reset, i, s), fresh, state)

    imgs = jax.vmap(
        lambda f: letterbox_flat_nhwc(f, w, h, det_cfg.input_size,
                                      raw=det_cfg.raw_preproc)
    )(frames_flat)                                   # [K, S, S, 3]
    box, cls, kpt = heads_fn(params, imgs)

    def decode_one(b, c, k):
        det = decode_topk(b, c, k, det_cfg.conf_threshold,
                          det_cfg.max_candidates, det_cfg.input_size,
                          topk_impl=det_cfg.topk_impl,
                          gather_impl=det_cfg.gather_impl)
        return pose_nms(det, det_cfg.iou_threshold,
                        det_cfg.oks_threshold, det_cfg.max_detections,
                        presorted=True)

    dets = jax.vmap(decode_one)(box, cls, kpt)
    if trk_cfg.reid_weight > 0.0:
        if embed_fn is None:
            from ..ops.reid import make_embed_fn
            embed_fn = make_embed_fn(
                raw_input=det_cfg.raw_preproc,
                sample_impl=trk_cfg.reid_sample_impl)
        embs = jax.vmap(embed_fn)(imgs, dets.poses)
    else:
        embs = jnp.zeros((frames_flat.shape[0], 1))   # scan placeholder

    # TPU: the fused chunk kernel with per-frame advance gating — the
    # production serving path gets megakernel speed (reset was applied
    # above; a starved frame leaves state untouched and emits nothing).
    if jax.default_backend() == "tpu":
        from ..ops.pallas_tracker import tracker_chunk_pallas
        return tracker_chunk_pallas(
            state, dets, trk_cfg,
            det_embeddings=embs if trk_cfg.reid_weight > 0.0 else None,
            advance=advance)

    def track_one(state, det_adv):
        det, adv, emb = det_adv
        new_state, aux = tracker_step(
            state, det, trk_cfg,
            det_embeddings=emb if trk_cfg.reid_weight > 0.0 else None)
        state = jax.tree.map(lambda n, o: jnp.where(adv, n, o),
                             new_state, state)
        ids, scores, poses, boxes, emit = extract_outputs_device(
            state, det.scores, trk_cfg)
        out = {"ids": ids, "scores": scores, "poses": poses,
               "boxes": boxes, "emit": emit & adv,
               "num_active": jnp.where(adv, aux["num_active"], 0)}
        return state, out

    return jax.lax.scan(track_one, state, (dets, advance, embs))


class StreamServer:
    """Dynamic multi-video serving over a fixed slot pool.

    Usage:
        srv = StreamServer(num_streams=8, frame_shape=(720, 1280))
        sid = srv.open_stream()
        srv.submit(sid, frame)          # enqueue; any number of streams
        n = srv.step()                  # one lockstep dispatch
        for out in srv.poll(sid): ...   # drained per-stream outputs
        srv.close_stream(sid)           # EOS; slot returns to the pool

    Slots are reused: reopening resets that slot's tracker state
    in-graph (no recompile, no reshape). Outputs are host dicts per
    frame (same keys as PosePipeline.process_frame outputs).
    """

    def __init__(self, num_streams: int, frame_shape: tuple[int, int],
                 config: PipelineConfig = PipelineConfig(),
                 mesh: Optional[Mesh] = None, params=None, seed: int = 0,
                 dtype=None, heads_fn=None, reid_params=None):
        from ..ops.reid import make_embed_fn
        if dtype is None:    # honor config.precision, as PosePipeline does
            dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16,
                     "int8": jnp.bfloat16}[config.precision]
        if heads_fn is not None and config.detector.raw_preproc:
            # injected detector (oracle/eval): no stem weights to fold
            import dataclasses
            config = dataclasses.replace(
                config, detector=dataclasses.replace(
                    config.detector, raw_preproc=False))
        self.config = config
        self._embed_fn = make_embed_fn(
            reid_params, raw_input=config.detector.raw_preproc,
            sample_impl=config.tracker.reid_sample_impl)
        self.num_streams = num_streams
        self.frame_h, self.frame_w = frame_shape
        self.mesh = mesh if mesh is not None else make_mesh()
        if heads_fn is not None:
            self.heads_fn = heads_fn     # detector override (oracle/eval)
        else:
            self.heads_fn, init_fn = build_model_heads(config.model_name,
                                                       dtype)
            if params is None:
                params = init_fn(jax.random.PRNGKey(seed))
            if config.detector.raw_preproc:
                from ..models.weights import fold_stem_preprocess
                params = fold_stem_preprocess(params)

        stream = NamedSharding(self.mesh, P("stream"))
        replicated = NamedSharding(self.mesh, P())
        init_state = jax.vmap(
            lambda _: TrackerState.init(config.tracker.max_tracks,
                                        config.tracker.max_detections)
        )(jnp.arange(num_streams))
        self.states = jax.device_put(init_state, stream)
        self.params = jax.device_put(params, replicated)

        vstep = jax.vmap(
            functools.partial(_gated_stream_step, config=config,
                              heads_fn=self.heads_fn,
                              embed_fn=self._embed_fn),
            in_axes=(None, 0, 0, 0, 0))
        self._step = jax.jit(
            vstep,
            in_shardings=(replicated, stream, stream, stream, stream),
            out_shardings=(stream, stream),
            donate_argnums=(1,),
        )
        self._frame_sharding = stream

        self._open = [False] * num_streams
        self._pending_reset = np.zeros(num_streams, bool)
        self._in: list = [collections.deque() for _ in range(num_streams)]
        self._out: list = [collections.deque() for _ in range(num_streams)]

    # -- lifecycle ---------------------------------------------------------
    def open_stream(self) -> int:
        """Claim a free slot; its tracker state resets on the next step.
        Raises RuntimeError when the pool is exhausted."""
        for sid in range(self.num_streams):
            if not self._open[sid]:
                self._open[sid] = True
                self._pending_reset[sid] = True
                self._in[sid].clear()
                self._out[sid].clear()
                return sid
        raise RuntimeError(
            f"all {self.num_streams} stream slots in use")

    def close_stream(self, sid: int):
        """EOS: release the slot. Pending inputs are dropped; already
        produced outputs stay pollable until reopened."""
        self._check(sid)
        self._open[sid] = False
        self._in[sid].clear()

    # -- data plane ---------------------------------------------------------
    def submit(self, sid: int, frame_bgr: np.ndarray):
        self._check(sid)
        if frame_bgr.shape[:2] != (self.frame_h, self.frame_w):
            raise ValueError(
                f"frame {frame_bgr.shape[:2]} != server geometry "
                f"{(self.frame_h, self.frame_w)}")
        self._in[sid].append(np.ascontiguousarray(frame_bgr))

    def step(self) -> int:
        """One lockstep dispatch: consumes at most one queued frame per
        open stream. Returns the number of frames consumed (0 = nothing
        queued; no dispatch happens)."""
        advance = np.zeros(self.num_streams, bool)
        frames = np.zeros((self.num_streams, self.frame_h, self.frame_w,
                           3), np.uint8)
        served = []
        for sid in range(self.num_streams):
            if self._open[sid] and self._in[sid]:
                frames[sid] = self._in[sid].popleft()
                advance[sid] = True
                served.append(sid)
        if not served:
            return 0
        reset = self._pending_reset.copy()
        self._pending_reset[:] = False

        frames_dev = jax.device_put(jnp.asarray(frames),
                                    self._frame_sharding)
        self.states, out = self._step(self.params, self.states,
                                      frames_dev, jnp.asarray(advance),
                                      jnp.asarray(reset))
        host = jax.device_get(out)
        for sid in served:
            self._out[sid].append({k: v[sid] for k, v in host.items()})
        return len(served)

    def poll(self, sid: int):
        """Drain and return this stream's completed outputs. Allowed
        on closed streams too (EOS leaves produced outputs pollable
        until the slot is reopened)."""
        if not (0 <= sid < self.num_streams):
            raise KeyError(f"stream {sid} out of range")
        outs = list(self._out[sid])
        self._out[sid].clear()
        return outs

    def _check(self, sid: int):
        if not (0 <= sid < self.num_streams) or not self._open[sid]:
            raise KeyError(f"stream {sid} is not open")


class ChunkedStreamServer(StreamServer):
    """StreamServer with K-frame chunked dispatch: each step consumes
    up to `chunk` queued frames PER stream (detection batched over
    streams x frames on the MXU, tracker recurrence scanned per stream
    with per-frame advance gating). The throughput-oriented serving
    mode — same open/close/submit/poll lifecycle; streams with fewer
    than `chunk` queued frames just advance by what they have."""

    def __init__(self, num_streams: int, frame_shape: tuple[int, int],
                 chunk: int = 8,
                 config: PipelineConfig = PipelineConfig(),
                 mesh: Optional[Mesh] = None, params=None, seed: int = 0,
                 dtype=None, heads_fn=None, reid_params=None):
        super().__init__(num_streams, frame_shape, config=config,
                         mesh=mesh, params=params, seed=seed,
                         dtype=dtype, heads_fn=heads_fn,
                         reid_params=reid_params)
        self.chunk = chunk
        stream = NamedSharding(self.mesh, P("stream"))
        replicated = NamedSharding(self.mesh, P())
        vchunk = jax.vmap(
            # self.config, not config: the base constructor may have
            # forced raw_preproc off for an injected detector
            functools.partial(_gated_stream_chunk, h=self.frame_h,
                              w=self.frame_w, config=self.config,
                              heads_fn=self.heads_fn,
                              embed_fn=self._embed_fn),
            in_axes=(None, 0, 0, 0, 0))
        self._chunk_step = jax.jit(
            vchunk,
            in_shardings=(replicated, stream, stream, stream, stream),
            out_shardings=(stream, stream),
            donate_argnums=(1,),
        )

    def step(self) -> int:
        """One chunked dispatch: consumes up to `chunk` frames per open
        stream. Returns total frames consumed (0 = no dispatch)."""
        S, K = self.num_streams, self.chunk
        hw3 = self.frame_h * self.frame_w * 3
        frames = np.zeros((S, K, hw3), np.uint8)
        advance = np.zeros((S, K), bool)
        served = 0
        for sid in range(S):
            if not self._open[sid]:
                continue
            for k in range(K):
                if not self._in[sid]:
                    break
                frames[sid, k] = self._in[sid].popleft().reshape(-1)
                advance[sid, k] = True
                served += 1
        if served == 0:
            return 0
        reset = self._pending_reset.copy()
        self._pending_reset[:] = False

        frames_dev = jax.device_put(jnp.asarray(frames),
                                    self._frame_sharding)
        self.states, out = self._chunk_step(
            self.params, self.states, frames_dev, jnp.asarray(advance),
            jnp.asarray(reset))
        host = jax.device_get(out)
        for sid in range(S):
            for k in range(K):
                if advance[sid, k]:
                    self._out[sid].append(
                        {key: v[sid, k] for key, v in host.items()})
        return served
