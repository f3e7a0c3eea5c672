"""Socket front-end for the stream servers: network ingestion with
per-stream backpressure over StreamServer / ChunkedStreamServer.

New surface beyond the reference (its serving story is a single-video
CLI, src/main.cpp); this is the piece that turns the device-side
serving classes (pipeline/serving.py) into a deployable service:
multiple clients connect over TCP (or a Unix socket), open streams,
push raw frames, and poll tracked outputs in frame coordinates.

Design:
  * Dependency-free: stdlib socket/threading/struct/json only.
  * Length-prefixed binary protocol (little-endian):
      request:  magic u32 'PBS1' | op u8 | stream_id i32 | len u32 | payload
      reply:    status u8 | len u32 | payload
    ops: OPEN(1) payload b"" -> {"sid": n}; FRAME(2) payload = raw
    H*W*3 uint8 BGR bytes; POLL(3) -> JSON list of per-frame track
    lists; CLOSE(4); STATS(5) -> server counters. status: 0=ok,
    1=error (payload = JSON {"error": ...}), 2=busy (backpressure).
  * One stepper thread owns the device: it batches whatever is queued
    into lockstep/chunked dispatches (serving.py's step()), so N
    network clients never contend for the TPU — the same
    one-executable-drives-everything shape as the rest of the
    framework. Client handler threads only touch host-side queues
    under a lock.
  * Backpressure / rate control: a stream whose input queue holds
    >= max_queue frames refuses FRAME with BUSY instead of buffering
    unboundedly — the client decides to wait, drop, or downsample
    (per-stream rate control lives at the edge, where the reference
    has no equivalent at all).
  * Outputs are un-letterboxed to FRAME pixel coordinates on the
    serving host (same math as PosePipeline.fetch_outputs /
    scaleTrackOutputs, reference main.cpp:48-68), so clients receive
    deployment-ready tracks: [{"id", "score", "bbox", "keypoints"}].
"""
from __future__ import annotations

import json
import socket
import struct
import threading
import time

import numpy as np

MAGIC = 0x50425331                      # 'PBS1'
_REQ = struct.Struct("<IbiI")           # magic, op, sid, payload len
_REP = struct.Struct("<bI")             # status, payload len

OP_OPEN, OP_FRAME, OP_POLL, OP_CLOSE, OP_STATS = 1, 2, 3, 4, 5
ST_OK, ST_ERR, ST_BUSY = 0, 1, 2

_MAX_PAYLOAD = 64 * 1024 * 1024


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf.extend(chunk)
    return bytes(buf)


class PoseServingFrontend:
    """Serve a StreamServer/ChunkedStreamServer over a socket.

    server: a constructed serving.StreamServer (or subclass); the
    front-end owns its lifecycle calls from here on.
    max_queue: per-stream input-queue bound before FRAME returns BUSY
    (default 2x the server's chunk, or 8 for per-frame servers).
    min_step_interval: stepper cadence floor in seconds (rate control
    for the device loop; 0 = step as fast as frames arrive).
    auto_step: run the stepper thread (production). False = the caller
    drives the device explicitly via step_once() (deterministic tests,
    external schedulers).
    """

    def __init__(self, server, host: str = "127.0.0.1", port: int = 0,
                 max_queue: int = 0, min_step_interval: float = 0.0,
                 auto_step: bool = True):
        self.server = server
        self.max_queue = max_queue or 2 * getattr(server, "chunk", 4)
        self.min_step_interval = min_step_interval
        self._lock = threading.Lock()      # guards every server call
        self._stop = threading.Event()
        self._frames_in = 0
        self._frames_tracked = 0
        self._steps = 0

        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.address = self._sock.getsockname()

        self._threads = [
            threading.Thread(target=self._accept_loop, daemon=True),
        ]
        if auto_step:
            self._threads.append(
                threading.Thread(target=self._step_loop, daemon=True))
        for t in self._threads:
            t.start()

    # -- device loop --------------------------------------------------------
    def step_once(self) -> int:
        """One explicit device dispatch (auto_step=False mode)."""
        with self._lock:
            served = self.server.step()
        if served:
            self._steps += 1
            self._frames_tracked += served
        return served

    def _step_loop(self):
        while not self._stop.is_set():
            t0 = time.perf_counter()
            with self._lock:
                served = self.server.step()
            if served:
                self._steps += 1
                self._frames_tracked += served
            else:
                time.sleep(0.002)           # idle; nothing queued
            if self.min_step_interval:
                dt = time.perf_counter() - t0
                if dt < self.min_step_interval:
                    time.sleep(self.min_step_interval - dt)

    # -- network ------------------------------------------------------------
    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return                      # socket closed on shutdown
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                hdr = _recv_exact(conn, _REQ.size)
                magic, op, sid, plen = _REQ.unpack(hdr)
                if magic != MAGIC or plen > _MAX_PAYLOAD:
                    self._reply(conn, ST_ERR,
                                {"error": "bad magic or oversized"})
                    return
                payload = _recv_exact(conn, plen) if plen else b""
                self._handle(conn, op, sid, payload)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def _reply(self, conn, status: int, obj=None, raw: bytes = b""):
        payload = raw if obj is None else json.dumps(obj).encode()
        conn.sendall(_REP.pack(status, len(payload)) + payload)

    def _handle(self, conn, op: int, sid: int, payload: bytes):
        srv = self.server
        try:
            if op == OP_OPEN:
                with self._lock:
                    new_sid = srv.open_stream()
                self._reply(conn, ST_OK, {"sid": new_sid})
            elif op == OP_FRAME:
                h, w = srv.frame_h, srv.frame_w
                if len(payload) != h * w * 3:
                    self._reply(conn, ST_ERR, {
                        "error": f"frame payload {len(payload)} != "
                                 f"{h}x{w}x3"})
                    return
                frame = np.frombuffer(payload, np.uint8).reshape(h, w, 3)
                with self._lock:
                    srv._check(sid)           # KeyError on bad/unopened
                    if len(srv._in[sid]) >= self.max_queue:
                        self._reply(conn, ST_BUSY,
                                    {"queued": len(srv._in[sid])})
                        return
                    srv.submit(sid, frame)
                self._frames_in += 1
                self._reply(conn, ST_OK, {"queued": True})
            elif op == OP_POLL:
                with self._lock:
                    outs = srv.poll(sid)
                self._reply(conn, ST_OK, [self._tracks(o) for o in outs])
            elif op == OP_CLOSE:
                with self._lock:
                    srv.close_stream(sid)
                self._reply(conn, ST_OK, {"closed": True})
            elif op == OP_STATS:
                self._reply(conn, ST_OK, self.stats())
            else:
                self._reply(conn, ST_ERR, {"error": f"bad op {op}"})
        except (KeyError, IndexError, ValueError, RuntimeError) as e:
            self._reply(conn, ST_ERR, {"error": str(e)})

    def _tracks(self, out: dict) -> list:
        """One step's device outputs -> emitted tracks in FRAME pixel
        coordinates (un-letterbox; PosePipeline.fetch_outputs math)."""
        from ..ops.preprocess import letterbox_params

        scale, _, _, pad_x, pad_y = letterbox_params(
            self.server.frame_w, self.server.frame_h,
            self.server.config.detector.input_size)
        pad2 = np.asarray([pad_x, pad_y], np.float32)
        pad4 = np.asarray([pad_x, pad_y, pad_x, pad_y], np.float32)
        tracks = []
        emit = np.asarray(out["emit"])
        for d in np.nonzero(emit)[0]:
            kp = np.asarray(out["poses"][d], np.float32).copy()
            kp[:, :2] = (kp[:, :2] - pad2) / scale
            bb = (np.asarray(out["boxes"][d], np.float32) - pad4) / scale
            tracks.append({
                "id": int(out["ids"][d]),
                "score": float(out["scores"][d]),
                "bbox": [round(float(v), 2) for v in bb],
                "keypoints": [[round(float(v), 2) for v in row]
                              for row in kp],
            })
        return tracks

    def stats(self) -> dict:
        return {"frames_in": self._frames_in,
                "frames_tracked": self._frames_tracked,
                "steps": self._steps,
                "open_streams": int(sum(self.server._open)),
                "max_queue": self.max_queue}

    def close(self):
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=2.0)


class PoseClient:
    """Minimal blocking client for PoseServingFrontend (same protocol;
    one socket per client, safe from one thread)."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))

    def _call(self, op: int, sid: int = -1, payload: bytes = b""):
        self._sock.sendall(_REQ.pack(MAGIC, op, sid, len(payload))
                           + payload)
        status, plen = _REP.unpack(_recv_exact(self._sock, _REP.size))
        body = _recv_exact(self._sock, plen) if plen else b""
        obj = json.loads(body) if body else None
        if status == ST_ERR:
            raise RuntimeError(obj.get("error", "server error"))
        return status, obj

    def open_stream(self) -> int:
        return self._call(OP_OPEN)[1]["sid"]

    def send_frame(self, sid: int, frame_bgr: np.ndarray) -> bool:
        """True if accepted; False on backpressure (queue full)."""
        status, _ = self._call(
            OP_FRAME, sid, np.ascontiguousarray(frame_bgr).tobytes())
        return status == ST_OK

    def poll(self, sid: int) -> list:
        """List of per-frame track lists (frame pixel coordinates)."""
        return self._call(OP_POLL, sid)[1]

    def close_stream(self, sid: int):
        self._call(OP_CLOSE, sid)

    def stats(self) -> dict:
        return self._call(OP_STATS)[1]

    def close(self):
        self._sock.close()
