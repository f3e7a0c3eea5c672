"""Video I/O and visualization.

Host-side equivalent of the reference's video utilities
(reference: src/utils/video_utils.cpp): VideoReader/VideoWriter wrap
OpenCV (gated import — everything else in the framework runs without
cv2), skeleton/track drawing uses the same 20-color palette and 19-edge
COCO skeleton (video_utils.cpp:10-48).
"""
from __future__ import annotations

import numpy as np

from ..core import constants as C

# 20-color track palette, BGR (reference: video_utils.cpp:10-31)
TRACK_COLORS = np.array([
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
    (255, 0, 255), (0, 255, 255), (128, 0, 0), (0, 128, 0),
    (0, 0, 128), (128, 128, 0), (128, 0, 128), (0, 128, 128),
    (255, 128, 0), (255, 0, 128), (128, 255, 0), (0, 255, 128),
    (128, 0, 255), (0, 128, 255), (192, 192, 192), (64, 64, 64),
], dtype=np.uint8)


def _cv2():
    try:
        import cv2
        return cv2
    except ImportError as e:   # pragma: no cover
        raise RuntimeError(
            "OpenCV (cv2) is required for video I/O / drawing") from e


class VideoReader:
    """cv2.VideoCapture wrapper (reference: video_utils.cpp:229-257)."""

    def __init__(self, path: str):
        cv2 = _cv2()
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"failed to open video: {path}")
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def read(self):
        ok, frame = self.cap.read()
        return frame if ok else None

    def __iter__(self):
        while True:
            f = self.read()
            if f is None:
                return
            yield f

    def release(self):
        self.cap.release()


class PrefetchVideoReader(VideoReader):
    """VideoReader with a background decode thread + bounded queue.

    cv2 releases the GIL during decode, so a single prefetch thread
    overlaps video decoding with the TPU dispatch loop — the host-side
    analogue of the reference's stream overlap (main.cpp's loop decodes
    on the critical path; here decode of frame N+1 hides behind frame
    N's tracking). Bounded queue applies backpressure; iteration order
    and termination semantics are identical to VideoReader.
    """

    def __init__(self, path: str, depth: int = 8):
        super().__init__(path)
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = False
        self._stop = False

        def worker():
            while not self._stop:
                f = super(PrefetchVideoReader, self).read()
                self._q.put(f)
                if f is None:
                    return

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def read(self):
        if self._done:
            return None
        f = self._q.get()
        if f is None:
            self._done = True
        return f

    def release(self):
        # signal the worker to stop, then empty the queue WITHOUT
        # decoding the remaining frames (early exit on a long video must
        # not block for the full remaining decode time)
        self._stop = True
        self._done = True
        import queue
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=2.0)
        super().release()


class VideoWriter:
    """cv2.VideoWriter wrapper (reference: video_utils.cpp:259-278)."""

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 30.0):
        cv2 = _cv2()
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(path, fourcc, fps, (width, height))
        if not self.writer.isOpened():
            raise IOError(f"failed to create output video: {path}")

    def write(self, frame: np.ndarray):
        self.writer.write(frame)

    def release(self):
        self.writer.release()


def draw_pose(frame: np.ndarray, keypoints: np.ndarray, color,
              kp_radius: int = 3, conf_thresh: float = 0.3):
    """Draw one skeleton (reference: drawPose, video_utils.cpp:50-102)."""
    cv2 = _cv2()
    color = tuple(int(c) for c in color)
    for a, b in C.SKELETON_EDGES:
        if keypoints[a, 2] > conf_thresh and keypoints[b, 2] > conf_thresh:
            pa = (int(keypoints[a, 0]), int(keypoints[a, 1]))
            pb = (int(keypoints[b, 0]), int(keypoints[b, 1]))
            cv2.line(frame, pa, pb, color, 2)
    for k in range(C.NUM_KEYPOINTS):
        if keypoints[k, 2] > conf_thresh:
            cv2.circle(frame, (int(keypoints[k, 0]), int(keypoints[k, 1])),
                       kp_radius, color, -1)


def draw_all_tracks(frame: np.ndarray, tracks, conf_thresh: float = 0.3,
                    use_native: bool = True):
    """Draw every track with its id-keyed color and label
    (reference: drawAllTracks, video_utils.cpp:134-193).

    Prefers the native C++ rasterizer (utils/native.py, one FFI call for
    the whole frame); falls back to per-primitive cv2 drawing."""
    if use_native:
        from . import native
        if native.available():
            return native.draw_tracks_native(frame, tracks, TRACK_COLORS,
                                             conf_thresh)
    cv2 = _cv2()
    for t in tracks:
        color = TRACK_COLORS[t.track_id % len(TRACK_COLORS)]
        draw_pose(frame, t.keypoints, color, conf_thresh=conf_thresh)
        x1, y1 = int(t.bbox[0]), int(t.bbox[1])
        x2, y2 = int(t.bbox[2]), int(t.bbox[3])
        c = tuple(int(v) for v in color)
        cv2.rectangle(frame, (x1, y1), (x2, y2), c, 2)
        label = f"ID:{t.track_id} {t.score:.2f}"
        cv2.putText(frame, label, (x1, max(y1 - 5, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 2)
    return frame


def draw_stats(frame: np.ndarray, fps: float, num_tracks: int,
               inference_ms: float):
    """FPS / track-count / latency overlay
    (reference: drawStats, video_utils.cpp:195-223)."""
    cv2 = _cv2()
    lines = [f"FPS: {fps:.1f}", f"Tracks: {num_tracks}",
             f"Inference: {inference_ms:.2f} ms"]
    y = 25
    for line in lines:
        cv2.putText(frame, line, (10, y), cv2.FONT_HERSHEY_SIMPLEX,
                    0.7, (0, 0, 0), 4)
        cv2.putText(frame, line, (10, y), cv2.FONT_HERSHEY_SIMPLEX,
                    0.7, (0, 255, 0), 2)
        y += 28
    return frame
