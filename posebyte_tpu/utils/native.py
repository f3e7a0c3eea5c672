"""ctypes bindings for the native host runtime (native/posebyte_native.cpp).

Provides dependency-free drawing (skeletons, boxes, labels) and the CPU
letterbox reference. The library auto-builds on first use if a compiler
is available; callers fall back to the cv2 path in utils/video.py when
neither is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..core import constants as C

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR,
                                         "libposebyte_native.so"))
_lib = None


def _build():
    script = os.path.join(_NATIVE_DIR, "build.sh")
    subprocess.run(["sh", script], check=True, capture_output=True)


def load(auto_build: bool = True):
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build:
        try:
            _build()
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    ci = ctypes.c_int
    lib.pb_draw_pose.argtypes = [u8p, ci, ci, f32p, i32p, ci, u8p,
                                 ctypes.c_float, ci, ci]
    lib.pb_draw_tracks.argtypes = [u8p, ci, ci, f32p, ci, i32p, ci, u8p,
                                   ci, ctypes.c_float]
    lib.pb_draw_text.argtypes = [u8p, ci, ci, ci, ci, ctypes.c_char_p,
                                 u8p, ci]
    lib.pb_letterbox_cpu.argtypes = [u8p, ci, ci, f32p, ci, ci]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


_EDGES = np.ascontiguousarray(C.SKELETON_EDGES.astype(np.int32))


def draw_tracks_native(frame: np.ndarray, tracks,
                       palette: np.ndarray, conf_thresh: float = 0.3):
    """Draw a list of TrackOutput onto a uint8 HWC frame in one native
    call (the fast path behind utils.video.draw_all_tracks)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(tracks)
    if n == 0:
        return frame
    packed = np.zeros((n, 57), np.float32)
    for i, t in enumerate(tracks):
        packed[i, 0] = t.track_id
        packed[i, 1] = t.score
        packed[i, 2:6] = t.bbox
        packed[i, 6:] = np.asarray(t.keypoints, np.float32).reshape(-1)
    pal = np.ascontiguousarray(palette.astype(np.uint8))
    h, w = frame.shape[:2]
    lib.pb_draw_tracks(np.ascontiguousarray(frame), w, h,
                       np.ascontiguousarray(packed), n, _EDGES,
                       len(_EDGES), pal, len(pal),
                       ctypes.c_float(conf_thresh))
    return frame


def letterbox_cpu(image: np.ndarray, target: int = 640,
                  bgr_to_rgb: bool = True) -> np.ndarray:
    """CPU letterbox reference via native code (legacy-path parity with
    the reference's CPU preprocess, yolo_pose_engine.cpp:515-557)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h, w = image.shape[:2]
    out = np.empty((3, target, target), np.float32)
    lib.pb_letterbox_cpu(np.ascontiguousarray(image), w, h, out, target,
                         1 if bgr_to_rgb else 0)
    return out
