"""Ground-truthed synthetic scenes for the accuracy loop.

The reference validates accuracy only by eyeballing a real dance clip
(reference: README.md quick start; no quantitative eval ships —
SURVEY.md §4). This module closes the loop quantitatively on a host
with no network egress: procedurally animated skeleton figures whose
exact poses ARE the ground truth, consumable three ways:

  * as GT detections fed straight to the tracker (detector bypass) —
    measures tracking quality (MOTA / id switches) in isolation;
  * as oracle-encoded detector head tensors (models/oracle.py) —
    measures the decode -> NMS -> track -> un-letterbox chain end to
    end with known inputs;
  * rendered to pixels (scripts/make_test_video.py --gt) — gives the
    real detector something structured plus a GT file to score against
    once trained weights are available.
"""
from __future__ import annotations

import numpy as np

from ..core.structs import Detections

# Human-shaped keypoint offsets, unit scale (same fixture geometry as
# the benchmark CLI / reference benchmark.cpp:19-66).
POSE_OFFSETS = np.array([
    (0.0, -0.45), (-0.05, -0.5), (0.05, -0.5), (-0.1, -0.48),
    (0.1, -0.48), (-0.2, -0.3), (0.2, -0.3), (-0.25, -0.1),
    (0.25, -0.1), (-0.25, 0.1), (0.25, 0.1), (-0.15, 0.05),
    (0.15, 0.05), (-0.15, 0.3), (0.15, 0.3), (-0.15, 0.5),
    (0.15, 0.5),
], dtype=np.float32)


class SyntheticScene:
    """Deterministic multi-person scene with bouncing linear motion.

    Poses are [P, 17, 3] float32 in frame pixel coordinates with
    per-keypoint confidence 1.0 (fully labeled GT). Figures are placed
    on a spread-out grid so they never overlap-collide (identity is
    unambiguous), and they bounce off frame edges.
    """

    def __init__(self, n_persons: int = 3, width: int = 1280,
                 height: int = 720, seed: int = 42,
                 scale_range=(90.0, 140.0), speed: float = 4.0):
        self.width, self.height = width, height
        rng = np.random.default_rng(seed)
        self.scales = rng.uniform(*scale_range, size=n_persons) \
            .astype(np.float32)
        margin = float(self.scales.max()) * 0.6 + 8.0
        # spread initial centers over a jittered grid
        cols = int(np.ceil(np.sqrt(n_persons)))
        rows = int(np.ceil(n_persons / cols))
        xs = np.linspace(margin, width - margin, cols)
        ys = np.linspace(margin, height - margin, rows)
        centers = []
        for i in range(n_persons):
            cx = xs[i % cols] + rng.uniform(-10, 10)
            cy = ys[i // cols] + rng.uniform(-10, 10)
            centers.append((cx, cy))
        self.centers = np.asarray(centers, np.float32)
        ang = rng.uniform(0, 2 * np.pi, size=n_persons)
        self.vels = np.stack([np.cos(ang), np.sin(ang)],
                             axis=-1).astype(np.float32) * speed
        self.margin = margin

    @property
    def n_persons(self) -> int:
        return len(self.centers)

    def step(self) -> np.ndarray:
        """Advance one frame; returns GT poses [P, 17, 3] (frame px)."""
        self.centers += self.vels
        lo = self.margin
        hix, hiy = self.width - self.margin, self.height - self.margin
        bounce_x = (self.centers[:, 0] < lo) | (self.centers[:, 0] > hix)
        bounce_y = (self.centers[:, 1] < lo) | (self.centers[:, 1] > hiy)
        self.vels[bounce_x, 0] *= -1
        self.vels[bounce_y, 1] *= -1
        self.centers[:, 0] = np.clip(self.centers[:, 0], lo, hix)
        self.centers[:, 1] = np.clip(self.centers[:, 1], lo, hiy)
        P = self.n_persons
        poses = np.ones((P, 17, 3), np.float32)
        poses[:, :, :2] = (self.centers[:, None, :]
                           + POSE_OFFSETS[None] * self.scales[:, None, None])
        return poses

    def frames(self, n: int):
        """Yield n GT pose arrays."""
        for _ in range(n):
            yield self.step()


def pose_bbox(pose: np.ndarray, pad: float = 0.12) -> np.ndarray:
    """Tight xyxy bbox around a [17, 3] pose, padded by `pad` x extent
    (a person box extends beyond the keypoints)."""
    x1, y1 = pose[:, 0].min(), pose[:, 1].min()
    x2, y2 = pose[:, 0].max(), pose[:, 1].max()
    dx, dy = (x2 - x1) * pad, (y2 - y1) * pad
    return np.asarray([x1 - dx, y1 - dy, x2 + dx, y2 + dy], np.float32)


def poses_to_detections(poses: np.ndarray, capacity: int,
                        score: float = 0.9) -> Detections:
    """GT poses [P, 17, 3] -> padded Detections (detector bypass)."""
    import jax.numpy as jnp
    P = len(poses)
    assert P <= capacity
    dp = np.zeros((capacity, 17, 3), np.float32)
    db = np.zeros((capacity, 4), np.float32)
    ds = np.zeros((capacity,), np.float32)
    dv = np.zeros((capacity,), bool)
    for i, pose in enumerate(poses):
        dp[i] = pose
        db[i] = pose_bbox(pose)
        ds[i] = score
        dv[i] = True
    return Detections(poses=jnp.asarray(dp), boxes=jnp.asarray(db),
                      scores=jnp.asarray(ds), valid=jnp.asarray(dv))


def render_frame(poses: np.ndarray, width: int, height: int,
                 background: int = 40, colors=None) -> np.ndarray:
    """Rasterize GT poses to a BGR uint8 frame with the dependency-free
    native renderer (skeleton lines + keypoint dots).

    colors: optional [P, 3] uint8/int per-identity BGR colors (Re-ID
    training randomizes appearance per scene); defaults to the fixed
    index-derived palette."""
    from .video import draw_pose

    frame = np.full((height, width, 3), background, np.uint8)
    for i, pose in enumerate(poses):
        if colors is not None:
            color = tuple(int(c) for c in colors[i])
        else:
            color = (60 + (60 * i) % 196, 200, 255 - (50 * i) % 200)
        draw_pose(frame, pose, color)
    return frame


class CrowdedScene:
    """HARD tracking scenario: crossing trajectories, close
    interactions, staggered entry/exit — the degraded-detection regime
    the two-tier / lost-recovery tracker machinery exists for
    (reference: gpu_tracker.cu:1276-1436; the easy SyntheticScene
    never exercises it — figures there are placed to NEVER overlap).

    Every person commutes between waypoints on OPPOSITE sides of the
    frame, all paths routed through a shared central corridor, so
    pairs continually cross at varying depths; when rendered
    (render_frame draws in index order) a crossing is a real partial-
    to-full occlusion of the earlier-drawn figure. With entry_exit,
    each person is only active inside a per-identity frame window
    (walks in from an edge / leaves mid-clip).

    step() returns (poses [P,17,3] f32, active [P] bool): GT for the
    ACTIVE people only; occluded-but-active people stay labeled (a
    detector will miss them — that is the point of the benchmark).
    """

    def __init__(self, n_persons: int = 8, width: int = 1280,
                 height: int = 720, seed: int = 0,
                 scale_range=(80.0, 130.0), speed: float = 5.0,
                 entry_exit: bool = True, clip_len: int = 96):
        self.width, self.height = width, height
        rng = np.random.default_rng(seed)
        self.rng = rng
        P = n_persons
        self.scales = rng.uniform(*scale_range, size=P).astype(np.float32)
        m = float(self.scales.max()) * 0.6 + 8.0
        self.margin = m

        # waypoint pairs on opposite sides, routed through the center
        side = rng.integers(0, 2, P)           # 0: left<->right, 1: top<->bottom
        a = np.empty((P, 2), np.float32)
        b = np.empty((P, 2), np.float32)
        for i in range(P):
            if side[i] == 0:
                a[i] = (m, rng.uniform(m, height - m))
                b[i] = (width - m, rng.uniform(m, height - m))
            else:
                a[i] = (rng.uniform(m, width - m), m)
                b[i] = (rng.uniform(m, width - m), height - m)
        # center routing: waypoint sequence a -> center' -> b -> center'' -> a
        self.waypoints = [a, None, b, None]
        self.center_jitter = rng.uniform(-60, 60, size=(2, P, 2)) \
            .astype(np.float32)
        cx, cy = width / 2.0, height / 2.0
        self.waypoints[1] = (np.asarray([[cx, cy]], np.float32)
                             + self.center_jitter[0])
        self.waypoints[3] = (np.asarray([[cx, cy]], np.float32)
                             + self.center_jitter[1])
        self.wp_idx = rng.integers(0, 4, P)
        self.centers = np.stack([self.waypoints[self.wp_idx[i]][i]
                                 for i in range(P)]).astype(np.float32)
        self.speed = np.float32(speed) * rng.uniform(0.7, 1.3, P) \
            .astype(np.float32)

        # entry/exit windows (staggered thirds of the clip)
        if entry_exit:
            start = rng.integers(0, clip_len // 3, P)
            end = clip_len - rng.integers(0, clip_len // 3, P)
            # at least a third of the population spans the whole clip
            always = rng.permutation(P)[:max(1, P // 3)]
            start[always] = 0
            end[always] = clip_len
            self.window = np.stack([start, end], -1)
        else:
            self.window = np.stack([np.zeros(P, np.int64),
                                    np.full(P, 10 ** 9)], -1)
        self.t = -1

    @property
    def n_persons(self) -> int:
        return len(self.centers)

    def step(self):
        """Advance one frame -> (poses [P,17,3], active [P] bool)."""
        self.t += 1
        P = self.n_persons
        for i in range(P):
            tgt = self.waypoints[self.wp_idx[i]][i]
            d = tgt - self.centers[i]
            dist = float(np.hypot(d[0], d[1]))
            if dist < self.speed[i] * 2.0:
                self.wp_idx[i] = (self.wp_idx[i] + 1) % 4
                tgt = self.waypoints[self.wp_idx[i]][i]
                d = tgt - self.centers[i]
                dist = float(np.hypot(d[0], d[1]))
            if dist > 1e-6:
                self.centers[i] += d / dist * self.speed[i]
        poses = np.ones((P, 17, 3), np.float32)
        poses[:, :, :2] = (self.centers[:, None, :]
                           + POSE_OFFSETS[None] * self.scales[:, None, None])
        active = ((self.t >= self.window[:, 0])
                  & (self.t < self.window[:, 1]))
        return poses, active

    def frames(self, n: int):
        """Yield n (poses, active) GT tuples."""
        for _ in range(n):
            yield self.step()
