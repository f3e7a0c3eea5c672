"""Unit tests for geometry and OKS ops against NumPy references that
independently implement the reference CUDA semantics."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core import constants as C
from posebyte_tpu.ops import (masked_pose_bbox, pose_centers,
                              boxes_iou_matrix, centers_iou_matrix,
                              oks_matrix, torso_oks_matrix, spatial_gate)


def np_oks_cell(track, det, vis_thr=0.2, sigma_scale=2.0,
                min_scale_sq=1000.0, min_count=3):
    """Scalar NumPy port of kernelOKSWithGating (gpu_tracker.cu:360-424)."""
    def area(p):
        m = p[:, 2] > 0.1
        if not m.any():
            return 0.0
        xs, ys = p[m, 0], p[m, 1]
        return max((xs.max() - xs.min()) * (ys.max() - ys.min()), 0.0)
    scale_sq = max((area(track) + area(det)) * 0.5, min_scale_sq)
    total, count = 0.0, 0
    for kp in range(17):
        if det[kp, 2] > vis_thr and track[kp, 2] > vis_thr:
            d2 = (det[kp, 0] - track[kp, 0]) ** 2 + \
                (det[kp, 1] - track[kp, 1]) ** 2
            sig = C.COCO_SIGMAS[kp] * sigma_scale
            total += np.exp(-d2 / (2.0 * scale_sq * sig * sig))
            count += 1
    return total / count if count >= min_count else 0.0


def test_masked_pose_bbox(random_pose_factory):
    pose = random_pose_factory()
    pose[3:, 2] = 0.0   # only first 3 keypoints visible
    bbox, valid = masked_pose_bbox(jnp.asarray(pose)[None])
    assert bool(valid[0])
    xs = pose[:3, 0]
    ys = pose[:3, 1]
    np.testing.assert_allclose(
        np.asarray(bbox[0]), [xs.min(), ys.min(), xs.max(), ys.max()],
        rtol=1e-5)

    pose2 = pose.copy()
    pose2[:, 2] = 0.05   # nothing visible above 0.1
    bbox2, valid2 = masked_pose_bbox(jnp.asarray(pose2)[None])
    assert not bool(valid2[0])
    np.testing.assert_array_equal(np.asarray(bbox2[0]), 0.0)


def test_pose_centers_matches_reference_semantics(random_pose_factory):
    pose = random_pose_factory()
    c = np.asarray(pose_centers(jnp.asarray(pose)[None]))[0]
    m = pose[:, 2] > 0.1
    xs, ys = pose[m, 0], pose[m, 1]
    np.testing.assert_allclose(c[0], (xs.min() + xs.max()) / 2, rtol=1e-5)
    np.testing.assert_allclose(c[2], xs.max() - xs.min(), rtol=1e-5)
    np.testing.assert_allclose(c[3], ys.max() - ys.min(), rtol=1e-5)


def test_boxes_iou_matrix():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(boxes_iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-6)
    expected = 25.0 / (100 + 100 - 25)
    np.testing.assert_allclose(iou[0, 1], expected, rtol=1e-6)
    np.testing.assert_allclose(iou[1, 0], expected, rtol=1e-6)


def test_centers_iou_matches_corner_iou():
    centers = jnp.asarray([[5, 5, 10, 10], [10, 10, 10, 10]], jnp.float32)
    corners = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    np.testing.assert_allclose(np.asarray(centers_iou_matrix(centers)),
                               np.asarray(boxes_iou_matrix(corners, corners)),
                               rtol=1e-6)


def test_oks_matrix_identical_pose_is_one(random_pose_factory):
    pose = random_pose_factory()
    t = jnp.asarray(pose)[None]
    oks = np.asarray(oks_matrix(t, t))
    np.testing.assert_allclose(oks[0, 0], 1.0, atol=1e-6)


def test_oks_matrix_vs_numpy_reference(random_pose_factory):
    tracks = np.stack([random_pose_factory() for _ in range(5)])
    dets = np.stack([random_pose_factory() for _ in range(7)])
    got = np.asarray(oks_matrix(jnp.asarray(tracks), jnp.asarray(dets)))
    want = np.array([[np_oks_cell(t, d) for d in dets] for t in tracks])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_oks_needs_three_covisible_keypoints(random_pose_factory):
    t = random_pose_factory()
    d = t.copy()
    d[2:, 2] = 0.0   # only 2 co-visible
    oks = np.asarray(oks_matrix(jnp.asarray(t)[None], jnp.asarray(d)[None]))
    assert oks[0, 0] == 0.0


def test_torso_oks(random_pose_factory):
    t = random_pose_factory()
    got = float(torso_oks_matrix(jnp.asarray(t)[None], jnp.asarray(t)[None])
                [0, 0])
    np.testing.assert_allclose(got, 1.0, atol=1e-6)
    # shifted by a large offset -> decays
    d = t.copy()
    d[:, 0] += 300.0
    got2 = float(torso_oks_matrix(jnp.asarray(t)[None],
                                  jnp.asarray(d)[None])[0, 0])
    assert got2 < 0.1
    # fewer than 2 visible torso keypoints -> 0
    d2 = t.copy()
    d2[C.TORSO_KEYPOINTS[1:], 2] = 0.0
    got3 = float(torso_oks_matrix(jnp.asarray(t)[None],
                                  jnp.asarray(d2)[None])[0, 0])
    assert got3 == 0.0


def test_spatial_gate_semantics(random_pose_factory):
    t_pose = random_pose_factory()
    centers = pose_centers(jnp.asarray(t_pose)[None])     # [1,4]
    vel = jnp.zeros((1, 17, 2))
    active = jnp.asarray([True])
    states = jnp.asarray([C.TRACK_STATE_CONFIRMED], jnp.int32)

    # same center -> gated in
    g = spatial_gate(centers, centers, vel, active, states)
    assert bool(g[0, 0])

    # far detection -> gated out
    far = np.asarray(centers).copy()
    far[0, 0] += 5000.0
    g2 = spatial_gate(centers, jnp.asarray(far), vel, active, states)
    assert not bool(g2[0, 0])

    # inactive track -> always out
    g3 = spatial_gate(centers, centers, vel, jnp.asarray([False]), states)
    assert not bool(g3[0, 0])

    # degenerate detection center -> allowed (defer to OKS)
    degen = jnp.zeros((1, 4))
    g4 = spatial_gate(centers, degen, vel, active, states)
    assert bool(g4[0, 0])

    # lost track gets a 2x wider gate
    mid = np.asarray(centers).copy()
    avg_sz = (mid[0, 2] + mid[0, 3] + centers[0, 2] + centers[0, 3]) / 4
    mid[0, 0] += float(avg_sz) * 4.0   # ratio ~4: > 3.0, < 6.0
    lost = jnp.asarray([C.TRACK_STATE_LOST], jnp.int32)
    assert not bool(spatial_gate(centers, jnp.asarray(mid), vel, active,
                                 states)[0, 0])
    assert bool(spatial_gate(centers, jnp.asarray(mid), vel, active,
                             lost)[0, 0])
