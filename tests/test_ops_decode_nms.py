"""Unit tests for YOLO decode, pose NMS, and letterbox preprocessing."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core import constants as C
from posebyte_tpu.core.structs import Detections
from posebyte_tpu.ops import (decode_yolo_output, pose_nms,
                              nms_overlap_matrix, letterbox_image,
                              letterbox_params, unletterbox_coords)


def make_raw_output(dets, num_anchors=8400):
    """Build a [56, A] raw tensor containing the given detections.

    dets: list of (cx, cy, w, h, conf, pose[17,3]).
    """
    raw = np.zeros((56, num_anchors), np.float32)
    for a, (cx, cy, w, h, conf, pose) in enumerate(dets):
        raw[0, a], raw[1, a], raw[2, a], raw[3, a], raw[4, a] = \
            cx, cy, w, h, conf
        raw[5:56, a] = pose.reshape(-1)
    return raw


def test_decode_filters_and_sorts(random_pose_factory):
    p1, p2, p3 = (random_pose_factory() for _ in range(3))
    raw = make_raw_output([
        (100, 100, 50, 80, 0.9, p1),
        (300, 300, 40, 90, 0.1, p2),    # below threshold
        (500, 200, 60, 70, 0.95, p3),
    ])
    det = decode_yolo_output(jnp.asarray(raw), conf_threshold=0.25,
                             max_candidates=16)
    v = np.asarray(det.valid)
    assert v.sum() == 2
    s = np.asarray(det.scores)
    # score-descending
    np.testing.assert_allclose(s[0], 0.95, rtol=1e-6)
    np.testing.assert_allclose(s[1], 0.9, rtol=1e-6)
    # cxcywh -> xyxy
    np.testing.assert_allclose(np.asarray(det.boxes[0]),
                               [470, 165, 530, 235], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(det.poses[0]), p3, rtol=1e-6)
    # invalid slots zeroed
    np.testing.assert_array_equal(np.asarray(det.scores[2:]), 0.0)


def test_nms_suppresses_duplicates_keeps_distinct(random_pose_factory):
    p1 = random_pose_factory()
    p2 = p1.copy()
    p2[:, 0] += 2.0                       # near-duplicate
    p3 = random_pose_factory()
    p3[:, 0] = p1[:, 0] + 400.0           # far away
    p3[:, 1] = p1[:, 1]

    def bbox(p):
        return [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]

    poses = np.zeros((8, 17, 3), np.float32)
    boxes = np.zeros((8, 4), np.float32)
    scores = np.zeros((8,), np.float32)
    valid = np.zeros((8,), bool)
    for i, (p, s) in enumerate([(p1, 0.9), (p2, 0.8), (p3, 0.7)]):
        poses[i], boxes[i], scores[i], valid[i] = p, bbox(p), s, True

    det = Detections(poses=jnp.asarray(poses), boxes=jnp.asarray(boxes),
                     scores=jnp.asarray(scores), valid=jnp.asarray(valid))
    out = pose_nms(det, max_keep=4)
    v = np.asarray(out.valid)
    assert v.sum() == 2
    s = np.asarray(out.scores)
    np.testing.assert_allclose(s[0], 0.9, rtol=1e-6)   # p1 kept (top score)
    np.testing.assert_allclose(s[1], 0.7, rtol=1e-6)   # p3 kept, p2 dropped


def test_nms_overlap_rule_iou_only():
    # Two boxes with IoU > 0.55 but no keypoints -> still suppressed by IoU.
    poses = np.zeros((2, 17, 3), np.float32)
    boxes = np.asarray([[0, 0, 100, 100], [5, 5, 105, 105]], np.float32)
    det = Detections(poses=jnp.asarray(poses), boxes=jnp.asarray(boxes),
                     scores=jnp.asarray([0.9, 0.8]),
                     valid=jnp.asarray([True, True]))
    ov = np.asarray(nms_overlap_matrix(det, 0.55, 0.55))
    assert ov[0, 1] and ov[1, 0]
    assert not ov[0, 0]

    # IoU below threshold, no co-visible keypoints -> no overlap
    boxes2 = jnp.asarray([[0, 0, 100, 100], [90, 90, 200, 200]], jnp.float32)
    det2 = det.replace(boxes=boxes2)
    ov2 = np.asarray(nms_overlap_matrix(det2, 0.55, 0.55))
    assert not ov2[0, 1]


def test_nms_max_keep_cap(random_pose_factory):
    n = 10
    poses = np.zeros((n, 17, 3), np.float32)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        p = random_pose_factory()
        p[:, 0] += i * 1000.0    # all far apart: nothing suppressed
        poses[i] = p
        boxes[i] = [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(),
                    p[:, 1].max()]
    det = Detections(poses=jnp.asarray(poses), boxes=jnp.asarray(boxes),
                     scores=jnp.asarray(np.linspace(0.9, 0.5, n),
                                        dtype=jnp.float32),
                     valid=jnp.ones((n,), bool))
    out = pose_nms(det, max_keep=4)
    assert np.asarray(out.valid).sum() == 4
    assert np.all(np.diff(np.asarray(out.scores)) <= 1e-6)


def test_letterbox_geometry():
    scale, new_w, new_h, pad_x, pad_y = letterbox_params(1920, 1080, 640)
    assert new_w == 640 and pad_x == 0
    assert new_h == 360 and pad_y == 140
    np.testing.assert_allclose(scale, 640 / 1920)


def test_letterbox_image_padding_and_values():
    img = np.full((100, 200, 3), 255, np.uint8)
    img[:, :, 0] = 0    # B=0 -> after BGR->RGB, channel 2 (B) is 0
    out = np.asarray(letterbox_image(jnp.asarray(img), target=64))
    assert out.shape == (3, 64, 64)
    _, _, new_h, _, pad_y = letterbox_params(200, 100, 64)
    # padding rows are gray 114/255
    np.testing.assert_allclose(out[:, 0, :], 114.0 / 255.0, rtol=1e-6)
    # content: R=1, G=1, B=0 (BGR input had B=0)
    mid = pad_y + new_h // 2
    np.testing.assert_allclose(out[0, mid, 32], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[2, mid, 32], 0.0, atol=1e-5)


def test_letterbox_selection_path_matches_matmul_path():
    """For exact-decimation geometries (all canonical video sizes) the
    strided-slice fast path must equal the general bilinear-matmul
    formulation bit-for-bit in f32 (at integer source positions
    bilinear IS selection, and both paths do the same single
    val * (1/255) multiply)."""
    from posebyte_tpu.ops.preprocess import (_selection_strides,
                                             letterbox_flat_nhwc)
    rng = np.random.default_rng(3)
    for (w, h, tgt) in [(1280, 720, 640), (1920, 1080, 640),
                        (1280, 720, 256)]:
        assert _selection_strides(w, h, tgt) is not None
        flat = jnp.asarray(rng.integers(0, 255, (h * w * 3,), np.uint8))
        fast = np.asarray(letterbox_flat_nhwc(flat, w, h, tgt))
        # selection=False forces the general matmul path — the lowering
        # the single-frame pipeline uses (batch-1 perf; runner._make_step)
        slow = np.asarray(
            letterbox_flat_nhwc(flat, w, h, tgt, selection=False))
        np.testing.assert_array_equal(fast, slow)
    # non-decimating geometry must NOT take the fast path
    assert _selection_strides(200, 100, 64) is None


def test_unletterbox_roundtrip():
    # model-space center of a 1920x1080 frame maps back to frame center
    xy = jnp.asarray([[320.0, 320.0]])
    back = np.asarray(unletterbox_coords(xy, 1920, 1080, 640))
    np.testing.assert_allclose(back[0], [960.0, 540.0], rtol=1e-5)


def test_decode_topk_matches_dense_path():
    import jax
    from posebyte_tpu.models import build_model, build_model_heads
    from posebyte_tpu.ops.decode import decode_topk

    apply_fn, init_fn = build_model("yolov8n-pose")
    heads_fn, _ = build_model_heads("yolov8n-pose")
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))

    raw = jax.jit(apply_fn)(params, x)
    dense = decode_yolo_output(raw[0], 0.25, 32)

    box, cls, kpt = jax.jit(heads_fn)(params, x)
    sparse = jax.jit(lambda b, c, k: decode_topk(b, c, k, 0.25, 32, 128))(
        box[0], cls[0], kpt[0])

    np.testing.assert_array_equal(np.asarray(dense.valid),
                                  np.asarray(sparse.valid))
    np.testing.assert_allclose(np.asarray(dense.scores),
                               np.asarray(sparse.scores), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.boxes),
                               np.asarray(sparse.boxes), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dense.poses),
                               np.asarray(sparse.poses), rtol=1e-4,
                               atol=1e-3)


def test_pose_nms_presorted_matches_general():
    """presorted=True (valid on decode_topk output, which is
    score-descending by construction) produces identical results to the
    general sorted path."""
    import jax
    import jax.numpy as jnp
    from posebyte_tpu.ops.decode import decode_topk
    from posebyte_tpu.ops.nms import pose_nms

    rng = np.random.default_rng(7)
    A, S = 756, 192
    box = jnp.asarray(rng.normal(size=(A, 64)), jnp.float32)
    cls = jnp.asarray(rng.normal(size=(A, 1)), jnp.float32)
    kpt = jnp.asarray(rng.normal(size=(A, 51)), jnp.float32)
    det = decode_topk(box, cls, kpt, 0.25, 64, S)

    a = jax.device_get(pose_nms(det, 0.55, 0.55, 16))
    b = jax.device_get(pose_nms(det, 0.55, 0.55, 16, presorted=True))
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-6)
    np.testing.assert_allclose(a.poses, b.poses, atol=1e-4)
    np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-4)
