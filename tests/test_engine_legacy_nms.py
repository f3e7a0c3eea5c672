"""Tests for the legacy NMS path and the YoloPoseEngine facade."""
import numpy as np
import jax
import jax.numpy as jnp

from posebyte_tpu.core.config import DetectorConfig
from posebyte_tpu.core.structs import Detections
from posebyte_tpu.ops.legacy_nms import (legacy_pose_nms,
                                         legacy_oks_pair_matrix)
from posebyte_tpu.models.engine import YoloPoseEngine


def _np_legacy_nms(poses, boxes, scores, score_threshold=0.0):
    """Direct NumPy port of NMSCuda::apply (nms.cu:142-306)."""
    from posebyte_tpu.core import constants as C

    def oks(p1, p2):
        def bbox_area(p):
            m = p[:, 2] > 0.2
            if m.sum() < 3:
                return None
            xs, ys = p[m, 0], p[m, 1]
            return (xs.max() - xs.min()) * (ys.max() - ys.min())
        a1, a2 = bbox_area(p1), bbox_area(p2)
        if a1 is None or a2 is None:
            return 0.0
        s2 = max(max(a1, a2), 32.0 ** 2)
        tot, cnt = 0.0, 0
        for k in range(17):
            if p1[k, 2] > 0.2 and p2[k, 2] > 0.2:
                d2 = (p1[k, 0] - p2[k, 0]) ** 2 + (p1[k, 1] - p2[k, 1]) ** 2
                tot += np.exp(-d2 / (2 * s2 * 4 * C.COCO_SIGMAS[k] ** 2))
                cnt += 1
        return tot / cnt if cnt >= 3 else 0.0

    def iou(b1, b2):
        ix = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
        iy = max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
        inter = ix * iy
        u = ((b1[2] - b1[0]) * (b1[3] - b1[1])
             + (b2[2] - b2[0]) * (b2[3] - b2[1]) - inter)
        return inter / u if u > 0 else 0.0

    idx = [i for i in range(len(scores)) if scores[i] >= score_threshold]
    idx.sort(key=lambda i: -scores[i])
    suppressed = set()
    keep = []
    for ii, i in enumerate(idx):
        if i in suppressed:
            continue
        keep.append(i)
        for j in idx[ii + 1:]:
            if j in suppressed:
                continue
            v_iou = iou(boxes[i], boxes[j])
            if v_iou > 0.55:
                suppressed.add(j); continue
            v_oks = oks(poses[i], poses[j])
            if v_oks > 0.5:
                suppressed.add(j); continue
            if v_iou > 0.2 and v_oks > 0.4:
                suppressed.add(j); continue
            c1 = ((boxes[i][0] + boxes[i][2]) / 2,
                  (boxes[i][1] + boxes[i][3]) / 2)
            c2 = ((boxes[j][0] + boxes[j][2]) / 2,
                  (boxes[j][1] + boxes[j][3]) / 2)
            scale = max(boxes[i][2] - boxes[i][0],
                        boxes[i][3] - boxes[i][1], 32.0)
            dist = np.hypot(c1[0] - c2[0], c1[1] - c2[1])
            if dist / scale < 0.3 and v_oks > 0.15:
                suppressed.add(j)
    return keep


def test_legacy_nms_matches_numpy_port(random_pose_factory):
    rng = np.random.default_rng(7)
    n = 24
    poses = np.zeros((n, 17, 3), np.float32)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        p = random_pose_factory()
        # cluster some poses to force suppressions
        if i % 3:
            p[:, 0] += rng.normal(0, 8)
            p[:, 1] += rng.normal(0, 8)
        poses[i] = p
        boxes[i] = [p[:, 0].min() - 5, p[:, 1].min() - 5,
                    p[:, 0].max() + 5, p[:, 1].max() + 5]
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)

    det = Detections(poses=jnp.asarray(poses), boxes=jnp.asarray(boxes),
                     scores=jnp.asarray(scores),
                     valid=jnp.ones((n,), bool))
    out = legacy_pose_nms(det, max_keep=24)

    want_keep = _np_legacy_nms(poses, boxes, scores)
    got_scores = np.asarray(out.scores)[np.asarray(out.valid)]
    want_scores = np.sort(scores[want_keep])[::-1]
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)


def test_legacy_oks_symmetry(random_pose_factory):
    poses = np.stack([random_pose_factory() for _ in range(6)])
    m = np.asarray(legacy_oks_pair_matrix(jnp.asarray(poses)))
    np.testing.assert_allclose(m, m.T, rtol=1e-5)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)


def test_engine_roundtrip_and_paths(tmp_path):
    cfg = DetectorConfig(input_size=192, max_candidates=32,
                         max_detections=8)
    eng = YoloPoseEngine("yolov8n-pose", cfg, precision="fp32")

    # save/load
    path = str(tmp_path / "eng.safetensors")
    eng.save_engine(path)
    eng2 = YoloPoseEngine.load_engine(path, config=cfg)
    assert eng2.model_name == "yolov8n-pose"

    frame = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), dtype=np.uint8)

    # legacy host path
    dets = eng.detect(frame)
    assert isinstance(dets, list)
    for d in dets:
        assert d["keypoints"].shape == (17, 3)

    # batched path
    batch = eng.detect_batch(np.stack([frame, frame]))
    assert len(batch) == 2

    # device-native path chains into Detections
    flat = jnp.asarray(frame.reshape(-1))
    det = eng.detect_device_native(flat, 120, 160)
    assert det.poses.shape == (8, 17, 3)
    assert eng.get_last_inference_time() > 0

    # device -> host list
    lst = eng.detect_from_device(flat, 120, 160)
    assert isinstance(lst, list)


def test_engine_params_mutation_takes_effect():
    """Mutating engine.params after a first call must change outputs on
    the next call (regression: jit closures capturing self.params at
    first trace silently served stale weights)."""
    cfg = DetectorConfig(input_size=128, max_candidates=16,
                         max_detections=4)
    eng = YoloPoseEngine("yolov8n-pose", cfg, precision="fp32")
    frame = np.random.default_rng(1).integers(
        0, 255, (96, 128, 3), dtype=np.uint8)
    flat = jnp.asarray(frame.reshape(-1))

    raw1 = jax.device_get(
        eng.detect_device_native(flat, 96, 128).scores)
    # re-weight in place: same pytree structure, different values
    eng.params = jax.tree.map(lambda x: x * 1.5, eng.params)
    raw2 = jax.device_get(
        eng.detect_device_native(flat, 96, 128).scores)
    assert not np.allclose(raw1, raw2)

    # quantization changes structure too (int8 w + scale): also served
    from posebyte_tpu.models.quant import quantize_params
    eng.params = quantize_params(
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), eng.params))
    det3 = eng.detect_device_native(flat, 96, 128)
    assert det3.poses.shape == (4, 17, 3)
