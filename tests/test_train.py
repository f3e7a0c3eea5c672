"""Training machinery (models/train.py): assignment correctness and a
tiny overfit run (loss decreases and the oracle-free detection loop
starts finding objects)."""
import jax
import jax.numpy as jnp
import numpy as np

from posebyte_tpu.models.train import (assign_targets, batch_loss,
                                       make_scan_train, pose_loss)
from posebyte_tpu.models.yolo_pose import make_anchors


def test_assign_targets_center_neighborhood():
    """A box gets its 3x3 center-cell neighborhood at the size-matched
    level; cells outside the box or grid are masked."""
    S = 256
    # 48px box centered at (100, 60) -> level 0 (stride 8)
    boxes = jnp.asarray([[76.0, 36.0, 124.0, 84.0]])
    valid = jnp.asarray([True])
    idx, mask = jax.device_get(assign_targets(boxes, valid, S))
    anchors, strides = make_anchors(S)
    sel = idx[0][mask[0]]
    assert len(sel) == 9                        # full 3x3 inside the box
    assert (strides[sel] == 8).all()
    # every selected cell center lies inside the box
    ctr = anchors[sel] * strides[sel][:, None]
    assert (ctr[:, 0] >= 76).all() and (ctr[:, 0] <= 124).all()
    assert (ctr[:, 1] >= 36).all() and (ctr[:, 1] <= 84).all()
    # the center cell itself is among them
    cx_cell = (100 // 8) + (60 // 8) * (S // 8)
    assert cx_cell in sel

    # a 150px box selects stride 16
    boxes2 = jnp.asarray([[50.0, 50.0, 200.0, 180.0]])
    idx2, mask2 = jax.device_get(assign_targets(boxes2, valid, S))
    assert (strides[idx2[0][mask2[0]]] == 16).all()

    # invalid GT assigns nothing
    _, mask3 = jax.device_get(
        assign_targets(boxes, jnp.asarray([False]), S))
    assert not mask3.any()


def test_pose_loss_zero_for_perfect_prediction():
    """Oracle-style perfect logits give near-zero box/kpt losses."""
    from posebyte_tpu.models.oracle import encode_oracle_head
    from posebyte_tpu.utils.synthetic import SyntheticScene, pose_bbox

    S = 256
    scene = SyntheticScene(2, 256, 256, seed=5, scale_range=(60.0, 90.0))
    gt = scene.step()
    boxes = np.stack([pose_bbox(p) for p in gt])
    head = encode_oracle_head(gt, boxes, np.full(len(gt), 0.99,
                                                 np.float32), S)
    P = 8
    gp = np.zeros((P, 17, 3), np.float32)
    gb = np.zeros((P, 4), np.float32)
    gv = np.zeros((P,), bool)
    gp[:len(gt)] = gt
    gb[:len(gt)] = boxes
    gv[:len(gt)] = True

    total, parts = jax.device_get(pose_loss(
        jnp.asarray(head["box"]), jnp.asarray(head["cls"]),
        jnp.asarray(head["kpt"]), jnp.asarray(gp), jnp.asarray(gb),
        jnp.asarray(gv), S))
    # the oracle encodes ONE cell per object; the 3x3 assignment expects
    # neighbors too, so cls isn't 0 — but the kpt regression at the
    # center cell must be tiny relative to a random-logits baseline
    rng = np.random.default_rng(0)
    rtotal, rparts = jax.device_get(pose_loss(
        jnp.asarray(rng.normal(0, 1, head["box"].shape), np.float32),
        jnp.asarray(rng.normal(0, 1, head["cls"].shape), np.float32),
        jnp.asarray(rng.normal(0, 1, head["kpt"].shape), np.float32),
        jnp.asarray(gp), jnp.asarray(gb), jnp.asarray(gv), S))
    assert float(total) < float(rtotal) * 0.7
    assert float(parts["dfl"]) < float(rparts["dfl"])


def test_tiny_overfit_loss_decreases():
    """A few scan-train steps on one tiny batch: loss must drop
    monotonically-ish (smoke of grads + optimizer + scan plumbing)."""
    import optax
    S = 64
    rng = np.random.default_rng(3)
    N, P = 8, 4
    data = {
        "img": jnp.asarray(rng.integers(0, 255, (N, S, S, 3),
                                        dtype=np.uint8)),
        "poses": jnp.asarray(
            rng.uniform(10, 54, (N, P, 17, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.sort(rng.uniform(5, 59, (N, P, 2, 2)).astype(np.float32),
                    axis=2).transpose(0, 1, 3, 2).reshape(N, P, 4)),
        "valid": jnp.asarray(np.ones((N, P), bool)),
    }
    data["poses"] = data["poses"].at[..., 2].set(1.0)

    from posebyte_tpu.models.yolo_pose import init_params
    params = init_params(jax.random.PRNGKey(0), "yolov8n-pose")
    opt = optax.adam(3e-3)
    run = jax.jit(make_scan_train("yolov8n-pose", S, opt, batch_size=4))
    st = opt.init(params)
    params, st, l1 = run(params, st, data, jax.random.split(
        jax.random.PRNGKey(1), 6))
    params, st, l2 = run(params, st, data, jax.random.split(
        jax.random.PRNGKey(2), 6))
    l1, l2 = np.asarray(l1), np.asarray(l2)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    assert l2.mean() < l1.mean()
    assert l2[-1] < l1[0] * 0.7
