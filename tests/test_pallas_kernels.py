"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.ops.assignment import auction_assign
from posebyte_tpu.ops.pallas_kernels import auction_assign_pallas


def _check_equiv(cost_np, active_np=None):
    cost = jnp.asarray(cost_np)
    active = None if active_np is None else jnp.asarray(active_np)
    r1, c1 = auction_assign(cost, active)
    r2, c2 = auction_assign_pallas(cost, active, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_auction_pallas_matches_xla(rng):
    for trial in range(3):
        cost = rng.uniform(0, 1, (16, 12)).astype(np.float32)
        _check_equiv(cost)


def test_auction_pallas_with_locks_and_active(rng):
    cost = rng.uniform(0, 1, (24, 16)).astype(np.float32)
    cost[5, :] = 1e9                      # fully locked row
    cost[:, 3] = 1e9                      # fully locked column
    active = np.ones(24, bool)
    active[7] = False
    _check_equiv(cost, active)


def test_auction_pallas_tracker_shape(rng):
    cost = rng.uniform(0, 1, (128, 64)).astype(np.float32)
    cost[rng.uniform(size=(128, 64)) < 0.7] = 1e9   # sparse gating
    _check_equiv(cost)


def test_nms_keep_pallas_matches_xla(rng):
    from posebyte_tpu.core.structs import Detections
    from posebyte_tpu.ops.nms import nms_overlap_matrix, _greedy_keep
    from posebyte_tpu.ops.pallas_kernels import nms_keep_pallas

    n = 64
    poses = rng.uniform(0, 640, (n, 17, 3)).astype(np.float32)
    poses[..., 2] = rng.uniform(0, 1, (n, 17))
    # clusters to force suppression chains
    poses[1::4] = poses[0::4] + rng.normal(0, 3, poses[1::4].shape) \
        .astype(np.float32)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = poses[..., 0].min(axis=1)
    boxes[:, 1] = poses[..., 1].min(axis=1)
    boxes[:, 2] = poses[..., 0].max(axis=1)
    boxes[:, 3] = poses[..., 1].max(axis=1)
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-5:] = False

    order = np.argsort(-np.where(valid, scores, -np.inf))
    det_sorted = Detections(
        poses=jnp.asarray(poses[order]), boxes=jnp.asarray(boxes[order]),
        scores=jnp.asarray(scores[order]), valid=jnp.asarray(valid[order]))

    overlap = nms_overlap_matrix(det_sorted, 0.55, 0.55)
    want = np.asarray(_greedy_keep(overlap, det_sorted.valid))
    got = np.asarray(nms_keep_pallas(det_sorted.poses, det_sorted.boxes,
                                     det_sorted.valid, 0.55, 0.55,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)


def test_conv3x3_int8_pallas_matches_xla(rng):
    """ops/pallas_conv.py (int8 conv prototype) is bit-exact vs XLA's
    int8 conv lowering: int32 accumulation + per-channel dequant."""
    import jax.numpy as jnp
    from jax import lax
    from posebyte_tpu.ops.pallas_conv import conv3x3_int8_pallas

    B, H, W, C, O = 2, 8, 8, 128, 128
    xq = rng.integers(-127, 128, (B, H, W, C)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, C, O)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, O).astype(np.float32)
    ref = lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    ref = (ref.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    got = conv3x3_int8_pallas(jnp.asarray(xq), jnp.asarray(wq),
                              jnp.asarray(scale), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))
