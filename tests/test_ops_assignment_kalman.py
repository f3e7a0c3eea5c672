"""Unit tests for the auction/greedy assignment and Kalman ops."""
import numpy as np
import jax.numpy as jnp

from posebyte_tpu.core import constants as C
from posebyte_tpu.core.structs import KalmanState136
from posebyte_tpu.ops import (auction_assign, greedy_assign,
                              filter_matches_by_threshold,
                              cv_predict, cv_update, Kalman136)


def _assert_valid_matching(row, col):
    row, col = np.asarray(row), np.asarray(col)
    for r, c in enumerate(row):
        if c >= 0:
            assert col[c] == r
    for c, r in enumerate(col):
        if r >= 0:
            assert row[r] == c


def test_auction_identity_cost():
    n = 6
    cost = jnp.asarray(1.0 - np.eye(n), jnp.float32)
    row, col = auction_assign(cost)
    np.testing.assert_array_equal(np.asarray(row), np.arange(n))
    _assert_valid_matching(row, col)


def test_auction_matches_scipy_optimal_cost(rng):
    from scipy.optimize import linear_sum_assignment
    for trial in range(5):
        cost_np = rng.uniform(0, 1, size=(12, 12)).astype(np.float32)
        row, col = auction_assign(jnp.asarray(cost_np))
        _assert_valid_matching(row, col)
        r = np.asarray(row)
        assert (r >= 0).all()
        got = cost_np[np.arange(12), r].sum()
        ri, ci = linear_sum_assignment(cost_np)
        opt = cost_np[ri, ci].sum()
        # epsilon-scaled auction: near-optimal within n*eps slack
        assert got <= opt + 12 * (1.0 / 13.0) + 1e-4


def test_auction_rectangular_and_inactive():
    cost = jnp.asarray([[0.1, 0.9, 0.8],
                        [0.9, 0.2, 0.8],
                        [0.5, 0.6, 0.9],
                        [0.4, 0.5, 0.6]], jnp.float32)
    active = jnp.asarray([True, True, False, True])
    row, col = auction_assign(cost, active)
    _assert_valid_matching(row, col)
    assert int(row[2]) == -1          # inactive row never matched
    assert int(row[0]) == 0 and int(row[1]) == 1


def test_auction_skips_locked_pairs():
    # Row 1's only options are lock sentinels -> must stay unmatched.
    cost = jnp.asarray([[0.1, 1e9], [1e9, 1e9]], jnp.float32)
    row, col = auction_assign(cost)
    assert int(row[0]) == 0
    assert int(row[1]) == -1
    assert int(col[1]) == -1


def test_threshold_filter():
    cost = jnp.asarray([[0.1, 0.9], [0.9, 0.8]], jnp.float32)
    row, col = auction_assign(cost)
    row2, col2 = filter_matches_by_threshold(cost, row, col, 0.5)
    assert int(row2[0]) == 0
    assert int(row2[1]) == -1
    assert int(col2[1]) == -1


def test_greedy_assign_globally_sorted():
    cost = jnp.asarray([[0.3, 0.1],
                        [0.2, 0.15]], jnp.float32)
    row, col = greedy_assign(cost, threshold=0.5)
    # global order: (0,1)=0.1 first, then (1,0)=0.2
    assert int(row[0]) == 1 and int(row[1]) == 0
    _assert_valid_matching(row, col)
    # threshold respected
    row2, _ = greedy_assign(cost, threshold=0.12)
    assert int(row2[0]) == 1 and int(row2[1]) == -1


def test_cv_predict_and_lost_decay():
    poses = jnp.ones((2, 17, 3)) * 100.0
    vel = jnp.ones((2, 17, 2)) * 2.0
    active = jnp.asarray([True, True])
    states = jnp.asarray([C.TRACK_STATE_CONFIRMED, C.TRACK_STATE_LOST],
                         jnp.int32)
    pred, new_vel = cv_predict(poses, vel, active, states)
    np.testing.assert_allclose(np.asarray(pred[0, :, :2]), 102.0)
    np.testing.assert_allclose(np.asarray(pred[0, :, 2]), 100.0)  # conf kept
    np.testing.assert_allclose(np.asarray(new_vel[0]), 2.0)
    np.testing.assert_allclose(np.asarray(new_vel[1]), 1.9)       # 0.95 decay


def test_cv_update_constant_gain():
    poses = jnp.zeros((1, 17, 3))
    vel = jnp.zeros((1, 17, 2))
    det = jnp.ones((4, 17, 3)) * 10.0
    row_assign = jnp.asarray([2], jnp.int32)
    active = jnp.asarray([True])
    new_poses, new_vel = cv_update(poses, vel, det, row_assign, active)
    K = 0.3 / (0.3 + 0.1)
    np.testing.assert_allclose(np.asarray(new_poses[0, :, :2]), K * 10.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_poses[0, :, 2]), 10.0)
    np.testing.assert_allclose(np.asarray(new_vel[0]), 0.3 * 10.0, rtol=1e-6)

    # unmatched -> untouched
    new_poses2, _ = cv_update(poses, vel, det, jnp.asarray([-1]), active)
    np.testing.assert_array_equal(np.asarray(new_poses2), 0.0)


def test_kalman136_roundtrip(random_pose_factory):
    state = KalmanState136.init(8)
    det = jnp.asarray(np.stack([random_pose_factory() for _ in range(2)]))
    slots = jnp.asarray([3, 5], jnp.int32)
    state = Kalman136.initiate(state, det, slots, jnp.asarray([True, True]))

    # init: mean position = detection, derivatives 0; pos var 10
    m = np.asarray(state.mean).reshape(8, 17, 8)
    np.testing.assert_allclose(m[3, :, 0:2], np.asarray(det[0, :, 0:2]),
                               rtol=1e-6)
    np.testing.assert_array_equal(m[3, :, 2:], 0.0)
    cov = np.asarray(state.cov_diag).reshape(8, 17, 8)
    np.testing.assert_allclose(cov[3, :, 0], 10.0)
    np.testing.assert_allclose(cov[3, :, 4], 100.0)

    # predict with zero derivatives keeps position, adds process noise
    state2 = Kalman136.predict(state)
    m2 = np.asarray(state2.mean).reshape(8, 17, 8)
    np.testing.assert_allclose(m2[3, :, 0:2], m[3, :, 0:2], rtol=1e-6)
    cov2 = np.asarray(state2.cov_diag).reshape(8, 17, 8)
    np.testing.assert_allclose(cov2[3, :, 0], 11.0)   # 10 + 1.0^2

    # update toward a shifted measurement
    shifted = np.asarray(det).copy()
    shifted[0, :, 0] += 8.0
    state3 = Kalman136.update(state2, jnp.asarray(shifted),
                              jnp.asarray([3], jnp.int32),
                              jnp.asarray([0], jnp.int32),
                              jnp.asarray([True]))
    m3 = np.asarray(state3.mean).reshape(8, 17, 8)
    conf = np.asarray(det)[0, :, 2]
    R = 5.0 / (conf + 0.1)
    K = 11.0 / (11.0 + R)
    np.testing.assert_allclose(m3[3, :, 0], m2[3, :, 0] + K * 8.0, rtol=1e-4)
    np.testing.assert_allclose(m3[3, :, 2], 0.5 * K * 8.0, rtol=1e-4)
    # untouched slot unchanged
    np.testing.assert_allclose(m3[5], m2[5], rtol=1e-6)

    poses = Kalman136.extract_poses(state3)
    assert poses.shape == (8, 17, 3)
    np.testing.assert_allclose(np.asarray(poses[3, :, 0]), m3[3, :, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(poses[:, :, 2]), 1.0)


def test_kalman136_third_order_transition():
    state = KalmanState136.init(1)
    mean = np.zeros((1, 17, 8), np.float32)
    mean[0, :, 0] = 10.0   # px
    mean[0, :, 2] = 2.0    # vx
    mean[0, :, 4] = 1.0    # ax
    mean[0, :, 6] = 0.6    # jx
    state = KalmanState136(mean=jnp.asarray(mean.reshape(1, -1)),
                           cov_diag=state.cov_diag)
    out = np.asarray(Kalman136.predict(state, accel_memory=0.9,
                                       jerk_memory=0.8).mean)
    out = out.reshape(1, 17, 8)
    np.testing.assert_allclose(out[0, :, 0], 10 + 2 + 0.5 * 1 + 0.6 / 6.0,
                               rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 2], 2 + 1 + 0.3, rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 4], 0.9, rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 6], 0.48, rtol=1e-5)
