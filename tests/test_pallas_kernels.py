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
