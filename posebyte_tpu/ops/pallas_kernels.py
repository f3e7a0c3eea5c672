"""Pallas TPU kernels for the association hot path.

The tracker dispatches three auction tiers per frame, each running
min(3R, 50) Jacobi rounds over the [T, D] cost matrix
(reference: hungarian.cu:27-123; ops/assignment.py). As an XLA
`fori_loop` every round's carry (assignments, prices) round-trips
through HBM; as a single Pallas kernel the entire auction — all rounds —
runs out of VMEM: one HBM read of the cost matrix, one HBM write of the
assignments.

The kernel reproduces ops/assignment.py's semantics exactly (same
iteration budget, epsilon decay, lock-sentinel bid suppression), and the
wrapper pads the column axis to the 128-lane width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _auction_kernel(cost_ref, active_ref, row_out_ref, col_out_ref,
                    *, num_iters: int):
    cost = cost_ref[:]                          # [R, C] f32
    active = active_ref[:]                      # [R, 1] int32
    R, C = cost.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)

    def round_fn(_, carry):
        row_assign, col_assign, prices, eps = carry
        # row_assign [R,1], col_assign [1,C], prices [1,C] f32

        value = -cost - prices                  # [R,C]
        best_val = jnp.max(value, axis=1, keepdims=True)         # [R,1]
        best_col = jnp.argmax(value, axis=1, keepdims=True) \
            .astype(jnp.int32)                                   # [R,1]
        is_best = col_ids == best_col                            # [R,C]
        second_val = jnp.max(jnp.where(is_best, _NEG, value),
                             axis=1, keepdims=True)              # [R,1]
        bidder = (row_assign < 0) & (active > 0) & (best_val > -1e8)
        bid = best_val - second_val + eps                        # [R,1]

        bid_matrix = jnp.where(is_best & bidder, bid, _NEG)      # [R,C]
        col_best = jnp.max(bid_matrix, axis=0, keepdims=True)    # [1,C]
        col_bidder = jnp.argmax(bid_matrix, axis=0, keepdims=True) \
            .astype(jnp.int32)                                   # [1,C]
        col_won = col_best > _NEG / 2

        new_col_assign = jnp.where(col_won, col_bidder, col_assign)
        new_prices = jnp.where(col_won, prices + col_best, prices)

        owned = new_col_assign == row_ids                        # [R,C]
        any_owned = jnp.any(owned, axis=1, keepdims=True)        # [R,1]
        col_of_row = jnp.max(jnp.where(owned, col_ids, -1),
                             axis=1, keepdims=True)              # [R,1]
        new_row_assign = jnp.where(any_owned, col_of_row,
                                   jnp.int32(-1))
        return new_row_assign, new_col_assign, new_prices, eps * 0.9

    init = (jnp.full((R, 1), -1, jnp.int32),
            jnp.full((1, C), -1, jnp.int32),
            jnp.zeros((1, C), jnp.float32),
            jnp.float32(1.0 / (R + 1)))
    row_assign, col_assign, _, _ = jax.lax.fori_loop(
        0, num_iters, round_fn, init)
    row_out_ref[:] = row_assign
    col_out_ref[:] = col_assign


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "interpret"))
def auction_assign_pallas(cost: jnp.ndarray,
                          row_active: jnp.ndarray | None = None,
                          num_iters: int | None = None,
                          interpret: bool = False):
    """Pallas auction: drop-in for ops.assignment.auction_assign.

    cost [R, C] float32 (locked pairs at ~1e9), row_active [R] bool.
    Returns (row_assign [R] int32, col_assign [C] int32).
    """
    R, C = cost.shape
    if num_iters is None:
        num_iters = min(R * 3, 50)
    if row_active is None:
        row_active = jnp.ones((R,), bool)

    # Pad to hardware-friendly tiles: columns to 128 lanes, rows to a
    # multiple of 8 sublanes. Padded columns carry lock-cost so they
    # never win; padded rows are inactive.
    Rp = max(8, -(-R // 8) * 8)
    Cp = max(128, -(-C // 128) * 128)
    cost_p = jnp.full((Rp, Cp), 1e9, jnp.float32) \
        .at[:R, :C].set(cost.astype(jnp.float32))
    active_p = jnp.zeros((Rp, 1), jnp.int32) \
        .at[:R, 0].set(row_active.astype(jnp.int32))

    row_out, col_out = pl.pallas_call(
        functools.partial(_auction_kernel, num_iters=num_iters),
        out_shape=(jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, Cp), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(cost_p, active_p)

    row_assign = row_out[:R, 0]
    col_assign = col_out[0, :C]
    # Paired indices referencing padded region (shouldn't happen; guard).
    row_assign = jnp.where(row_assign >= C, -1, row_assign)
    col_assign = jnp.where(col_assign >= R, -1, col_assign)
    return row_assign, col_assign
