"""Linear assignment: Jacobi auction and greedy matchers.

TPU-native reformulation of the reference's auction solver
(reference: src/cuda/hungarian.cu:27-123 kernelAuctionBidding /
kernelAuctionAssignment, and solveDeviceAsyncWithActive at 358-405).

The CUDA version scans all columns per row-thread; here each auction
round is two fully vectorized steps on [R, C] tensors:

  1. bidding  — per unassigned active row, top-2 of value = -cost - price
  2. awarding — per column, argmax over that column's bids; winner takes
                the column, evicting the previous owner, and the price
                rises by (best - second + epsilon)

which is the same Jacobi auction recurrence, expressed as masked
reductions the VPU executes in a handful of fused ops. The loop runs a
fixed min(3*rows, 50) rounds with epsilon *= 0.9 per round and no
convergence sync, matching the reference's device path exactly
(hungarian.cu:378-403, including the quirk that the device path never
applies its cost threshold — gating and locked costs constrain matches).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


def auction_iterations(num_rows: int) -> int:
    """Fixed iteration budget (reference: hungarian.cu:379)."""
    return min(num_rows * 3, 50)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def auction_assign(cost: jnp.ndarray,
                   row_active: jnp.ndarray | None = None,
                   num_iters: int | None = None):
    """Solve min-cost assignment by Jacobi auction.

    Args:
      cost: [R, C] cost matrix (lower is better). Locked / ungated pairs
        should carry a large cost (1e9) as the tracker does.
      row_active: optional [R] bool; inactive rows never bid
        (reference: hungarian.cu:47-53).
      num_iters: fixed rounds; defaults to min(3R, 50).

    Returns:
      (row_assign [R] int32, col_assign [C] int32), -1 where unassigned.
    """
    R, Ccols = cost.shape
    if num_iters is None:
        num_iters = auction_iterations(R)
    if row_active is None:
        row_active = jnp.ones((R,), bool)

    row_ids = jnp.arange(R, dtype=jnp.int32)

    def round_fn(_, carry):
        row_assign, col_assign, prices, eps = carry

        # --- bidding: value = -cost - price; top-2 per unassigned row ---
        value = -cost - prices[None, :]                      # [R,C]
        # Rows whose best remaining option is a lock sentinel (>= ~1e8
        # cost) do not bid. The reference would let such rows "win"
        # locked pairs because its device path ignores the cost
        # threshold (hungarian.cu:358-405); suppressing the bid keeps
        # every legitimate match identical while preventing degenerate
        # lock matches (see tracker/step.py divergence notes).
        bidder = (row_assign < 0) & row_active               # [R]
        best_col = jnp.argmax(value, axis=1).astype(jnp.int32)
        best_val = jnp.max(value, axis=1)
        bidder = bidder & (best_val > -1e8)
        masked = jnp.where(
            jax.nn.one_hot(best_col, Ccols, dtype=bool), _NEG, value)
        second_val = jnp.max(masked, axis=1)
        bid = best_val - second_val + eps                    # [R]

        # --- awarding: per column, the highest bidder wins -------------
        # bid_matrix[r, c] = bid[r] if row r bids on column c else -inf
        bids_on = jax.nn.one_hot(best_col, Ccols, dtype=bool) & bidder[:, None]
        bid_matrix = jnp.where(bids_on, bid[:, None], _NEG)  # [R,C]
        col_best_bid = jnp.max(bid_matrix, axis=0)           # [C]
        col_bidder = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
        col_won = col_best_bid > _NEG / 2                    # [C]

        new_col_assign = jnp.where(col_won, col_bidder, col_assign)
        prices = jnp.where(col_won, prices + col_best_bid, prices)

        # Row side: row r owns column c iff new_col_assign[c] == r.
        # (covers winning rows, evicted previous owners, and unchanged.)
        owner_of = new_col_assign                             # [C]
        owned = owner_of[None, :] == row_ids[:, None]         # [R,C]
        col_idx = jnp.argmax(owned, axis=1).astype(jnp.int32)
        new_row_assign = jnp.where(jnp.any(owned, axis=1), col_idx,
                                   jnp.int32(-1))

        return new_row_assign, new_col_assign, prices, eps * 0.9

    eps0 = jnp.float32(1.0 / (R + 1))
    init = (jnp.full((R,), -1, jnp.int32),
            jnp.full((Ccols,), -1, jnp.int32),
            jnp.zeros((Ccols,), jnp.float32),
            eps0)
    row_assign, col_assign, _, _ = jax.lax.fori_loop(
        0, num_iters, round_fn, init)
    return row_assign, col_assign


def filter_matches_by_threshold(cost: jnp.ndarray,
                                row_assign: jnp.ndarray,
                                col_assign: jnp.ndarray,
                                threshold: float):
    """Post-hoc threshold filter used by the reference *host* solver only
    (reference: hungarian.cu:324-336): invalidate matches whose cost
    exceeds the threshold. The device path never applies this."""
    R, Ccols = cost.shape
    safe_col = jnp.clip(row_assign, 0, Ccols - 1)
    match_cost = jnp.take_along_axis(cost, safe_col[:, None], axis=1)[:, 0]
    bad = (row_assign >= 0) & (match_cost > threshold)
    new_row = jnp.where(bad, -1, row_assign)
    # Invalidate the paired column entries too.
    bad_cols = jnp.zeros((Ccols,), bool).at[safe_col].max(bad, mode="drop")
    new_col = jnp.where(bad_cols, -1, col_assign)
    return new_row, new_col


@functools.partial(jax.jit, static_argnames=("max_matches",))
def greedy_assign(cost: jnp.ndarray, threshold: float = 1e9,
                  max_matches: int | None = None):
    """Globally score-ordered greedy assignment.

    Deterministic equivalent of the reference's greedy matcher family
    (reference: hungarian.cu:126-157 kernelGreedyMatch with atomicCAS
    column claiming, and the sorted CPU fallback at 454-518): repeatedly
    take the globally cheapest remaining (row, col) pair under the
    threshold. Unlike the racy atomicCAS kernel, this matches the sorted
    CPU path bit-for-bit.
    """
    R, Ccols = cost.shape
    if max_matches is None:
        max_matches = min(R, Ccols)

    def body(_, carry):
        row_assign, col_assign, cur = carry
        flat = jnp.ravel(cur)
        idx = jnp.argmin(flat)
        best = flat[idx]
        r = (idx // Ccols).astype(jnp.int32)
        c = (idx % Ccols).astype(jnp.int32)
        take = best < threshold
        row_assign = jnp.where(take, row_assign.at[r].set(c), row_assign)
        col_assign = jnp.where(take, col_assign.at[c].set(r), col_assign)
        cur = jnp.where(take, cur.at[r, :].set(jnp.inf).at[:, c].set(jnp.inf),
                        cur)
        return row_assign, col_assign, cur

    init = (jnp.full((R,), -1, jnp.int32),
            jnp.full((Ccols,), -1, jnp.int32),
            cost.astype(jnp.float32))
    row_assign, col_assign, _ = jax.lax.fori_loop(0, max_matches, body, init)
    return row_assign, col_assign
