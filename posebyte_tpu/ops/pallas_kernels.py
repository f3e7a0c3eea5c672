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


def auction_rounds(cost, active, num_iters: int):
    """The auction itself, on VMEM values: cost [R, C] f32 (locked pairs
    ~1e9), active [R, 1] int32 -> (row_assign [R, 1], col_assign [1, C])
    int32. Shared by the standalone kernel below and the fused tracker
    chunk kernel (ops/pallas_tracker.py)."""
    R, C = cost.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)

    # Early exit is EXACT: a round with no bidders changes nothing
    # (prices only move on a won bid, and every bid re-assigns a row),
    # so once no unassigned active row can bid the remaining rounds of
    # the reference's fixed budget are no-ops. The carry stays
    # int32/f32-only (Mosaic rejects boolean loop carries).
    def cond(carry):
        _, _, _, _, it, cont = carry
        return (it < num_iters) & (cont > 0)

    def round_fn(carry):
        row_assign, col_assign, prices, eps, it, _ = carry
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
        cont = jnp.any(bidder).astype(jnp.int32)
        return (new_row_assign, new_col_assign, new_prices, eps * 0.9,
                it + 1, cont)

    init = (jnp.full((R, 1), -1, jnp.int32),
            jnp.full((1, C), -1, jnp.int32),
            jnp.zeros((1, C), jnp.float32),
            jnp.float32(1.0 / (R + 1)),
            jnp.int32(0), jnp.int32(1))
    row_assign, col_assign, _, _, _, _ = jax.lax.while_loop(
        cond, round_fn, init)
    return row_assign, col_assign


def _auction_kernel(cost_ref, active_ref, row_out_ref, col_out_ref,
                    *, num_iters: int):
    row_assign, col_assign = auction_rounds(cost_ref[:], active_ref[:],
                                            num_iters)
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


# ---------------------------------------------------------------------------
# Fused pose-NMS kernel: overlap matrix + greedy fixed point in VMEM
# ---------------------------------------------------------------------------

def _nms_kernel(xr_ref, xc_ref, yr_ref, yc_ref, cr_ref, cc_ref,
                br_ref, bc_ref, valid_ref, sig_ref, keep_ref,
                *, num_kp: int, iou_threshold: float,
                oks_threshold: float):
    """Inputs are score-sorted. Layouts: *r = [pad, N] row-broadcast
    copies, *c = [N, pad] column-broadcast copies; boxes b* hold
    x1,y1,x2,y2 in slots 0-3; valid [1, N] int32; sig [1, pad(kp)] holds
    4*sigma^2. Output keep [1, N] int32 (rank space)."""
    N = xr_ref.shape[1]

    # --- pairwise IoU from boxes ----------------------------------------
    x1r = br_ref[0:1, :]; y1r = br_ref[1:2, :]
    x2r = br_ref[2:3, :]; y2r = br_ref[3:4, :]
    x1c = bc_ref[:, 0:1]; y1c = bc_ref[:, 1:2]
    x2c = bc_ref[:, 2:3]; y2c = bc_ref[:, 3:4]

    ix = jnp.maximum(0.0, jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r))
    iy = jnp.maximum(0.0, jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r))
    inter = ix * iy                                        # [N,N]
    area_c = (x2c - x1c) * (y2c - y1c)                     # [N,1]
    area_r = (x2r - x1r) * (y2r - y1r)                     # [1,N]
    union = area_c + area_r - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

    scale_sq = jnp.maximum(jnp.maximum(area_c, area_r), 32.0 * 32.0)

    # --- OKS accumulation over keypoints (statically unrolled) -----------
    oks_sum = jnp.zeros((N, N), jnp.float32)
    count = jnp.zeros((N, N), jnp.int32)
    for kp in range(num_kp):
        dx = xc_ref[:, kp:kp + 1] - xr_ref[kp:kp + 1, :]
        dy = yc_ref[:, kp:kp + 1] - yr_ref[kp:kp + 1, :]
        dist_sq = dx * dx + dy * dy
        sig4 = sig_ref[0, kp]
        oks_kp = jnp.exp(-dist_sq / (2.0 * scale_sq * sig4))
        vis = (cc_ref[:, kp:kp + 1] > 0.2) & (cr_ref[kp:kp + 1, :] > 0.2)
        oks_sum = oks_sum + jnp.where(vis, oks_kp, 0.0)
        count = count + vis.astype(jnp.int32)
    oks = jnp.where(count >= 3,
                    oks_sum / jnp.maximum(count, 1).astype(jnp.float32),
                    0.0)

    overlap = (iou > iou_threshold) | (
        (count >= 3) & ((oks > oks_threshold)
                        | ((oks > 0.4) & (iou > 0.2))))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = row_ids == col_ids

    valid_row = valid_ref[0:1, :] > 0                       # [1,N]
    # Mosaic cannot legalize 2-D transposes here; derive the column
    # orientation of a [1,N] row vector via the identity mask instead.
    def to_col(v_row):                                       # [1,N]->[N,1]
        return jnp.any(eye & v_row, axis=1, keepdims=True)

    valid_col = to_col(valid_row)                            # [N,1]
    # dominance: earlier (higher score) row j suppresses column i
    dom = overlap & valid_row & valid_col & (row_ids < col_ids)

    # --- Jacobi iteration to the greedy solution --------------------------
    # Mosaic cannot lower a convergence-checked while_loop here, so run a
    # fixed number of sweeps. Each sweep is idempotent once converged;
    # convergence needs (longest suppression chain + 1) sweeps, so 24
    # sweeps are exact for chains up to 23 deep — far beyond anything
    # real pose data produces (typical depth 2-4). The XLA fallback
    # (ops/nms.py) retains the fully general convergence check.
    # (int32 carry: Mosaic rejects boolean loop carries)
    def body(_, keep_i32):
        keep_col = to_col(keep_i32 > 0)                      # [N,1]
        suppressed = jnp.any(dom & keep_col, axis=0,
                             keepdims=True)                  # [1,N]
        return (valid_row & ~suppressed).astype(jnp.int32)

    keep = jax.lax.fori_loop(0, 24, body, valid_row.astype(jnp.int32))
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("iou_threshold",
                                              "oks_threshold",
                                              "interpret"))
def nms_keep_pallas(poses_sorted: jnp.ndarray, boxes_sorted: jnp.ndarray,
                    valid_sorted: jnp.ndarray, iou_threshold: float,
                    oks_threshold: float, interpret: bool = False):
    """Fused NMS keep-mask over score-sorted detections.

    poses [N,17,3], boxes [N,4], valid [N] -> keep [N] bool (rank space).
    Semantics identical to nms.nms_overlap_matrix + nms._greedy_keep.
    """
    from ..core import constants as C

    N = poses_sorted.shape[0]
    KP = C.NUM_KEYPOINTS
    KPp = 32                          # pad keypoint axis for sublane/lane
    x = poses_sorted[:, :, 0].astype(jnp.float32)       # [N,17]
    y = poses_sorted[:, :, 1].astype(jnp.float32)
    c = poses_sorted[:, :, 2].astype(jnp.float32)

    def pad_cols(a):                  # [N,17] -> [N,KPp]
        return jnp.pad(a, ((0, 0), (0, KPp - KP)))

    def rows(a):                      # [N,17] -> [KPp,N]
        return jnp.transpose(pad_cols(a))

    b_rows = jnp.transpose(jnp.pad(boxes_sorted.astype(jnp.float32),
                                   ((0, 0), (0, 4))))   # [8,N]
    b_cols = jnp.pad(boxes_sorted.astype(jnp.float32), ((0, 0), (0, 4)))
    sig = jnp.pad((4.0 * jnp.asarray(C.COCO_SIGMAS) ** 2)[None, :],
                  ((0, 0), (0, KPp - KP)), constant_values=1.0)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, num_kp=KP,
                          iou_threshold=float(iou_threshold),
                          oks_threshold=float(oks_threshold)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows(x), pad_cols(x), rows(y), pad_cols(y), rows(c), pad_cols(c),
      b_rows, b_cols, valid_sorted.astype(jnp.int32)[None, :], sig)
    return keep[0] > 0
