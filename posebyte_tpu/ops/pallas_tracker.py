"""Fused VMEM-resident tracker chunk kernel.

The chunked pipeline runs the tracker recurrence as `lax.scan` over K
frames; each scan iteration is ~100 small XLA ops over [T=128, D=64]
tensors, so per-op scheduling overhead — not arithmetic — dominates
(~70 us/frame measured at chunk 128, ~21% of the whole fused step).

This kernel executes the ENTIRE 9-stage tracker update
(tracker/step.py, reference: GPUTracker::update gpu_tracker.cu:1057-1557)
for a whole K-frame chunk as ONE Pallas kernel: a sequential grid over
frames with the full tracker state resident in VMEM between frames
(state buffers are outputs with a constant index map, so they persist
across grid steps — the TPU-native analogue of the reference keeping
its slot pool in registers/L2 across kernel launches). Per-frame
detections stream in HBM->VMEM one frame per grid step; per-frame
outputs stream back.

Design notes (Mosaic constraints shape the formulations):
  * No scatters/gathers: slot allocation and state gathers become
    one-hot / assignment-matrix matmuls on the MXU ([T,D] selection
    matrices against [D,KPp] keypoint planes) and masked-sum
    "transposes" via identity masks (to_row/to_col), exactly the trick
    the fused NMS kernel uses (pallas_kernels.py).
  * No boolean loop carries; the auction while_loop is shared verbatim
    with the standalone kernel (pallas_kernels.auction_rounds).
  * Keypoint axis is padded 17 -> 32 lanes; padded confidences are 0 so
    every visibility mask already excludes them.
  * cumsum-free ranking: free-slot ranks / new-detection ranks come
    from strictly-lower-triangular masked sums over [T,T] / [D,D]
    iota grids.

Semantics are identical to tracker/step.py for BOTH motion models —
"cv" and "kalman136" (the 136-D filter runs in-kernel as 16 extra
[T,KPp] VMEM planes) — including the optional Re-ID appearance blend
(config.reid_weight > 0: three [T,KPp] embedding channel planes,
co-visible cosine cost fused into the keypoint loop, EMA update) and
per-frame advance gating for the serving lifecycle. Equivalence is
asserted interpret-mode in tests/test_pallas_tracker.py and the same
comparison runs on real TPU hardware via the benchmark harness.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import constants as C
from ..core.config import TrackerConfig
from ..core.structs import Detections, TrackerState
from ..ops.kalman import (CV_LOST_DECAY, CV_MEASUREMENT_NOISE,
                          CV_PROCESS_NOISE, CV_VELOCITY_ALPHA)
from .pallas_kernels import auction_rounds

KP = C.NUM_KEYPOINTS          # 17
KPP = 32                      # keypoint lanes, padded
LOCK = 1e9
BIG = 1e9   # plain float: a jnp constant here would be captured by the
            # kernel trace ("captures constants" pallas_call error)


def _to_row_f(v_col, eye):
    """[N,1] f32 -> [1,N] via identity-mask sum (no 2-D transpose)."""
    return jnp.sum(jnp.where(eye, v_col, 0.0), axis=0, keepdims=True)


def _to_row_i(v_col, eye):
    return jnp.sum(jnp.where(eye, v_col, 0), axis=0, keepdims=True)


def _to_col_i(v_row, eye):
    """[1,N] i32 -> [N,1]."""
    return jnp.sum(jnp.where(eye, v_row, 0), axis=1, keepdims=True)


def _to_col_f(v_row, eye):
    return jnp.sum(jnp.where(eye, v_row, 0.0), axis=1, keepdims=True)


def _centers_cols(x, y, conf, thresh=0.1):
    """Masked center boxes from [T,KPp] planes -> (cx,cy,w,h) [T,1],
    zeros when < 2 visible keypoints (ops/geometry.pose_centers)."""
    mask = conf > thresh
    mn_x = jnp.min(jnp.where(mask, x, BIG), axis=1, keepdims=True)
    mx_x = jnp.max(jnp.where(mask, x, -BIG), axis=1, keepdims=True)
    mn_y = jnp.min(jnp.where(mask, y, BIG), axis=1, keepdims=True)
    mx_y = jnp.max(jnp.where(mask, y, -BIG), axis=1, keepdims=True)
    valid = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True) >= 2
    cx = (mn_x + mx_x) * 0.5
    cy = (mn_y + mx_y) * 0.5
    w = mx_x - mn_x
    h = mx_y - mn_y
    z = jnp.float32(0.0)
    return (jnp.where(valid, cx, z), jnp.where(valid, cy, z),
            jnp.where(valid, w, z), jnp.where(valid, h, z))


def _centers_rows(xT, yT, confT, thresh=0.1):
    """Same from transposed [KPp,D] planes -> [1,D] rows."""
    mask = confT > thresh
    mn_x = jnp.min(jnp.where(mask, xT, BIG), axis=0, keepdims=True)
    mx_x = jnp.max(jnp.where(mask, xT, -BIG), axis=0, keepdims=True)
    mn_y = jnp.min(jnp.where(mask, yT, BIG), axis=0, keepdims=True)
    mx_y = jnp.max(jnp.where(mask, yT, -BIG), axis=0, keepdims=True)
    valid = jnp.sum(mask.astype(jnp.int32), axis=0, keepdims=True) >= 2
    cx = (mn_x + mx_x) * 0.5
    cy = (mn_y + mx_y) * 0.5
    w = mx_x - mn_x
    h = mx_y - mn_y
    z = jnp.float32(0.0)
    return (jnp.where(valid, cx, z), jnp.where(valid, cy, z),
            jnp.where(valid, w, z), jnp.where(valid, h, z))


def _masked_area_cols(x, y, conf, thresh=0.1):
    """Visible-kp bbox area [T,1] (ops/oks._masked_area)."""
    mask = conf > thresh
    mn_x = jnp.min(jnp.where(mask, x, BIG), axis=1, keepdims=True)
    mx_x = jnp.max(jnp.where(mask, x, -BIG), axis=1, keepdims=True)
    mn_y = jnp.min(jnp.where(mask, y, BIG), axis=1, keepdims=True)
    mx_y = jnp.max(jnp.where(mask, y, -BIG), axis=1, keepdims=True)
    any_v = jnp.any(mask, axis=1, keepdims=True)
    area = (mx_x - mn_x) * (mx_y - mn_y)
    return jnp.where(any_v, jnp.maximum(area, 0.0), 0.0)


def _masked_area_rows(xT, yT, confT, thresh=0.1):
    mask = confT > thresh
    mn_x = jnp.min(jnp.where(mask, xT, BIG), axis=0, keepdims=True)
    mx_x = jnp.max(jnp.where(mask, xT, -BIG), axis=0, keepdims=True)
    mn_y = jnp.min(jnp.where(mask, yT, BIG), axis=0, keepdims=True)
    mx_y = jnp.max(jnp.where(mask, yT, -BIG), axis=0, keepdims=True)
    any_v = jnp.any(mask, axis=0, keepdims=True)
    area = (mx_x - mn_x) * (mx_y - mn_y)
    return jnp.where(any_v, jnp.maximum(area, 0.0), 0.0)


def _dotf(a, b):
    # Precision.HIGHEST: TPU f32 matmuls otherwise run as bf16 passes,
    # which would round the one-hot selections (~0.1 px pose error on
    # hardware — caught by the on-device scan-vs-kernel comparison).
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _tracker_chunk_kernel(
        # per-frame det blocks
        dx_ref, dy_ref, dc_ref, dxT_ref, dyT_ref, dcT_ref,
        dscore_ref, dvalid_ref, adv_ref, demb_refs,
        # initial state (read at k == 0 only)
        px0_ref, py0_ref, pc0_ref, vx0_ref, vy0_ref, sc0_ref,
        ids0_ref, st0_ref, hi0_ref, ag0_ref, lf0_ref, ac0_ref, cnt0_ref,
        slot0_ref, kf0_refs, emb0_refs,
        # outputs: per-frame
        o_ids_ref, o_sc_ref, o_emit_ref, o_na_ref,
        o_px_ref, o_py_ref, o_pc_ref, o_box_ref,
        # outputs: persistent state (constant index map)
        px_ref, py_ref, pc_ref, vx_ref, vy_ref, sc_ref,
        ids_ref, st_ref, hi_ref, ag_ref, lf_ref, ac_ref, cnt_ref,
        slot_ref, kf_refs, emb_refs,
        *, cfg: TrackerConfig):
    k = pl.program_id(0)
    T = px_ref.shape[0]
    D = dx_ref.shape[1]
    use_kf = cfg.motion_model == "kalman136"
    use_reid = cfg.reid_weight > 0.0

    @pl.when(k == 0)
    def _init():
        px_ref[:] = px0_ref[:]
        py_ref[:] = py0_ref[:]
        pc_ref[:] = pc0_ref[:]
        vx_ref[:] = vx0_ref[:]
        vy_ref[:] = vy0_ref[:]
        sc_ref[:] = sc0_ref[:]
        ids_ref[:] = ids0_ref[:]
        st_ref[:] = st0_ref[:]
        hi_ref[:] = hi0_ref[:]
        ag_ref[:] = ag0_ref[:]
        lf_ref[:] = lf0_ref[:]
        ac_ref[:] = ac0_ref[:]
        cnt_ref[:] = cnt0_ref[:]
        slot_ref[:] = slot0_ref[:]
        for dst, src in zip(kf_refs, kf0_refs):
            dst[:] = src[:]
        for dst, src in zip(emb_refs, emb0_refs):
            dst[:] = src[:]

    # ---- load state + det frame ------------------------------------------
    px, py, pc = px_ref[:], py_ref[:], pc_ref[:]          # [T,KPp] f32
    vx, vy = vx_ref[:], vy_ref[:]
    scores = sc_ref[:]                                    # [T,1] f32
    ids, states = ids_ref[:], st_ref[:]                   # [T,1] i32
    hits, ages = hi_ref[:], ag_ref[:]
    last_frame, act_i = lf_ref[:], ac_ref[:]
    counters = cnt_ref[:]                                 # [1,8] i32
    act = act_i > 0

    dx, dy, dc = dx_ref[0], dy_ref[0], dc_ref[0]          # [D,KPp] f32
    dxT, dyT, dcT = dxT_ref[0], dyT_ref[0], dcT_ref[0]    # [KPp,D]
    dscore = dscore_ref[0]                                # [1,D] f32
    dvalid = dvalid_ref[0] > 0                            # [1,D] bool

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    next_id = jnp.sum(jnp.where(lane8 == 0, counters, 0))  # scalar i32
    frame = jnp.sum(jnp.where(lane8 == 1, counters, 0)) + 1

    # per-frame lifecycle advance flag (serving starvation gating):
    # 0 -> this frame's entire update is discarded (state writes keep the
    # previous frame's values, outputs are masked). Scalar selects don't
    # lower on Mosaic, so broadcast it into each needed geometry.
    adv_i = jnp.sum(jnp.where(lane8 == 0, adv_ref[0], 0))  # scalar 0/1
    advT = (jnp.zeros((T, 1), jnp.int32) + adv_i) > 0      # [T,1]
    advD = (jnp.zeros((D, 1), jnp.int32) + adv_i) > 0      # [D,1]
    adv1D = (jnp.zeros((1, D), jnp.int32) + adv_i) > 0     # [1,D]
    adv18 = (jnp.zeros((1, 8), jnp.int32) + adv_i) > 0     # [1,8]

    if use_reid:
        er, eg, eb = emb_refs[0][:], emb_refs[1][:], emb_refs[2][:]
        der, deg, deb = demb_refs[0][0], demb_refs[1][0], demb_refs[2][0]
        derT, degT, debT = (demb_refs[3][0], demb_refs[4][0],
                            demb_refs[5][0])               # [KPp,D]
        # per-keypoint color energies (visibility: zero block = occluded)
        te = er * er + eg * eg + eb * eb                   # [T,KPp]
        deT = derT * derT + degT * degT + debT * debT      # [KPp,D]

    eyeT = (jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (T, T), 1))
    eyeD = (jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (D, D), 1))
    colD_TD = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
    rowT_TD = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    rowT_DT = jax.lax.broadcasted_iota(jnp.int32, (D, T), 1)

    # ---- Stage 1: motion predict ------------------------------------------
    actm = act  # [T,1], broadcasts over KPp lanes
    if use_kf:
        # third-order closed form (ops/kalman.Kalman136.predict)
        (kmx, kmy, kvx, kvy, kax, kay, kjx, kjy,
         kcpx, kcpy, kcvx, kcvy, kcax, kcay, kcjx, kcjy) = \
            [r[:] for r in kf_refs]
        kmx = kmx + kvx + 0.5 * kax + (1.0 / 6.0) * kjx
        kmy = kmy + kvy + 0.5 * kay + (1.0 / 6.0) * kjy
        kvx = kvx + kax + 0.5 * kjx
        kvy = kvy + kay + 0.5 * kjy
        kax = kax * cfg.accel_memory
        kay = kay * cfg.accel_memory
        kjx = kjx * cfg.jerk_memory
        kjy = kjy * cfg.jerk_memory
        kcpx, kcpy = kcpx + 1.0, kcpy + 1.0
        kcvx, kcvy = kcvx + 0.25, kcvy + 0.25
        kcax, kcay = kcax + 0.01, kcay + 0.01
        kcjx, kcjy = kcjx + 0.0025, kcjy + 0.0025
        pred_x = jnp.where(actm, kmx, px)
        pred_y = jnp.where(actm, kmy, py)
        vx, vy = kvx, kvy          # gating speed from KF velocities
    else:
        # constant-velocity (ops/kalman.cv_predict)
        pred_x = jnp.where(actm, px + vx, px)
        pred_y = jnp.where(actm, py + vy, py)
        lost = (states == C.TRACK_STATE_LOST) & act
        vx = jnp.where(lost, vx * CV_LOST_DECAY, vx)
        vy = jnp.where(lost, vy * CV_LOST_DECAY, vy)

    # ---- Stage 2: centers + spatial gate ----------------------------------
    tcx, tcy, tw, th = _centers_cols(pred_x, pred_y, pc)   # [T,1]
    dcx, dcy, dw, dh = _centers_rows(dxT, dyT, dcT)        # [1,D]

    degenerate = (tw < 1.0) | (th < 1.0) | (dw < 1.0) | (dh < 1.0)
    dist = jnp.sqrt((tcx - dcx) ** 2 + (tcy - dcy) ** 2)   # [T,D]
    avg_size = (tw + th + dw + dh) * 0.25
    ratio = dist / (avg_size + 1e-6)
    # torso speed = mean |v| over the 4 torso keypoints
    speed = jnp.zeros((T, 1), jnp.float32)
    for t_kp in C.TORSO_KEYPOINTS.tolist():
        speed += jnp.sqrt(vx[:, t_kp:t_kp + 1] ** 2
                          + vy[:, t_kp:t_kp + 1] ** 2)
    speed = speed * 0.25
    vel_factor = 1.0 + jnp.minimum(speed / (avg_size + 1e-6), 2.0)
    thr = cfg.gate_threshold * vel_factor
    thr = jnp.where(states == C.TRACK_STATE_LOST, thr * 2.0, thr)
    # where(degenerate, True, p) == degenerate | p — Mosaic cannot
    # lower the scalar-True select (i8->i1 trunci) on hardware
    gate = (degenerate | (ratio < thr)) & act & dvalid     # [T,D]

    thr_l = cfg.gate_threshold * C.LOST_GATE_SCALE * vel_factor
    thr_l = jnp.where(states == C.TRACK_STATE_LOST, thr_l * 2.0, thr_l)
    lost_gate = (degenerate | (ratio < thr_l)) & act & dvalid

    # ---- OKS matrices (one fused keypoint loop) ---------------------------
    t_area = _masked_area_cols(pred_x, pred_y, pc)         # [T,1]
    d_area = _masked_area_rows(dxT, dyT, dcT)              # [1,D]
    scale_sq = jnp.maximum((t_area + d_area) * 0.5, 1000.0)

    vis_thr = cfg.visibility_threshold
    oks1_sum = jnp.zeros((T, D), jnp.float32)
    oks1_cnt = jnp.zeros((T, D), jnp.int32)
    oks5_sum = jnp.zeros((T, D), jnp.float32)
    oks5_cnt = jnp.zeros((T, D), jnp.int32)
    torso_sum = jnp.zeros((T, D), jnp.float32)
    torso_cnt = jnp.zeros((T, D), jnp.int32)
    torso_set = set(C.TORSO_KEYPOINTS.tolist())
    if use_reid:
        # co-visible cosine accumulators (ops/reid.cosine_cost_matrix)
        rnum = jnp.zeros((T, D), jnp.float32)
        rtn = jnp.zeros((T, D), jnp.float32)
        rdn = jnp.zeros((T, D), jnp.float32)
    for kp in range(KP):
        d2 = ((pred_x[:, kp:kp + 1] - dxT[kp:kp + 1, :]) ** 2
              + (pred_y[:, kp:kp + 1] - dyT[kp:kp + 1, :]) ** 2)  # [T,D]
        sig2 = float((2.0 * C.COCO_SIGMAS[kp]) ** 2)
        e = jnp.exp(-d2 / (2.0 * scale_sq * sig2))
        tck = pc[:, kp:kp + 1]
        dck = dcT[kp:kp + 1, :]
        vis1 = (tck > vis_thr) & (dck > vis_thr)
        oks1_sum += jnp.where(vis1, e, 0.0)
        oks1_cnt += vis1.astype(jnp.int32)
        vis5 = (tck > 0.2) & (dck > 0.2)
        oks5_sum += jnp.where(vis5, e, 0.0)
        oks5_cnt += vis5.astype(jnp.int32)
        if kp in torso_set:
            sig2t = float((3.0 * C.COCO_SIGMAS[kp]) ** 2)
            et = jnp.exp(-d2 / (2.0 * 10000.0 * sig2t))
            vist = (tck > 0.1) & (dck > 0.1)
            torso_sum += jnp.where(vist, et, 0.0)
            torso_cnt += vist.astype(jnp.int32)
        if use_reid:
            te_col = te[:, kp:kp + 1]                      # [T,1]
            de_row = deT[kp:kp + 1, :]                     # [1,D]
            visr = (te_col > 1e-12) & (de_row > 1e-12)     # [T,D]
            dot = (er[:, kp:kp + 1] * derT[kp:kp + 1, :]
                   + eg[:, kp:kp + 1] * degT[kp:kp + 1, :]
                   + eb[:, kp:kp + 1] * debT[kp:kp + 1, :])
            rnum += jnp.where(visr, dot, 0.0)
            rtn += jnp.where(visr, te_col, 0.0)
            rdn += jnp.where(visr, de_row, 0.0)
    oks1 = jnp.where(oks1_cnt >= 3,
                     oks1_sum / jnp.maximum(oks1_cnt, 1), 0.0)
    oks5 = jnp.where(oks5_cnt >= 3,
                     oks5_sum / jnp.maximum(oks5_cnt, 1), 0.0)
    torso = jnp.where(torso_cnt >= 2,
                      torso_sum / jnp.maximum(torso_cnt, 1), 0.0)

    # ---- Stages 3-5: three auction tiers with merge/lock ------------------
    num_iters = min(T * 3, 50)
    act_i32 = act.astype(jnp.int32)
    non_lost = act & (states != C.TRACK_STATE_LOST)
    gate1 = gate & non_lost

    if use_reid:
        # 1 - cosine over co-visible keypoints; neutral 1.0 when none
        cosd = rnum / jnp.maximum(jnp.sqrt(rtn) * jnp.sqrt(rdn), 1e-6)
        reid_cost = jnp.where(rtn > 0.0, 1.0 - cosd, 1.0)
        w = float(cfg.reid_weight)
        cost1 = jnp.where(gate1,
                          (1.0 - w) * (1.0 - oks1) + w * reid_cost, LOCK)
    else:
        cost1 = jnp.where(gate1, 1.0 - oks1, LOCK)
    row_assign, col_assign = auction_rounds(cost1, act_i32, num_iters)
    # row_assign [T,1], col_assign [1,D]

    locked = (row_assign >= 0) | (col_assign >= 0)         # [T,D] bcast
    cost2 = jnp.where(gate1, 1.0 - torso, LOCK)
    cost2 = jnp.where(locked, LOCK, cost2)
    r2, c2 = auction_rounds(cost2, act_i32, num_iters)
    row_assign = jnp.where(row_assign >= 0, row_assign, r2)
    col_assign = jnp.where(col_assign >= 0, col_assign, c2)

    only_lost = act & (states == C.TRACK_STATE_LOST)
    locked = (row_assign >= 0) | (col_assign >= 0)
    if use_reid:   # appearance helps re-acquire lost tracks
        cost3 = jnp.where(lost_gate & only_lost,
                          (1.0 - w) * (1.0 - oks5) + w * reid_cost, LOCK)
    else:
        cost3 = jnp.where(lost_gate & only_lost, 1.0 - oks5, LOCK)
    cost3 = jnp.where(locked, LOCK, cost3)
    r3, c3 = auction_rounds(cost3, act_i32, num_iters)
    row_assign = jnp.where(row_assign >= 0, row_assign, r3)
    col_assign = jnp.where(col_assign >= 0, col_assign, c3)

    # ---- Stage 6: update matched (ops/kalman.cv_update) -------------------
    matched = (row_assign >= 0) & act                      # [T,1]
    onehot = ((colD_TD == row_assign) & matched) \
        .astype(jnp.float32)                               # [T,D]
    det_x_at = _dotf(onehot, dx)                           # [T,KPp]
    det_y_at = _dotf(onehot, dy)
    det_c_at = _dotf(onehot, dc)
    det_sc_at = jnp.sum(jnp.where(onehot > 0, dscore, 0.0),
                        axis=1, keepdims=True)             # [T,1]

    if use_kf:
        # per-keypoint scalar-gain update (Kalman136.update):
        # R = 5/(conf+0.1), skip kp below conf 0.1, K_v = 0.5*K_x
        use = (det_c_at >= 0.1) & matched
        Rk = 5.0 / (det_c_at + 0.1)
        Kx = kcpx / (kcpx + Rk)
        Ky = kcpy / (kcpy + Rk)
        ix = det_x_at - kmx
        iy = det_y_at - kmy
        kmx = kmx + jnp.where(use, Kx * ix, 0.0)
        kmy = kmy + jnp.where(use, Ky * iy, 0.0)
        kvx = kvx + jnp.where(use, 0.5 * Kx * ix, 0.0)
        kvy = kvy + jnp.where(use, 0.5 * Kx * iy, 0.0)
        kcpx = jnp.where(use, (1.0 - Kx) * kcpx, kcpx)
        kcpy = jnp.where(use, (1.0 - Ky) * kcpy, kcpy)
        px = jnp.where(matched, kmx, px)
        py = jnp.where(matched, kmy, py)
        vx, vy = kvx, kvy
    else:
        gain = CV_MEASUREMENT_NOISE / (CV_MEASUREMENT_NOISE
                                       + CV_PROCESS_NOISE)
        innov_x = det_x_at - px
        innov_y = det_y_at - py
        px = jnp.where(matched, px + gain * innov_x, px)
        py = jnp.where(matched, py + gain * innov_y, py)
        vx = jnp.where(matched,
                       CV_VELOCITY_ALPHA * innov_x
                       + (1.0 - CV_VELOCITY_ALPHA) * vx, vx)
        vy = jnp.where(matched,
                       CV_VELOCITY_ALPHA * innov_y
                       + (1.0 - CV_VELOCITY_ALPHA) * vy, vy)
    pc = jnp.where(matched, det_c_at, pc)
    scores = jnp.where(matched, det_sc_at, scores)
    hits = jnp.where(matched, hits + 1, hits)
    ages = jnp.where(matched, 0, ages)
    last_frame = jnp.where(matched, frame, last_frame)
    promote = matched & (states == C.TRACK_STATE_TENTATIVE) & \
        (hits >= cfg.min_hits)
    reactivate = matched & (states == C.TRACK_STATE_LOST)
    states = jnp.where(promote | reactivate, C.TRACK_STATE_CONFIRMED,
                       states)

    if use_reid:
        # EMA toward the matched detection's embedding, renormalized
        # over all 51 components (ops/reid.ema_update)
        der_at = _dotf(onehot, der)                        # [T,KPp]
        deg_at = _dotf(onehot, deg)
        deb_at = _dotf(onehot, deb)
        g = float(cfg.reid_ema)
        upd_r = g * er + (1.0 - g) * der_at
        upd_g = g * eg + (1.0 - g) * deg_at
        upd_b = g * eb + (1.0 - g) * deb_at
        n2 = jnp.sum(upd_r * upd_r + upd_g * upd_g + upd_b * upd_b,
                     axis=1, keepdims=True)                # [T,1]
        nrm = jnp.maximum(jnp.sqrt(n2), 1e-6)
        er = jnp.where(matched, upd_r / nrm, er)
        eg = jnp.where(matched, upd_g / nrm, eg)
        eb = jnp.where(matched, upd_b / nrm, eb)

    # ---- Stage 7: age unmatched -------------------------------------------
    unmatched = (~matched) & act
    ages = jnp.where(unmatched, ages + 1, ages)
    tent_dead = unmatched & (states == C.TRACK_STATE_TENTATIVE) & \
        (ages > C.TENTATIVE_MAX_AGE)
    to_lost = unmatched & (states == C.TRACK_STATE_CONFIRMED) & \
        (ages > cfg.max_age)
    lost_dead = unmatched & (states == C.TRACK_STATE_LOST) & \
        (ages > cfg.max_age + cfg.lost_window)
    states = jnp.where(to_lost, C.TRACK_STATE_LOST, states)
    active = act & ~(tent_dead | lost_dead)                # [T,1]

    # ---- Stage 8: allocate new tracks (rank matmuls, no scatter) ----------
    new_det = dvalid & (col_assign < 0) & \
        (dscore >= cfg.new_track_thresh)                   # [1,D]
    new_det_col = _to_col_i(new_det.astype(jnp.int32), eyeD) > 0  # [D,1]
    rD = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    cD = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    det_rank = jnp.sum(jnp.where((rD < cD) & new_det_col, 1, 0),
                       axis=0, keepdims=True)              # [1,D]
    free = ~active                                         # [T,1]
    rT = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cT = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    free_rank_row = jnp.sum(jnp.where((rT < cT) & free, 1, 0),
                            axis=0, keepdims=True)         # [1,T]
    free_rank = _to_col_i(free_rank_row, eyeT)             # [T,1]
    num_free = jnp.sum(free.astype(jnp.int32))
    can_alloc = new_det & (det_rank < num_free)            # [1,D]

    A = (free & can_alloc & (free_rank == det_rank))       # [T,D]
    Af = A.astype(jnp.float32)
    alloc = jnp.any(A, axis=1, keepdims=True)              # [T,1]

    px = jnp.where(alloc, _dotf(Af, dx), px)
    py = jnp.where(alloc, _dotf(Af, dy), py)
    pc = jnp.where(alloc, _dotf(Af, dc), pc)
    vx = jnp.where(alloc, 0.0, vx)
    vy = jnp.where(alloc, 0.0, vy)
    scores = jnp.where(alloc,
                       jnp.sum(jnp.where(A, dscore, 0.0), axis=1,
                               keepdims=True), scores)
    new_id_row = next_id + det_rank                        # [1,D]
    ids = jnp.where(alloc,
                    jnp.sum(jnp.where(A, new_id_row, 0), axis=1,
                            keepdims=True), ids)
    hits = jnp.where(alloc, 1, hits)
    ages = jnp.where(alloc, 0, ages)
    states = jnp.where(alloc, C.TRACK_STATE_TENTATIVE, states)
    last_frame = jnp.where(alloc, frame, last_frame)
    active = active | alloc
    slot_for_det = jnp.sum(jnp.where(A, rowT_TD, 0), axis=0,
                           keepdims=True)                  # [1,D]
    col_assign = jnp.where(can_alloc, slot_for_det, col_assign)
    next_id = next_id + jnp.sum(can_alloc.astype(jnp.int32))

    if use_reid:
        # newly allocated tracks take the detection embedding outright
        # (tracker/step.py init_at scatter)
        er = jnp.where(alloc, _dotf(Af, der), er)
        eg = jnp.where(alloc, _dotf(Af, deg), eg)
        eb = jnp.where(alloc, _dotf(Af, deb), eb)

    if use_kf:
        # Kalman136.initiate for allocated slots: mean <- detection,
        # derivatives 0, pos var 10 (1000 when conf <= 0), others 100.
        # px/pc already hold the allocated detections' x/conf here.
        kmx = jnp.where(alloc, px, kmx)
        kmy = jnp.where(alloc, py, kmy)
        kvx = jnp.where(alloc, 0.0, kvx)
        kvy = jnp.where(alloc, 0.0, kvy)
        kax = jnp.where(alloc, 0.0, kax)
        kay = jnp.where(alloc, 0.0, kay)
        kjx = jnp.where(alloc, 0.0, kjx)
        kjy = jnp.where(alloc, 0.0, kjy)
        pos_var = jnp.where(pc > 0.0, 10.0, 1000.0)
        kcpx = jnp.where(alloc, pos_var, kcpx)
        kcpy = jnp.where(alloc, pos_var, kcpy)
        kcvx = jnp.where(alloc, 100.0, kcvx)
        kcvy = jnp.where(alloc, 100.0, kcvy)
        kcax = jnp.where(alloc, 100.0, kcax)
        kcay = jnp.where(alloc, 100.0, kcay)
        kcjx = jnp.where(alloc, 100.0, kcjx)
        kcjy = jnp.where(alloc, 100.0, kcjy)

    # ---- Stage 9: duplicate suppression -----------------------------------
    eligible = active & (states != C.TRACK_STATE_LOST) & \
        (hits >= cfg.min_hits)                             # [T,1]
    # centers from gating time (pre-update), as in tracker/step.py
    cx_r = _to_row_f(tcx, eyeT)
    cy_r = _to_row_f(tcy, eyeT)
    w_r = _to_row_f(tw, eyeT)
    h_r = _to_row_f(th, eyeT)
    x1c, x2c = tcx - tw * 0.5, tcx + tw * 0.5              # [T,1]
    y1c, y2c = tcy - th * 0.5, tcy + th * 0.5
    x1r, x2r = cx_r - w_r * 0.5, cx_r + w_r * 0.5          # [1,T]
    y1r, y2r = cy_r - h_r * 0.5, cy_r + h_r * 0.5
    ix = jnp.maximum(0.0, jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r))
    iy = jnp.maximum(0.0, jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r))
    inter = ix * iy                                        # [T,T]
    union = tw * th + w_r * h_r - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

    elig_row = jnp.any(eyeT & eligible, axis=0, keepdims=True)  # [1,T]
    pair = eligible & elig_row & ~eyeT
    dup = pair & (iou > cfg.dedup_iou_threshold)
    hits_row = _to_row_i(hits, eyeT)
    ids_row = _to_row_i(ids, eyeT)
    hl = hits < hits_row
    tie = (hits == hits_row) & (ids > ids_row)
    dominated = jnp.any(dup & (hl | tie), axis=1, keepdims=True)
    active = active & ~dominated

    # ---- output extraction (tracker/output.extract_outputs_device) --------
    ca_col = _to_col_i(col_assign, eyeD)                   # [D,1]
    has_slot = ca_col >= 0
    OD = (rowT_DT == jnp.clip(ca_col, 0, T - 1))           # [D,T]
    ODf = OD.astype(jnp.float32)
    states_rT = _to_row_i(states, eyeT)                    # [1,T]
    active_rT = _to_row_i(active.astype(jnp.int32), eyeT)
    hits_rT = _to_row_i(hits, eyeT)
    ids_rT = _to_row_i(ids, eyeT)
    st_at = jnp.sum(jnp.where(OD, states_rT, 0), axis=1,
                    keepdims=True)                         # [D,1]
    ac_at = jnp.sum(jnp.where(OD, active_rT, 0), axis=1,
                    keepdims=True) > 0
    hi_at = jnp.sum(jnp.where(OD, hits_rT, 0), axis=1, keepdims=True)
    id_at = jnp.sum(jnp.where(OD, ids_rT, 0), axis=1, keepdims=True)
    emit = has_slot & ac_at
    emit &= ~((st_at == C.TRACK_STATE_TENTATIVE) & (hi_at < cfg.min_hits))
    emit &= st_at != C.TRACK_STATE_LOST

    out_x = _dotf(ODf, px)                                 # [D,KPp]
    out_y = _dotf(ODf, py)
    out_c = _dotf(ODf, pc)
    dsc_col = _to_col_f(dscore, eyeD)                      # [D,1]
    o_ids = jnp.where(emit, id_at, -1)
    o_sc = jnp.where(emit, dsc_col, 0.0)

    bmask = out_c > 0.2
    bx1 = jnp.min(jnp.where(bmask, out_x, BIG), axis=1, keepdims=True)
    bx2 = jnp.max(jnp.where(bmask, out_x, -BIG), axis=1, keepdims=True)
    by1 = jnp.min(jnp.where(bmask, out_y, BIG), axis=1, keepdims=True)
    by2 = jnp.max(jnp.where(bmask, out_y, -BIG), axis=1, keepdims=True)
    padx = (bx2 - bx1) * 0.1
    pady = (by2 - by1) * 0.1
    anyb = jnp.any(bmask, axis=1, keepdims=True)
    z = jnp.float32(0.0)
    box = jnp.concatenate(
        [jnp.where(anyb, bx1 - padx, z), jnp.where(anyb, by1 - pady, z),
         jnp.where(anyb, bx2 + padx, z), jnp.where(anyb, by2 + pady, z)],
        axis=1)                                            # [D,4]

    # ---- write frame outputs (masked when not advancing) ------------------
    o_ids_ref[0] = _to_row_i(jnp.where(advD, o_ids, -1), eyeD)
    o_sc_ref[0] = _to_row_f(jnp.where(advD, o_sc, 0.0), eyeD)
    o_emit_ref[0] = _to_row_i((emit & advD).astype(jnp.int32), eyeD)
    num_active = jnp.sum(active.astype(jnp.int32))
    o_na_ref[0] = jnp.where(lane8 == 0, num_active * adv_i, 0)
    o_px_ref[0] = out_x
    o_py_ref[0] = out_y
    o_pc_ref[0] = out_c
    o_box_ref[0] = jnp.concatenate(
        [box, jnp.zeros((D, 4), jnp.float32)], axis=1)     # [D,8]

    # ---- persist state (kept at the previous frame's values when not
    # advancing: refs still hold the old state until written) --------------
    px_ref[:] = jnp.where(advT, px, px_ref[:])
    py_ref[:] = jnp.where(advT, py, py_ref[:])
    pc_ref[:] = jnp.where(advT, pc, pc_ref[:])
    vx_ref[:] = jnp.where(advT, vx, vx_ref[:])
    vy_ref[:] = jnp.where(advT, vy, vy_ref[:])
    sc_ref[:] = jnp.where(advT, scores, sc_ref[:])
    ids_ref[:] = jnp.where(advT, ids, ids_ref[:])
    st_ref[:] = jnp.where(advT, states, st_ref[:])
    hi_ref[:] = jnp.where(advT, hits, hi_ref[:])
    ag_ref[:] = jnp.where(advT, ages, ag_ref[:])
    lf_ref[:] = jnp.where(advT, last_frame, lf_ref[:])
    ac_ref[:] = jnp.where(advT, active.astype(jnp.int32), ac_ref[:])
    cnt_ref[:] = jnp.where(adv18,
                           jnp.where(lane8 == 0, next_id, 0)
                           + jnp.where(lane8 == 1, frame, 0),
                           cnt_ref[:])
    slot_ref[:] = jnp.where(adv1D, col_assign, slot_ref[:])
    if use_kf:
        for ref, val in zip(kf_refs,
                            (kmx, kmy, kvx, kvy, kax, kay, kjx, kjy,
                             kcpx, kcpy, kcvx, kcvy, kcax, kcay,
                             kcjx, kcjy)):
            ref[:] = jnp.where(advT, val, ref[:])
    if use_reid:
        for ref, val in zip(emb_refs, (er, eg, eb)):
            ref[:] = jnp.where(advT, val, ref[:])


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def tracker_chunk_pallas(state: TrackerState, dets: Detections,
                         config: TrackerConfig = TrackerConfig(),
                         det_embeddings=None, advance=None,
                         interpret: bool = False):
    """Run K tracker frames as one fused kernel.

    dets: Detections with leading chunk axis — poses [K,D,17,3], boxes
    [K,D,4], scores [K,D], valid [K,D]. Returns (state', outs) where
    outs matches the chunk pipeline's per-frame dict (leading K):
    ids, scores, poses, boxes, emit, num_active.

    det_embeddings: [K,D,51] appearance descriptors (required iff
    config.reid_weight > 0 — the cosine blend + EMA run in-kernel as
    three [T,KPp] channel planes).
    advance: optional [K] bool lifecycle mask (serving starvation
    gating): frames with advance=False leave the state untouched and
    emit nothing. None = advance every frame. Per-chunk resets are the
    caller's job (blend a fresh TrackerState BEFORE calling, as
    pipeline/serving.py does).
    """
    assert config.motion_model in ("cv", "kalman136")
    assert config.torso_tier, \
        "torso_tier=False is an evaluation-only ablation supported by " \
        "the scan path (tracker_step); the fused chunk kernel always " \
        "runs the production stage-4 tier"
    use_reid = config.reid_weight > 0.0
    assert (det_embeddings is not None) == use_reid, \
        "det_embeddings must be passed iff config.reid_weight > 0"
    use_kf = config.motion_model == "kalman136"
    Kc, D = dets.scores.shape
    T = state.poses.shape[0]

    def pad_kp(a):                      # [K,D,17] -> [K,D,KPP]
        return jnp.pad(a.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, KPP - KP)))

    dx = pad_kp(dets.poses[..., 0])
    dy = pad_kp(dets.poses[..., 1])
    dc = pad_kp(dets.poses[..., 2])
    dxT = jnp.transpose(dx, (0, 2, 1))  # [K,KPP,D]
    dyT = jnp.transpose(dy, (0, 2, 1))
    dcT = jnp.transpose(dc, (0, 2, 1))
    dscore = dets.scores.astype(jnp.float32)[:, None, :]   # [K,1,D]
    dvalid = dets.valid.astype(jnp.int32)[:, None, :]

    if advance is None:
        adv_in = jnp.ones((Kc, 1, 8), jnp.int32)
    else:
        adv_in = jnp.broadcast_to(
            advance.astype(jnp.int32)[:, None, None], (Kc, 1, 8))

    if use_reid:
        e3 = det_embeddings.astype(jnp.float32).reshape(Kc, D, KP, 3)
        der = jnp.pad(e3[..., 0], ((0, 0), (0, 0), (0, KPP - KP)))
        deg = jnp.pad(e3[..., 1], ((0, 0), (0, 0), (0, KPP - KP)))
        deb = jnp.pad(e3[..., 2], ((0, 0), (0, 0), (0, KPP - KP)))
        demb = (der, deg, deb,
                jnp.transpose(der, (0, 2, 1)),
                jnp.transpose(deg, (0, 2, 1)),
                jnp.transpose(deb, (0, 2, 1)))
    else:
        demb = ()

    def pad_kp2(a):                     # [T,17] -> [T,KPP]
        return jnp.pad(a.astype(jnp.float32), ((0, 0), (0, KPP - KP)))

    px0 = pad_kp2(state.poses[..., 0])
    py0 = pad_kp2(state.poses[..., 1])
    pc0 = pad_kp2(state.poses[..., 2])
    vx0 = pad_kp2(state.velocities[..., 0])
    vy0 = pad_kp2(state.velocities[..., 1])
    sc0 = state.scores.astype(jnp.float32)[:, None]
    i32col = lambda a: a.astype(jnp.int32)[:, None]
    ids0, st0 = i32col(state.ids), i32col(state.states)
    hi0, ag0 = i32col(state.hits), i32col(state.ages)
    lf0 = i32col(state.last_frame)
    ac0 = i32col(state.active)
    lane8 = jnp.arange(8, dtype=jnp.int32)[None, :]
    cnt0 = (jnp.where(lane8 == 0, state.next_id.astype(jnp.int32), 0)
            + jnp.where(lane8 == 1, state.frame.astype(jnp.int32), 0))

    # 136-D Kalman state as 16 keypoint planes (mean + cov diag, 8
    # components each in _split order px,py,vx,vy,ax,ay,jx,jy)
    kf_mean8 = state.kf_mean.astype(jnp.float32).reshape(T, KP, 8)
    kf_cov8 = state.kf_cov.astype(jnp.float32).reshape(T, KP, 8)
    kf0 = tuple(pad_kp2(kf_mean8[..., i]) for i in range(8)) + \
        tuple(pad_kp2(kf_cov8[..., i]) for i in range(8))

    slot0 = state.det_track_slot.astype(jnp.int32)[None, :]   # [1,D]
    if use_reid:
        se3 = state.embeddings.astype(jnp.float32).reshape(T, KP, 3)
        emb0 = tuple(pad_kp2(se3[..., c]) for c in range(3))
    else:
        emb0 = ()

    per_frame = lambda *dims: pl.BlockSpec((1,) + dims,
                                           lambda k: (k, 0, 0))
    whole2 = lambda a, b: pl.BlockSpec((a, b), lambda k: (0, 0))

    kernel = functools.partial(_tracker_chunk_kernel, cfg=config)
    n_emb = 3 if use_reid else 0
    out_shape = (
        jax.ShapeDtypeStruct((Kc, 1, D), jnp.int32),     # o_ids
        jax.ShapeDtypeStruct((Kc, 1, D), jnp.float32),   # o_sc
        jax.ShapeDtypeStruct((Kc, 1, D), jnp.int32),     # o_emit
        jax.ShapeDtypeStruct((Kc, 1, 8), jnp.int32),     # o_na
        jax.ShapeDtypeStruct((Kc, D, KPP), jnp.float32),  # o_px
        jax.ShapeDtypeStruct((Kc, D, KPP), jnp.float32),  # o_py
        jax.ShapeDtypeStruct((Kc, D, KPP), jnp.float32),  # o_pc
        jax.ShapeDtypeStruct((Kc, D, 8), jnp.float32),   # o_box
        jax.ShapeDtypeStruct((T, KPP), jnp.float32),     # px
        jax.ShapeDtypeStruct((T, KPP), jnp.float32),     # py
        jax.ShapeDtypeStruct((T, KPP), jnp.float32),     # pc
        jax.ShapeDtypeStruct((T, KPP), jnp.float32),     # vx
        jax.ShapeDtypeStruct((T, KPP), jnp.float32),     # vy
        jax.ShapeDtypeStruct((T, 1), jnp.float32),       # sc
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # ids
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # st
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # hi
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # ag
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # lf
        jax.ShapeDtypeStruct((T, 1), jnp.int32),         # ac
        jax.ShapeDtypeStruct((1, 8), jnp.int32),         # cnt
        jax.ShapeDtypeStruct((1, D), jnp.int32),         # slot
        tuple(jax.ShapeDtypeStruct((T, KPP), jnp.float32)
              for _ in range(16)),                       # kf planes
        tuple(jax.ShapeDtypeStruct((T, KPP), jnp.float32)
              for _ in range(n_emb)),                    # emb planes
    )
    kf_spec = tuple(whole2(T, KPP) for _ in range(16))
    demb_spec = tuple(per_frame(D, KPP) for _ in range(n_emb)) + \
        tuple(per_frame(KPP, D) for _ in range(n_emb))
    emb_spec = tuple(whole2(T, KPP) for _ in range(n_emb))
    in_specs = [
        per_frame(D, KPP), per_frame(D, KPP), per_frame(D, KPP),
        per_frame(KPP, D), per_frame(KPP, D), per_frame(KPP, D),
        per_frame(1, D), per_frame(1, D), per_frame(1, 8), demb_spec,
        whole2(T, KPP), whole2(T, KPP), whole2(T, KPP),
        whole2(T, KPP), whole2(T, KPP), whole2(T, 1),
        whole2(T, 1), whole2(T, 1), whole2(T, 1), whole2(T, 1),
        whole2(T, 1), whole2(T, 1), whole2(1, 8), whole2(1, D),
        kf_spec, emb_spec,
    ]
    out_specs = (
        per_frame(1, D), per_frame(1, D), per_frame(1, D),
        per_frame(1, 8),
        per_frame(D, KPP), per_frame(D, KPP), per_frame(D, KPP),
        per_frame(D, 8),
        whole2(T, KPP), whole2(T, KPP), whole2(T, KPP),
        whole2(T, KPP), whole2(T, KPP), whole2(T, 1),
        whole2(T, 1), whole2(T, 1), whole2(T, 1), whole2(T, 1),
        whole2(T, 1), whole2(T, 1), whole2(1, 8), whole2(1, D),
        kf_spec, emb_spec,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Kc,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(dx, dy, dc, dxT, dyT, dcT, dscore, dvalid, adv_in, demb,
      px0, py0, pc0, vx0, vy0, sc0, ids0, st0, hi0, ag0, lf0, ac0, cnt0,
      slot0, kf0, emb0)

    (o_ids, o_sc, o_emit, o_na, o_px, o_py, o_pc, o_box,
     px, py, pc, vx, vy, sc, ids, st, hi, ag, lf, ac, cnt, slot,
     kf_out, emb_out) = outs
    if use_kf:
        kf_mean_out = jnp.stack([kf_out[i][:, :KP] for i in range(8)],
                                axis=-1).reshape(T, KP * 8)
        kf_cov_out = jnp.stack([kf_out[8 + i][:, :KP] for i in range(8)],
                               axis=-1).reshape(T, KP * 8)
    else:
        kf_mean_out, kf_cov_out = state.kf_mean, state.kf_cov
    if use_reid:
        embeddings_out = jnp.stack(
            [emb_out[c][:, :KP] for c in range(3)],
            axis=-1).reshape(T, KP * 3)
    else:
        embeddings_out = state.embeddings

    poses_out = jnp.stack([o_px[..., :KP], o_py[..., :KP],
                           o_pc[..., :KP]], axis=-1)       # [K,D,17,3]
    new_state = TrackerState(
        poses=jnp.stack([px[:, :KP], py[:, :KP], pc[:, :KP]], axis=-1),
        velocities=jnp.stack([vx[:, :KP], vy[:, :KP]], axis=-1),
        scores=sc[:, 0],
        ids=ids[:, 0], states=st[:, 0], hits=hi[:, 0], ages=ag[:, 0],
        last_frame=lf[:, 0], active=ac[:, 0] > 0,
        next_id=cnt[0, 0], frame=cnt[0, 1],
        det_track_slot=slot[0],
        kf_mean=kf_mean_out, kf_cov=kf_cov_out,
        embeddings=embeddings_out,
    )
    outs_dict = {
        "ids": o_ids[:, 0, :],
        "scores": o_sc[:, 0, :],
        "poses": poses_out,
        "boxes": o_box[..., :4],
        "emit": o_emit[:, 0, :] > 0,
        "num_active": o_na[:, 0, 0],
    }
    return new_state, outs_dict
