"""TPU-friendly exact top-k for the decode confidence ranking.

`jax.lax.top_k` lowers to a full O(A log^2 A) bitonic sort network on
the TPU's vector unit, which is the structural suspect for the
decode+NMS share of the fused chunk step (docs/BENCHMARKS.md "where
the time goes"; the reference's CUDA path pays an analogous
sort in gpu_postprocess.cu:178-203).  This module provides a
sort-free exact alternative shaped for the hardware:

1. **MSB radix-select** finds the k-th largest value in 31 masked
   count-reductions (pure VPU map-reduce, no data movement);
2. the <=k selected lanes are **compacted by a one-hot matmul**
   (the same selection-matmul idiom the tracker megakernel uses in
   place of scatters, ops/pallas_tracker.py);
3. a k-element two-key sort (k=256 vs A=8400) produces the exact
   (score-descending, index-ascending) order `lax.top_k` defines.

The radix key mapping assumes the decode domain: every NEGATIVE
entry is the same masked filler value (decode_topk uses exactly -1.0
in `ranked = jnp.where(passing, conf, -1.0)`); non-negative entries
may be any finite float including -0.0/+0.0 and subnormals (all
comparisons ride an integer total-order key, never a float
comparator).  On that domain the result is bit-identical to
`lax.top_k` — including stable tie-breaks and top_k's bit-level
-0.0 < +0.0 ordering; a property test asserts this against lax.top_k
with adversarial ties (tests/test_topk.py).  Distinct negative
values would tie-collapse to index order, which is why the domain
requires a single filler value.

`topk_impl` selects the implementation end-to-end
(core/config.DetectorConfig.topk_impl):
  - "sort"   — jax.lax.top_k (XLA sort lowering; the r1-r3 default)
  - "bisect" — this module's radix-select (exact)
  - "approx" — jax.lax.approx_max_k, the TPU's native PartialReduce
    op (recall_target 0.95; NOT exact — opt-in, excluded from the
    fidelity contract; falls back to exact on CPU)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def onehot_select(onehot_bool: jnp.ndarray, payload: jnp.ndarray):
    """Exact one-hot selection matmul: bool [K, A] x [A, C] -> f32 [K, C].

    The shared scatter/gather-free idiom (also used by the tracker
    megakernel): entries are exactly 0/1 in any float dtype and each
    output element sums exactly one payload entry, so with
    Precision.HIGHEST and f32 accumulation the result is the selected
    payload value widened to f32 — except that the MXU flushes
    subnormal payload entries (callers own that caveat; see
    decode_topk's docstring for decode's rounding argument)."""
    return lax.dot_general(
        onehot_bool.astype(payload.dtype), payload,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def total_order_key(r32: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving non-negative int32 key matching lax.top_k's
    bit-level TOTAL order on the decode ranking domain (all negative
    entries equal one filler value; non-negative entries arbitrary
    finite floats): negative non-zero -> 0; -0.0 -> 1; x >= +0.0 ->
    bits(x) + 2 (IEEE-754 bit patterns of non-negative floats are
    monotone in the value; max finite bits + 2 < 2^31, so negation is
    safe for descending sorts). Under this key -0.0 < +0.0 strictly,
    exactly as lax.top_k's comparator orders them."""
    r32 = r32.astype(jnp.float32)
    bits = lax.bitcast_convert_type(r32, jnp.int32)
    return jnp.where(bits >= 0, bits + 2,
                     jnp.where(r32 == 0, jnp.int32(1), jnp.int32(0)))


def topk_masked_bisect(ranked: jnp.ndarray, k: int):
    """Exact `lax.top_k(ranked, k)` for 1-D `ranked` whose negative
    entries (if any) all equal one filler value; non-negative entries
    are arbitrary finite floats.

    Returns (values, indices) bit-identical to lax.top_k (descending
    in top_k's bit-level total order; ties broken toward the lower
    index).
    """
    A = ranked.shape[-1]
    if k >= A:
        return lax.top_k(ranked, k)     # degenerate; nothing to save
    r32 = ranked.astype(jnp.float32)
    key = total_order_key(r32)

    # MSB radix-select: p ends as the largest key value t with
    # count(key >= t) >= k, i.e. exactly the k-th largest key.
    def body(p, b):
        t = p | (jnp.int32(1) << b)
        cnt = jnp.sum((key >= t).astype(jnp.int32))
        return jnp.where(cnt >= k, t, p), None

    p, _ = lax.scan(body, jnp.int32(0),
                    jnp.arange(30, -1, -1, dtype=jnp.int32))

    # Select all keys > p, then the earliest-index ties == p until
    # exactly k lanes are chosen (lax.top_k's stable tie policy).
    greater = key > p
    m = jnp.sum(greater.astype(jnp.int32))
    equal = key == p
    eq_rank = jnp.cumsum(equal.astype(jnp.int32))             # 1-based
    sel = greater | (equal & (eq_rank <= (k - m)))

    # Compact the k selected lanes in index order via onehot_select.
    # Only the INDICES ride the matmul: indices < 2^24 are exact in
    # f32 and never subnormal; values are recovered by an exact
    # k-element gather instead.
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1               # [A]
    onehot = (sel[None, :]
              & (jnp.arange(k, dtype=jnp.int32)[:, None] == pos[None, :]))
    idx_f = onehot_select(
        onehot, jnp.arange(A, dtype=jnp.float32)[:, None])    # [k, 1]
    idx_io = idx_f[:, 0].astype(jnp.int32)
    vals_io = r32[idx_io]

    # Exact output order: descending TOTAL-ORDER key (so -0.0 sorts
    # after +0.0, as lax.top_k's bit-level comparator does), ascending
    # index on ties — a k-element two-key sort (cheap: k << A).
    neg, idx_sorted, vals_sorted = lax.sort(
        (-key[idx_io], idx_io, vals_io), num_keys=2)
    del neg
    return vals_sorted.astype(ranked.dtype), idx_sorted


def topk_confidence(ranked: jnp.ndarray, k: int, impl: str = "sort"):
    """Dispatch the decode confidence top-k by implementation name."""
    if impl == "sort":
        return lax.top_k(ranked, k)
    if impl == "bisect":
        return topk_masked_bisect(ranked, k)
    if impl == "approx":
        return lax.approx_max_k(ranked, k, recall_target=0.95)
    raise ValueError(f"unknown topk_impl {impl!r} "
                     "(expected sort|bisect|approx)")
