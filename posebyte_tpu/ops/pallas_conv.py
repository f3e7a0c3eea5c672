"""Pallas int8 3x3 conv prototype (VERDICT r3 item 5).

Context: the reference's TensorRT int8 engines get +25..79% over FP16
(reference README.md:218-221) because TensorRT's int8 conv path runs
near the GPU's int8 peak. On this stack, XLA's int8
conv_general_dilated lowering measures ~140-153 effective TOPs = 36-39%
of the v5e int8 peak (scripts/bench_int8_micro.py, docs/ROADMAP.md
negative results), capping the w8a8 e2e win well under TensorRT's
multipliers. This module is the one scoped-but-untried lever: bypass
XLA's conv lowering with a Pallas kernel that formulates the 3x3 conv
as nine shifted int8 matmuls (the MXU's native int8 path via
dot_general with preferred_element_type=int32), the input tile
VMEM-resident so each input byte is read from HBM once.

Formulation (per batch-grid step, one frame):
    x_pad [H+2, W+2, C] int8 in VMEM (halo included)
    for (dy, dx) in 3x3:
        acc[HW, O] += x_pad[dy:dy+H, dx:dx+W, :].reshape(HW, C) @ W[dy,dx]
    out = acc.astype(f32) * (s_x * s_w)[O]    (dequant epilogue, bf16)

The reshape of the shifted window is the layout gamble: Mosaic must
relayout (H, W_pad-slice) sublanes into an HW sublane axis. Measured
verdict lives in docs/ROADMAP.md; the kernel is correctness-tested in
interpret mode against lax.conv_general_dilated
(tests/test_pallas_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _conv3x3_kernel(x_ref, w_ref, scale_ref, out_ref, *, H: int, W: int):
    """x_ref [1, H+2, W+2, C] int8; w_ref [9, C, O] int8;
    scale_ref [1, O] f32 (s_x * s_w per output channel);
    out_ref [1, H*W, O] bf16."""
    C = x_ref.shape[-1]
    O = w_ref.shape[-1]
    acc = jnp.zeros((H * W, O), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + H, dx:dx + W, :]          # [H, W, C]
            xs2 = xs.reshape(H * W, C)
            acc = acc + jax.lax.dot_general(
                xs2, w_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    out_ref[0] = (acc.astype(jnp.float32)
                  * scale_ref[0][None, :]).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_int8_pallas(x_q: jnp.ndarray, w_q: jnp.ndarray,
                        scale: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """int8 3x3 same-padding stride-1 conv, int32 accumulation, fused
    dequant epilogue.

    x_q   [B, H, W, C] int8 (pre-quantized activations)
    w_q   [3, 3, C, O] int8 (HWIO)
    scale [O] f32 — s_x * s_w per output channel (the dequant factor)
    returns [B, H, W, O] bf16 (= conv(x_q, w_q).astype(f32) * scale)

    Equivalent XLA formulation:
        lax.conv_general_dilated(x_q, w_q, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32) * scale
    """
    B, H, W, C = x_q.shape
    O = w_q.shape[-1]
    x_pad = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w_q.reshape(9, C, O)

    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, H=H, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((9, C, O), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, O), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H * W, O), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H * W, O), jnp.bfloat16),
        interpret=interpret,
    )(x_pad, w9, scale.reshape(1, O).astype(jnp.float32))
    return out.reshape(B, H, W, O)
