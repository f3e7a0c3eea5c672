"""Functional neural-net building blocks for YOLO-pose on TPU.

TPU-native design notes:
  * NHWC layout + HWIO kernels — XLA's native TPU convolution layout, so
    every conv lowers straight onto the MXU without transposes.
  * BatchNorm is folded into conv weight/bias at load time (an inference
    framework, like the reference's TensorRT engine builds —
    reference: src/tensorrt/yolo_pose_engine.cpp:183-411); at init time
    layers are conv+bias directly.
  * Params are plain nested dicts (pytrees): transparent for weight
    import, quantization rewrites, and sharding annotations.
  * Compute dtype is a parameter: fp32 / bf16 (int8 lives in quant.py).

Explicit symmetric padding (k//2) matches torch's Conv2d semantics so
imported ultralytics weights reproduce reference outputs exactly.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


@jax.tree_util.register_static
class Static:
    """Wrapper marking a pytree leaf as static metadata (not traced under
    jit). Used for structural flags stored alongside weights (block
    arity, shortcut flags, hidden widths)."""

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return hash(self.value)

    def __eq__(self, other):
        return isinstance(other, Static) and self.value == other.value

    def __repr__(self):
        return f"Static({self.value!r})"


def conv_init(key, c_in: int, c_out: int, k: int = 1):
    """He-normal conv params {w: [k,k,c_in,c_out], b: [c_out]}."""
    fan_in = c_in * k * k
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (k, k, c_in, c_out), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}


# Active calibration recorder (models/quant.py sets this in eager mode
# to collect per-conv activation ranges; None in production).
_CALIBRATION_RECORDER = None
# "percentile" (per-image 99.9th |x| percentiles) or "entropy"
# (streaming |x| histograms for the TensorRT-style KL threshold
# search, models/quant.py::_kl_threshold).
_CALIBRATION_METHOD = "percentile"


class _EntropyHist:
    """Streaming |activation| histogram with a growable range (2048
    bins) — the collection half of TensorRT's Int8EntropyCalibrator2
    (reference: yolo_pose_engine.cpp:56-142). When a batch exceeds the
    current range the bin width doubles and adjacent bins merge, so
    one pass over the calibration set suffices."""
    NBINS = 2048

    def __init__(self):
        import numpy as _np
        self.counts = _np.zeros(self.NBINS, _np.int64)
        self.width = 0.0

    def update(self, absx):
        import numpy as _np
        if absx.size == 0:
            return
        amax = float(absx.max())
        if amax == 0.0:
            return
        if self.width == 0.0:
            self.width = amax / self.NBINS
        while amax > self.NBINS * self.width:
            merged = self.counts[0::2] + self.counts[1::2]
            self.counts = _np.concatenate(
                [merged, _np.zeros(self.NBINS // 2, _np.int64)])
            self.width *= 2.0
        idx = _np.minimum((absx / self.width).astype(_np.int64),
                          self.NBINS - 1)
        self.counts += _np.bincount(idx, minlength=self.NBINS) \
            .astype(_np.int64)


def _record_calibration(recorder, method, params, x):
    import numpy as _np
    if method == "entropy":
        hist = recorder.setdefault(id(params), _EntropyHist())
        hist.update(_np.abs(_np.asarray(x, _np.float32)).ravel())
    else:
        # per-image 99.9th-percentile |x| (clips in-image outliers)
        recorder.setdefault(id(params), []).append(
            float(jnp.percentile(jnp.abs(x.astype(jnp.float32)), 99.9)))


def conv2d(params, x, stride: int = 1, groups: int = 1):
    """NHWC conv with torch-style symmetric k//2 padding.

    Three parameter flavors:
      {w, b}                      float weights
      {w int8, scale, b}          weight-only int8 (dequant in epilogue)
      {w int8, scale, act_scale, b}  full int8 (w8a8): the activation
          quantizes to int8 with the calibrated per-tensor scale and the
          convolution runs on the MXU's int8 path with int32
          accumulation — the TPU analog of the reference's TensorRT INT8
          engines (yolo_pose_engine.cpp:243-332).
    """
    if _CALIBRATION_RECORDER is not None:
        _record_calibration(_CALIBRATION_RECORDER, _CALIBRATION_METHOD,
                            params, x)

    k = params["w"].shape[0]
    pad = k // 2
    conv_kw = dict(
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )

    if "act_scale" in params and "scale" in params:
        s_x = params["act_scale"].astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127) \
            .astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, params["w"], preferred_element_type=jnp.int32, **conv_kw)
        out = (y.astype(jnp.float32)
               * (s_x * params["scale"].astype(jnp.float32))
               + params["b"].astype(jnp.float32))
        return out.astype(x.dtype)

    if "scale" in params:
        w = params["w"].astype(x.dtype) * params["scale"].astype(x.dtype)
    else:
        w = params["w"].astype(x.dtype)
    y = lax.conv_general_dilated(x, w, preferred_element_type=x.dtype,
                                 **conv_kw)
    return y + params["b"].astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv2d_s2d(params, x):
    """EXACT space-to-depth reformulation of a k3 stride-2 conv.

    Low-channel stride-2 stem convs waste MXU lanes (3 of 128 on the
    first layer). Packing each 2x2 pixel cell into channels
    (HxWxC -> H/2 x W/2 x 4C) and rewriting the 3x3/s2 kernel as an
    equivalent 2x2/s1 kernel over cells quadruples lane utilization and
    quarters the spatial iteration space — bit-exact, including the
    asymmetric cell padding that reproduces the original pad=1.
    Tap mapping: absolute offset dy-1 lands in cell (y-1, py=1) for
    dy=0, (y, py=dy-1) for dy in {1, 2}; same along x.
    """
    w = params["w"]                       # [3, 3, C, O]
    assert w.shape[0] == 3 and w.shape[1] == 3
    B, H, W, C = x.shape
    O = w.shape[-1]

    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

    w2 = jnp.zeros((2, 2, 4 * C, O), w.dtype)
    for dy in range(3):
        cy, py = (0, 1) if dy == 0 else (1, dy - 1)
        for dx in range(3):
            cx, px = (0, 1) if dx == 0 else (1, dx - 1)
            ch = (py * 2 + px) * C
            w2 = w2.at[cy, cx, ch:ch + C, :].set(w[dy, dx])

    if "scale" in params:
        w2 = w2.astype(jnp.float32) * params["scale"]
    y = lax.conv_general_dilated(
        x2, w2.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y + params["b"].astype(x.dtype)


def conv_block_s2d(params, x):
    """silu(conv2d_s2d(...)) — drop-in for conv_block(params, x, 2)."""
    return silu(conv2d_s2d(params, x))


def packed_stem(p0, p1, x, pack: int):
    """EXACT frame-packed stem: the first two stride-2 Conv+SiLU layers
    computed for `pack` frames at once via block-diagonal weights.

    yolov8/11's stem has 3->16->32 channels against the MXU's 128
    lanes, idling 75-98% of the array. Packing P frames' channels
    side-by-side (batch B -> B/P, channels C -> P*C) with
    block-diagonal kernels (w_packed[:, :, b*ci:(b+1)*ci,
    b*co:(b+1)*co] = w) raises lane occupancy to P*co without mixing
    frames: an output block's channels read only its own frame's input
    block, every cross-block weight is an exact zero, so per-output
    arithmetic is identical to the per-frame conv (fp32-exact; bf16
    differs only in accumulation-tree rounding).

    x [B, S, S, 3] with B % pack == 0 -> [B, S/4, S/4, c1] — identical
    to conv_block(p1, conv_block(p0, x, 2), 2). Only valid for plain
    float stems (the int8 partial-quant policy keeps b0/b1 float, so
    this holds for every precision mode).
    """
    B, S, _, C = x.shape
    P = pack
    assert B % P == 0, (B, P)
    c0 = p0["w"].shape[-1]
    c1 = p1["w"].shape[-1]

    def blockdiag(w):
        k, _, ci, co = w.shape
        wb = jnp.zeros((k, k, ci * P, co * P), w.dtype)
        for b in range(P):
            wb = wb.at[:, :, b * ci:(b + 1) * ci,
                       b * co:(b + 1) * co].set(w)
        return wb

    conv_kw = dict(window_strides=(2, 2), padding=((1, 1), (1, 1)),
                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = x.reshape(B // P, P, S, S, C).transpose(0, 2, 3, 1, 4) \
        .reshape(B // P, S, S, P * C)
    a = lax.conv_general_dilated(
        xp, blockdiag(p0["w"]).astype(x.dtype),
        preferred_element_type=x.dtype, **conv_kw)
    a = silu(a + jnp.tile(p0["b"], P).astype(x.dtype))
    b = lax.conv_general_dilated(
        a, blockdiag(p1["w"]).astype(x.dtype),
        preferred_element_type=x.dtype, **conv_kw)
    b = silu(b + jnp.tile(p1["b"], P).astype(x.dtype))
    S4 = S // 4
    return b.reshape(B // P, S4, S4, P, c1).transpose(0, 3, 1, 2, 4) \
        .reshape(B, S4, S4, c1)


def conv_block(params, x, stride: int = 1, groups: int = 1):
    """Conv + (folded) BN + SiLU — ultralytics `Conv`."""
    return silu(conv2d(params, x, stride, groups))


def conv_block_init(key, c_in, c_out, k=1):
    return conv_init(key, c_in, c_out, k)


def dwconv_block(params, x, stride: int = 1):
    """Depthwise Conv + SiLU — ultralytics `DWConv` (used by YOLO11
    detect heads)."""
    c = x.shape[-1]
    return silu(conv2d(params, x, stride, groups=c))


def dwconv_init(key, c: int, k: int = 3):
    # depthwise: HWIO with I = 1, O = c
    fan_in = k * k
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (k, k, 1, c), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((c,), jnp.float32)}


# ---------------------------------------------------------------------------
# Bottleneck / C2f / C3k2 / SPPF / C2PSA
# ---------------------------------------------------------------------------

def bottleneck_init(key, c_in, c_out, shortcut=True, e=0.5, k=(3, 3)):
    k1, k2 = jax.random.split(key)
    c_h = int(c_out * e)
    return {
        "cv1": conv_init(k1, c_in, c_h, k[0]),
        "cv2": conv_init(k2, c_h, c_out, k[1]),
        "add": Static(shortcut and c_in == c_out),
    }


def bottleneck(params, x):
    y = conv_block(params["cv2"], conv_block(params["cv1"], x))
    return x + y if params["add"].value else y


def c2f_init(key, c_in, c_out, n=1, shortcut=False, e=0.5):
    keys = jax.random.split(key, n + 2)
    c_h = int(c_out * e)
    return {
        "cv1": conv_init(keys[0], c_in, 2 * c_h, 1),
        "cv2": conv_init(keys[1], (2 + n) * c_h, c_out, 1),
        "m": [bottleneck_init(keys[2 + i], c_h, c_h, shortcut, e=1.0)
              for i in range(n)],
        "c_h": Static(c_h),
    }


def c2f(params, x):
    """CSP bottleneck with 2 convs, n inner bottlenecks (ultralytics C2f)."""
    c_h = params["c_h"].value
    y = conv_block(params["cv1"], x)
    parts = [y[..., :c_h], y[..., c_h:]]
    for m in params["m"]:
        parts.append(bottleneck(m, parts[-1]))
    return conv_block(params["cv2"], jnp.concatenate(parts, axis=-1))


def c3_init(key, c_in, c_out, n=1, shortcut=True, e=0.5, bk=(1, 3)):
    keys = jax.random.split(key, n + 3)
    c_h = int(c_out * e)
    return {
        "cv1": conv_init(keys[0], c_in, c_h, 1),
        "cv2": conv_init(keys[1], c_in, c_h, 1),
        "cv3": conv_init(keys[2], 2 * c_h, c_out, 1),
        "m": [bottleneck_init(keys[3 + i], c_h, c_h, shortcut, e=1.0, k=bk)
              for i in range(n)],
    }


def c3(params, x):
    a = conv_block(params["cv1"], x)
    for m in params["m"]:
        a = bottleneck(m, a)
    b = conv_block(params["cv2"], x)
    return conv_block(params["cv3"], jnp.concatenate([a, b], axis=-1))


def c3k2_init(key, c_in, c_out, n=1, c3k=False, e=0.5, shortcut=True):
    """YOLO11's C3k2: a C2f whose inner blocks are C3k (k=3 C3) when
    c3k=True, plain bottlenecks otherwise."""
    keys = jax.random.split(key, n + 2)
    c_h = int(c_out * e)
    inner = []
    for i in range(n):
        if c3k:
            inner.append((Static("c3k"), c3_init(keys[2 + i], c_h, c_h, n=2,
                                         shortcut=shortcut, bk=(3, 3))))
        else:
            inner.append((Static("bottleneck"),
                          bottleneck_init(keys[2 + i], c_h, c_h, shortcut,
                                          e=0.5)))
    return {
        "cv1": conv_init(keys[0], c_in, 2 * c_h, 1),
        "cv2": conv_init(keys[1], (2 + n) * c_h, c_out, 1),
        "m": inner,
        "c_h": Static(c_h),
    }


def c3k2(params, x):
    c_h = params["c_h"].value
    y = conv_block(params["cv1"], x)
    parts = [y[..., :c_h], y[..., c_h:]]
    for kind, m in params["m"]:
        if kind.value == "c3k":
            parts.append(c3(m, parts[-1]))
        else:
            parts.append(bottleneck(m, parts[-1]))
    return conv_block(params["cv2"], jnp.concatenate(parts, axis=-1))


def sppf_init(key, c_in, c_out, k=5):
    k1, k2 = jax.random.split(key)
    c_h = c_in // 2
    return {
        "cv1": conv_init(k1, c_in, c_h, 1),
        "cv2": conv_init(k2, c_h * 4, c_out, 1),
        "k": Static(k),
    }


def _maxpool(x, k):
    pad = k // 2
    return lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        lax.max, (1, k, k, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def sppf(params, x):
    """Spatial pyramid pooling (fast): 3 chained maxpools, concat."""
    k = params["k"].value
    y = conv_block(params["cv1"], x)
    p1 = _maxpool(y, k)
    p2 = _maxpool(p1, k)
    p3 = _maxpool(p2, k)
    return conv_block(params["cv2"], jnp.concatenate([y, p1, p2, p3],
                                                     axis=-1))


# ---------------------------------------------------------------------------
# C2PSA (YOLO11 attention stage)
# ---------------------------------------------------------------------------

def _attention_init(key, dim, num_heads):
    k1, k2, k3 = jax.random.split(key, 3)
    head_dim = dim // num_heads
    key_dim = head_dim // 2
    nh_kd = key_dim * num_heads
    h = dim + nh_kd * 2
    return {
        "qkv": conv_init(k1, dim, h, 1),
        "proj": conv_init(k2, dim, dim, 1),
        "pe": dwconv_init(k3, dim, 3),
        "num_heads": Static(num_heads), "key_dim": Static(key_dim),
        "head_dim": Static(head_dim),
    }


def _attention(params, x):
    """Ultralytics `Attention` over spatial tokens (B, H, W, C)."""
    B, H, W, Cc = x.shape
    nh, kd, hd = (params["num_heads"].value, params["key_dim"].value,
                  params["head_dim"].value)
    N = H * W
    qkv = conv2d(params["qkv"], x)                       # [B,H,W,h]
    qkv = qkv.reshape(B, N, nh, kd * 2 + hd)
    q, k, v = jnp.split(qkv, [kd, kd * 2], axis=-1)       # [B,N,nh,*]
    scale = kd ** -0.5
    attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, H, W, Cc)
    vv = v.reshape(B, H, W, nh * hd)
    pe = conv2d(params["pe"], vv, groups=Cc)
    return conv2d(params["proj"], out + pe)


def _psablock_init(key, dim, num_heads):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": _attention_init(k1, dim, num_heads),
        "ffn1": conv_init(k2, dim, dim * 2, 1),
        "ffn2": conv_init(k3, dim * 2, dim, 1),
    }


def _psablock(params, x):
    x = x + _attention(params["attn"], x)
    y = conv_block(params["ffn1"], x)
    return x + conv2d(params["ffn2"], y)


def c2psa_init(key, c, n=1, e=0.5):
    keys = jax.random.split(key, n + 2)
    c_h = int(c * e)
    return {
        "cv1": conv_init(keys[0], c, 2 * c_h, 1),
        "cv2": conv_init(keys[1], 2 * c_h, c, 1),
        "m": [_psablock_init(keys[2 + i], c_h, max(1, c_h // 64))
              for i in range(n)],
        "c_h": Static(c_h),
    }


def c2psa(params, x):
    c_h = params["c_h"].value
    y = conv_block(params["cv1"], x)
    a, b = y[..., :c_h], y[..., c_h:]
    for m in params["m"]:
        b = _psablock(m, b)
    return conv_block(params["cv2"], jnp.concatenate([a, b], axis=-1))


def upsample2x(x):
    """Nearest-neighbor 2x upsample (ultralytics nn.Upsample)."""
    B, H, W, Cc = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
