"""YOLOv8-pose / YOLO11-pose forward passes in functional JAX.

TPU-native replacement for the reference's TensorRT engine
(reference: src/tensorrt/yolo_pose_engine.cpp:183-411 buildFromONNX and
the ONNX graphs exported by scripts/setup_model.py:14-49, which cover
ultralytics YOLOv8-pose n/s/m/l/x and YOLO11-pose n/s/m/l/x). Instead of
parsing ONNX into a vendor engine, the architecture is implemented
directly as jitted JAX so XLA owns fusion/scheduling; weights import
from ultralytics checkpoints via models/weights.py.

The raw output layout matches the reference engine exactly:
[B, 56, 8400] with rows 0-3 = bbox cxcywh in input pixels, row 4 =
sigmoid confidence, rows 5-55 = 17 keypoints (x, y in input pixels,
sigmoid conf) — see gpu_postprocess.cu:44-47.

Everything is NHWC / bf16-ready; shapes are static per input size.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

REG_MAX = 16
NUM_CLASSES = 1
NK = 51          # 17 keypoints * 3


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    family: str              # "v8" | "v11"
    depth: float
    width: float
    max_channels: int
    c3k_everywhere: bool = False   # v11 m/l/x force c3k=True

    def ch(self, c: int) -> int:
        """Scaled channel count, rounded to a multiple of 8 (ultralytics
        make_divisible)."""
        c = min(c, self.max_channels)
        return max(8, int(math.ceil(c * self.width / 8) * 8))

    def n(self, n: int) -> int:
        return max(1, round(n * self.depth))


MODEL_CONFIGS = {
    "yolov8n-pose": ModelConfig("yolov8n-pose", "v8", 0.33, 0.25, 1024),
    "yolov8s-pose": ModelConfig("yolov8s-pose", "v8", 0.33, 0.50, 1024),
    "yolov8m-pose": ModelConfig("yolov8m-pose", "v8", 0.67, 0.75, 768),
    "yolov8l-pose": ModelConfig("yolov8l-pose", "v8", 1.00, 1.00, 512),
    "yolov8x-pose": ModelConfig("yolov8x-pose", "v8", 1.00, 1.25, 512),
    "yolo11n-pose": ModelConfig("yolo11n-pose", "v11", 0.50, 0.25, 1024),
    "yolo11s-pose": ModelConfig("yolo11s-pose", "v11", 0.50, 0.50, 1024),
    "yolo11m-pose": ModelConfig("yolo11m-pose", "v11", 0.50, 1.00, 512,
                                c3k_everywhere=True),
    "yolo11l-pose": ModelConfig("yolo11l-pose", "v11", 1.00, 1.00, 512,
                                c3k_everywhere=True),
    "yolo11x-pose": ModelConfig("yolo11x-pose", "v11", 1.00, 1.50, 512,
                                c3k_everywhere=True),
}


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _head_init(key, cfg: ModelConfig, chs):
    """Pose head params over the three pyramid levels (ultralytics
    Pose = Detect + keypoint branch)."""
    keys = iter(jax.random.split(key, 64))
    c2 = max(16, chs[0] // 4, 4 * REG_MAX)
    c3 = max(chs[0], min(NUM_CLASSES, 100))
    c4 = max(chs[0] // 4, NK)
    head = {"cv2": [], "cv3": [], "cv4": []}
    for ch in chs:
        head["cv2"].append({
            "0": L.conv_init(next(keys), ch, c2, 3),
            "1": L.conv_init(next(keys), c2, c2, 3),
            "2": L.conv_init(next(keys), c2, 4 * REG_MAX, 1),
        })
        if cfg.family == "v11":
            head["cv3"].append({
                "0_dw": L.dwconv_init(next(keys), ch, 3),
                "0_pw": L.conv_init(next(keys), ch, c3, 1),
                "1_dw": L.dwconv_init(next(keys), c3, 3),
                "1_pw": L.conv_init(next(keys), c3, c3, 1),
                "2": L.conv_init(next(keys), c3, NUM_CLASSES, 1),
            })
        else:
            head["cv3"].append({
                "0": L.conv_init(next(keys), ch, c3, 3),
                "1": L.conv_init(next(keys), c3, c3, 3),
                "2": L.conv_init(next(keys), c3, NUM_CLASSES, 1),
            })
        head["cv4"].append({
            "0": L.conv_init(next(keys), ch, c4, 3),
            "1": L.conv_init(next(keys), c4, c4, 3),
            "2": L.conv_init(next(keys), c4, NK, 1),
        })
    return head


def init_params(key, name: str = "yolov8n-pose"):
    """Random-init parameter pytree for the named model."""
    cfg = MODEL_CONFIGS[name]
    keys = iter(jax.random.split(key, 32))
    ch = cfg.ch
    p = {}
    if cfg.family == "v8":
        d3, d6 = cfg.n(3), cfg.n(6)
        p["b0"] = L.conv_init(next(keys), 3, ch(64), 3)
        p["b1"] = L.conv_init(next(keys), ch(64), ch(128), 3)
        p["b2"] = L.c2f_init(next(keys), ch(128), ch(128), d3, True)
        p["b3"] = L.conv_init(next(keys), ch(128), ch(256), 3)
        p["b4"] = L.c2f_init(next(keys), ch(256), ch(256), d6, True)
        p["b5"] = L.conv_init(next(keys), ch(256), ch(512), 3)
        p["b6"] = L.c2f_init(next(keys), ch(512), ch(512), d6, True)
        p["b7"] = L.conv_init(next(keys), ch(512), ch(1024), 3)
        p["b8"] = L.c2f_init(next(keys), ch(1024), ch(1024), d3, True)
        p["b9"] = L.sppf_init(next(keys), ch(1024), ch(1024))
        # head (PAN)
        p["h12"] = L.c2f_init(next(keys), ch(1024) + ch(512), ch(512), d3)
        p["h15"] = L.c2f_init(next(keys), ch(512) + ch(256), ch(256), d3)
        p["h16"] = L.conv_init(next(keys), ch(256), ch(256), 3)
        p["h18"] = L.c2f_init(next(keys), ch(256) + ch(512), ch(512), d3)
        p["h19"] = L.conv_init(next(keys), ch(512), ch(512), 3)
        p["h21"] = L.c2f_init(next(keys), ch(512) + ch(1024), ch(1024), d3)
        chs = (ch(256), ch(512), ch(1024))
    else:
        d2 = cfg.n(2)
        ck = cfg.c3k_everywhere
        p["b0"] = L.conv_init(next(keys), 3, ch(64), 3)
        p["b1"] = L.conv_init(next(keys), ch(64), ch(128), 3)
        p["b2"] = L.c3k2_init(next(keys), ch(128), ch(256), d2, ck, e=0.25)
        p["b3"] = L.conv_init(next(keys), ch(256), ch(256), 3)
        p["b4"] = L.c3k2_init(next(keys), ch(256), ch(512), d2, ck, e=0.25)
        p["b5"] = L.conv_init(next(keys), ch(512), ch(512), 3)
        p["b6"] = L.c3k2_init(next(keys), ch(512), ch(512), d2, True)
        p["b7"] = L.conv_init(next(keys), ch(512), ch(1024), 3)
        p["b8"] = L.c3k2_init(next(keys), ch(1024), ch(1024), d2, True)
        p["b9"] = L.sppf_init(next(keys), ch(1024), ch(1024))
        p["b10"] = L.c2psa_init(next(keys), ch(1024), d2)
        p["h13"] = L.c3k2_init(next(keys), ch(1024) + ch(512), ch(512), d2,
                               ck)
        # NOTE: v11's backbone layer 4 outputs ch(512) (unlike v8's
        # ch(256)), so the P3 concat is 2*ch(512).
        p["h16"] = L.c3k2_init(next(keys), ch(512) + ch(512), ch(256), d2,
                               ck)
        p["h17"] = L.conv_init(next(keys), ch(256), ch(256), 3)
        p["h19"] = L.c3k2_init(next(keys), ch(256) + ch(512), ch(512), d2,
                               ck)
        p["h20"] = L.conv_init(next(keys), ch(512), ch(512), 3)
        p["h22"] = L.c3k2_init(next(keys), ch(512) + ch(1024), ch(1024), d2,
                               True)
        chs = (ch(256), ch(512), ch(1024))
    p["head"] = _head_init(next(keys), cfg, chs)
    return p


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

# NOTE: an exact space-to-depth stem rewrite exists (layers.conv2d_s2d,
# verified bit-identical in tests/test_models.py) but measured ~7%
# SLOWER than the plain stride-2 convs on v5e — current XLA already
# optimizes the low-channel stem. Kept as an op for future compilers.
def _backbone_neck_v8(p, x, stem_done: bool = False):
    if not stem_done:
        x = L.conv_block(p["b0"], x, 2)
        x = L.conv_block(p["b1"], x, 2)
    x = L.c2f(p["b2"], x)
    x = L.conv_block(p["b3"], x, 2)
    p3 = L.c2f(p["b4"], x)
    x = L.conv_block(p["b5"], p3, 2)
    p4 = L.c2f(p["b6"], x)
    x = L.conv_block(p["b7"], p4, 2)
    x = L.c2f(p["b8"], x)
    p5 = L.sppf(p["b9"], x)

    u4 = jnp.concatenate([L.upsample2x(p5), p4], axis=-1)
    n4 = L.c2f(p["h12"], u4)
    u3 = jnp.concatenate([L.upsample2x(n4), p3], axis=-1)
    o3 = L.c2f(p["h15"], u3)
    d4 = jnp.concatenate([L.conv_block(p["h16"], o3, 2), n4], axis=-1)
    o4 = L.c2f(p["h18"], d4)
    d5 = jnp.concatenate([L.conv_block(p["h19"], o4, 2), p5], axis=-1)
    o5 = L.c2f(p["h21"], d5)
    return o3, o4, o5


def _backbone_neck_v11(p, x, stem_done: bool = False):
    if not stem_done:
        x = L.conv_block(p["b0"], x, 2)
        x = L.conv_block(p["b1"], x, 2)
    x = L.c3k2(p["b2"], x)
    x = L.conv_block(p["b3"], x, 2)
    p3 = L.c3k2(p["b4"], x)
    x = L.conv_block(p["b5"], p3, 2)
    p4 = L.c3k2(p["b6"], x)
    x = L.conv_block(p["b7"], p4, 2)
    x = L.c3k2(p["b8"], x)
    x = L.sppf(p["b9"], x)
    p5 = L.c2psa(p["b10"], x)

    u4 = jnp.concatenate([L.upsample2x(p5), p4], axis=-1)
    n4 = L.c3k2(p["h13"], u4)
    u3 = jnp.concatenate([L.upsample2x(n4), p3], axis=-1)
    o3 = L.c3k2(p["h16"], u3)
    d4 = jnp.concatenate([L.conv_block(p["h17"], o3, 2), n4], axis=-1)
    o4 = L.c3k2(p["h19"], d4)
    d5 = jnp.concatenate([L.conv_block(p["h20"], o4, 2), p5], axis=-1)
    o5 = L.c3k2(p["h22"], d5)
    return o3, o4, o5


def _head_level(head, i, x, family: str):
    """One pyramid level -> (box_logits [B,H,W,64], cls [B,H,W,1],
    kpt [B,H,W,51])."""
    cv2, cv3, cv4 = head["cv2"][i], head["cv3"][i], head["cv4"][i]
    box = L.conv2d(cv2["2"],
                   L.conv_block(cv2["1"], L.conv_block(cv2["0"], x)))
    if family == "v11":
        c = L.dwconv_block(cv3["0_dw"], x)
        c = L.conv_block(cv3["0_pw"], c)
        c = L.dwconv_block(cv3["1_dw"], c)
        c = L.conv_block(cv3["1_pw"], c)
        cls = L.conv2d(cv3["2"], c)
    else:
        cls = L.conv2d(cv3["2"],
                       L.conv_block(cv3["1"], L.conv_block(cv3["0"], x)))
    kpt = L.conv2d(cv4["2"],
                   L.conv_block(cv4["1"], L.conv_block(cv4["0"], x)))
    return box, cls, kpt


@functools.lru_cache(maxsize=8)
def make_anchors_levels(input_size: int = 640, strides=(8, 16, 32)):
    """Per-pyramid-level anchor centers + strides:
    ((anchors [A_l, 2], strides [A_l]), ...) as numpy, one tuple per
    level in stride order. Level l's anchors occupy the global index
    range [offset_l, offset_l + A_l) in make_anchors' concatenation."""
    per = []
    for s in strides:
        n = input_size // s
        xs = np.arange(n, dtype=np.float32) + 0.5
        gy, gx = np.meshgrid(xs, xs, indexing="ij")
        per.append((np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1),
                    np.full((n * n,), s, np.float32)))
    return tuple(per)


@functools.lru_cache(maxsize=8)
def make_anchors(input_size: int = 640, strides=(8, 16, 32)):
    """Anchor centers (in grid units) + per-anchor stride, concatenated
    over levels: ([A, 2], [A]) as numpy (static baked constants)."""
    per = make_anchors_levels(input_size, strides)
    return (np.concatenate([p for p, _ in per], 0),
            np.concatenate([s for _, s in per], 0))


def _dfl(box_logits: jnp.ndarray) -> jnp.ndarray:
    """Distribution-focal decode: [B, A, 4, REG_MAX] logits ->
    [B, A, 4] expected distances (ultralytics DFL as a softmax
    expectation; one fused VPU pass instead of the 1x1-conv trick)."""
    prob = jax.nn.softmax(box_logits.astype(jnp.float32), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.einsum("bafr,r->baf", prob, bins,
                      precision=jax.lax.Precision.HIGHEST)


def forward_head_maps(params, x, family: str = "v8",
                      packed_stem: int = 0):
    """Input [B, S, S, 3] NHWC -> undecoded PER-LEVEL head maps:
    a tuple of (box [B, A_l, 64], cls [B, A_l, 1], kpt [B, A_l, 51])
    per pyramid level (A_l = H_l*W_l, row-major flatten of the conv
    output — free reshape, no cross-level concatenation).

    This is the producer surface for the tail-fused decode
    (ops/decode.py::decode_topk_levels): candidate selection runs on
    each level's conv-native layout and the [B, A, C] concatenated
    tensors are never materialized."""
    stem_done = False
    if packed_stem > 1 and x.shape[0] % packed_stem == 0:
        # frame-packed stem: full MXU lane occupancy on the thin first
        # two convs (layers.packed_stem; exact per-frame math)
        x = L.packed_stem(params["b0"], params["b1"], x, packed_stem)
        stem_done = True
    if family == "v8":
        feats = _backbone_neck_v8(params, x, stem_done)
    else:
        feats = _backbone_neck_v11(params, x, stem_done)

    head = params["head"]
    levels = []
    for i, f in enumerate(feats):
        b, c, k = _head_level(head, i, f, family)
        B = b.shape[0]
        levels.append((b.reshape(B, -1, 4 * REG_MAX),
                       c.reshape(B, -1, NUM_CLASSES),
                       k.reshape(B, -1, NK)))
    return tuple(levels)


def forward_heads(params, x, family: str = "v8",
                  packed_stem: int = 0):
    """Input [B, S, S, 3] NHWC -> undecoded head outputs
    (box_logits [B, A, 64], cls_logits [B, A, 1], kpt_raw [B, A, 51]).

    The hot path: the pipeline selects top-K candidates on
    sigmoid(cls_logits) and decodes DFL/keypoints only for those
    (ops/decode.py::decode_topk) — a ~30x reduction of decode-tail work
    versus decoding all A anchors."""
    levels = forward_head_maps(params, x, family, packed_stem)
    return (jnp.concatenate([b for b, _, _ in levels], axis=1),
            jnp.concatenate([c for _, c, _ in levels], axis=1),
            jnp.concatenate([k for _, _, k in levels], axis=1))


def decode_dense(box, cls, kpt, input_size: int):
    """Dense decode of every anchor -> [B, 56, A] (the reference
    engine's output tensor contract)."""
    anchors_np, strides_np = make_anchors(input_size)
    anchors = jnp.asarray(anchors_np)         # [A, 2] grid units
    strides = jnp.asarray(strides_np)         # [A]

    # DFL box decode -> cxcywh in pixels (ultralytics dist2bbox(xywh=True))
    d = _dfl(box.reshape(*box.shape[:2], 4, REG_MAX))   # [B, A, 4]
    lt, rb = d[..., :2], d[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) * 0.5 * strides[None, :, None]
    wh = (x2y2 - x1y1) * strides[None, :, None]

    conf = jax.nn.sigmoid(cls.astype(jnp.float32))      # [B, A, 1]

    # keypoint decode (ultralytics Pose.kpts_decode):
    # xy = (pred*2 + (anchor - 0.5)) * stride ; conf = sigmoid
    k3 = kpt.reshape(*kpt.shape[:2], 17, 3).astype(jnp.float32)
    kxy = (k3[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) \
        * strides[None, :, None, None]
    kconf = jax.nn.sigmoid(k3[..., 2:3])
    kdec = jnp.concatenate([kxy, kconf], axis=-1).reshape(
        *kpt.shape[:2], NK)

    out = jnp.concatenate([cxy, wh, conf, kdec], axis=-1)  # [B, A, 56]
    return jnp.transpose(out, (0, 2, 1))                   # [B, 56, A]


def forward_raw(params, x, family: str = "v8"):
    """Input [B, 640, 640, 3] NHWC float -> raw head output [B, 56, A]
    matching the reference engine's output tensor layout."""
    box, cls, kpt = forward_heads(params, x, family)
    return decode_dense(box, cls, kpt, x.shape[1])


def build_model_heads(name: str = "yolov8n-pose", dtype=jnp.float32,
                      packed_stem: int = 0):
    """Returns (heads_fn, init_fn): heads_fn(params, images_nhwc) ->
    (box_logits, cls_logits, kpt_raw) — the hot path feeding
    ops.decode.decode_topk (sparse decode).

    packed_stem=P > 1 runs the first two convs frame-packed
    (layers.packed_stem: full MXU lane occupancy, exact per-frame math)
    whenever the batch divides P; falls back silently otherwise."""
    cfg = MODEL_CONFIGS[name]

    def heads_fn(params, x):
        return forward_heads(params, x.astype(dtype), cfg.family,
                             packed_stem=packed_stem)

    def init_fn(key):
        return init_params(key, name)

    return heads_fn, init_fn


def build_model_head_maps(name: str = "yolov8n-pose",
                          dtype=jnp.float32, packed_stem: int = 0):
    """Like build_model_heads, but the returned fn yields PER-LEVEL
    head maps (forward_head_maps) for the tail-fused decode
    (DetectorConfig.decode_fusion == "tail")."""
    cfg = MODEL_CONFIGS[name]

    def head_maps_fn(params, x):
        return forward_head_maps(params, x.astype(dtype), cfg.family,
                                 packed_stem=packed_stem)

    return head_maps_fn


def build_model(name: str = "yolov8n-pose", dtype=jnp.float32):
    """Returns (apply_fn, init_fn) for the named model.

    apply_fn(params, images_nhwc) -> [B, 56, A]; computes in `dtype`
    (bf16 recommended on TPU; the decode tail is always fp32).
    """
    cfg = MODEL_CONFIGS[name]

    def apply_fn(params, x):
        return forward_raw(params, x.astype(dtype), cfg.family)

    def init_fn(key):
        return init_params(key, name)

    return apply_fn, init_fn
