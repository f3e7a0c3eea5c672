"""Weight import/export.

Replaces the reference's model-acquisition chain
(reference: scripts/setup_model.py downloads an ultralytics checkpoint
and exports ONNX; src/tensorrt/yolo_pose_engine.cpp:183-411 parses it
into a TensorRT engine). Here checkpoints import directly:

  * `load_ultralytics_checkpoint` reads an ultralytics YOLO .pt file
    WITHOUT the ultralytics package: a stub unpickler stands in for the
    model classes (torch tensors deserialize through torch's own
    persistent-id machinery regardless), and the nn.Module tree is
    walked via `_parameters` / `_buffers` / `_modules`.
  * `convert_state_dict` maps the torch layer names onto our param
    pytree, folding every BatchNorm into the preceding conv
    (w' = w * g/sqrt(v+eps), b' = beta - g*m/sqrt(v+eps)) and
    transposing OIHW -> HWIO.
  * `save_params` / `load_params` persist the converted pytree as
    safetensors — the analog of the reference's serialized engine
    (saveEngine/loadEngine, yolo_pose_engine.cpp:413-495).
"""
from __future__ import annotations

import io
import pickle
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from .yolo_pose import MODEL_CONFIGS, init_params

BN_EPS = 1e-3   # ultralytics Conv uses BatchNorm2d(eps=0.001)


# ---------------------------------------------------------------------------
# Checkpoint reading without ultralytics installed
# ---------------------------------------------------------------------------

class _Stub:
    """Generic stand-in for any unavailable class in the pickle."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __call__(self, *args, **kwargs):   # some reduces call the object
        return self


_SAFE_PREFIXES = ("torch", "collections", "numpy", "builtins", "__builtin__")


def _make_unpickler_module():
    import importlib

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] in ("torch", "collections", "numpy",
                                        "builtins", "__builtin__"):
                try:
                    mod = importlib.import_module(module)
                    return getattr(mod, name)
                except (ImportError, AttributeError):
                    pass
            return type(name, (_Stub,), {"__module__": module})

    class Shim:
        Unpickler = StubUnpickler

        @staticmethod
        def load(f, **kw):
            return StubUnpickler(f).load()

        @staticmethod
        def loads(b, **kw):
            return StubUnpickler(io.BytesIO(b)).load()

    return Shim


def _walk_module(obj, prefix, out):
    """Recursively collect tensors from a stubbed nn.Module tree."""
    d = getattr(obj, "__dict__", None)
    if d is None:
        return
    for bag_name in ("_parameters", "_buffers"):
        bag = d.get(bag_name) or {}
        for k, v in bag.items():
            if v is None:
                continue
            arr = np.asarray(v.detach().to("cpu", dtype=None).float().numpy()
                             if hasattr(v, "detach") else v)
            out[f"{prefix}{k}"] = arr.astype(np.float32)
    for k, child in (d.get("_modules") or {}).items():
        _walk_module(child, f"{prefix}{k}.", out)


def load_ultralytics_checkpoint(path: str) -> dict:
    """Read an ultralytics .pt checkpoint -> flat {name: np.float32 array}
    with names like 'model.0.conv.weight'."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_make_unpickler_module())
    if isinstance(ckpt, dict):
        # Training checkpoints carry both "model" and "ema"; the EMA
        # weights are the deployable ones (released .pt files hold the
        # EMA under "model" already).
        model = ckpt.get("ema") or ckpt.get("model") or ckpt
    else:
        model = ckpt
    if not hasattr(model, "__dict__"):
        raise ValueError(f"unrecognized checkpoint structure in {path}")
    out: dict = {}
    _walk_module(model, "", out)
    if not out:
        raise ValueError(f"no tensors found in {path}")
    return out


# ---------------------------------------------------------------------------
# torch state dict -> our pytree
# ---------------------------------------------------------------------------

def _fused_conv(sd, prefix):
    """ultralytics Conv (conv + bn) -> {w HWIO, b}."""
    w = sd[f"{prefix}.conv.weight"]            # OIHW
    if f"{prefix}.bn.weight" in sd:
        g = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        scale = g / np.sqrt(var + BN_EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
    else:
        b = sd.get(f"{prefix}.conv.bias", np.zeros(w.shape[0], np.float32))
    return {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "b": b.astype(np.float32)}


def _plain_conv(sd, prefix):
    """nn.Conv2d with bias (head output convs)."""
    w = sd[f"{prefix}.weight"]
    b = sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32))
    return {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "b": b.astype(np.float32)}


def _fill_bottleneck(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")


def _fill_c2f(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")
    for i, m in enumerate(p["m"]):
        _fill_bottleneck(m, sd, f"{prefix}.m.{i}")


def _fill_c3(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")
    p["cv3"] = _fused_conv(sd, f"{prefix}.cv3")
    for i, m in enumerate(p["m"]):
        _fill_bottleneck(m, sd, f"{prefix}.m.{i}")


def _fill_c3k2(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")
    for i, (kind, m) in enumerate(p["m"]):
        if kind.value == "c3k":
            _fill_c3(m, sd, f"{prefix}.m.{i}")
        else:
            _fill_bottleneck(m, sd, f"{prefix}.m.{i}")


def _fill_sppf(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")


def _fill_c2psa(p, sd, prefix):
    p["cv1"] = _fused_conv(sd, f"{prefix}.cv1")
    p["cv2"] = _fused_conv(sd, f"{prefix}.cv2")
    for i, m in enumerate(p["m"]):
        mp = f"{prefix}.m.{i}"
        m["attn"]["qkv"] = _fused_conv(sd, f"{mp}.attn.qkv")
        m["attn"]["proj"] = _fused_conv(sd, f"{mp}.attn.proj")
        m["attn"]["pe"] = _fused_conv(sd, f"{mp}.attn.pe")
        m["ffn1"] = _fused_conv(sd, f"{mp}.ffn.0")
        m["ffn2"] = _fused_conv(sd, f"{mp}.ffn.1")


def _fill_head(head, sd, prefix, family):
    for i in range(3):
        cv2 = head["cv2"][i]
        cv2["0"] = _fused_conv(sd, f"{prefix}.cv2.{i}.0")
        cv2["1"] = _fused_conv(sd, f"{prefix}.cv2.{i}.1")
        cv2["2"] = _plain_conv(sd, f"{prefix}.cv2.{i}.2")
        cv3 = head["cv3"][i]
        if family == "v11":
            cv3["0_dw"] = _fused_conv(sd, f"{prefix}.cv3.{i}.0.0")
            cv3["0_pw"] = _fused_conv(sd, f"{prefix}.cv3.{i}.0.1")
            cv3["1_dw"] = _fused_conv(sd, f"{prefix}.cv3.{i}.1.0")
            cv3["1_pw"] = _fused_conv(sd, f"{prefix}.cv3.{i}.1.1")
            cv3["2"] = _plain_conv(sd, f"{prefix}.cv3.{i}.2")
        else:
            cv3["0"] = _fused_conv(sd, f"{prefix}.cv3.{i}.0")
            cv3["1"] = _fused_conv(sd, f"{prefix}.cv3.{i}.1")
            cv3["2"] = _plain_conv(sd, f"{prefix}.cv3.{i}.2")
        cv4 = head["cv4"][i]
        cv4["0"] = _fused_conv(sd, f"{prefix}.cv4.{i}.0")
        cv4["1"] = _fused_conv(sd, f"{prefix}.cv4.{i}.1")
        cv4["2"] = _plain_conv(sd, f"{prefix}.cv4.{i}.2")


# our key -> (torch index, fill fn) per family
_V8_LAYOUT = [
    ("b0", 0, "conv"), ("b1", 1, "conv"), ("b2", 2, "c2f"),
    ("b3", 3, "conv"), ("b4", 4, "c2f"), ("b5", 5, "conv"),
    ("b6", 6, "c2f"), ("b7", 7, "conv"), ("b8", 8, "c2f"),
    ("b9", 9, "sppf"), ("h12", 12, "c2f"), ("h15", 15, "c2f"),
    ("h16", 16, "conv"), ("h18", 18, "c2f"), ("h19", 19, "conv"),
    ("h21", 21, "c2f"),
]
_V11_LAYOUT = [
    ("b0", 0, "conv"), ("b1", 1, "conv"), ("b2", 2, "c3k2"),
    ("b3", 3, "conv"), ("b4", 4, "c3k2"), ("b5", 5, "conv"),
    ("b6", 6, "c3k2"), ("b7", 7, "conv"), ("b8", 8, "c3k2"),
    ("b9", 9, "sppf"), ("b10", 10, "c2psa"), ("h13", 13, "c3k2"),
    ("h16", 16, "c3k2"), ("h17", 17, "conv"), ("h19", 19, "c3k2"),
    ("h20", 20, "conv"), ("h22", 22, "c3k2"),
]
_FILLERS = {"c2f": _fill_c2f, "c3k2": _fill_c3k2, "sppf": _fill_sppf,
            "c2psa": _fill_c2psa}


def convert_state_dict(sd: dict, name: str):
    """torch state dict (ultralytics names) -> our params pytree."""
    import jax.numpy as jnp
    cfg = MODEL_CONFIGS[name]
    params = init_params(jax.random.PRNGKey(0), name)
    layout = _V8_LAYOUT if cfg.family == "v8" else _V11_LAYOUT
    for key, idx, kind in layout:
        prefix = f"model.{idx}"
        if kind == "conv":
            params[key] = _fused_conv(sd, prefix)
        else:
            _FILLERS[kind](params[key], sd, prefix)
    head_idx = 22 if cfg.family == "v8" else 23
    _fill_head(params["head"], sd, f"model.{head_idx}", cfg.family)
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, params)


def load_pretrained(path: str, name: str):
    """ultralytics .pt -> params pytree."""
    return convert_state_dict(load_ultralytics_checkpoint(path), name)


# ---------------------------------------------------------------------------
# Our own serialized format (the "engine" analog)
# ---------------------------------------------------------------------------

def _flatten(params, prefix=""):
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}."))
    elif hasattr(params, "shape"):
        flat[prefix[:-1]] = np.asarray(params)
    # Static metadata re-derives from init_params; skip.
    return flat


def save_params(params, path: str, name: str):
    """Serialize params as safetensors (saveEngine analog)."""
    from safetensors.numpy import save_file
    flat = _flatten(params)
    save_file(flat, path, metadata={"model": name,
                                    "format": "posebyte-tpu-v1"})


def load_params(path: str, name: str = None):
    """Load safetensors params back into the structured pytree."""
    import jax.numpy as jnp
    from safetensors.numpy import safe_open

    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        name = name or meta.get("model")
        flat = {k: f.get_tensor(k) for k in f.keys()}
    params = init_params(jax.random.PRNGKey(0), name)

    def fill(node, prefix=""):
        if isinstance(node, dict):
            # A conv saved in quantized form gains scale/act_scale keys
            # not present in the random-init structure.
            if set(node) == {"w", "b"} and f"{prefix}scale" in flat:
                out = {"w": jnp.asarray(flat[f"{prefix}w"]),
                       "scale": jnp.asarray(flat[f"{prefix}scale"]),
                       "b": jnp.asarray(flat[f"{prefix}b"])}
                if f"{prefix}act_scale" in flat:
                    out["act_scale"] = jnp.asarray(
                        flat[f"{prefix}act_scale"])
                return out
            return {k: fill(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, list):
            return [fill(v, f"{prefix}{i}.") for i, v in enumerate(node)]
        if isinstance(node, tuple):
            return tuple(fill(v, f"{prefix}{i}.") for i, v in enumerate(node))
        if hasattr(node, "shape"):
            return jnp.asarray(flat[prefix[:-1]])
        return node   # Static metadata

    return fill(params), name


def fold_stem_preprocess(params):
    """Fold BGR->RGB + /255 normalization into the stem conv weights.

    Returns a params pytree whose stem conv (`b0`, always float — it is
    in quant.PARTIAL_QUANT_SKIP) has its INPUT channel axis reversed and
    its weights scaled by 1/255, so that

        conv(w_folded, raw_bgr_0_255) == conv(w, rgb_normalized)

    exactly (the conv is linear in its input; the bias is untouched).
    Pairs with ops.preprocess.letterbox_flat_nhwc(raw=True): together
    they delete the materialized full-tensor channel reverse and the
    /255 multiply from the per-frame graph (the reference pays neither —
    its fused CUDA preprocess kernel normalizes in registers,
    preprocess.cu:50-77; on TPU the fold moves that work into weights
    loaded once).

    Engine-level transform, applied at pipeline/server construction;
    checkpoints on disk stay in the standard (unfolded) form.
    """
    b0 = params["b0"]
    if "scale" in b0:
        raise ValueError("stem conv is quantized; fold_stem_preprocess "
                         "requires the float stem (PARTIAL_QUANT_SKIP)")
    w = jnp.asarray(b0["w"])
    folded = dict(b0)
    folded["w"] = (w[:, :, ::-1, :] * jnp.asarray(1.0 / 255.0, w.dtype))
    out = dict(params)
    out["b0"] = folded
    return out
