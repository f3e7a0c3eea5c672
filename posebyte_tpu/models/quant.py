"""INT8 quantization.

TPU-native replacement for the reference's TensorRT INT8 path
(reference: src/tensorrt/yolo_pose_engine.cpp:243-332): entropy
calibration + partial quantization where the early backbone
(`/model.0/`-`/model.4/`) stays high precision.

Here:
  * weights quantize to per-output-channel symmetric int8 with an fp32
    scale (the storage win the reference reports as ~48% engine-size
    reduction, README.md:230);
  * the same partial-quantization policy applies: layers b0-b4 (the
    stem + first two C2f stages) keep bf16 weights — quantizing them
    hurts keypoint accuracy, per the reference's README.md:235-241;
  * at compute time the int8 weights dequantize into the conv's input
    dtype; XLA fuses the rescale into the convolution epilogue. (A raw
    int8-MXU path needs activation calibration and is staged behind
    `calibrate_activations`.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Layers kept high-precision (reference partial-quant policy:
# yolo_pose_engine.cpp:282-332 forces /model.0/../model.4/ to FP16).
PARTIAL_QUANT_SKIP = ("b0", "b1", "b2", "b3", "b4")


def _quantize_conv(p: dict) -> dict:
    """{w HWIO, b} -> {w int8 HWIO, scale [c_out], b} symmetric
    per-output-channel."""
    w = np.asarray(p["w"], np.float32)
    amax = np.max(np.abs(w), axis=(0, 1, 2))            # [c_out]
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w": q, "scale": scale, "b": np.asarray(p["b"], np.float32)}


def _walk(node, fn):
    if isinstance(node, dict):
        if "w" in node and "b" in node and "scale" not in node:
            return fn(node)
        return {k: _walk(v, fn) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v, fn) for v in node]
    if isinstance(node, tuple):
        return tuple(_walk(v, fn) for v in node)
    return node


def quantize_params(params, skip=PARTIAL_QUANT_SKIP):
    """Quantize every conv except the skip-listed top-level layers."""
    out = {}
    for key, node in params.items():
        if key in skip:
            out[key] = node
        else:
            out[key] = _walk(node, _quantize_conv)
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, out)


def conv_paths(node, prefix=""):
    """Stable dotted-path -> conv-param-dict map over a params tree
    (keys calibration caches; same walk order as _walk)."""
    out = {}
    if isinstance(node, dict):
        if "w" in node and "b" in node:
            out[prefix or "."] = node
            return out
        for k in sorted(node.keys()):
            out.update(conv_paths(node[k], f"{prefix}.{k}" if prefix
                                  else str(k)))
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            out.update(conv_paths(v, f"{prefix}[{i}]"))
    return out


def save_calibration_cache(qparams, path: str) -> int:
    """Persist activation scales to a JSON cache reusable across
    exports (parity: the reference's Int8EntropyCalibrator cache file,
    yolo_pose_engine.cpp:144-164). Returns the number of scales."""
    import json
    scales = {p: float(np.asarray(n["act_scale"]))
              for p, n in conv_paths(qparams).items()
              if "act_scale" in n}
    with open(path, "w") as f:
        json.dump({"version": 1, "act_scales": scales}, f, indent=1)
    return len(scales)


def load_calibration_cache(qparams, path: str) -> int:
    """Attach cached activation scales to already-weight-quantized
    convs (by dotted path). Returns the number attached."""
    import json
    with open(path) as f:
        cache = json.load(f)
    scales = cache["act_scales"]
    n = 0
    for p, node in conv_paths(qparams).items():
        if p in scales and "scale" in node:
            node["act_scale"] = jnp.asarray(scales[p], jnp.float32)
            n += 1
    return n


def _load_calibration_images(calib_dir: str, input_size: int,
                             max_images: int = 64):
    """Load + letterbox calibration images (the analog of the
    reference's Int8EntropyCalibrator feed loop,
    yolo_pose_engine.cpp:78-142). Returns [N, S, S, 3] float32 or None."""
    import os
    try:
        import cv2
    except ImportError:
        return None
    if not os.path.isdir(calib_dir):
        return None
    from ..ops.preprocess import letterbox_image
    imgs = []
    for f in sorted(os.listdir(calib_dir))[:max_images]:
        img = cv2.imread(os.path.join(calib_dir, f))
        if img is None:
            continue
        imgs.append(np.asarray(letterbox_image(jnp.asarray(img),
                                               input_size)))
    if not imgs:
        return None
    return np.transpose(np.stack(imgs), (0, 2, 3, 1)).astype(np.float32)


def _kl_threshold(counts: np.ndarray, width: float,
                  n_quant: int = 128, start_bin: int = 128) -> float:
    """TensorRT-style entropy calibration threshold (the search half of
    Int8EntropyCalibrator2, reference yolo_pose_engine.cpp:56-164;
    algorithm re-derived from NVIDIA's published 8-bit-inference
    description, not a port): over candidate clip points i (in bins),
    pick the one minimizing KL(P_i || Q_i) where P_i is the observed
    |activation| histogram clipped at bin i (outlier mass folded into
    the last bin) and Q_i is P_i re-expressed with `n_quant` uniform
    quantization levels (each level's mass spread evenly over its
    nonzero source bins). Returns the clip threshold in activation
    units: (i + 0.5) * width for the best i.
    """
    nbins = counts.shape[0]
    total = counts.sum()
    if total == 0 or width == 0.0:
        return 0.0
    cnt = counts.astype(np.float64)
    tail = np.concatenate([cnt[::-1].cumsum()[::-1], [0.0]])  # sum i..
    best_kl, best_i = np.inf, nbins
    for i in range(start_bin, nbins + 1):
        p = cnt[:i].copy()
        p[i - 1] += tail[i]                 # clip: outliers -> last bin
        nz = cnt[:i] > 0
        gid = (np.arange(i) * n_quant) // i  # bin -> quant level
        sums = np.bincount(gid, weights=cnt[:i], minlength=n_quant)
        nnz = np.bincount(gid, weights=nz.astype(np.float64),
                          minlength=n_quant)
        q = np.where(nz, (sums / np.maximum(nnz, 1.0))[gid], 0.0)
        p /= p.sum()
        qs = q.sum()
        if qs == 0.0:
            continue
        q /= qs
        mask = p > 0
        kl = float(np.sum(p[mask] *
                          np.log(p[mask] / np.maximum(q[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return (best_i + 0.5) * width


def calibrate_activations(qparams, name: str, images: np.ndarray,
                          percentile_headroom: float = 1.0,
                          method: str = "percentile"):
    """Collect per-conv activation amax by running the model eagerly
    with a recorder hooked into layers.conv2d, then attach
    `act_scale = amax / 127` to every already-weight-quantized conv —
    enabling the full int8 (w8a8) MXU path.

    method="percentile" (default) records per-image 99.9th-percentile
    |x| and scales from their max — robust minmax, the documented
    divergence from the reference (docs/FIDELITY.md #7).
    method="entropy" reproduces the reference's algorithm family:
    streaming 2048-bin |x| histograms (layers._EntropyHist) + the
    KL-divergence clip search (_kl_threshold) of TensorRT's
    Int8EntropyCalibrator2 (yolo_pose_engine.cpp:56-164).
    The recorded scales are the calibration cache and serialize with
    the engine either way.
    """
    from . import layers as L
    from .yolo_pose import MODEL_CONFIGS, forward_raw
    if method not in ("percentile", "entropy"):
        raise ValueError(f"unknown calibration method {method!r} "
                         "(expected percentile|entropy)")
    if jax.default_backend() != "cpu":
        print("[quant] NOTE: activation calibration runs EAGERLY (the "
              "recorder reads concrete values) — on remote/tunneled "
              "accelerators per-op dispatch makes this very slow. "
              "Calibrate on CPU (JAX_PLATFORMS=cpu + "
              "jax.config.update('jax_platforms','cpu')) and hand the "
              "scales over via --calib-cache.")
    recorder: dict = {}
    L._CALIBRATION_RECORDER = recorder
    L._CALIBRATION_METHOD = method
    try:
        # Batched passes: eager-mode op-dispatch overhead dominates
        # calibration time, and it is independent of batch size — one
        # batch-16 pass costs the same dispatches as one image. The
        # recorded statistic becomes the 99.9th percentile over the
        # batch (pooling images), which is equivalent calibration
        # robustness to per-image percentiles.
        B = 16
        for start in range(0, images.shape[0], B):
            forward_raw(qparams, jnp.asarray(images[start:start + B]),
                        MODEL_CONFIGS[name].family)
    finally:
        L._CALIBRATION_RECORDER = None
        L._CALIBRATION_METHOD = "percentile"

    n_attached = 0

    def attach(node):
        nonlocal n_attached
        if isinstance(node, dict):
            if "scale" in node and id(node) in recorder:
                if method == "entropy":
                    hist = recorder[id(node)]
                    amax = _kl_threshold(hist.counts, hist.width)
                else:
                    # max over per-image 99.9th percentiles: robust to
                    # in-image outliers, conservative across images
                    amax = max(recorder[id(node)]) * percentile_headroom
                node["act_scale"] = jnp.asarray(
                    max(amax, 1e-6) / 127.0, jnp.float32)
                n_attached += 1
            else:
                for v in node.values():
                    attach(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                attach(v)

    attach(qparams)
    print(f"[quant] activation calibration ({method}): {n_attached} "
          f"int8 convs over {images.shape[0]} images")
    return qparams


def calibrate_and_quantize(params, name: str, calib_dir: str = "",
                           input_size: int = 640,
                           cache_path: str = "",
                           synthetic_fallback: bool = False,
                           n_synthetic: int = 64,
                           method: str = "percentile"):
    """Full INT8 build (export CLI): per-channel int8 weights with the
    partial-quantization policy, plus activation calibration for the
    w8a8 MXU path.

    Calibration sources, in priority order (mirrors the reference's
    calibrator, which short-circuits to its cache file when present,
    yolo_pose_engine.cpp:144-164):
      1. an existing `cache_path` — scales load directly, no images;
      2. images in `calib_dir` (up to 64, percentile-calibrated);
         the result is persisted to `cache_path` when given;
      3. `synthetic_fallback=True` (explicit opt-in only): synthetic
         frames — scales are unvalidated, printed LOUDLY;
      4. otherwise: weight-only int8 (no act_scales attached) — the
         conv dequantizes weights into bf16 instead of shipping
         noise-calibrated activation scales.
    """
    import os
    qparams = quantize_params(params)

    if cache_path and os.path.exists(cache_path):
        n = load_calibration_cache(qparams, cache_path)
        print(f"[quant] loaded {n} activation scales from cache "
              f"{cache_path}")
        return qparams

    images = _load_calibration_images(calib_dir, input_size) \
        if calib_dir else None
    if images is None and synthetic_fallback:
        rng = np.random.default_rng(0)
        images = rng.uniform(
            0.0, 1.0, (n_synthetic, input_size, input_size, 3)) \
            .astype(np.float32)
        print("[quant] WARNING: calibrating on SYNTHETIC frames — "
              "activation scales are unvalidated; accuracy loss is "
              "unquantified. Provide -c <calib_dir> for real scales.")
    if images is not None:
        qparams = calibrate_activations(qparams, name, images,
                                        method=method)
        if cache_path:
            n = save_calibration_cache(qparams, cache_path)
            print(f"[quant] wrote {n} activation scales to cache "
                  f"{cache_path}")
    else:
        print("[quant] no calibration source: weight-only int8 "
              "(activations stay bf16; pass -c or --calib-cache for "
              "the full w8a8 path)")
    return qparams
