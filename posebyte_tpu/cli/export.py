"""export_engine — convert checkpoints to the framework's serialized
format and ahead-of-time compile for a target geometry.

CLI parity with the reference export binary
(reference: src/export_engine.cpp:20-98: `-m model.onnx -o out.engine
-p {fp32,fp16,int8} [-b batch] [-c calib]`). The TPU analog of a
TensorRT engine build is: import weights -> optional int8 calibration ->
safetensors serialization (+ the XLA compile cache warms on first run).

Usage:
  python -m posebyte_tpu.cli.export -m yolov8n-pose.pt -o out.safetensors \\
      [-p {fp32,bf16,int8}] [-b BATCH] [-c calib_dir]
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="export_engine")
    p.add_argument("-m", "--model", required=True,
                   help="ultralytics .pt checkpoint, .safetensors, or a "
                        "model name (random init)")
    p.add_argument("-o", "--output", required=True,
                   help="output .safetensors path")
    p.add_argument("-p", "--precision", default="bf16",
                   choices=["fp32", "fp16", "bf16", "int8"],
                   help="fp16 is accepted as an alias for bf16 (TPU)")
    p.add_argument("-b", "--batch", type=int, default=1,
                   help="max batch size (AOT warmup geometry)")
    p.add_argument("-c", "--calib", default="",
                   help="calibration image directory (int8)")
    p.add_argument("--calib-cache", default="",
                   help="int8 activation-scale cache file: loaded if it "
                        "exists (skips image calibration), written after "
                        "calibrating otherwise (parity: TensorRT "
                        "calibrator cache)")
    p.add_argument("--calib-method", default="percentile",
                   choices=["percentile", "entropy"],
                   help="int8 activation calibration algorithm: "
                        "percentile = robust 99.9th-pct minmax "
                        "(default); entropy = the reference's "
                        "KL-divergence clip search "
                        "(Int8EntropyCalibrator2 parity, "
                        "yolo_pose_engine.cpp:56-164)")
    p.add_argument("--allow-synthetic-calib", action="store_true",
                   help="permit int8 activation calibration on synthetic "
                        "frames when no images/cache are given "
                        "(unvalidated scales; default is weight-only "
                        "int8 instead)")
    p.add_argument("--size", type=int, default=640,
                   help="input size (default 640)")
    p.add_argument("--no-compile", action="store_true",
                   help="skip the AOT compile warmup")
    p.add_argument("--aot", default="",
                   help="also write a locked AOT engine (StableHLO with "
                        "weights baked in) to this path — the literal "
                        "serialized-engine analog")
    args = p.parse_args(argv)

    from .demo import load_model_params
    from ..models import build_model
    from ..models.weights import save_params

    precision = {"fp16": "bf16"}.get(args.precision, args.precision)
    params, name = load_model_params(args.model)
    if params is None:
        import jax
        _, init_fn = build_model(name)
        params = init_fn(jax.random.PRNGKey(0))
        print(f"[export] WARNING: random-initialized {name} "
              f"(no checkpoint given)")

    if precision == "int8":
        from ..models.quant import calibrate_and_quantize
        params = calibrate_and_quantize(
            params, name, args.calib, args.size,
            cache_path=args.calib_cache,
            synthetic_fallback=args.allow_synthetic_calib,
            method=args.calib_method)

    save_params(params, args.output, name)
    size_mb = os.path.getsize(args.output) / 1e6
    print(f"[export] saved {name} ({precision}) -> {args.output} "
          f"({size_mb:.1f} MB)")

    if args.aot:
        import jax.numpy as jnp
        from ..models.aot import export_engine_aot
        dt = jnp.float32 if precision == "fp32" else jnp.bfloat16
        size = export_engine_aot(params, name, args.aot, args.batch,
                                 args.size, dt)
        print(f"[export] AOT engine -> {args.aot} ({size / 1e6:.1f} MB)")

    if not args.no_compile:
        import jax
        import jax.numpy as jnp
        dtype = jnp.float32 if precision == "fp32" else jnp.bfloat16
        apply_fn, _ = build_model(name, dtype)
        x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(apply_fn)(params, x))
        print(f"[export] AOT compile warm ({args.batch}x{args.size}): "
              f"{time.perf_counter() - t0:.1f}s "
              f"(cached for subsequent runs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
