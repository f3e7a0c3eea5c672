#!/usr/bin/env python
"""Download a YOLO-pose checkpoint and convert it to the framework's
engine format.

Parity with the reference's model setup utility
(reference: scripts/setup_model.py:14-49, which downloads an ultralytics
checkpoint and exports ONNX for TensorRT). Here the checkpoint converts
directly to safetensors via the weight importer — no ONNX hop, no
ultralytics dependency for the conversion itself (only for download
fallback when the direct URL changes).

Usage:
  python scripts/setup_model.py --model yolov8n-pose [--out models/]
"""
import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RELEASE_URL = ("https://github.com/ultralytics/assets/releases/download/"
               "v8.3.0/{name}.pt")

SUPPORTED = ["yolov8n-pose", "yolov8s-pose", "yolov8m-pose",
             "yolov8l-pose", "yolov8x-pose",
             "yolo11n-pose", "yolo11s-pose", "yolo11m-pose",
             "yolo11l-pose", "yolo11x-pose"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov8n-pose", choices=SUPPORTED)
    p.add_argument("--out", default="models")
    p.add_argument("--keep-pt", action="store_true")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    pt_path = os.path.join(args.out, f"{args.model}.pt")
    st_path = os.path.join(args.out, f"{args.model}.safetensors")

    if not os.path.exists(pt_path):
        url = RELEASE_URL.format(name=args.model)
        print(f"Downloading {url}")
        try:
            urllib.request.urlretrieve(url, pt_path)
        except Exception as e:
            print(f"Download failed ({e}). If this host has no network "
                  f"access, place {args.model}.pt at {pt_path} manually.")
            return 1

    from posebyte_tpu.models.weights import load_pretrained, save_params
    print(f"Converting {pt_path} -> {st_path}")
    params = load_pretrained(pt_path, args.model)
    save_params(params, st_path, args.model)
    print(f"Saved {st_path} ({os.path.getsize(st_path) / 1e6:.1f} MB)")
    if not args.keep_pt:
        os.remove(pt_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
