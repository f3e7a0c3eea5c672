#!/usr/bin/env python
"""Train a YOLO-pose model on synthetic rendered scenes (egress-free).

Closes the last validation hole (VERDICT r2 item 1): with no network
access, real ultralytics checkpoints cannot be downloaded, so the conv
net had never produced a detection from pixels. The models are pure
JAX — differentiable for free — and the synthetic renderer supplies
unlimited exactly-labeled frames, so we train the REAL architecture
until the full pixels -> letterbox -> forward -> decode -> NMS ->
track -> un-letterbox pipeline finds people with no oracle anywhere.

Pipeline-exact data: frames are rendered at video geometry (varied
sizes/aspects), then letterboxed to the model input with the SAME
separable-matmul weights the device path uses
(ops/preprocess._interp_matrices), so the training distribution equals
what the deployed model sees bit-for-bit (up to uint8 requantization).

TPU-shaped training: the whole dataset stays device-resident and each
segment of N steps runs as ONE lax.scan executable (models/train.py),
because per-step host round trips through the relay tunnel would
dominate (docs/DEVELOPMENT.md "Measurement environment quirks").

Usage:
  python scripts/train_synthetic.py                 # defaults: n @ 256
  python scripts/train_synthetic.py --steps 8000 --out assets/...
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

P_MAX = 8

# (width, height) video geometries the letterbox must generalize over
GEOMETRIES = [(640, 360), (960, 540), (1280, 720), (480, 480),
              (424, 640), (640, 480)]


def _fetch_plain(params):
    import jax
    return jax.tree.map(lambda x: np.array(x, copy=True),
                        jax.device_get(params))


def _fetch_flat(params):
    """Fetch every leaf as a 1-D array (forces a linear-layout d2h
    path), reshape on host."""
    import jax
    flat = jax.device_get(
        jax.jit(lambda t: jax.tree.map(lambda a: a.reshape(-1), t))(
            params))
    return jax.tree.map(lambda f, a: np.array(f, copy=True)
                        .reshape(a.shape), flat, params)


def _fetch_salted(params, salt: float):
    """Fetch through value-perturbed buffers (a + salt on device,
    - salt on host): the device buffers hold DIFFERENT bytes than any
    prior fetch, defeating any relay-side content or buffer
    memoization; the f32 round trip costs ~1e-7 relative error."""
    import jax
    import jax.numpy as jnp
    s = jnp.float32(salt)
    pert = jax.jit(lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32) + s, t))(params)
    fetched = jax.device_get(pert)
    return jax.tree.map(
        lambda f, a: (np.array(f, np.float32) - np.float32(salt))
        .astype(np.asarray(a).dtype if hasattr(a, "dtype")
                else np.float32).reshape(np.shape(a)), fetched, params)


def _subprocess_cpu_loss(ckpt: str, model: str, size: int,
                         seed: int) -> float:
    """The unfoolable oracle: a FRESH python process on the CPU backend
    loads the checkpoint from disk and computes the training loss on a
    train-set prefix. The relay cannot influence this number."""
    import subprocess
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, 'scripts');"
        "import numpy as np, jax.numpy as jnp;"
        "from train_synthetic import make_split;"
        "from posebyte_tpu.models.weights import load_params;"
        "from posebyte_tpu.models.train import batch_loss;"
        f"p, n = load_params({ckpt!r});"
        f"d = make_split(32, {size}, {seed}, noise=True);"
        "d = {k: jnp.asarray(v) for k, v in d.items()};"
        f"l, _ = batch_loss(p, d, n, {size});"
        "print('CPULOSS', float(l))"
    )
    out = subprocess.run(
        ["python", "-c", code], capture_output=True, text=True,
        timeout=1200,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    for line in out.stdout.splitlines():
        if line.startswith("CPULOSS"):
            return float(line.split()[1])
    raise RuntimeError(f"cpu loss check failed: {out.stderr[-500:]}")


def save_params_verified(params_dev, out: str, model: str, size: int,
                         seed: int, expect_loss: float):
    """Fetch + save + PROVE the checkpoint is the trained model.

    Round-3 finding (docs/DEVELOPMENT.md quirk 11): after a long
    training session, device_get of the params pytree returned wrong
    bytes for a subset of leaves — deterministically, with per-leaf
    value SUMS preserved (a layout/permutation-style scramble), and
    with re-uploads of those same bytes mapping back to the correct
    device buffers, so every in-process check passed while the file
    was garbage. No in-process verification can be trusted; the only
    reliable acceptance test is a FRESH CPU process computing the
    train loss of the file. Escalate through fetch strategies until
    that oracle agrees with the on-device loss."""
    from posebyte_tpu.models.weights import save_params

    strategies = [
        ("device_get", lambda p: _fetch_plain(p)),
        ("flat", lambda p: _fetch_flat(p)),
        ("salted1", lambda p: _fetch_salted(p, 0.03125)),
        ("salted2", lambda p: _fetch_salted(p, -0.015625)),
    ]
    bar = max(3.0 * expect_loss, expect_loss + 1.5)
    for name, fetch in strategies:
        pm = fetch(params_dev)
        save_params(pm, out, model)
        loss = _subprocess_cpu_loss(out, model, size, seed)
        print(f"[save-verify] strategy {name}: cpu-subprocess loss "
              f"{loss:.4f} (device {expect_loss:.4f}, bar {bar:.2f})",
              flush=True)
        if loss <= bar:
            return pm, loss
    raise RuntimeError(
        "every fetch strategy produced a checkpoint whose independent "
        "CPU loss disagrees with the on-device loss — params cannot "
        "be extracted faithfully through this relay")


def letterbox_host(frame_bgr: np.ndarray, target: int) -> np.ndarray:
    """Host-side letterbox, numerically identical to the device path
    (same interpolation matrices; ops/preprocess.py): uint8 BGR HWC ->
    uint8 RGB [target,target,3] (requantized)."""
    from posebyte_tpu.core import constants as C
    from posebyte_tpu.ops.preprocess import _interp_matrices

    h, w = frame_bgr.shape[:2]
    Wy, Wx, mask = _interp_matrices(w, h, target)
    a = np.tensordot(Wy, frame_bgr.astype(np.float32), axes=(1, 0))
    out = np.einsum("ywc,xw->yxc", a, Wx, optimize=True)
    out = out[..., ::-1]                                   # BGR -> RGB
    out = np.where(mask[..., None], out, C.LETTERBOX_PAD_VALUE)
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)


def make_split(n_frames: int, target: int, seed0: int, noise: bool):
    """Render n_frames across varied scenes; returns dict of numpy
    arrays: img [N,S,S,3] u8 RGB letterboxed, poses [N,P,17,3] and
    boxes [N,P,4] in INPUT coords, valid [N,P]."""
    from posebyte_tpu.ops.preprocess import letterbox_params
    from posebyte_tpu.utils.synthetic import (SyntheticScene, pose_bbox,
                                              render_frame)

    rng = np.random.default_rng(seed0)
    imgs = np.zeros((n_frames, target, target, 3), np.uint8)
    poses = np.zeros((n_frames, P_MAX, 17, 3), np.float32)
    boxes = np.zeros((n_frames, P_MAX, 4), np.float32)
    valid = np.zeros((n_frames, P_MAX), bool)

    i = 0
    scene_idx = 0
    while i < n_frames:
        w, h = GEOMETRIES[scene_idx % len(GEOMETRIES)]
        n_persons = int(rng.integers(0, P_MAX + 1))
        scale_lo = float(rng.uniform(60.0, 110.0))
        scene = SyntheticScene(
            max(n_persons, 1), w, h, seed=seed0 + 1000 + scene_idx,
            scale_range=(scale_lo, scale_lo + rng.uniform(20.0, 80.0)),
            speed=float(rng.uniform(2.0, 7.0)))
        background = int(rng.integers(15, 90))
        scale, _, _, pad_x, pad_y = letterbox_params(w, h, target)
        take = min(int(rng.integers(8, 25)), n_frames - i)
        for gt in scene.frames(take):
            if n_persons == 0:
                gt_use = gt[:0]
            else:
                gt_use = gt
            frame = render_frame(gt_use, w, h, background=background)
            if noise:
                sigma = rng.uniform(0.0, 8.0)
                frame = np.clip(
                    frame.astype(np.float32)
                    + rng.normal(0, sigma, frame.shape), 0, 255
                ).astype(np.uint8)
            imgs[i] = letterbox_host(frame, target)
            for p, pose in enumerate(gt_use[:P_MAX]):
                q = pose.copy()
                q[:, :2] = q[:, :2] * scale + (pad_x, pad_y)
                poses[i, p] = q
                b = pose_bbox(pose)
                boxes[i, p] = (b * scale
                               + (pad_x, pad_y, pad_x, pad_y))
                valid[i, p] = True
            i += 1
            if i == n_frames:
                break
        scene_idx += 1
    return {"img": imgs, "poses": poses, "boxes": boxes, "valid": valid}


def eval_detection(params, data, model_name: str, target: int,
                   conf: float = 0.30, batch: int = 32):
    """Detection-only OKS-mAP on a split: batched forward + the
    production sparse decode + OKS NMS (no tracker)."""
    import jax
    import jax.numpy as jnp
    from posebyte_tpu.core.config import DetectorConfig
    from posebyte_tpu.models import build_model_heads
    from posebyte_tpu.ops.decode import decode_topk
    from posebyte_tpu.ops.nms import pose_nms
    from posebyte_tpu.utils.evaluation import keypoint_map

    heads_fn, _ = build_model_heads(model_name, jnp.float32)
    cfg = DetectorConfig(input_size=target, conf_threshold=conf)

    @jax.jit
    def run(params, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        box, cls, kpt = heads_fn(params, x)

        def dec(b, c, k):
            det = decode_topk(b, c, k, cfg.conf_threshold,
                              cfg.max_candidates, cfg.input_size)
            return pose_nms(det, cfg.iou_threshold, cfg.oks_threshold,
                            cfg.max_detections, presorted=True)

        return jax.vmap(dec)(box, cls, kpt)

    import jax.numpy as jnp
    N = len(data["img"])
    gts, preds, scores = [], [], []
    for i in range(0, N - N % batch, batch):
        dets = jax.device_get(run(params,
                                  jnp.asarray(data["img"][i:i + batch])))
        for b in range(batch):
            v = data["valid"][i + b]
            gts.append(data["poses"][i + b][v])
            dv = dets.valid[b]
            preds.append(dets.poses[b][dv])
            scores.append(dets.scores[b][dv])
    return keypoint_map(gts, preds, scores)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="yolov8n-pose")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n-train", type=int, default=3072)
    p.add_argument("--n-val", type=int, default=256)
    p.add_argument("--segment", type=int, default=200,
                   help="steps per scan dispatch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="")
    p.add_argument("--resume", default="",
                   help="existing checkpoint to continue from")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over N mesh devices (0 = single"
                        "-device; batch must divide by N). Each device"
                        " samples batch/N rows from its dataset shard;"
                        " grads pmean over ICI (parallel/train.py)")
    args = p.parse_args()
    out = args.out or (f"assets/{args.model}-synthetic{args.size}"
                       ".safetensors")

    import jax
    import jax.numpy as jnp
    import optax
    from posebyte_tpu.models import yolo_pose
    from posebyte_tpu.models.train import make_scan_train
    from posebyte_tpu.models.weights import load_params, save_params

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    train = make_split(args.n_train, args.size, args.seed, noise=True)
    val = make_split(args.n_val, args.size, args.seed + 777_000,
                     noise=False)
    print(f"dataset: {args.n_train} train / {args.n_val} val frames "
          f"({train['img'].nbytes / 1e6:.0f} MB) in "
          f"{time.time() - t0:.1f}s", flush=True)

    if args.resume:
        params, _ = load_params(args.resume, args.model)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                              params)
        print(f"resumed from {args.resume}", flush=True)
    else:
        params = yolo_pose.init_params(jax.random.PRNGKey(args.seed),
                                       args.model)

    sched = optax.warmup_cosine_decay_schedule(
        init_value=args.lr * 0.05, peak_value=args.lr,
        warmup_steps=min(500, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.02)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adamw(sched, weight_decay=1e-5))
    opt_state = optimizer.init(params)

    if args.dp:
        if args.batch % args.dp:
            raise SystemExit(f"--batch {args.batch} must divide by "
                             f"--dp {args.dp}")
        from posebyte_tpu.parallel.train import (make_data_mesh,
                                                 make_dp_scan_train,
                                                 shard_dataset)
        mesh = make_data_mesh(args.dp)
        run = make_dp_scan_train(args.model, args.size, optimizer,
                                 args.batch // args.dp, mesh)
        data_dev = shard_dataset(train, mesh)
        print(f"data-parallel over {args.dp} devices "
              f"({args.batch // args.dp}/device)", flush=True)
    else:
        run = jax.jit(make_scan_train(args.model, args.size, optimizer,
                                      args.batch))
        data_dev = {k: jnp.asarray(v) for k, v in train.items()}

    key = jax.random.PRNGKey(args.seed + 1)
    done = 0
    t0 = time.time()
    while done < args.steps:
        seg = min(args.segment, args.steps - done)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, seg)
        params, opt_state, losses = run(params, opt_state, data_dev,
                                        keys)
        losses = np.asarray(losses)
        done += seg
        print(f"step {done:6d}/{args.steps}  loss "
              f"{losses[-20:].mean():.4f}  "
              f"({(time.time() - t0) / done * 1e3:.1f} ms/step avg)",
              flush=True)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    last_loss = float(np.asarray(losses)[-20:].mean())
    if jax.default_backend() == "cpu":
        params = jax.device_get(params)
        save_params(params, out, args.model)
    else:
        params, cpu_loss = save_params_verified(
            params, out, args.model, args.size, args.seed, last_loss)
    print(f"saved {out}", flush=True)

    maps = eval_detection(params, val, args.model, args.size)
    print("val detection:", json.dumps({k: round(v, 4)
                                        for k, v in maps.items()}),
          flush=True)
    with open(out.replace(".safetensors", ".metrics.json"), "w") as f:
        json.dump({"val_detection": maps, "steps": args.steps,
                   "train_frames": args.n_train, "size": args.size,
                   "model": args.model}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
