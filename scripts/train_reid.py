#!/usr/bin/env python
"""Train the learned Re-ID head on synthetic identity-colored scenes.

ROADMAP #4: the tracker's appearance seam (ops/reid.py) accepts
embeddings from any source; this trains the learned source
(models/reid_head.py) with an InfoNCE identity-contrastive objective
over the synthetic renderer — per-scene randomized identity colors,
pairs of frames of the same scene at a time offset, positives = same
identity across the pair, negatives = every other figure in the batch.

The head is ~2.7k params, so training runs in minutes ON CPU — no
relay hazards (the TPU tunnel's eager/measurement quirks,
docs/DEVELOPMENT.md, are irrelevant here) and the checkpoint needs no
fetch-verification dance.

Usage:
  JAX_PLATFORMS=cpu python scripts/train_reid.py          # defaults
  ... --steps 1500 --out assets/reid-head-synthetic.safetensors
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Force the CPU backend unconditionally: the head is tiny (training on
# the tunneled TPU would be pure relay overhead) and sitecustomize pins
# the platform via jax.config, so the env var alone is NOT enough
# (docs/DEVELOPMENT.md) — set the config knob before any backend touch.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

P_MAX = 6
GEOMETRIES = [(640, 360), (960, 540), (1280, 720), (640, 480)]


def make_pairs(n_pairs: int, target: int, seed0: int):
    """Render identity pairs: for each scene, two frames `gap` apart
    with per-identity random colors. Returns dict of numpy arrays:
    img_a/img_b [N,S,S,3] u8 RGB letterboxed, poses_a/poses_b
    [N,P_MAX,17,3] in MODEL coords, valid [N,P_MAX]."""
    from posebyte_tpu.ops.preprocess import letterbox_params
    from posebyte_tpu.utils.synthetic import SyntheticScene, render_frame
    from train_synthetic import letterbox_host

    rng = np.random.default_rng(seed0)
    S = target
    out = {
        "img_a": np.zeros((n_pairs, S, S, 3), np.uint8),
        "img_b": np.zeros((n_pairs, S, S, 3), np.uint8),
        "poses_a": np.zeros((n_pairs, P_MAX, 17, 3), np.float32),
        "poses_b": np.zeros((n_pairs, P_MAX, 17, 3), np.float32),
        "valid": np.zeros((n_pairs, P_MAX), bool),
    }
    for i in range(n_pairs):
        w, h = GEOMETRIES[i % len(GEOMETRIES)]
        n_persons = int(rng.integers(2, P_MAX + 1))
        scene = SyntheticScene(
            n_persons, w, h, seed=seed0 + 31 * i,
            scale_range=(float(rng.uniform(70, 100)),
                         float(rng.uniform(110, 170))),
            speed=float(rng.uniform(2.0, 7.0)))
        # identity colors: well-separated hues, randomized per scene
        colors = rng.integers(30, 256, (n_persons, 3))
        background = int(rng.integers(15, 90))
        gap = int(rng.integers(3, 12))
        frames_gt = [gt.copy() for gt in scene.frames(gap + 1)]
        scale, _, _, pad_x, pad_y = letterbox_params(w, h, target)

        for tag, gt in (("a", frames_gt[0]), ("b", frames_gt[gap])):
            frame = render_frame(gt, w, h, background=background,
                                 colors=colors)
            # photometric augmentation: brightness + noise
            gain = rng.uniform(0.7, 1.3)
            sigma = rng.uniform(0.0, 6.0)
            frame = np.clip(frame.astype(np.float32) * gain
                            + rng.normal(0, sigma, frame.shape),
                            0, 255).astype(np.uint8)
            out[f"img_{tag}"][i] = letterbox_host(frame, target)
            for p, pose in enumerate(gt[:P_MAX]):
                q = pose.copy()
                q[:, :2] = q[:, :2] * scale + (pad_x, pad_y)
                out[f"poses_{tag}"][i, p] = q
        out["valid"][i, :n_persons] = True
    return out


def info_nce_loss(params, batch, temp: float = 0.1):
    """Identity-contrastive InfoNCE over a batch of scene pairs.

    Anchors = figures in frame A; for each anchor, positive = the SAME
    identity in frame B of the same scene; negatives = every other
    (scene, figure) embedding in the batch from frame B. Similarity is
    the co-visibility cosine the tracker itself uses at association
    time (ops/reid.cosine_cost_matrix), so the head trains against the
    exact deployed metric."""
    import jax
    import jax.numpy as jnp
    from posebyte_tpu.models.reid_head import apply_reid_head
    from posebyte_tpu.ops.reid import cosine_cost_matrix

    emb_a = jax.vmap(lambda im, po: apply_reid_head(
        params, im.astype(jnp.float32) / 255.0, po))(
            batch["img_a"], batch["poses_a"])      # [N,P,51]
    emb_b = jax.vmap(lambda im, po: apply_reid_head(
        params, im.astype(jnp.float32) / 255.0, po))(
            batch["img_b"], batch["poses_b"])

    N, P = emb_a.shape[:2]
    ea = emb_a.reshape(N * P, -1)
    eb = emb_b.reshape(N * P, -1)
    sim = 1.0 - cosine_cost_matrix(ea, eb)          # [NP, NP] cosine
    v = batch["valid"].reshape(N * P)
    pair_ok = v[:, None] & v[None, :]
    logits = jnp.where(pair_ok, sim / temp, -1e9)
    labels = jnp.arange(N * P)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_anchor = -logp[labels, labels]
    return jnp.sum(jnp.where(v, per_anchor, 0.0)) / jnp.maximum(
        jnp.sum(v), 1)


def eval_separation(params, data):
    """Mean same-identity vs different-identity co-visibility cosine on
    a held-out split, plus top-1 identity retrieval accuracy."""
    import jax
    import jax.numpy as jnp
    from posebyte_tpu.models.reid_head import apply_reid_head
    from posebyte_tpu.ops.reid import cosine_cost_matrix

    same, diff, hits, total = [], [], 0, 0
    for i in range(len(data["img_a"])):
        v = data["valid"][i]
        n = int(v.sum())
        if n < 2:
            continue
        ea = apply_reid_head(params, jnp.asarray(
            data["img_a"][i], jnp.float32) / 255.0,
            jnp.asarray(data["poses_a"][i]))[:n]
        eb = apply_reid_head(params, jnp.asarray(
            data["img_b"][i], jnp.float32) / 255.0,
            jnp.asarray(data["poses_b"][i]))[:n]
        cos = np.asarray(1.0 - cosine_cost_matrix(ea, eb))
        same.extend(np.diag(cos))
        diff.extend(cos[~np.eye(n, dtype=bool)])
        hits += int((cos.argmax(axis=1) == np.arange(n)).sum())
        total += n
    return {"same_id_cos": float(np.mean(same)),
            "diff_id_cos": float(np.mean(diff)),
            "top1_acc": hits / max(total, 1), "anchors": total}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--n-train", type=int, default=768)
    p.add_argument("--n-val", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="assets/reid-head-synthetic"
                                    ".safetensors")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from posebyte_tpu.models.reid_head import (init_reid_head,
                                               save_reid_head)

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    train = make_pairs(args.n_train, args.size, args.seed)
    val = make_pairs(args.n_val, args.size, args.seed + 999_000)
    print(f"dataset: {args.n_train} train / {args.n_val} val pairs in "
          f"{time.time() - t0:.1f}s", flush=True)

    params = init_reid_head(jax.random.PRNGKey(args.seed))
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    data_dev = {k: jnp.asarray(v) for k, v in train.items()}
    n = args.n_train

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.choice(key, n, (args.batch,), replace=False)
        batch = {k: v[idx] for k, v in data_dev.items()}
        loss, grads = jax.value_and_grad(info_nce_loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if (it + 1) % 200 == 0:
            print(f"step {it + 1:5d}/{args.steps}  loss "
                  f"{float(loss):.4f}  "
                  f"({(time.time() - t0) / (it + 1) * 1e3:.0f} ms/step)",
                  flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_reid_head(jax.device_get(params), args.out)
    print(f"saved {args.out}", flush=True)

    metrics = eval_separation(params, val)
    print("val separation:", json.dumps(
        {k: round(v, 4) if isinstance(v, float) else v
         for k, v in metrics.items()}), flush=True)
    with open(args.out.replace(".safetensors", ".metrics.json"),
              "w") as f:
        json.dump({"val": metrics, "steps": args.steps,
                   "train_pairs": args.n_train, "size": args.size},
                  f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
