"""Data-parallel mesh training (parallel/train.py): one DP step over
the 8-virtual-device mesh must equal one single-device step on the same
global batch, and the sharded-dataset scan trainer must optimize."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from posebyte_tpu.models.train import make_train_step
from posebyte_tpu.models.yolo_pose import init_params
from posebyte_tpu.parallel.train import (make_data_mesh,
                                         make_dp_scan_train,
                                         make_dp_train_step,
                                         shard_dataset)

S = 64
MODEL = "yolov8n-pose"


def _tiny_data(n, seed=3):
    rng = np.random.default_rng(seed)
    P = 4
    data = {
        "img": rng.integers(0, 255, (n, S, S, 3), dtype=np.uint8),
        "poses": rng.uniform(10, 54, (n, P, 17, 3)).astype(np.float32),
        "boxes": np.sort(rng.uniform(5, 59, (n, P, 2, 2))
                         .astype(np.float32), axis=2)
        .transpose(0, 1, 3, 2).reshape(n, P, 4),
        "valid": np.ones((n, P), bool),
    }
    data["poses"][..., 2] = 1.0
    return data


def test_dp_step_matches_single_device():
    """grad-of-global-mean == pmean of per-shard grads (equal shards):
    the DP step must reproduce the single-device step to reduction-
    order fp tolerance. SGD keeps the update LINEAR in the grads so
    the tolerance is meaningful (adam's m/(sqrt(v)+eps) after one step
    is ~ lr*sign(g): reduction-order noise on a near-zero gradient
    flips the whole element)."""
    mesh = make_data_mesh()
    n_dev = mesh.shape["data"]
    batch_np = _tiny_data(2 * n_dev)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    opt = optax.sgd(1e-2)
    params0 = init_params(jax.random.PRNGKey(0), MODEL)
    st0 = opt.init(params0)

    # single-device reference
    step1 = jax.jit(make_train_step(MODEL, S, opt))
    p_ref, st_ref, loss_ref, parts_ref = step1(params0, st0, batch)

    # DP over the mesh (fresh copies: the DP step donates its inputs)
    params0b = init_params(jax.random.PRNGKey(0), MODEL)
    st0b = opt.init(params0b)
    dp_step = make_dp_train_step(MODEL, S, opt, mesh)
    p_dp, st_dp, loss_dp, parts_dp = dp_step(params0b, st0b, batch)

    assert np.isfinite(float(loss_ref))
    np.testing.assert_allclose(float(loss_dp), float(loss_ref),
                               rtol=1e-5)
    for k in parts_ref:
        np.testing.assert_allclose(float(parts_dp[k]),
                                   float(parts_ref[k]), rtol=1e-4,
                                   atol=1e-6)
    flat_ref, tdef = jax.tree.flatten(p_ref)
    flat_dp = tdef.flatten_up_to(p_dp)
    assert len(flat_ref) == len(flat_dp)
    for a, b in zip(flat_ref, flat_dp):
        # sgd update = -lr * grad: param diff == lr * (grad reduction-
        # order diff), tiny relative to the param scale
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-6)


def test_dp_step_rejects_indivisible_batch():
    mesh = make_data_mesh()
    n_dev = mesh.shape["data"]
    if n_dev == 1:
        pytest.skip("needs >1 device")
    batch = {k: jnp.asarray(v) for k, v in _tiny_data(n_dev + 1).items()}
    opt = optax.adam(1e-3)
    params = init_params(jax.random.PRNGKey(0), MODEL)
    dp_step = make_dp_train_step(MODEL, S, opt, mesh)
    # shard_map rejects a non-divisible sharded axis with ValueError;
    # keep the match narrow so unrelated failures (import errors inside
    # jit, TypeError) can't satisfy this guard (ADVICE r3).
    with pytest.raises(ValueError):
        dp_step(params, opt.init(params), batch)


def test_dp_scan_train_optimizes_on_sharded_data():
    """The one-dispatch DP segment trainer: dataset sharded over the
    mesh, loss finite and decreasing across segments."""
    mesh = make_data_mesh()
    n_dev = mesh.shape["data"]
    data = shard_dataset(_tiny_data(2 * n_dev), mesh)
    # every shard is non-empty and the global axis is intact
    assert jax.tree.leaves(data)[0].shape[0] == 2 * n_dev

    opt = optax.adam(3e-3)
    params = init_params(jax.random.PRNGKey(0), MODEL)
    st = opt.init(params)
    run = make_dp_scan_train(MODEL, S, opt, batch_per_device=2,
                             mesh=mesh)
    params, st, l1 = run(params, st, data, jax.random.split(
        jax.random.PRNGKey(1), 6))
    params, st, l2 = run(params, st, data, jax.random.split(
        jax.random.PRNGKey(2), 6))
    l1, l2 = np.asarray(l1), np.asarray(l2)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    assert l2.mean() < l1.mean()
    # params remain replicated (single logical value per leaf)
    leaf = jax.tree.leaves(params)[0]
    assert leaf.sharding.is_fully_replicated
