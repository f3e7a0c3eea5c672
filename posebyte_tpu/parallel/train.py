"""Data-parallel mesh training for the synthetic-supervision pipeline.

The reference never trains (it consumes ultralytics checkpoints,
scripts/setup_model.py) and has no distributed mode at all (SURVEY.md
§2.3); training on rendered synthetic scenes is this framework's
egress-free path to real weights (models/train.py). This module scales
that training over a `jax.sharding.Mesh` the TPU-native way:

  * the batch axis is sharded over a ``data`` mesh axis (each device
    computes its microbatch's loss/grads locally),
  * gradients are averaged over ICI in one collective: under the new
    `jax.shard_map` varying-axis semantics, differentiating wrt
    REPLICATED (unvarying) params auto-inserts the `psum` in the
    transpose of the implicit broadcast — the grads arrive already
    summed over the mesh, so the body only divides by the axis size
    (an explicit extra pmean would be an identity on the unvarying
    sum, silently leaving the update n_dev× too large — pinned by
    test_dp_step_matches_single_device),
  * params/optimizer state stay replicated — the optimizer update runs
    identically on every device from identical averaged grads, so no
    re-broadcast is ever needed.

Formulated with `shard_map` (not jit+in_shardings) for the same reason
as parallel/sharding.py: inside the mapped body every array is the
device-local shard, so the per-device work is exactly the single-chip
`models.train.batch_loss` and the ONLY collective is the explicit
pmean — the partitioner never has to infer anything.

Both entry points mirror their single-chip counterparts:

  * `make_dp_train_step`  ≙ models.train.make_train_step
  * `make_dp_scan_train`  ≙ models.train.make_scan_train — the whole
    N-step segment is ONE dispatch (lax.scan) with the dataset sharded
    device-resident along the sample axis; each device draws its
    microbatch from its own shard (keys folded with the device's
    axis index) so a D-device run sees D× the sample throughput.

Equivalence contract: one DP step over D devices == one single-device
step on the concatenated global batch (grad-of-mean == pmean of
grads-of-shard-means when shards are equal-sized; asserted to fp
tolerance in tests/test_parallel_train.py on the 8-virtual-device CPU
mesh).

JAX-version requirement: the gradient scaling above RELIES on
`jax.shard_map`'s varying-axis (check_vma) semantics — the implicit
psum on the transpose of the unvarying-params broadcast — pinned on
JAX 0.9.0. Do NOT wrap these bodies with check_vma=False, and treat
tests/test_parallel_train.py::test_dp_step_matches_single_device as
the REQUIRED gate for any JAX upgrade: it is the only check that
catches a silent n_dev× update rescale if those semantics change.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.train import batch_loss

__all__ = ["make_data_mesh", "make_dp_train_step", "make_dp_scan_train",
           "shard_dataset"]


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over a ``data`` axis (distinct from the serving meshes'
    ``stream`` axis: streams are independent recurrences, data shards
    are one optimization problem)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, axis_names=("data",))


def shard_dataset(data: dict, mesh: Mesh) -> dict:
    """Place a host dataset dict ({k: [N, ...]}) sharded along axis 0
    over the mesh's ``data`` axis. N is trimmed to a multiple of the
    mesh size (a warning is logged when samples are dropped)."""
    import warnings
    sharding = NamedSharding(mesh, P("data"))
    n_dev = mesh.shape["data"]
    out = {}
    for k, v in data.items():
        n = (v.shape[0] // n_dev) * n_dev
        if n != v.shape[0]:
            warnings.warn(
                f"shard_dataset: trimming '{k}' from {v.shape[0]} to {n} "
                f"samples ({v.shape[0] - n} dropped) to divide evenly "
                f"over {n_dev} devices", stacklevel=2)
        out[k] = jax.device_put(jnp.asarray(v[:n]), sharding)
    return out


def make_dp_train_step(model_name: str, input_size: int, optimizer,
                       mesh: Mesh):
    """Returns step(params, opt_state, batch) -> (params, opt_state,
    loss, parts), jitted over the mesh.

    `batch` is the GLOBAL batch (dict of [B, ...]); B must be a
    multiple of the mesh size. Each device grads its shard, gradients
    are pmean'd, and the identical optax update runs replicated."""

    n_dev = mesh.shape["data"]

    def local_step(params, opt_state, batch):
        (loss, parts), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params, batch, model_name,
                                      input_size)
        # grads are already psum'd over "data" by the transpose of the
        # replicated-params broadcast (module docstring): sum -> mean
        grads = jax.tree.map(lambda g: g / n_dev, grads)
        loss = jax.lax.pmean(loss, "data")
        parts = jax.lax.pmean(parts, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, parts

    smap = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P(), P(), P()))
    return jax.jit(smap, donate_argnums=(0, 1))


def make_dp_scan_train(model_name: str, input_size: int, optimizer,
                       batch_per_device: int, mesh: Mesh):
    """Returns run(params, opt_state, data, keys) executing len(keys)
    DP optimization steps as ONE dispatch (≙ models.train.
    make_scan_train, the relay-tunnel-friendly shape).

    `data` must be sharded along axis 0 over ``data`` (shard_dataset);
    each device samples `batch_per_device` rows per step from ITS
    shard using the step key folded with its axis index, so the
    effective global batch is batch_per_device * mesh size."""

    n_dev = mesh.shape["data"]

    def local_run(params, opt_state, data, keys):
        me = jax.lax.axis_index("data")
        n_local = jax.tree.leaves(data)[0].shape[0]

        def body(carry, key):
            params, opt_state = carry
            sel = jax.random.randint(jax.random.fold_in(key, me),
                                     (batch_per_device,), 0, n_local)
            batch = {k: v[sel] for k, v in data.items()}
            (loss, _), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params, batch, model_name,
                                          input_size)
            # auto-psum'd over "data" (module docstring): sum -> mean
            grads = jax.tree.map(lambda g: g / n_dev, grads)
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state, losses

    smap = shard_map(
        local_run, mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()))
    return jax.jit(smap, donate_argnums=(0, 1))
