"""Tracker-state checkpoint / resume.

The reference has no tracker persistence (SURVEY.md §5 "Checkpoint /
resume: none"); its only persisted artifacts are serialized engines and
the INT8 calibration cache. This framework adds full pipeline
resumability: the TrackerState pytree (and optional Kalman136 state)
serializes to safetensors, so long video jobs can stop/resume with
identical track identities — plus the engine format (weights.py) and the
persistent XLA compile cache cover the reference's two mechanisms.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.structs import KalmanState136, TrackerState


def save_tracker_state(state: TrackerState, path: str):
    from safetensors.numpy import save_file
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    save_file(arrays, path, metadata={"format": "posebyte-tracker-v1"})


def load_tracker_state(path: str) -> TrackerState:
    from safetensors.numpy import safe_open
    with safe_open(path, framework="numpy") as f:
        arrays = {k: jnp.asarray(f.get_tensor(k)) for k in f.keys()}
    # forward compat: fields added later (e.g. Re-ID embeddings) default
    # to their init values when absent from older checkpoints
    if "embeddings" in {fld.name for fld in dataclasses.fields(TrackerState)} \
            and "embeddings" not in arrays:
        from ..ops.reid import REID_DIM
        T = arrays["poses"].shape[0]
        arrays["embeddings"] = jnp.zeros((T, REID_DIM), jnp.float32)
    return TrackerState(**arrays)


def save_kalman_state(state: KalmanState136, path: str):
    from safetensors.numpy import save_file
    save_file({"mean": np.asarray(state.mean),
               "cov_diag": np.asarray(state.cov_diag)}, path,
              metadata={"format": "posebyte-kalman136-v1"})


def load_kalman_state(path: str) -> KalmanState136:
    from safetensors.numpy import safe_open
    with safe_open(path, framework="numpy") as f:
        return KalmanState136(mean=jnp.asarray(f.get_tensor("mean")),
                              cov_diag=jnp.asarray(
                                  f.get_tensor("cov_diag")))
