"""Device mesh construction: ('data', 'expert', 'model') axes.

The TPU-native replacement for the NCCL/distributed backend the reference
never exercises (SURVEY.md §2.4): data parallel replicas, expert parallelism
for the MoE (all-to-all over ICI), and tensor parallelism for attention
heads / expert matmul columns. Collectives are emitted by XLA GSPMD from
sharding annotations — no external comm library.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from gpt_oss_vllm_tpu.config import ParallelConfig

AXES = ("data", "expert", "model")


def make_mesh(parallel: ParallelConfig, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = parallel.world_size
    if len(devices) < n:
        raise ValueError(
            f"parallel config needs {n} devices (dp={parallel.dp} x ep={parallel.ep} "
            f"x tp={parallel.tp}), have {len(devices)}"
        )
    if parallel.dcn_dp > 1:
        return _hybrid_mesh(parallel, list(devices)[:n])
    shape = (parallel.dp, parallel.ep, parallel.tp)
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=list(devices)[:n])
    except Exception:
        arr = np.array(list(devices)[:n]).reshape(shape)
    return Mesh(arr, AXES)


def _hybrid_mesh(parallel: ParallelConfig, devices: Sequence) -> Mesh:
    """Multi-slice mesh: the data axis factors as dcn_dp (over DCN, outermost)
    x local replicas, so every ep/tp collective stays within one ICI domain.

    Same ('data','expert','model') axis names — the sharding annotations and
    jitted programs are unchanged between one slice and many (SURVEY.md §7:
    "same program, bigger mesh"); only gradient/replica all-reduces cross
    DCN. Uses jax's hybrid mesh builder on real multi-process platforms
    (which orders devices by slice), with a manual reshape fallback for
    single-process/virtual test meshes where every device reports the same
    process."""
    if parallel.dp % parallel.dcn_dp != 0:
        raise ValueError(
            f"dcn_dp={parallel.dcn_dp} must divide dp={parallel.dp}"
        )
    local_dp = parallel.dp // parallel.dcn_dp
    ici_shape = (local_dp, parallel.ep, parallel.tp)
    dcn_shape = (parallel.dcn_dp, 1, 1)
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=list(devices)
        )
    except Exception:
        # virtual / single-process devices: slice i owns the i-th contiguous
        # device block (what the hybrid builder would produce)
        arr = np.array(list(devices)).reshape(
            (parallel.dcn_dp * local_dp, parallel.ep, parallel.tp)
        )
        return Mesh(arr, AXES)
    # hybrid builder returns shape dcn*ici per axis; fold dcn into data
    return Mesh(arr.reshape(parallel.dp, parallel.ep, parallel.tp), AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1), AXES)
