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
    shape = (parallel.dp, parallel.ep, parallel.tp)
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=list(devices)[:n])
    except Exception:
        arr = np.array(list(devices)[:n]).reshape(shape)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1), AXES)
