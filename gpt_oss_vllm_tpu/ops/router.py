"""Fused MoE router Pallas kernel: logits + top-k + softmax in one program.

At decode (T=1) the XLA route is ~0.10 ms/layer — a [1,H]x[H,E] matmul plus
``lax.top_k`` (a lowered sort) plus softmax, each a separate tiny op whose
fixed overhead dominates (measured with tools/decomp_bench.py). One Pallas
program computes all of it on-register.

Semantics contract (= ``ops.moe.route_topk``, the reference's
``unsloth_to_vllm_converter.py:291-292``): f32 logits, top-k by value with
ties broken toward the LOWER expert index (lax.top_k order), softmax over
the k selected logits.

Top-k on the VPU without sort/gather: k rounds of (row-max -> lowest-index
lane equal to it -> mask that lane to -inf). Indices/weights are emitted as
the first k lanes of an [T, E]-shaped block (lane-offset stores are illegal;
lane==j masks are not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_ROWS = 8  # row-block per program (Mosaic sublane tile)


def _router_kernel(x_ref, w_ref, b_ref, wout_ref, iout_ref, *, k: int, E: int):
    x = x_ref[:].astype(jnp.float32)  # [R, H]
    w = w_ref[:].astype(jnp.float32)  # [E, H]
    logits = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [R, E]
    logits = logits + b_ref[:]  # [1, E] broadcast
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    cur = logits
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)  # [R, 1]
        sel = jnp.where(cur == m, lane, E)
        idx = jnp.min(sel, axis=1, keepdims=True)  # [R, 1] lowest tied index
        vals.append(m)
        idxs.append(idx)
        cur = jnp.where(lane == idx, NEG_INF, cur)
    # softmax over the k selected logits (vals[0] is the row max)
    exps = [jnp.exp(v - vals[0]) for v in vals]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    wout = jnp.zeros(logits.shape, jnp.float32)
    iout = jnp.zeros(logits.shape, jnp.int32)
    for j in range(k):
        here = lane == j
        wout = jnp.where(here, exps[j] / denom, wout)
        iout = jnp.where(here, idxs[j], iout)
    wout_ref[:] = wout
    iout_ref[:] = iout


@functools.partial(jax.jit, static_argnames=("top_k", "interpret"))
def router_topk_pallas(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [E, H]
    router_b,  # [E] or None
    top_k: int,
    interpret: bool = False,
):
    """Returns (weights [T,k] f32, indices [T,k] int32)."""
    T, H = x.shape
    E = router_w.shape[0]
    Tp = ((T + _ROWS - 1) // _ROWS) * _ROWS
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    b = jnp.zeros((1, E), jnp.float32) if router_b is None else (
        router_b.astype(jnp.float32).reshape(1, E)
    )
    grid = (Tp // _ROWS,)
    wout, iout = pl.pallas_call(
        functools.partial(_router_kernel, k=top_k, E=E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, E), jnp.float32),
            jax.ShapeDtypeStruct((Tp, E), jnp.int32),
        ],
        interpret=interpret,
    )(x, router_w, b)
    return wout[:T, :top_k], iout[:T, :top_k]
