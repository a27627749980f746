"""Attention with sinks + sliding window — pure-XLA reference path.

The reference *disables* both features because FA2 on SM 8.6 cannot run them
(``patch_1_fix_assertion.py:25-30``, ``patch_3_disable_sinks.py:27-41``).
Here they are first-class (SURVEY.md §2.3 row 2):

- **Sink**: each query head owns a learned logit that joins the softmax
  denominator but contributes no value — i.e. out = sum_j p_j v_j where
  p includes a phantom key with logit ``sinks[h]``. Numerically this is a
  denominator correction: denom += exp(sink - running_max).
- **Sliding window**: key j is visible to query i iff ``i - window < j <= i``
  ("Only apply sliding window to every other layer" — the alternating-layer
  pattern the reference's patch anchors on, ``patch_3_disable_sinks.py:17``).

The fused Pallas flash kernel (``ops.flash_attention``) must match this
module bit-for-bit on overlapping inputs; these einsum forms are the test
oracle and the small-shape fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_mask(
    q_positions: jax.Array,  # [*, T] int32 absolute positions
    k_positions: jax.Array,  # [*, S] int32
    sliding_window: Optional[int],
) -> jax.Array:
    """Boolean [*, T, S] visibility mask: causal + optional sliding window."""
    q = q_positions[..., :, None]
    k = k_positions[..., None, :]
    mask = k <= q
    if sliding_window is not None and sliding_window > 0:
        mask = mask & (q - k < sliding_window)
    return mask


def mha_reference(
    q: jax.Array,  # [B, T, n_q, D]
    k: jax.Array,  # [B, S, n_kv, D]
    v: jax.Array,  # [B, S, n_kv, D]
    sinks: Optional[jax.Array],  # [n_q] f32
    mask: jax.Array,  # [B, T, S] bool (or [T, S])
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Grouped-query attention with sink logits. Returns [B, T, n_q, D]."""
    B, T, n_q, D = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    G = n_q // n_kv
    if sm_scale is None:
        sm_scale = D**-0.5
    qf = q.reshape(B, T, n_kv, G, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("btkgd,bskd->bkgts", qf, kf) * sm_scale  # [B,n_kv,G,T,S]
    if mask.ndim == 2:
        mask = mask[None]
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    if sinks is not None:
        sink = sinks.reshape(n_kv, G).astype(jnp.float32)  # per q-head
        m = jnp.maximum(jnp.max(logits, axis=-1), sink[None, :, :, None])
    else:
        m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    denom = jnp.sum(p, axis=-1)
    if sinks is not None:
        denom = denom + jnp.exp(sink[None, :, :, None] - m)
    out = jnp.einsum("bkgts,bskd->btkgd", p / denom[..., None], vf)
    return out.reshape(B, T, n_q, D).astype(q.dtype)
