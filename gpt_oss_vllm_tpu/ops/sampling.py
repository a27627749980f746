"""Token sampling: greedy / temperature / top-k / top-p, batched and jittable.

Replaces the substrate vLLM sampler the reference relies on; determinism
idiom preserved: temperature 0 == argmax (``smoke_suite.py:27-40``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sample_tokens(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # [B] f32; 0 => greedy
    top_p: jax.Array,  # [B] f32 in (0, 1]
    top_k: jax.Array,  # [B] int32; 0 => disabled
) -> jax.Array:
    """Returns sampled token ids [B] int32. Fully batched: each row applies
    its own temperature/top-p/top-k (mixed greedy+sampled batches jit as one
    program — no recompile per sampling config)."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # top-k mask: keep the k highest logits per row
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]  # [B, V]
    k_idx = jnp.clip(jnp.where(top_k > 0, top_k, V) - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=1)  # [B,1]
    masked = jnp.where(logits >= kth, logits, NEG_INF)

    # top-p (nucleus) on the already top-k-masked logits
    s = jnp.sort(masked, axis=-1)[:, ::-1]
    probs_sorted = jax.nn.softmax(s, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep tokens whose cumulative prob (exclusive) < top_p
    cutoff_mask = (cum - probs_sorted) < top_p[:, None]
    threshold = jnp.min(jnp.where(cutoff_mask, s, jnp.inf), axis=-1)  # smallest kept logit
    masked = jnp.where(masked >= threshold[:, None], masked, NEG_INF)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    sampled = jax.random.categorical(key, masked / temp, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_with_logprobs(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    num_logprobs: int,
):
    """Sampling plus OpenAI-style logprobs: the chosen token's logprob and
    the top-``num_logprobs`` (token, logprob) pairs, all device-side."""
    tokens = sample_tokens(logits, key, temperature, top_p, top_k)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logp, tokens[:, None], axis=1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(logp, num_logprobs)
    return tokens, chosen, top_ids.astype(jnp.int32), top_vals
