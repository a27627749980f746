"""Token sampling: greedy / temperature / top-k / top-p, batched and jittable.

Replaces the substrate vLLM sampler the reference relies on; determinism
idiom preserved: temperature 0 == argmax (``smoke_suite.py:27-40``).

Two entry points:

- ``sample_tokens(logits, key, ...)`` — one PRNG key for the whole batch
  (cheap, non-reproducible across batch compositions).
- ``sample_tokens_seeded(logits, seeds, counters, ...)`` — per-row
  (seed, step-counter) streams: each request's token sequence is a pure
  function of its seed and sampling params, independent of which other
  requests share the decode batch. This is the engine's default and is
  stronger than the reference substrate's per-request seeding (vLLM seeds
  a per-request generator whose draws still interleave with scheduling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _mask_logits(
    logits: jax.Array,  # [B, V] f32
    top_p: jax.Array,  # [B] f32 in (0, 1]
    top_k: jax.Array,  # [B] int32; 0 => disabled
) -> jax.Array:
    """Apply per-row top-k then top-p (nucleus) masking."""
    B, V = logits.shape
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
    return jnp.where(masked >= threshold[:, None], masked, NEG_INF)


def _min_p_mask(scaled: jax.Array, min_p: jax.Array) -> jax.Array:
    """vLLM-style ``min_p``: keep tokens whose post-temperature probability is
    at least ``min_p * max_prob`` (min_p 0 keeps everything)."""
    probs = jax.nn.softmax(scaled, axis=-1)
    keep = probs >= min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(keep, scaled, NEG_INF)


def sample_tokens(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # [B] f32; 0 => greedy
    top_p: jax.Array,  # [B] f32 in (0, 1]
    top_k: jax.Array,  # [B] int32; 0 => disabled
    min_p: jax.Array = None,  # [B] f32 in [0, 1]; 0 => disabled
) -> jax.Array:
    """Returns sampled token ids [B] int32. Fully batched: each row applies
    its own temperature/top-p/top-k/min-p (mixed greedy+sampled batches jit
    as one program — no recompile per sampling config)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    masked = _mask_logits(logits, top_p, top_k)
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = masked / temp
    if min_p is not None:
        scaled = _min_p_mask(scaled, min_p)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def _row_gumbel(seeds: jax.Array, counters: jax.Array, V: int) -> jax.Array:
    """Per-row Gumbel noise from independent (seed, counter) streams."""

    def one(seed, ctr):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), ctr)
        return jax.random.gumbel(k, (V,), jnp.float32)

    return jax.vmap(one)(seeds, counters)


def sample_tokens_seeded(
    logits: jax.Array,  # [B, V] f32
    seeds: jax.Array,  # [B] uint32/int32 per-request seed
    counters: jax.Array,  # [B] int32 per-request draw counter (tokens emitted)
    temperature: jax.Array,  # [B] f32; 0 => greedy
    top_p: jax.Array,
    top_k: jax.Array,
    min_p: jax.Array = None,  # [B] f32 in [0, 1]; 0 => disabled
) -> jax.Array:
    """Per-request deterministic sampling via the Gumbel-max trick:
    argmax(logits/T + Gumbel) ~ Categorical(softmax(logits/T)); the noise
    comes from fold_in(PRNGKey(seed), counter) so a request replays the
    exact same token stream whatever batch it lands in."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    masked = _mask_logits(logits, top_p, top_k)
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = masked / temp
    if min_p is not None:
        scaled = _min_p_mask(scaled, min_p)
    gumbel = _row_gumbel(seeds, counters, logits.shape[1])
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_with_logprobs(
    logits: jax.Array,  # [B, V] f32
    seeds: jax.Array,  # [B]
    counters: jax.Array,  # [B]
    temperature: jax.Array,
    top_p: jax.Array,
    top_k: jax.Array,
    num_logprobs: int,
    min_p: jax.Array = None,
):
    """Sampling plus OpenAI-style logprobs: the chosen token's logprob and
    the top-``num_logprobs`` (token, logprob) pairs, all device-side."""
    tokens = sample_tokens_seeded(logits, seeds, counters, temperature, top_p, top_k, min_p)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logp, tokens[:, None], axis=1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(logp, num_logprobs)
    return tokens, chosen, top_ids.astype(jnp.int32), top_vals


def apply_logit_bias(
    logits: jax.Array,  # [B, V] f32
    bias_ids: jax.Array,  # [B, M] int32 token ids (-1 = unused slot)
    bias_vals: jax.Array,  # [B, M] f32
) -> jax.Array:
    """OpenAI ``logit_bias``: per-request sparse additive biases, applied as
    a padded scatter-add ([B, M] with -1 pads remapped out of bounds, the
    same drop idiom as the KV write path)."""
    B, V = logits.shape
    ids = jnp.where(bias_ids < 0, V, bias_ids)
    return logits.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], ids
    ].add(bias_vals, mode="drop")


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    counts: jax.Array,  # [B, V] int32 token occurrence counts (prompt+output)
    presence: jax.Array,  # [B] f32; 0 = off
    frequency: jax.Array,  # [B] f32; 0 = off
    repetition: jax.Array,  # [B] f32; 1 = off
) -> jax.Array:
    """OpenAI presence/frequency penalties + HF-style repetition penalty.

    presence subtracts a flat penalty from every token already seen;
    frequency subtracts proportionally to its count; repetition divides
    positive logits (multiplies negative) of seen tokens by the factor.
    """
    seen = counts > 0
    out = logits - presence[:, None] * seen - frequency[:, None] * counts
    rep = repetition[:, None]
    rep_applied = jnp.where(out > 0, out / rep, out * rep)
    return jnp.where(seen, rep_applied, out)


def spec_postprocess_logits(
    logits: jax.Array,  # [B, W, V] f32 — window logits (W = 1 + K)
    drafts: jax.Array,  # [B, K] int32 draft tokens (ignored where not fed)
    counters: jax.Array,  # [B] int32 tokens emitted BEFORE this window
    bias_ids: jax.Array = None,  # [B, M] int32 (-1 = unused)
    bias_vals: jax.Array = None,  # [B, M] f32
    stop_ids: jax.Array = None,  # [B, S] int32 (-1 = unused)
    min_tokens: jax.Array = None,  # [B] int32
    counts: jax.Array = None,  # [B, V] int32 occurrence counts at window start
    presence: jax.Array = None,  # [B] f32
    frequency: jax.Array = None,  # [B] f32
    repetition: jax.Array = None,  # [B] f32
) -> jax.Array:
    """Host-sampler post-processing applied PER WINDOW POSITION so spec
    verification targets the exact distribution the non-speculative engine
    would sample from at that point (``engine._sample_row`` semantics):

    - ``logit_bias``: static per request, broadcast over the window;
    - ``min_tokens``: stop ids masked to -inf while the would-be output
      index (counter + window position) is below min_tokens;
    - penalties: window position j sees ``counts`` plus the one-hots of the
      j would-be-emitted draft tokens BEFORE it — the within-window cascade
      that makes multi-token spec steps byte-identical to token-at-a-time
      sync sampling (position j only matters when drafts 0..j-1 were all
      accepted, in which case exactly those tokens precede it).
    """
    B, W, V = logits.shape
    out = logits
    win = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]
    if bias_ids is not None:
        ids = jnp.where((bias_ids < 0) | (bias_ids > V), V, bias_ids)  # V = dropped
        flatb = jnp.zeros((B, V + 1), jnp.float32).at[
            jnp.arange(B, dtype=jnp.int32)[:, None], ids
        ].add(bias_vals)[:, :V]
        out = out + flatb[:, None, :]
    if stop_ids is not None and min_tokens is not None:
        sids = jnp.where((stop_ids < 0) | (stop_ids > V), V, stop_ids)
        stop_mask = jnp.zeros((B, V + 1), jnp.bool_).at[
            jnp.arange(B, dtype=jnp.int32)[:, None], sids
        ].set(True)[:, :V]  # [B, V]
        unmet = (counters[:, None] + win) < min_tokens[:, None]  # [B, W]
        out = jnp.where(
            stop_mask[:, None, :] & unmet[:, :, None], NEG_INF, out
        )
    if counts is not None:
        K = drafts.shape[1]
        dr = jnp.clip(drafts, 0, V - 1)
        oh = jax.nn.one_hot(dr, V, dtype=jnp.int8)  # [B, K, V]
        before = (win.T > jnp.arange(K, dtype=jnp.int32)[None, :]).astype(
            jnp.int8
        )  # [W, K]: draft i precedes window j iff i < j
        extra = jnp.einsum("jk,bkv->bjv", before, oh).astype(jnp.int32)
        c = counts[:, None, :] + extra  # [B, W, V]
        seen = c > 0
        out = (
            out
            - presence[:, None, None] * seen
            - frequency[:, None, None] * c
        )
        rep = repetition[:, None, None]
        rep_applied = jnp.where(out > 0, out / rep, out * rep)
        out = jnp.where(seen, rep_applied, out)
    return out


def spec_verify(
    logits: jax.Array,  # [B, W, V] f32 — logits at every fed window position
    drafts: jax.Array,  # [B, W] int32 — draft token verified at position j
    #                     (fed[j+1]); entries at j >= draft_len are ignored
    draft_len: jax.Array,  # [B] int32 in [0, W-1]
    seeds: jax.Array,  # [B]
    counters: jax.Array,  # [B] tokens emitted so far
    temperature: jax.Array,  # [B]
    top_p: jax.Array,
    top_k: jax.Array,
    min_p: jax.Array = None,
):
    """Speculative-sampling verification for point-mass (n-gram) drafts.

    The draft 'model' proposes deterministically (q = one-hot at the draft
    token), so the Leviathan/Chen acceptance rule reduces to: accept draft
    d_j with probability p_j(d_j) under the TARGET sampling distribution
    (temperature/top-k/top-p/min-p applied — the same distribution the
    normal sampler draws from); on the first rejection, sample from the
    residual max(p - q, 0)/Z = p with d_j masked out; if every draft is
    accepted, draw the standard bonus token from the next position. The
    emitted marginal distribution equals non-speculative sampling exactly
    (tests/test_spec_decode.py::test_spec_verify_preserves_distribution).

    temperature <= 0 rows degrade to greedy longest-prefix acceptance —
    identical to ``engine.spec.accept_greedy``.

    Returns (n_accept [B] int32, final_token [B] int32): the engine emits
    ``drafts[:n_accept] + [final_token]`` (>= 1 token per verify step).

    vLLM's substrate verifies sampled drafts the same way (its
    rejection/"recovered token" sampler); the reference inherits that but
    never exercises it. Here it is first-class and seeded: acceptance
    uniforms come from fold_in(seed, counter + j) and the residual/bonus
    Gumbel from a disjoint counter plane, so streams stay per-request
    deterministic under any batch composition.
    """
    B, W, V = logits.shape
    flat = logits.reshape(B * W, V).astype(jnp.float32)

    def rep(a):
        return jnp.repeat(a, W, axis=0)

    masked = _mask_logits(flat, rep(top_p), rep(top_k))
    temp_r = jnp.maximum(rep(temperature), 1e-6)[:, None]
    scaled = masked / temp_r
    if min_p is not None:
        scaled = _min_p_mask(scaled, rep(min_p))
    logp = jax.nn.log_softmax(scaled, axis=-1).reshape(B, W, V)
    scaled = scaled.reshape(B, W, V)
    greedy_tok = jnp.argmax(scaled, axis=-1).astype(jnp.int32)  # [B, W]

    safe_d = jnp.clip(drafts, 0, V - 1)
    p_draft = jnp.exp(
        jnp.take_along_axis(logp, safe_d[..., None], axis=-1)[..., 0]
    )  # [B, W]

    # acceptance uniforms: one per (request, window position) from the
    # request's seeded stream
    def row_u(seed, ctr):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), ctr)
        return jax.random.uniform(k, (W,), jnp.float32)

    u = jax.vmap(row_u)(seeds, counters)  # [B, W]
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    is_greedy = (temperature <= 0.0)[:, None]
    acc = jnp.where(is_greedy, drafts == greedy_tok, u < p_draft)
    acc = acc & (pos < draft_len[:, None])
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)  # [B]

    # final token at position j* = n_acc: residual sample on rejection
    # (mask the rejected draft out — exact residual for a point-mass q),
    # plain bonus draw when everything was accepted
    jstar = jnp.minimum(n_acc, W - 1)
    final_scaled = jnp.take_along_axis(
        scaled, jstar[:, None, None], axis=1
    )[:, 0]  # [B, V]
    rejected = n_acc < draft_len
    d_rej = jnp.take_along_axis(safe_d, jstar[:, None], axis=1)[:, 0]
    final_scaled = jnp.where(
        rejected[:, None]
        & (jnp.arange(V, dtype=jnp.int32)[None, :] == d_rej[:, None]),
        NEG_INF,
        final_scaled,
    )
    # disjoint counter plane for the residual/bonus draw (acceptance
    # uniforms used fold_in(seed, ctr) directly)
    gumbel = _row_gumbel(seeds, counters + jnp.int32(1 << 20) + jstar, V)
    final_sampled = jnp.argmax(final_scaled + gumbel, axis=-1).astype(jnp.int32)
    final_greedy = jnp.argmax(final_scaled, axis=-1).astype(jnp.int32)
    final = jnp.where(temperature <= 0.0, final_greedy, final_sampled)
    return n_acc.astype(jnp.int32), final
