"""Device-side n-gram drafting for async speculative decoding.

The host drafter (``engine/spec.propose_ngram``) forces the engine onto the
sync scheduling path: the NEXT step's drafts depend on THIS step's accepted
tokens, so the host must read acceptance back every step (~1 tunnel RTT).
This op moves drafting into the fused decode program: the per-slot token
history lives in a device ring ([S, L] int32), the suffix match is a
vectorized compare, and acceptance advances the history in-program — the
whole speculative loop chains on device exactly like the non-spec async
path (``engine.engine._decode_async_step``).

Semantics: match the fixed-length-``m`` suffix ending at ``hist_len`` against
every earlier window, most recent occurrence wins, and draft the ``k``
tokens that followed it (all ``k`` must exist in history). This is the
host drafter's ``min_match`` rung only — a deliberate simplification: draft
CONTENT affects speed, never correctness (greedy verification accepts
exactly the tokens the model would have produced), so the cheaper device
form trades a little acceptance on mixed text for a zero-sync loop.
Reference context: vLLM's ngram speculator (the substrate capability row of
SURVEY.md §2.1 #14's quant config is unrelated; spec decode is the
``[Speculative decoding]`` row of docs/PARITY.md §1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "m"))
def ngram_draft_device(
    history: jax.Array,  # [L] int32 token ring (prefix of length hist_len valid)
    hist_len: jax.Array,  # scalar int32
    k: int,
    m: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Return (draft [k] int32, n_draft scalar int32 in {0, k}).

    Matches the m-token suffix ``history[hist_len-m : hist_len]`` at every
    start j with j+m <= hist_len-m's occurrence constraint relaxed to
    j + m + k <= hist_len (all k follower tokens must exist) and
    j != hist_len - m (not the suffix itself); the LARGEST such j wins.
    """
    L = history.shape[0]
    idx = jnp.arange(L, dtype=jnp.int32)
    # suffix tokens, gathered at dynamic offsets
    eq = jnp.ones((L,), dtype=jnp.bool_)
    for i in range(m):
        suf_i = history[jnp.clip(hist_len - m + i, 0, L - 1)]
        # token at window position j+i, via a shift-by-i view of history
        shifted = jnp.roll(history, -i)
        eq = eq & (shifted == suf_i)
    valid = (
        eq
        & (idx + m + k <= hist_len)  # followers fully inside history
        & (idx != hist_len - m)  # not the suffix occurrence itself
        & (hist_len >= m + 1)
    )
    any_match = jnp.any(valid)
    best_j = jnp.max(jnp.where(valid, idx, -1))
    start = jnp.clip(best_j + m, 0, L - k)
    draft = jax.lax.dynamic_slice(history, (start,), (k,))
    n = jnp.where(any_match, jnp.int32(k), jnp.int32(0))
    return jnp.where(any_match, draft, jnp.zeros((k,), jnp.int32)), n
