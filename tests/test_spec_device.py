"""Device-side n-gram drafting (ops/spec_device) vs the host drafter."""

import numpy as np

import jax.numpy as jnp

from gpt_oss_vllm_tpu.engine.spec import propose_ngram
from gpt_oss_vllm_tpu.ops.spec_device import ngram_draft_device


def greedy_accept_counts(draft, n_draft, greedy):
    """Vectorized greedy-acceptance oracle (longest prefix where draft[i]
    equals the model's prediction after consuming fed position i, capped at
    n_draft) — lives here as the test oracle; the production path verifies
    through ops.sampling.spec_verify (ADVICE r3 low)."""
    k = draft.shape[1]
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    ok = (draft == greedy[:, :k]) & (pos < n_draft[:, None])
    prefix = jnp.cumprod(ok.astype(jnp.int32), axis=1)
    return jnp.sum(prefix, axis=1).astype(jnp.int32)


def _draft(tokens, k, m=2, L=64):
    hist = np.zeros(L, np.int32)
    hist[: len(tokens)] = tokens
    d, n = ngram_draft_device(jnp.asarray(hist), jnp.int32(len(tokens)), k=k, m=m)
    return np.asarray(d).tolist(), int(n)


def test_device_draft_matches_host_on_cycle():
    # cyclic text: suffix [3, 4] occurred before; followers = [5, 6, 7]
    toks = [1, 2, 3, 4, 5, 6, 7, 2, 3, 4]
    d, n = _draft(toks, k=3, m=2)
    assert n == 3 and d == [5, 6, 7]
    # the host drafter (min_match rung) proposes the same continuation
    assert propose_ngram(toks, 3, min_match=2, max_match=2) == [5, 6, 7]


def test_device_draft_most_recent_occurrence_wins():
    # [9, 9] occurs at 0 (followed by 1) and at 4 (followed by 2)
    toks = [9, 9, 1, 0, 9, 9, 2, 0, 9, 9]
    d, n = _draft(toks, k=1, m=2)
    assert n == 1 and d == [2]


def test_device_draft_no_match_and_short_history():
    d, n = _draft([1, 2, 3, 4, 5], k=3, m=2)
    assert n == 0
    d, n = _draft([7], k=2, m=2)
    assert n == 0


def test_device_draft_requires_full_followers():
    # suffix [5, 6] matches at j=0 with exactly k=3 followers -> drafted
    toks = [5, 6, 9, 5, 6]
    d, n = _draft(toks, k=3, m=2)
    assert n == 3 and d == [9, 5, 6]
    # k=4 followers would need j+2+4 <= 5: impossible -> no draft
    d, n = _draft(toks, k=4, m=2)
    assert n == 0


def test_greedy_accept_counts():
    draft = jnp.asarray([[7, 8, 9], [7, 8, 9], [1, 2, 3]], jnp.int32)
    nd = jnp.asarray([3, 2, 0], jnp.int32)
    greedy = jnp.asarray(
        [[7, 8, 5, 0], [7, 5, 9, 0], [1, 2, 3, 0]], jnp.int32
    )
    n_acc = np.asarray(greedy_accept_counts(draft, nd, greedy))
    assert n_acc.tolist() == [2, 1, 0]
