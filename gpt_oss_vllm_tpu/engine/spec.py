"""Prompt-lookup (n-gram) speculative decoding — draft proposal + greedy verify.

The vLLM substrate the reference runs on ships n-gram speculative decoding;
this is the TPU-native equivalent: drafts come from matching the sequence's
own recent suffix against its history (zero extra model cost), and one
`model_step` with ``all_logits=True`` verifies the whole draft window — the
paged cache writes K/V for every fed position, and positions beyond the
accepted prefix are masked by causality until real tokens overwrite them,
so rejected drafts never contaminate later steps.

Greedy acceptance: draft token j is accepted iff it equals the model's
argmax at position j-1; the first mismatch position contributes the model's
own token (the "bonus"), so every verify step emits >= 1 token — speculation
never slows the stream down by more than the widened step itself.
"""

from __future__ import annotations

from typing import List, Sequence


def propose_ngram(
    tokens: Sequence[int], max_draft: int, min_match: int = 2, max_match: int = 4
) -> List[int]:
    """Propose up to ``max_draft`` continuation tokens by matching the
    longest recent suffix (length ``max_match`` down to ``min_match``)
    against the sequence history and copying what followed it.

    Matches are searched from the END (most recent occurrence wins — local
    repetition like code/tables beats a stale early match).
    """
    n = len(tokens)
    if n < min_match + 1 or max_draft <= 0:
        return []
    for m in range(min(max_match, n - 1), min_match - 1, -1):
        suffix = tuple(tokens[n - m :])
        # scan candidate start positions right-to-left, excluding the suffix
        # occurrence itself
        for start in range(n - m - 1, -1, -1):
            if tuple(tokens[start : start + m]) == suffix:
                cont = tokens[start + m : start + m + max_draft]
                if cont:
                    return list(cont)
    return []


def accept_greedy(draft: Sequence[int], model_argmax: Sequence[int]) -> List[int]:
    """Longest-prefix acceptance: emitted tokens for one verify step.

    ``model_argmax[j]`` is the model's greedy token AFTER consuming position
    j of the fed window (fed[0] = previous sampled token, fed[1:] = draft).
    Returns the emitted tokens: accepted drafts + the bonus token at the
    first mismatch (always >= 1 token).
    """
    out: List[int] = []
    for j, d in enumerate(draft):
        if int(model_argmax[j]) == int(d):
            out.append(int(d))
        else:
            break
    # bonus: the model's own prediction at the first unconfirmed position
    out.append(int(model_argmax[len(out)]))
    return out
