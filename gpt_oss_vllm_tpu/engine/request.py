"""Request state + sampling parameters for the serving engine."""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(frozen=True)
class SamplingParams:
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    min_p: float = 0.0  # keep tokens with prob >= min_p * max_prob (0 = off)
    min_tokens: int = 0  # suppress stop tokens until this many are emitted
    stop_token_ids: tuple = ()
    # vLLM extension: emitted stop/EOS tokens do not finish the request
    # (generation runs to max_tokens — the benchmarking contract)
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None  # return top-N logprobs per token
    # vLLM prompt_logprobs / OpenAI echo+logprobs: top-N logprobs for every
    # PROMPT token (computed from the prefill pass; None = off). 0 = chosen
    # token only.
    prompt_logprobs: Optional[int] = None
    presence_penalty: float = 0.0  # flat penalty on seen tokens (OpenAI)
    frequency_penalty: float = 0.0  # count-proportional penalty (OpenAI)
    repetition_penalty: float = 1.0  # HF-style multiplicative (1 = off)
    # OpenAI logit_bias: ((token_id, bias), ...) added to logits pre-sampling
    logit_bias: Optional[tuple] = None
    # structured outputs: a compiled serving.guided.GuidedGrammar (vocab
    # mask tables + byte-DFA); None = unconstrained. guided_gate="harmony"
    # activates the constraint only inside the final channel's message
    guided: Optional[object] = None
    guided_gate: str = "none"

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def has_penalties(self) -> bool:
        return (
            self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
            or self.repetition_penalty != 1.0
        )


class RequestState(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    ABORTED = "aborted"


@dataclass
class Request:
    request_id: str
    prompt_token_ids: List[int]
    sampling: SamplingParams
    state: RequestState = RequestState.WAITING
    output_token_ids: List[int] = field(default_factory=list)
    slot: Optional[int] = None  # decode batch slot while RUNNING
    blocks: List[int] = field(default_factory=list)
    arrival_time: float = field(default_factory=time.time)
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None
    finish_reason: Optional[str] = None
    # resolved per-request PRNG seed (sampling.seed, or engine-assigned):
    # the request's token stream is fold_in(PRNGKey(seed), draw_counter),
    # reproducible independent of batch composition
    seed_resolved: int = 0
    num_shared_prompt_tokens: int = 0  # prefix-cache hits (KV reused, not recomputed)
    # per-request grammar-constraint state (serving.guided.GuidedSession);
    # derives from sampling.guided at admission. Survives preemption: it
    # tracks output_token_ids, which recompute preserves.
    guided: Optional[object] = None
    # prompt logprobs collected during prefill when
    # sampling.prompt_logprobs is set: one entry per prompt token — None
    # for position 0, then (chosen_logprob, [(token_id, logprob), ...]).
    # Filled once; preemption recompute does not recompute them.
    prompt_logprobs_out: Optional[list] = None

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.arrival_time
