"""OpenAI-compatible API protocol models.

The endpoint contract the reference's clients exercise
(``quick_client.py:19-21`` — /v1/models, /v1/completions,
/v1/chat/completions; SSE framing ``data: {...}`` with ``data: [DONE]``
terminator and ``choices[0].delta.content`` vs ``.text``,
``quick_client.py:118-145``; ``usage.completion_tokens`` as the metrics
surface, ``:155-162``).
"""

from __future__ import annotations

import time
import uuid
from typing import Dict, List, Optional, Union

from pydantic import BaseModel, Field


def _id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


class StreamOptions(BaseModel):
    include_usage: bool = False


class CompletionRequest(BaseModel):
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0  # vLLM extension: prob >= min_p * max_prob
    min_tokens: int = 0  # vLLM extension: suppress stop until N tokens
    n: int = 1
    best_of: Optional[int] = None  # generate best_of, return the n best
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    stop: Optional[Union[str, List[str]]] = None
    seed: Optional[int] = None
    echo: bool = False
    ignore_eos: bool = False  # vLLM extension: run to max_tokens
    logprobs: Optional[int] = None
    # vLLM extension: top-N logprobs for every PROMPT token (0 = chosen
    # only); echo+logprobs implies it with N = logprobs
    prompt_logprobs: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    logit_bias: Optional[Dict[str, float]] = None  # {token_id: bias}
    # structured outputs: OpenAI response_format + vLLM guided_* extensions
    response_format: Optional[Dict] = None
    guided_json: Optional[Union[str, Dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[List[str]] = None


class FunctionCall(BaseModel):
    name: str = ""
    arguments: str = ""


class ToolCall(BaseModel):
    id: str = Field(default_factory=lambda: _id("call"))
    type: str = "function"
    function: FunctionCall = Field(default_factory=FunctionCall)
    index: Optional[int] = None  # set on streaming deltas


class FunctionDef(BaseModel):
    name: str
    description: Optional[str] = None
    parameters: Optional[Dict] = None


class ToolDef(BaseModel):
    type: str = "function"
    function: FunctionDef


class ChatMessage(BaseModel):
    role: str
    content: Optional[str] = None
    # assistant turns that issued tool calls; role="tool" results carry
    # tool_call_id (+ optional name) back to the model
    tool_calls: Optional[List[ToolCall]] = None
    tool_call_id: Optional[str] = None
    name: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str
    messages: List[ChatMessage]
    tools: Optional[List[ToolDef]] = None
    # "auto" (default) | "none" | "required" | {"type": "function",
    # "function": {"name": ...}} — the latter two force a tool call via
    # grammar-constrained decoding
    tool_choice: Optional[Union[str, Dict]] = None
    # accepted for OpenAI compatibility; the harmony framing yields one
    # tool call per assistant turn (generation stops at <|call|>), so this
    # never changes behavior here
    parallel_tool_calls: Optional[bool] = None
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0  # vLLM extension: prob >= min_p * max_prob
    min_tokens: int = 0  # vLLM extension: suppress stop until N tokens
    n: int = 1
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    stop: Optional[Union[str, List[str]]] = None
    seed: Optional[int] = None
    ignore_eos: bool = False  # vLLM extension: run to max_tokens
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    # vLLM extension: top-N logprobs for every prompt token
    prompt_logprobs: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    logit_bias: Optional[Dict[str, float]] = None  # {token_id: bias}
    # structured outputs: OpenAI response_format + vLLM guided_* extensions
    response_format: Optional[Dict] = None
    guided_json: Optional[Union[str, Dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[List[str]] = None


class LogProbs(BaseModel):
    tokens: List[str] = []
    token_logprobs: List[Optional[float]] = []
    top_logprobs: List[Optional[Dict[str, float]]] = []
    text_offset: List[int] = []


class ChatTopLogprob(BaseModel):
    token: str = ""
    logprob: float = 0.0


class ChatLogprobToken(BaseModel):
    token: str = ""
    logprob: float = 0.0
    top_logprobs: List[ChatTopLogprob] = []


class ChatLogprobs(BaseModel):
    # the OpenAI chat logprobs shape: {"content": [{token, logprob,
    # top_logprobs: [...]}]}
    content: List[ChatLogprobToken] = []


class Usage(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class CompletionChoice(BaseModel):
    index: int = 0
    text: str = ""
    finish_reason: Optional[str] = None
    logprobs: Optional[LogProbs] = None
    # vLLM-style prompt logprobs: one entry per prompt token — null for
    # position 0, then {"token", "logprob", "top_logprobs": [{"token",
    # "logprob"}, ...]} (a LIST of entries, not a dict keyed by decoded
    # text: two distinct ids can decode identically)
    prompt_logprobs: Optional[List] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _id("cmpl"))
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionChoice] = []
    usage: Usage = Field(default_factory=Usage)


class ChatChoiceMessage(BaseModel):
    role: str = "assistant"
    # null (not "") for tool-call-only turns, per the OpenAI schema
    content: Optional[str] = ""
    # harmony analysis/commentary channels (chain-of-thought); the de-facto
    # OpenAI-extension field name used by reasoning-model servers
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None


class ChatChoice(BaseModel):
    index: int = 0
    message: ChatChoiceMessage = Field(default_factory=ChatChoiceMessage)
    finish_reason: Optional[str] = None
    logprobs: Optional[ChatLogprobs] = None
    # vLLM-style prompt logprobs (see CompletionChoice.prompt_logprobs)
    prompt_logprobs: Optional[List] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _id("chatcmpl"))
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatChoice] = []
    usage: Usage = Field(default_factory=Usage)


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None


class ChatChunkChoice(BaseModel):
    index: int = 0
    delta: DeltaMessage = Field(default_factory=DeltaMessage)
    finish_reason: Optional[str] = None
    logprobs: Optional[ChatLogprobs] = None


class ChatCompletionChunk(BaseModel):
    id: str
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatChunkChoice] = []
    usage: Optional[Usage] = None  # final chunk when stream_options.include_usage


class CompletionChunk(BaseModel):
    id: str
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionChoice] = []
    usage: Optional[Usage] = None  # final chunk when stream_options.include_usage


class TokenizeRequest(BaseModel):
    prompt: Optional[str] = None
    messages: Optional[List[ChatMessage]] = None
    tools: Optional[List[ToolDef]] = None  # rendered into the chat prompt
    model: str = ""


class TokenizeResponse(BaseModel):
    tokens: List[int] = []
    count: int = 0
    max_model_len: int = 0


class DetokenizeRequest(BaseModel):
    tokens: List[int]
    model: str = ""


class DetokenizeResponse(BaseModel):
    prompt: str = ""


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "gpt_oss_vllm_tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard] = []


class ErrorResponse(BaseModel):
    error: Dict[str, Optional[str]]

    @staticmethod
    def make(message: str, err_type: str = "invalid_request_error", code: Optional[str] = None):
        return ErrorResponse(error={"message": message, "type": err_type, "code": code})
