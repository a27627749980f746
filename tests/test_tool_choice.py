"""Forced ``tool_choice`` via grammar-constrained decoding.

The substrate server the reference delegates to backs forced tool choice
with guided decoding (``/root/reference/patches/gpt_oss_server.py:64-67`` →
vLLM's OpenAI server). Here the harmony token stream itself is constrained
(``serving.guided.ToolChoiceGrammar``): a forced named function (or
``"required"``) must ALWAYS yield a valid ``tool_calls`` response whose
arguments validate against the declared JSON schema — sampled, stream and
non-stream — and unknown names are a 400.
"""

import json

import pytest

from gpt_oss_vllm_tpu.serving.guided import (
    GuidedError,
    compile_tool_choice,
)
from gpt_oss_vllm_tpu.serving.tokenizer import ByteTokenizer, get_tokenizer

WEATHER_TOOL = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "look up weather",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"enum": ["SF", "NY"]},
                "days": {"type": "integer"},
            },
        },
    },
}
CALC_TOOL = {
    "type": "function",
    "function": {
        "name": "calc",
        "parameters": {
            "type": "object",
            "properties": {"expr": {"type": "string", "maxLength": 8}},
        },
    },
}


# ---------------------------------------------------------------------------
# unit: session phases
# ---------------------------------------------------------------------------


def test_tool_choice_session_phases():
    tok = get_tokenizer("byte-harmony")
    g = compile_tool_choice([WEATHER_TOOL], ["get_weather"], tok)
    s = g.new_session()
    assert s.active
    # phase 1: only <|channel|> allowed
    row = s.allowed_row()
    assert row[tok.special("channel")]
    assert row.sum() == 1
    s.advance(tok.special("channel"))
    # phase 2: channel name constrained; <|message|> only at acceptance
    row = s.allowed_row()
    assert row[ord("c")] and not row[ord("x")]
    assert not row[tok.special("message")]
    for b in "commentary to=functions.get_weather".encode():
        assert s.allowed_row()[b]
        s.advance(b)
    row = s.allowed_row()
    assert row[tok.special("message")]
    assert not row[tok.special("call")]  # args not started
    s.advance(tok.special("message"))
    # phase 3: the tool's schema grammar; call only at acceptance
    row = s.allowed_row()
    assert row[ord("{")] and not row[tok.special("call")]
    for b in json.dumps({"city": "SF", "days": 3}).encode():
        assert s.allowed_row()[b], chr(b)
        s.advance(b)
    row = s.allowed_row()
    assert row[tok.special("call")]
    # other stops are NOT allowed — the tool-call framing ends at <|call|>
    assert not row[tok.special("return")]
    assert not row[tok.eos_id]


def test_tool_choice_required_selects_args_schema_per_name():
    tok = get_tokenizer("byte-harmony")
    g = compile_tool_choice(
        [WEATHER_TOOL, CALC_TOOL], ["get_weather", "calc"], tok
    )
    s = g.new_session()
    s.advance(tok.special("channel"))
    for b in "commentary to=functions.calc".encode():
        s.advance(b)
    s.advance(tok.special("message"))
    # calc's schema: {"expr": "..."} — "city" is not admissible
    for b in b'{"expr"':
        assert s.allowed_row()[b]
        s.advance(b)
    row = s.allowed_row()
    assert row[ord(":")] or row[ord(" ")]


def test_tool_choice_validation_errors():
    tok = get_tokenizer("byte-harmony")
    with pytest.raises(GuidedError):
        compile_tool_choice([WEATHER_TOOL], ["nope"], tok)
    with pytest.raises(GuidedError):
        compile_tool_choice([], ["anything"], tok)
    with pytest.raises(GuidedError):
        # plain (non-harmony) tokenizer lacks the channel/call specials
        compile_tool_choice([WEATHER_TOOL], ["get_weather"], ByteTokenizer())


# ---------------------------------------------------------------------------
# HTTP end-to-end on a REAL tiny engine (random weights; the grammar must
# carry all the structure)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def harmony_engine():
    from gpt_oss_vllm_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        QuantConfig,
        SchedulerConfig,
        ServingConfig,
    )
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.models.params import random_params

    tok = get_tokenizer("byte-harmony")
    cfg = EngineConfig(
        model=ModelConfig.tiny(vocab_size=512),
        quant=QuantConfig(method="none"),
        cache=CacheConfig(block_size=8, num_blocks=300, max_blocks_per_seq=80),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=640),
        serving=ServingConfig(served_model_name="tiny-harmony"),
    )
    params = random_params(cfg.model, cfg.quant, seed=5)
    return InferenceEngine(cfg, params), tok, cfg


@pytest.fixture()
async def hclient(harmony_engine, aiohttp_client):
    from gpt_oss_vllm_tpu.serving.api_server import AsyncEngine, build_app

    engine, tok, cfg = harmony_engine
    ae = AsyncEngine(engine, tok)
    app = build_app(ae, cfg.serving, cfg.scheduler.max_model_len)
    return await aiohttp_client(app)


def _base_chat(tool_choice, tools=None, **kw):
    return {
        "model": "m",
        "messages": [{"role": "user", "content": "weather in SF?"}],
        "tools": tools or [WEATHER_TOOL, CALC_TOOL],
        "tool_choice": tool_choice,
        "max_tokens": 160,
        **kw,
    }


def _validate_weather_args(args: str):
    doc = json.loads(args)
    assert set(doc) <= {"city", "days"}
    if "city" in doc:
        assert doc["city"] in ("SF", "NY")
    if "days" in doc:
        assert isinstance(doc["days"], int)


async def test_http_forced_named_function(hclient):
    for seed in (1, 2, 3):
        r = await hclient.post(
            "/v1/chat/completions",
            json=_base_chat(
                {"type": "function", "function": {"name": "get_weather"}},
                temperature=1.0, seed=seed,
            ),
        )
        assert r.status == 200
        choice = (await r.json())["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        tcs = choice["message"]["tool_calls"]
        assert len(tcs) == 1
        assert tcs[0]["function"]["name"] == "get_weather"
        _validate_weather_args(tcs[0]["function"]["arguments"])
        assert choice["message"]["content"] is None


async def test_http_forced_named_function_stream(hclient):
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat(
            {"type": "function", "function": {"name": "get_weather"}},
            temperature=1.0, seed=11, stream=True,
        ),
    )
    assert r.status == 200
    raw = (await r.read()).decode()
    assert raw.rstrip().endswith("data: [DONE]")
    name, args, finishes = "", "", []
    for line in raw.splitlines():
        if not line.startswith("data: ") or line == "data: [DONE]":
            continue
        chunk = json.loads(line[len("data: "):])
        for c in chunk["choices"]:
            if c.get("finish_reason"):
                finishes.append(c["finish_reason"])
            for tc in (c.get("delta", {}).get("tool_calls") or []):
                name += tc["function"]["name"] or ""
                args += tc["function"]["arguments"] or ""
    assert name == "get_weather"
    _validate_weather_args(args)
    assert "tool_calls" in finishes


async def test_http_tool_choice_required(hclient):
    names = set()
    for seed in (4, 5, 6, 7):
        r = await hclient.post(
            "/v1/chat/completions",
            json=_base_chat("required", temperature=1.0, seed=seed),
        )
        assert r.status == 200
        choice = (await r.json())["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        tcs = choice["message"]["tool_calls"]
        assert len(tcs) == 1
        assert tcs[0]["function"]["name"] in ("get_weather", "calc")
        names.add(tcs[0]["function"]["name"])
        doc = json.loads(tcs[0]["function"]["arguments"])
        if tcs[0]["function"]["name"] == "get_weather":
            _validate_weather_args(tcs[0]["function"]["arguments"])
        else:
            assert set(doc) <= {"expr"}


async def test_http_tool_choice_errors(hclient):
    # unknown name -> 400
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat({"type": "function", "function": {"name": "nope"}}),
    )
    assert r.status == 400
    assert "nope" in (await r.json())["error"]["message"]
    # required without tools -> 400
    r = await hclient.post(
        "/v1/chat/completions",
        json={
            "model": "m",
            "messages": [{"role": "user", "content": "x"}],
            "tool_choice": "required",
            "max_tokens": 8,
        },
    )
    assert r.status == 400
    # combining forcing with response_format -> 400
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat(
            {"type": "function", "function": {"name": "get_weather"}},
            response_format={"type": "json_object"},
        ),
    )
    assert r.status == 400
    # malformed dict -> 400
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat({"type": "function"}),
    )
    assert r.status == 400


async def test_http_tool_choice_auto_unchanged(hclient):
    """tool_choice auto/none never installs a forcing grammar (the model is
    random — without forcing it just rambles; the response must be 200 with
    ordinary content routing)."""
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat("auto", max_tokens=8, temperature=1.0, seed=1),
    )
    assert r.status == 200
    r = await hclient.post(
        "/v1/chat/completions",
        json=_base_chat("none", max_tokens=8, temperature=1.0, seed=1),
    )
    assert r.status == 200


async def test_tool_name_shape_validated(hclient):
    """A declared tool name outside OpenAI's [a-zA-Z0-9_-]{1,64} contract is
    a 400, not a server-killing parse failure: 'get weather' would defeat
    ToolChoiceSession._decode_name's whitespace-delimited parse and raise
    from inside engine.step() (review finding r5)."""
    r = await hclient.post(
        "/v1/chat/completions",
        json={
            "model": "m",
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 8,
            "tools": [
                {"type": "function",
                 "function": {"name": "get weather", "parameters": {
                     "type": "object"}}},
                {"type": "function",
                 "function": {"name": "calc", "parameters": {
                     "type": "object"}}},
            ],
            "tool_choice": "required",
        },
    )
    assert r.status == 400
    body = await r.json()
    assert "name" in body["error"]["message"]
