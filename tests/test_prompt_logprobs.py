"""Prompt logprobs (vLLM ``prompt_logprobs`` / OpenAI ``echo``+``logprobs``).

The reference's substrate OpenAI server returns prompt-token logprobs when
``echo=true, logprobs=N`` (vLLM's ``prompt_logprobs``); the repo computes
them from the prefill pass in bounded chunks (``engine.PLP_CHUNK`` — never
T x vocab at once, the step.py:12-13 memory rule).
"""

import numpy as np
import pytest

from gpt_oss_vllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
    SchedulerConfig,
    ServingConfig,
)
from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
from gpt_oss_vllm_tpu.engine.request import SamplingParams
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.serving.tokenizer import ByteTokenizer


def _cfg(prefill_chunk=512, prefix_caching=True):
    return EngineConfig(
        model=ModelConfig.tiny(vocab_size=512),
        quant=QuantConfig(method="none"),
        cache=CacheConfig(block_size=8, num_blocks=96, max_blocks_per_seq=16,
                          enable_prefix_caching=prefix_caching),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=96,
                                  prefill_chunk=prefill_chunk),
        serving=ServingConfig(served_model_name="tiny"),
    )


@pytest.fixture(scope="module")
def tiny_params():
    cfg = _cfg()
    return random_params(cfg.model, cfg.quant, seed=3)


def _collect_plp(engine, tok, prompt, n=2, rid="p0"):
    engine.add_request(
        rid, tok.encode(prompt),
        SamplingParams(max_tokens=2, temperature=0.0,
                       stop_token_ids=tuple(tok.stop_ids),
                       prompt_logprobs=n),
    )
    plp = None
    for _ in range(50):
        for out in engine.step():
            if out.request_id == rid and out.prompt_logprobs is not None:
                plp = out.prompt_logprobs
        if engine.num_running() == 0 and not engine.waiting:
            break
    return plp


def test_prompt_logprobs_shape_and_ordering(tiny_params):
    tok = ByteTokenizer()
    engine = InferenceEngine(_cfg(), tiny_params)
    prompt = "hello world"
    plp = _collect_plp(engine, tok, prompt, n=3)
    ids = tok.encode(prompt)
    assert plp is not None and len(plp) == len(ids)
    assert plp[0] is None  # first token has no conditional
    for chosen, top in plp[1:]:
        assert isinstance(chosen, float) and chosen <= 0.0
        assert len(top) == 3
        # top list sorted descending; chosen never beats the best
        vals = [v for _, v in top]
        assert vals == sorted(vals, reverse=True)
        assert chosen <= vals[0] + 1e-5
    # the chosen token's logprob matches its top-list entry when present
    for i, e in enumerate(plp):
        if e is None:
            continue
        chosen, top = e
        for t, v in top:
            if t == ids[i]:
                assert abs(v - chosen) < 1e-5


def test_prompt_logprobs_chunked_matches_single_chunk(tiny_params):
    """PLP entries are chunk-invariant: a 4-token prefill chunk (forcing
    multi-chunk PL admission) matches the single-chunk run."""
    tok = ByteTokenizer()
    prompt = "the quick brown fox jumps"
    a = _collect_plp(InferenceEngine(_cfg(prefill_chunk=16), tiny_params),
                     tok, prompt, n=2, rid="a")
    b = _collect_plp(InferenceEngine(_cfg(prefill_chunk=512), tiny_params),
                     tok, prompt, n=2, rid="b")
    assert a is not None and b is not None and len(a) == len(b)
    for ea, eb in zip(a[1:], b[1:]):
        assert abs(ea[0] - eb[0]) < 2e-3
        assert [t for t, _ in ea[1]] == [t for t, _ in eb[1]]


def test_prompt_logprobs_bypass_prefix_cache(tiny_params):
    """A cached identical prompt must not swallow PL positions: the second
    request still returns one entry per prompt token."""
    tok = ByteTokenizer()
    engine = InferenceEngine(_cfg(prefix_caching=True), tiny_params)
    prompt = "abcdefgh" * 3  # 24 tokens = 3 full blocks
    first = _collect_plp(engine, tok, prompt, n=1, rid="warm")
    second = _collect_plp(engine, tok, prompt, n=1, rid="cold")
    assert len(first) == len(second) == len(tok.encode(prompt))
    for ea, eb in zip(first[1:], second[1:]):
        assert abs(ea[0] - eb[0]) < 2e-3


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------


@pytest.fixture()
async def client(tiny_params, aiohttp_client):
    from gpt_oss_vllm_tpu.serving.api_server import AsyncEngine, build_app

    cfg = _cfg()
    engine = InferenceEngine(cfg, tiny_params)
    ae = AsyncEngine(engine, ByteTokenizer())
    app = build_app(ae, cfg.serving, cfg.scheduler.max_model_len)
    return await aiohttp_client(app)


async def test_http_echo_logprobs_cover_prompt(client):
    prompt = "echo me"
    r = await client.post(
        "/v1/completions",
        json={"model": "m", "prompt": prompt, "max_tokens": 3,
              "temperature": 0.0, "echo": True, "logprobs": 2},
    )
    assert r.status == 200
    choice = (await r.json())["choices"][0]
    assert choice["text"].startswith(prompt)
    lp = choice["logprobs"]
    n_prompt = len(prompt)  # byte tokenizer: 1 token per char
    assert len(lp["tokens"]) >= n_prompt + 1
    assert "".join(lp["tokens"][:n_prompt]) == prompt
    assert lp["token_logprobs"][0] is None  # OpenAI: first prompt token
    assert lp["top_logprobs"][0] is None
    for v in lp["token_logprobs"][1:]:
        assert v is not None and v <= 0.0
    # text offsets start at 0 and are strictly increasing over the echo
    assert lp["text_offset"][0] == 0
    assert lp["text_offset"][:n_prompt] == list(range(n_prompt))


async def test_http_prompt_logprobs_extension(client):
    r = await client.post(
        "/v1/completions",
        json={"model": "m", "prompt": "xyz", "max_tokens": 2,
              "temperature": 0.0, "prompt_logprobs": 2},
    )
    assert r.status == 200
    choice = (await r.json())["choices"][0]
    plp = choice["prompt_logprobs"]
    assert plp is not None and len(plp) == 3
    assert plp[0] is None
    for e in plp[1:]:
        assert set(e) == {"token", "logprob", "top_logprobs"}
        assert len(e["top_logprobs"]) == 2
    # echo off: completion logprobs absent unless requested
    assert choice["logprobs"] is None


async def test_http_prompt_logprobs_chat(client):
    r = await client.post(
        "/v1/chat/completions",
        json={"model": "m",
              "messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 2, "temperature": 0.0, "prompt_logprobs": 1},
    )
    assert r.status == 200
    choice = (await r.json())["choices"][0]
    plp = choice["prompt_logprobs"]
    assert plp is not None and plp[0] is None and len(plp) > 4
    assert all(e is None or e["logprob"] <= 0.0 for e in plp)


async def test_http_explicit_prompt_logprobs_stream_rejected(client):
    r = await client.post(
        "/v1/completions",
        json={"model": "m", "prompt": "x", "max_tokens": 2,
              "prompt_logprobs": 2, "stream": True},
    )
    assert r.status == 400


async def test_http_echo_logprobs_streams(client):
    """echo+logprobs+stream is valid OpenAI (prompt_logprobs is implied
    only on NON-streaming requests — review finding r5): the echoed prompt
    text leads the stream, completion logprobs attach to content chunks."""
    import json as _json

    r = await client.post(
        "/v1/completions",
        json={"model": "m", "prompt": "hi", "max_tokens": 3, "echo": True,
              "logprobs": 1, "stream": True, "temperature": 0.0},
    )
    assert r.status == 200
    raw = (await r.read()).decode()
    assert raw.rstrip().endswith("data: [DONE]")
    chunks = [
        _json.loads(l[6:]) for l in raw.splitlines()
        if l.startswith("data: ") and l != "data: [DONE]"
    ]
    assert chunks[0]["choices"][0]["text"] == "hi"  # echoed prompt first
    assert any(c["choices"][0].get("logprobs") for c in chunks[1:])


async def test_http_negative_logprobs_rejected(client):
    for extra in ({"logprobs": -1}, {"prompt_logprobs": -3}):
        r = await client.post(
            "/v1/completions",
            json={"model": "m", "prompt": "x", "max_tokens": 2, **extra},
        )
        assert r.status == 400, extra


async def test_http_plp_shared_across_n_candidates(client):
    """n>1 echo+logprobs computes prompt logprobs ONCE per prompt
    (candidate 0) and shares them: every choice carries an identical
    echoed-logprobs prefix."""
    r = await client.post(
        "/v1/completions",
        json={"model": "m", "prompt": "abcd", "max_tokens": 2, "echo": True,
              "logprobs": 1, "n": 2, "temperature": 0.8, "seed": 3},
    )
    assert r.status == 200
    body = await r.json()
    assert len(body["choices"]) == 2
    lps = [c["logprobs"] for c in body["choices"]]
    assert all(lp is not None for lp in lps)
    npr = 4  # prompt tokens
    a, b = lps[0], lps[1]
    assert a["tokens"][:npr] == b["tokens"][:npr]
    assert a["token_logprobs"][:npr] == b["token_logprobs"][:npr]
    assert a["token_logprobs"][0] is None  # position 0: no conditional
