"""Harmony channel protocol tests: chat rendering with <|channel|>, the
incremental stream parser (analysis/final routing, marker stripping), and
the HTTP chat path end-to-end over a scripted channeled model — the
capability the reference gets by delegating to vLLM's harmony-aware OpenAI
server (``gpt_oss_server.py:64-67``)."""

import json

import pytest

from gpt_oss_vllm_tpu.serving.harmony import HarmonyStreamParser
from gpt_oss_vllm_tpu.serving.tokenizer import ByteTokenizer, get_tokenizer


def h():
    return get_tokenizer("byte-harmony")


def _script(t, channeled=True):
    """Token script a harmony model would emit after <|start|>assistant."""
    ch, msg, end, start, ret = (
        t.special("channel"), t.special("message"), t.special("end"),
        t.special("start"), t.special("return"),
    )
    if not channeled:
        return t.encode("plain text") + [ret]
    return (
        [ch] + t.encode("analysis") + [msg] + t.encode("Think hard…")
        + [end, start] + t.encode("assistant")
        + [ch] + t.encode("final") + [msg] + t.encode("Hello!") + [ret]
    )


def _collect(parser, ids):
    got = {"content": "", "reasoning": ""}
    for i, tok in enumerate(ids):
        for dest, d in parser.push(tok, final=i == len(ids) - 1):
            got[dest] += d
    for dest, d in parser.finish():
        got[dest] += d
    return got


def test_harmony_tokenizer_flags():
    t = h()
    assert t.harmony
    end = t.special("end")
    assert end in t.stop_ids
    assert end not in t.chat_stop_ids  # <|end|> must NOT stop chat generation
    assert t.special("return") in t.chat_stop_ids
    assert t.special("call") in t.chat_stop_ids
    assert not ByteTokenizer().harmony


def test_render_chat_channel_framing():
    t = h()
    ids = t.render_chat(
        [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
            {"role": "user", "content": "more"},
        ]
    )
    start, ch, msg, end = (
        t.special("start"), t.special("channel"), t.special("message"), t.special("end"),
    )
    expect = (
        [start] + t.encode("user") + [msg] + t.encode("hi") + [end]
        + [start] + t.encode("assistant") + [ch] + t.encode("final")
        + [msg] + t.encode("yo") + [end]
        + [start] + t.encode("user") + [msg] + t.encode("more") + [end]
        + [start] + t.encode("assistant")  # generation header: NO <|message|>
    )
    assert ids == expect
    # non-harmony rendering is unchanged (regression)
    t2 = ByteTokenizer()
    ids2 = t2.render_chat([{"role": "user", "content": "hi"}])
    assert ids2[-1] == t2.special("message")


def test_parser_routes_channels_and_strips_markers():
    t = h()
    got = _collect(HarmonyStreamParser(t), _script(t))
    assert got["content"] == "Hello!"
    assert got["reasoning"] == "Think hard…"


def test_parser_incremental_equals_batch_any_split():
    t = h()
    ids = _script(t)
    want = _collect(HarmonyStreamParser(t), ids)
    # pushing one token at a time (done by _collect) must equal any coarser
    # grouping — verify against a fresh parser fed the same stream twice
    assert _collect(HarmonyStreamParser(t), ids) == want


def test_parser_lenient_plain_stream():
    """A model that never emits channel markers streams to content."""
    t = h()
    got = _collect(HarmonyStreamParser(t), _script(t, channeled=False))
    assert got["content"] == "plain text"
    assert got["reasoning"] == ""
    # non-harmony tokenizer: passthrough mode
    t2 = ByteTokenizer()
    got2 = _collect(HarmonyStreamParser(t2), t2.encode("abc") + [t2.special("return")])
    assert got2["content"] == "abc"


def test_parser_commentary_and_tool_channels_route_to_reasoning():
    t = h()
    ch, msg, ret = t.special("channel"), t.special("message"), t.special("return")
    ids = (
        [ch] + t.encode("commentary to=functions.look_up") + [msg]
        + t.encode('{"q": 1}') + [ret]
    )
    got = _collect(HarmonyStreamParser(t), ids)
    assert got["reasoning"] == '{"q": 1}'
    assert got["content"] == ""


def test_parser_holds_partial_utf8_across_deltas():
    t = h()
    ch, msg, ret = t.special("channel"), t.special("message"), t.special("return")
    euro = list("€".encode("utf-8"))
    ids = [ch] + t.encode("final") + [msg] + euro + [ret]
    p = HarmonyStreamParser(t)
    seen = []
    for tok in ids:
        seen += p.push(tok)
    seen += p.finish()
    assert "".join(d for _, d in seen) == "€"
    # no replacement characters ever streamed
    assert all("�" not in d for _, d in seen)


# ---------------------------------------------------------------------------
# HTTP end-to-end: scripted channeled model through the real chat handlers
# ---------------------------------------------------------------------------


class _ScriptedEngine:
    """Engine test double: emits a fixed token script, one token per step,
    finishing at the request's stop ids (exactly the real engine's stop
    contract). Lets HTTP tests drive deterministic channeled output."""

    def __init__(self, script):
        self.script = script
        self.reqs = {}
        self.waiting = []
        self.metrics = {"steps": 0}

    def add_request(self, rid, prompt_ids, sampling):
        self.reqs[rid] = (0, sampling)

    def abort_request(self, rid):
        self.reqs.pop(rid, None)

    def has_work(self):
        return bool(self.reqs)

    def num_running(self):
        return len(self.reqs)

    def step(self):
        from gpt_oss_vllm_tpu.engine.engine import StepOutput

        outs = []
        for rid in list(self.reqs):
            i, sp = self.reqs[rid]
            tok = self.script[i]
            fin = (
                tok in sp.stop_token_ids
                or i + 1 >= len(self.script)
                or i + 1 >= sp.max_tokens
            )
            outs.append(StepOutput(rid, tok, fin, "stop" if fin else None))
            if fin:
                del self.reqs[rid]
            else:
                self.reqs[rid] = (i + 1, sp)
        self.metrics["steps"] += 1
        return outs


@pytest.fixture()
async def harmony_client(aiohttp_client):
    from gpt_oss_vllm_tpu.config import ServingConfig
    from gpt_oss_vllm_tpu.serving.api_server import AsyncEngine, build_app

    tok = h()
    eng = _ScriptedEngine(_script(tok))
    ae = AsyncEngine(eng, tok)
    app = build_app(ae, ServingConfig(served_model_name="tiny-harmony"), 96)
    return await aiohttp_client(app)


async def test_chat_non_stream_clean_final_text(harmony_client):
    r = await harmony_client.post(
        "/v1/chat/completions",
        json={
            "model": "tiny-harmony",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 80,
            "temperature": 0.0,
        },
    )
    assert r.status == 200
    body = await r.json()
    msg = body["choices"][0]["message"]
    assert msg["content"] == "Hello!"
    assert msg["reasoning_content"] == "Think hard…"
    # no markers or role text leaked anywhere
    assert "analysis" not in msg["content"]
    assert "assistant" not in msg["content"]


async def test_chat_stream_routes_deltas(harmony_client):
    r = await harmony_client.post(
        "/v1/chat/completions",
        json={
            "model": "tiny-harmony",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 80,
            "temperature": 0.0,
            "stream": True,
        },
    )
    assert r.status == 200
    raw = (await r.read()).decode()
    assert raw.rstrip().endswith("data: [DONE]")
    content = ""
    reasoning = ""
    for line in raw.splitlines():
        if not line.startswith("data: ") or line == "data: [DONE]":
            continue
        chunk = json.loads(line[len("data: "):])
        for c in chunk["choices"]:
            d = c.get("delta", {})
            content += d.get("content") or ""
            reasoning += d.get("reasoning_content") or ""
    assert content == "Hello!"
    assert reasoning == "Think hard…"
