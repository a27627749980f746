"""Structured outputs (grammar-constrained decoding): regex->byte-DFA
compiler parity vs Python ``re``, JSON-schema lowering, token mask tables,
harmony channel gating, engine integration (sync-path masking + mixed
batches on the async engine) and the HTTP ``response_format`` /
``guided_*`` surface.

The reference inherits structured outputs from vLLM's OpenAI server
(``gpt_oss_server.py:64-67``); the validity assertions here (every
constrained generation parses/validates) are this repo's equivalent of the
substrate's guided-decoding tests.
"""

import json
import random
import re

import numpy as np
import pytest

from gpt_oss_vllm_tpu.serving.guided import (
    GuidedError,
    _json_object_regex,
    compile_guided,
    compile_regex,
    json_schema_to_regex,
)
from gpt_oss_vllm_tpu.serving.tokenizer import ByteTokenizer


# ---------------------------------------------------------------------------
# regex -> DFA compiler
# ---------------------------------------------------------------------------

PATTERNS = [
    r"abc",
    r"a*b+c?",
    r"(ab|cd)*e",
    r"[a-c]{2,4}",
    r"\d+\.\d{2}",
    r"-?(0|[1-9]\d*)",
    r'"([^"\\]|\\.)*"',
    r"(foo|bar|baz)",
    r"a{3}",
    r"a{2,}",
    r"[^abc]+",
    r"x(yz)*",
    r"[\w-]+@[\w-]+\.[a-z]{2,3}",
    r"\s*yes\s*|\s*no\s*",
]


@pytest.mark.parametrize("pat", PATTERNS)
def test_dfa_matches_re_fullmatch(pat):
    dfa = compile_regex(pat)
    rng = random.Random(hash(pat) & 0xFFFF)
    alphabet = 'abcdefxyz0123456789.\\"-@_ \t'
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 9)))
        assert (re.fullmatch(pat, s) is not None) == dfa.matches(
            s.encode()
        ), (pat, s)


def test_dfa_unicode_literals_and_negated_class():
    dfa = compile_regex("héllo|wörld")
    assert dfa.matches("héllo".encode())
    assert dfa.matches("wörld".encode())
    assert not dfa.matches(b"hello")
    # negated class admits any multi-byte UTF-8 char
    dfa = compile_regex(r'"[^"]*"')
    assert dfa.matches('"snow ☃ man"'.encode())
    assert not dfa.matches('"a"b"'.encode())


def test_dfa_rejects_unsupported():
    with pytest.raises(GuidedError):
        compile_regex("(?P<name>x)")  # named groups unsupported
    with pytest.raises(GuidedError):
        compile_regex("a{4,2}")
    with pytest.raises(GuidedError):
        compile_regex("[z-a]")


def test_minimization_preserves_language():
    from gpt_oss_vllm_tpu.serving.guided import _NFA, _Parser, _nfa_to_dfa

    pat = r"(ab|a)(b|bb)*c{1,3}"
    ast = _Parser(pat).parse()
    nfa = _NFA()
    s, a = nfa.compile(ast)
    raw = _nfa_to_dfa(nfa, s, a)
    mini = compile_regex(pat)
    assert mini.num_states <= raw.num_states
    rng = random.Random(7)
    for _ in range(500):
        t = "".join(rng.choice("abc") for _ in range(rng.randint(0, 8)))
        assert raw.matches(t.encode()) == mini.matches(t.encode()), t


# ---------------------------------------------------------------------------
# JSON schema lowering
# ---------------------------------------------------------------------------

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 3},
        "mood": {"enum": ["happy", "sad"]},
        "score": {"type": "number"},
        "ok": {"type": "boolean"},
    },
}


def test_schema_regex_accepts_valid_docs():
    dfa = compile_regex(json_schema_to_regex(SCHEMA))
    doc = {
        "name": "Ana", "age": 31, "tags": ["a", "b"],
        "mood": "happy", "score": -1.5e3, "ok": True,
    }
    assert dfa.matches(json.dumps(doc).encode())  # spaced
    assert dfa.matches(json.dumps(doc, separators=(",", ":")).encode())


def test_schema_regex_rejects_invalid_docs():
    dfa = compile_regex(json_schema_to_regex(SCHEMA))
    good = {
        "name": "Ana", "age": 31, "tags": [], "mood": "sad",
        "score": 1, "ok": False,
    }
    assert dfa.matches(json.dumps(good).encode())
    bad_type = dict(good)
    bad_type["age"] = "x"
    assert not dfa.matches(json.dumps(bad_type).encode())
    bad_enum = dict(good)
    bad_enum["mood"] = "angry"
    assert not dfa.matches(json.dumps(bad_enum).encode())
    # property order is the declared order (OpenAI strict-mode shape)
    assert not dfa.matches(b'{"age": 3, "name": "x"}')
    # maxItems enforced
    too_many = dict(good)
    too_many["tags"] = ["a", "b", "c", "d"]
    assert not dfa.matches(json.dumps(too_many).encode())


def test_schema_ref_and_anyof():
    schema = {
        "type": "object",
        "properties": {"pet": {"$ref": "#/$defs/pet"}},
        "$defs": {
            "pet": {
                "anyOf": [{"enum": ["cat", "dog"]}, {"type": "integer"}]
            }
        },
    }
    from gpt_oss_vllm_tpu.serving.guided import _resolve_refs

    resolved = _resolve_refs(schema, schema)
    dfa = compile_regex(json_schema_to_regex(resolved))
    assert dfa.matches(b'{"pet": "cat"}')
    assert dfa.matches(b'{"pet": 12}')
    assert not dfa.matches(b'{"pet": "fish"}')


def test_json_object_grammar_bounded_depth():
    dfa = compile_regex(_json_object_regex(3))
    assert dfa.matches(json.dumps({"a": [1, {"b": "c"}], "d": None}).encode())
    assert dfa.matches(b"{}")
    assert not dfa.matches(b"[1, 2]")  # top level must be an object
    assert not dfa.matches(b'{"a": }')


# ---------------------------------------------------------------------------
# token tables + sessions (byte tokenizer)
# ---------------------------------------------------------------------------


def test_choice_token_table_masks():
    tok = ByteTokenizer()
    g = compile_guided("choice", ["red", "green", "blue"], tok)
    st = g.start_state
    row = g.allowed_row(st)
    assert {i for i in range(len(row)) if row[i]} == {
        ord("r"), ord("g"), ord("b")
    }
    for b in b"red":
        st = g.advance(st, b)
    assert g.accepting(st)
    assert g.forces_stop(st)  # no choice extends "red"
    row = g.allowed_row(st)
    allowed = {i for i in range(len(row)) if row[i]}
    assert allowed  # the stop ids
    assert allowed <= set(tok.stop_ids) | set(tok.chat_stop_ids)


def test_prefix_choice_does_not_force_stop():
    tok = ByteTokenizer()
    g = compile_guided("choice", ["go", "gone"], tok)
    st = g.start_state
    for b in b"go":
        st = g.advance(st, b)
    assert g.accepting(st)
    assert not g.forces_stop(st)  # "gone" still reachable
    row = g.allowed_row(st)
    assert row[ord("n")]
    assert row[tok.eos_id]


def test_session_harmony_gate_activates_on_final_channel():
    tok = ByteTokenizer(harmony=True)
    g = compile_guided("choice", ["yes", "no"], tok)
    s = g.new_session("harmony")
    assert not s.active  # free-form until the final channel
    assert s.allowed_row() is None
    # analysis channel: anything goes, grammar state untouched
    for t in [tok.special("channel")] + tok.encode("analysis") + [tok.special("message")]:
        s.advance(t)
    assert not s.active
    for t in tok.encode("thinking...") + [tok.special("end")]:
        s.advance(t)
    # final channel activates the constraint
    for t in [tok.special("start")] + tok.encode("assistant") + [
        tok.special("channel")
    ] + tok.encode("final") + [tok.special("message")]:
        s.advance(t)
    assert s.active
    row = s.allowed_row()
    assert {i for i in range(len(row)) if row[i]} == {ord("y"), ord("n")}
    for t in tok.encode("yes"):
        s.advance(t)
    assert s.grammar.accepting(s.state)


def test_session_plain_gate_is_immediately_active():
    tok = ByteTokenizer()
    g = compile_guided("regex", r"[ab]+", tok)
    s = g.new_session("none")
    assert s.active
    s.advance(ord("a"))
    row = s.allowed_row()
    assert row[ord("b")] and not row[ord("c")]


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def guided_setup():
    from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.models.params import random_params

    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, QuantConfig(method="none"), seed=11)
    tok = ByteTokenizer()
    return cfg, params, tok


def _make_engine(cfg, params):
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine

    return InferenceEngine(cfg, params)


def _drain(engine, req_ids):
    texts = {r: [] for r in req_ids}
    reasons = {}
    for _ in range(500):
        for out in engine.step():
            if out.request_id in texts and out.token_id >= 0:
                texts[out.request_id].append(out.token_id)
            if out.finished and out.request_id in texts:
                reasons[out.request_id] = out.finish_reason
        if len(reasons) == len(req_ids) and engine.num_running() == 0 and not engine.waiting:
            break
    return texts, reasons


def test_engine_guided_choice_sampled(guided_setup):
    cfg, params, tok = guided_setup
    engine = _make_engine(cfg, params)
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    g = compile_guided("choice", ["red", "green", "blue"], tok)
    for i, seed in enumerate([1, 2, 3, 4]):
        engine.add_request(
            f"c{i}", tok.encode(f"pick a color {i}: "),
            SamplingParams(
                max_tokens=16, temperature=0.9, seed=seed,
                stop_token_ids=tuple(tok.stop_ids), guided=g,
            ),
        )
    texts, reasons = _drain(engine, [f"c{i}" for i in range(4)])
    for rid, toks in texts.items():
        body = [t for t in toks if t not in tok.stop_ids]
        assert tok.decode(body) in ("red", "green", "blue"), (rid, toks)
        assert reasons[rid] == "stop"


def test_engine_guided_json_schema_valid_output(guided_setup):
    cfg, params, tok = guided_setup
    engine = _make_engine(cfg, params)
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string", "maxLength": 4},
            "n": {"enum": [1, 2, 3]},
            "ok": {"type": "boolean"},
        },
    }
    g = compile_guided("json_schema", schema, tok)
    for i, seed in enumerate([11, 22, 33]):
        engine.add_request(
            f"j{i}", tok.encode("emit json: "),
            SamplingParams(
                max_tokens=64, temperature=1.0, seed=seed,
                stop_token_ids=tuple(tok.stop_ids), guided=g,
            ),
        )
    texts, reasons = _drain(engine, [f"j{i}" for i in range(3)])
    for rid, toks in texts.items():
        body = tok.decode([t for t in toks if t not in tok.stop_ids])
        assert reasons[rid] == "stop", (rid, body)
        doc = json.loads(body)
        assert set(doc) == {"name", "n", "ok"}
        assert isinstance(doc["name"], str) and len(doc["name"]) <= 4
        assert doc["n"] in (1, 2, 3)
        assert isinstance(doc["ok"], bool)


def test_engine_guided_regex_prefix_valid_on_length_cut(guided_setup):
    """max_tokens can cut a constrained generation mid-document: the emitted
    text must still be a viable DFA prefix (never ungrammatical)."""
    cfg, params, tok = guided_setup
    engine = _make_engine(cfg, params)
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    g = compile_guided("regex", r"[ab]{40}", tok)
    engine.add_request(
        "r0", tok.encode("go: "),
        SamplingParams(
            max_tokens=5, temperature=0.8, seed=5,
            stop_token_ids=tuple(tok.stop_ids), guided=g,
        ),
    )
    texts, reasons = _drain(engine, ["r0"])
    body = tok.decode([t for t in texts["r0"] if t not in tok.stop_ids])
    assert reasons["r0"] == "length"
    assert len(body) == 5 and set(body) <= {"a", "b"}


def test_engine_guided_mixed_batch_async_parity(guided_setup):
    """Guided rows ride the async chain (device-side mask + DFA byte walk);
    plain greedy requests in the same batch must still emit exactly the
    tokens the all-sync engine would."""
    import dataclasses

    cfg, params, tok = guided_setup
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    sync_cfg = dataclasses.replace(
        cfg, scheduler=dataclasses.replace(cfg.scheduler, async_decode=False)
    )
    plain = SamplingParams(max_tokens=12, temperature=0.0)
    ref_engine = _make_engine(sync_cfg, params)
    ref_engine.add_request("p", [5, 6, 7], plain)
    ref_texts, _ = _drain(ref_engine, ["p"])

    engine = _make_engine(cfg, params)  # async default
    g = compile_guided("choice", ["yes", "no"], tok)
    engine.add_request("p", [5, 6, 7], plain)
    engine.add_request(
        "g", tok.encode("answer: "),
        SamplingParams(
            max_tokens=8, temperature=0.7, seed=3,
            stop_token_ids=tuple(tok.stop_ids), guided=g,
        ),
    )
    texts, reasons = _drain(engine, ["p", "g"])
    assert texts["p"] == ref_texts["p"]
    body = tok.decode([t for t in texts["g"] if t not in tok.stop_ids])
    assert body in ("yes", "no")
    # after the guided request finishes the engine returns to the async
    # chain: a fresh plain request still matches the sync oracle
    engine.add_request("p2", [5, 6, 7], plain)
    texts2, _ = _drain(engine, ["p2"])
    assert texts2["p2"] == ref_texts["p"]


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_engine():
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

    tok = ByteTokenizer()
    cfg = EngineConfig(
        model=ModelConfig.tiny(vocab_size=512),
        quant=QuantConfig(method="none"),
        cache=CacheConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=96),
        serving=ServingConfig(served_model_name="tiny"),
    )
    params = random_params(cfg.model, cfg.quant, seed=2)
    return InferenceEngine(cfg, params), tok, cfg


@pytest.fixture()
async def client(http_engine, aiohttp_client):
    from gpt_oss_vllm_tpu.serving.api_server import AsyncEngine, build_app

    engine, tok, cfg = http_engine
    ae = AsyncEngine(engine, tok)
    app = build_app(ae, cfg.serving, cfg.scheduler.max_model_len)
    return await aiohttp_client(app)


async def test_http_guided_choice(client):
    r = await client.post(
        "/v1/completions",
        json={
            "model": "m", "prompt": "color: ", "max_tokens": 16,
            "temperature": 0.9, "seed": 1,
            "guided_choice": ["alpha", "beta"],
        },
    )
    assert r.status == 200
    body = await r.json()
    assert body["choices"][0]["text"] in ("alpha", "beta")
    assert body["choices"][0]["finish_reason"] == "stop"


async def test_http_response_format_json_schema(client):
    rf = {
        "type": "json_schema",
        "json_schema": {
            "name": "answer",
            "schema": {
                "type": "object",
                "properties": {
                    "verdict": {"enum": ["yes", "no"]},
                    "conf": {"type": "integer"},
                },
            },
        },
    }
    r = await client.post(
        "/v1/chat/completions",
        json={
            "model": "m",
            "messages": [{"role": "user", "content": "verdict?"}],
            "max_tokens": 48, "temperature": 1.0, "seed": 7,
            "response_format": rf,
        },
    )
    assert r.status == 200
    body = await r.json()
    content = body["choices"][0]["message"]["content"]
    doc = json.loads(content)
    assert doc["verdict"] in ("yes", "no")
    assert isinstance(doc["conf"], int)


async def test_http_guided_regex_stream(client):
    r = await client.post(
        "/v1/completions",
        json={
            "model": "m", "prompt": "id: ", "max_tokens": 24,
            "temperature": 0.8, "seed": 9, "stream": True,
            "guided_regex": r"[A-Z]{3}-\d{4}",
        },
    )
    assert r.status == 200
    raw = (await r.read()).decode()
    lines = [l for l in raw.split("\n") if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    text = "".join(
        json.loads(l[6:])["choices"][0]["text"] for l in lines[:-1]
    )
    assert re.fullmatch(r"[A-Z]{3}-\d{4}", text), text


async def test_http_guided_bad_spec_400(client):
    r = await client.post(
        "/v1/completions",
        json={
            "model": "m", "prompt": "x", "max_tokens": 4,
            "guided_regex": "(?P<bad>x)",
        },
    )
    assert r.status == 400
    r = await client.post(
        "/v1/completions",
        json={
            "model": "m", "prompt": "x", "max_tokens": 4,
            "guided_regex": "a", "guided_choice": ["b"],
        },
    )
    assert r.status == 400


async def test_http_response_format_json_object(client):
    r = await client.post(
        "/v1/completions",
        json={
            "model": "m", "prompt": "json: ", "max_tokens": 64,
            "temperature": 1.0, "seed": 4,
            "response_format": {"type": "json_object"},
        },
    )
    assert r.status == 200
    body = await r.json()
    ch = body["choices"][0]
    if ch["finish_reason"] == "stop":
        doc = json.loads(ch["text"])
        assert isinstance(doc, dict)
    else:
        # length-cut: the emitted prefix must still be grammatical — it
        # extends to a valid object (cheap check: correct opening + no parse
        # error before the cut is hard to assert directly; ensure non-empty
        # and starts with '{')
        assert ch["text"].startswith("{")


# ---------------------------------------------------------------------------
# device-chained guided decoding (async path)
# ---------------------------------------------------------------------------


def test_engine_guided_async_chain_byte_parity(guided_setup):
    """Guided rows on the zero-sync chain emit EXACTLY the tokens the sync
    engine does (same masked logits, same seeded sampler), for greedy and
    sampled rows, across mixed multi-grammar batches — and the async engine
    actually pipelines (in-flight steps observed)."""
    import dataclasses

    cfg, params, tok = guided_setup
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    g1 = compile_guided("choice", ["red", "green", "blue"], tok)
    g2 = compile_guided("regex", r"[ab]{1,30}", tok)
    reqs = [
        ("a0", tok.encode("color: "), SamplingParams(
            max_tokens=12, temperature=0.0,
            stop_token_ids=tuple(tok.stop_ids), guided=g1)),
        ("a1", tok.encode("seq: "), SamplingParams(
            max_tokens=10, temperature=0.9, seed=4,
            stop_token_ids=tuple(tok.stop_ids), guided=g2)),
        ("a2", tok.encode("other: "), SamplingParams(
            max_tokens=12, temperature=0.8, seed=9,
            stop_token_ids=tuple(tok.stop_ids), guided=g2)),
        ("a3", [5, 6, 7], SamplingParams(max_tokens=10, temperature=0.0)),
    ]

    def run(async_decode):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, async_decode=async_decode, async_depth=3,
                async_flush_burst=2,
            ),
        )
        eng = _make_engine(c, params)
        for rid, p, sp in reqs:
            eng.add_request(rid, p, sp)
        toks = {rid: [] for rid, _, _ in reqs}
        max_pending = 0
        while eng.has_work():
            for o in eng.step():
                if o.token_id >= 0:
                    toks[o.request_id].append(o.token_id)
            max_pending = max(max_pending, len(getattr(eng, "_pending", ())))
        return toks, max_pending

    want, _ = run(False)
    got, max_pending = run(True)
    assert got == want
    assert max_pending >= 2  # the guided batch really pipelined async steps
    body = tok.decode([t for t in got["a0"] if t not in tok.stop_ids])
    assert body in ("red", "green", "blue")
    for rid in ("a1", "a2"):
        b = tok.decode([t for t in got[rid] if t not in tok.stop_ids])
        assert b and set(b) <= {"a", "b"}


def test_engine_guided_async_json_complete(guided_setup):
    """A schema-guided sampled request completes a valid document through
    the async chain (grammar state chained on device across steps)."""
    import dataclasses

    cfg, params, tok = guided_setup
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    schema = {
        "type": "object",
        "properties": {
            "k": {"enum": ["x", "y"]},
            "v": {"type": "string", "maxLength": 3},
        },
    }
    g = compile_guided("json_schema", schema, tok)
    c = dataclasses.replace(
        cfg,
        scheduler=dataclasses.replace(
            cfg.scheduler, async_decode=True, async_depth=3,
            async_flush_burst=2,
        ),
    )
    eng = _make_engine(c, params)
    for i, seed in enumerate([3, 14, 15]):
        eng.add_request(
            f"j{i}", tok.encode(f"doc {i}: "),
            SamplingParams(
                max_tokens=48, temperature=1.0, seed=seed,
                stop_token_ids=tuple(tok.stop_ids), guided=g,
            ),
        )
    texts, reasons = _drain(eng, [f"j{i}" for i in range(3)])
    for rid, toks in texts.items():
        body = tok.decode([t for t in toks if t not in tok.stop_ids])
        assert reasons[rid] == "stop", (rid, body)
        doc = json.loads(body)
        assert doc["k"] in ("x", "y") and len(doc["v"]) <= 3


def test_engine_guided_min_tokens_stays_sync(guided_setup):
    """min_tokens>0 guided rows keep the exact sync path (grammar-forced
    stop must override the stop suppression) — output stays valid."""
    import dataclasses

    cfg, params, tok = guided_setup
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    g = compile_guided("choice", ["ok"], tok)
    c = dataclasses.replace(
        cfg,
        scheduler=dataclasses.replace(cfg.scheduler, async_decode=True),
    )
    eng = _make_engine(c, params)
    eng.add_request(
        "m", tok.encode("x: "),
        SamplingParams(
            max_tokens=8, temperature=0.0, min_tokens=5,
            stop_token_ids=tuple(tok.stop_ids), guided=g,
        ),
    )
    texts, reasons = _drain(eng, ["m"])
    body = tok.decode([t for t in texts["m"] if t not in tok.stop_ids])
    assert body == "ok"
    assert reasons["m"] == "stop"


def test_engine_guided_composes_with_speculation(guided_setup):
    """Guided x speculative decoding: the window program masks each
    position with the DFA state after the preceding drafts, so constrained
    rows keep multi-token spec steps. Greedy guided streams must be
    byte-identical to the sync no-spec engine, and drafts must actually
    fire (a (ab)+ grammar makes output perfectly draftable)."""
    import dataclasses

    cfg, params, tok = guided_setup
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    g = compile_guided("regex", r"(ab){2,40}", tok)
    reqs = [
        ("s0", tok.encode("go: "), SamplingParams(
            max_tokens=24, temperature=0.0,
            stop_token_ids=tuple(tok.stop_ids), guided=g)),
        ("s1", tok.encode("two: "), SamplingParams(
            max_tokens=20, temperature=0.7, seed=6,
            stop_token_ids=tuple(tok.stop_ids), guided=g)),
        ("s2", [7, 8, 9] * 8, SamplingParams(max_tokens=16, temperature=0.0)),
    ]

    def run(spec_tokens, async_decode):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, spec_tokens=spec_tokens,
                async_decode=async_decode, async_depth=2, async_flush_burst=1,
                max_model_len=256,
            ),
        )
        eng = _make_engine(c, params)
        for rid, p, sp in reqs:
            eng.add_request(rid, p, sp)
        toks = {rid: [] for rid, _, _ in reqs}
        while eng.has_work():
            for o in eng.step():
                if o.token_id >= 0:
                    toks[o.request_id].append(o.token_id)
        return toks, eng

    want, _ = run(0, False)
    got, eng = run(4, True)
    # greedy rows byte-identical (s0 guided, s2 plain rider)
    assert got["s0"] == want["s0"]
    assert got["s2"] == want["s2"]
    # sampled guided row still grammatical + deterministic
    b1 = tok.decode([t for t in got["s1"] if t not in tok.stop_ids])
    import re as _re

    assert _re.fullmatch(r"(ab){2,40}|(ab){1,40}a?", b1), b1  # prefix ok on length cut
    got2, _ = run(4, True)
    assert got2 == got
    # speculation really engaged on the constrained stream
    assert eng.metrics.get("spec_proposed", 0) > 0
    assert eng.metrics.get("spec_accepted", 0) > 0


def test_regex_anchors_lazy_and_assertions():
    """fullmatch semantics: ^/$ anchors are no-ops; lazy quantifiers match
    the same language as greedy; zero-width assertions raise instead of
    silently matching a literal letter."""
    d = compile_regex(r"^foo$")
    assert d.matches(b"foo") and not d.matches(b"xfoo")
    d = compile_regex(r"a*?b+?")
    for s in ["b", "aab", "abbb", "a", ""]:
        assert d.matches(s.encode()) == (
            re.fullmatch(r"a*?b+?", s) is not None
        ), s
    for pat in (r"\bfoo", r"a\Z", r"x\By"):
        with pytest.raises(GuidedError):
            compile_regex(pat)
    assert compile_regex(r"[\b]").matches(b"\x08")  # backspace inside class


def test_quantifier_bound_dos_rejected_fast():
    """Huge bounded quantifiers are rejected at parse/lowering time (the
    unauthenticated-DoS fix): no NFA is built, so the error is instant."""
    import time

    from gpt_oss_vllm_tpu.serving.guided import json_schema_to_regex

    t0 = time.monotonic()
    with pytest.raises(GuidedError):
        compile_regex("a{1,200000}")
    with pytest.raises(GuidedError):
        compile_regex("a{100000}")
    with pytest.raises(GuidedError):
        json_schema_to_regex({"type": "string", "maxLength": 200000})
    with pytest.raises(GuidedError):
        json_schema_to_regex(
            {"type": "array", "items": {"type": "integer"},
             "minItems": 100000}
        )
    # nested reps whose product explodes are caught by the NFA state cap
    with pytest.raises(GuidedError):
        compile_regex("((ab|cd){1000}){1000}")
    assert time.monotonic() - t0 < 30.0
    # in-bound quantifiers still compile
    assert compile_regex("a{1,64}").matches(b"a" * 64)


def test_negated_class_with_perl_classes_excludes_multibyte():
    """[^\\D] is digits ONLY (Python re semantics): the class body already
    covers all multi-byte UTF-8 via \\D, so the negation must not re-admit
    it."""
    d = compile_regex(r"[^\D]")
    assert d.matches(b"5")
    assert not d.matches("é".encode())
    assert not d.matches(b"x")
    assert re.fullmatch(r"[^\D]", "é") is None
    d = compile_regex(r"[^\W]+")
    assert d.matches(b"ab_9")
    assert not d.matches("aé".encode())
    d = compile_regex(r"[^\S]")
    assert d.matches(b" ") and not d.matches("é".encode())
    # plain negated classes still admit multi-byte
    assert compile_regex(r"[^a]").matches("é".encode())
    with pytest.raises(GuidedError):
        compile_regex(r"[^\d\D]")  # negation of everything matches nothing


# ---------------------------------------------------------------------------
# device-side harmony channel gate (zero-sync guided chat)
# ---------------------------------------------------------------------------


def test_final_channel_tables_name_semantics():
    """The device channel-name DFA matches the host gate rule
    name.strip().split()[:1] == ["final"] on ASCII names."""
    from gpt_oss_vllm_tpu.serving.guided import final_channel_tables

    trans, accept = final_channel_tables()

    def sel(name: bytes) -> bool:
        s = 0
        for b in name:
            s = int(trans[s, b])
        return bool(accept[s])

    for name in (b"final", b" final", b"final ", b"final json",
                 b"\tfinal\tx", b"  final  "):
        assert sel(name), name
        assert name.decode().strip().split()[:1] == ["final"]
    for name in (b"fin", b"finally", b"xfinal", b"",
                 b"commentary to=functions.f", b"analysis", b"f inal"):
        assert not sel(name), name
        assert name.decode().strip().split()[:1] != ["final"]


def test_session_device_gate_state_encoding():
    """GuidedSession.device_gate_state encodes the harmony gate exactly as
    the fused program chains it: -1 none, 0 ACTIVE, 1 FREE, 2+s collecting."""
    from gpt_oss_vllm_tpu.serving.guided import final_channel_tables

    tok = ByteTokenizer(harmony=True)
    g = compile_guided("choice", ["yes"], tok)
    trans, _ = final_channel_tables()
    s = g.new_session("harmony")
    assert s.device_gate_ok
    assert s.device_gate_state(trans) == 1  # FREE until a final channel
    s.advance(tok.special("channel"))
    assert s.device_gate_state(trans) == 2  # collecting, DFA start
    for t in tok.encode("fin"):
        s.advance(t)
    assert s.device_gate_state(trans) == 2 + 3  # mid-literal
    for t in tok.encode("al"):
        s.advance(t)
    s.advance(tok.special("message"))
    assert s.active and s.device_gate_state(trans) == 0
    s.advance(tok.special("end"))  # channel closed: back to free-form
    assert s.device_gate_state(trans) == 1
    assert g.new_session("none").device_gate_state(trans) == -1


def _scripted_params(cfg, transitions, seed=0, gain=12.0):
    """Params whose GREEDY next token follows ``transitions[last_token]``:
    attention and expert outputs are zeroed so the residual stream carries
    the last token's embedding; lm_head row v' accumulates the embeddings
    of every source token that scripts to v'. Lets engine tests choreograph
    harmony channel headers deterministically through the REAL model path."""
    import dataclasses as dc

    import jax.numpy as jnp

    from gpt_oss_vllm_tpu.config import QuantConfig
    from gpt_oss_vllm_tpu.models.params import random_params

    p = random_params(cfg, QuantConfig(method="none"), seed=seed)
    V, H = cfg.vocab_size, cfg.hidden_size
    rng = np.random.default_rng(seed)
    emb = rng.normal(0.0, 1.0 / np.sqrt(H), (V, H)).astype(np.float32)
    lm = np.zeros((V, H), np.float32)
    for cur, nxt in transitions.items():
        lm[nxt] += gain * emb[cur]
    dt = jnp.dtype(cfg.dtype)
    layers = [
        dc.replace(
            l,
            wo=jnp.zeros_like(l.wo),
            bo=None if l.bo is None else jnp.zeros_like(l.bo),
            w_down=jnp.zeros_like(l.w_down),
            b_down=None if l.b_down is None else jnp.zeros_like(l.b_down),
        )
        for l in p.layers
    ]
    return dc.replace(
        p,
        embedding=jnp.asarray(emb, dt),
        lm_head=jnp.asarray(lm, dt),
        layers=layers,
    )


def _harmony_engine_run(cfg, params, tok, g, script_prompt, async_decode,
                        max_tokens=24):
    import dataclasses

    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    c = dataclasses.replace(
        cfg,
        scheduler=dataclasses.replace(
            cfg.scheduler, async_decode=async_decode, async_depth=3,
            async_flush_burst=2,
        ),
    )
    eng = _make_engine(c, params)
    stops = tuple(dict.fromkeys(tuple(tok.stop_ids) + tuple(tok.chat_stop_ids)))
    eng.add_request(
        "h", script_prompt,
        SamplingParams(
            max_tokens=max_tokens, temperature=0.0, stop_token_ids=stops,
            guided=g, guided_gate="harmony",
        ),
    )
    toks = []
    max_pending = 0
    for _ in range(500):
        for o in eng.step():
            if o.token_id >= 0:
                toks.append(o.token_id)
        max_pending = max(max_pending, len(getattr(eng, "_pending", ())))
        if not eng.has_work():
            break
    return toks, max_pending, eng


def test_engine_harmony_gate_rides_async_chain(guided_setup):
    """A harmony-gated guided request rides the ZERO-SYNC chain end to end:
    the scripted model opens <|channel|>final<|message|>, the device gate
    activates the grammar exactly there, the constrained content is
    grammatical, byte parity vs the all-sync engine holds, and the async
    engine never takes a sync step (VERDICT r4 next #5)."""
    cfg, _params, _tok = guided_setup
    tok = ByteTokenizer(name="byte-harmony", harmony=True)
    ch, msg = tok.special("channel"), tok.special("message")
    ret = tok.special("return")
    f, i_, n, a, l = (ord(c) for c in "final")
    x, y, z = (ord(c) for c in "xyz")
    script = {80: ch, ch: f, f: i_, i_: n, n: a, a: l, l: msg,
              msg: x, x: y, y: z, z: ret}
    params = _scripted_params(cfg.model, script, seed=7)
    g = compile_guided("regex", r"[ab]{2,4}", tok)

    want, _, _ = _harmony_engine_run(cfg, params, tok, g, [80], False)
    got, max_pending, eng = _harmony_engine_run(cfg, params, tok, g, [80], True)
    assert got == want
    assert max_pending >= 2  # really pipelined
    assert eng.metrics.get("sync_steps", 0) == 0  # zero-sync the whole way
    # header emitted verbatim (gate FREE: the grammar must NOT mask it)
    assert got[:7] == [ch, f, i_, n, a, l, msg]
    # content after <|message|> is grammar-constrained until a stop
    stops = set(tok.stop_ids) | set(tok.chat_stop_ids)
    body = [t for t in got[7:] if t not in stops]
    assert re.fullmatch(r"[ab]{2,4}", tok.decode(body))
    # replay through the host session: the gate really activated
    s = g.new_session("harmony")
    seen_active = False
    for t in got:
        s.advance(t)
        seen_active = seen_active or s.active
    assert seen_active


def test_engine_harmony_gate_non_final_channel_stays_free(guided_setup):
    """A non-``final`` channel must stay unconstrained on the device chain:
    the scripted content violates the grammar and is emitted verbatim, with
    byte parity vs the sync engine."""
    cfg, _params, _tok = guided_setup
    tok = ByteTokenizer(name="byte-harmony", harmony=True)
    ch, msg = tok.special("channel"), tok.special("message")
    ret = tok.special("return")
    z = ord("z")
    c_, d, e = (ord(c) for c in "cde")
    script = {80: ch, ch: z, z: msg, msg: c_, c_: d, d: e, e: ret}
    params = _scripted_params(cfg.model, script, seed=9)
    g = compile_guided("regex", r"[ab]{2,4}", tok)

    want, _, _ = _harmony_engine_run(cfg, params, tok, g, [80], False)
    got, _, eng = _harmony_engine_run(cfg, params, tok, g, [80], True)
    assert got == want
    assert eng.metrics.get("sync_steps", 0) == 0
    # channel name "z" is not "final": content cde flows unmasked
    assert got == [ch, z, msg, c_, d, e, ret]


def test_engine_harmony_gate_composes_with_speculation(guided_setup):
    """A harmony-gated guided request SPECULATES on the zero-sync chain:
    the spec window program chains the channel gate along draft positions
    (a guided harmony chat no longer costs the batch its drafts). Scripted
    model opens <|channel|>final<|message|> then cycles 'xyxy...' — which
    the grammar permits and the n-gram drafter drafts — so acceptance is
    real; token parity vs the all-sync no-spec engine, drafts actually
    proposed and accepted, zero sync steps."""
    import dataclasses

    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    cfg, _params, _tok = guided_setup
    tok = ByteTokenizer(name="byte-harmony", harmony=True)
    ch, msg = tok.special("channel"), tok.special("message")
    f, i_, n, a, l = (ord(c) for c in "final")
    x, y = ord("x"), ord("y")
    script = {80: ch, ch: f, f: i_, i_: n, n: a, a: l, l: msg,
              msg: x, x: y, y: x}
    params = _scripted_params(cfg.model, script, seed=11)
    g = compile_guided("regex", r"(xy){1,40}", tok)
    stops = tuple(dict.fromkeys(tuple(tok.stop_ids) + tuple(tok.chat_stop_ids)))
    prompt = [80] * 16

    def run(spec_tokens, async_decode):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, async_decode=async_decode,
                spec_tokens=spec_tokens, async_depth=2, async_flush_burst=2,
            ),
        )
        eng = _make_engine(c, params)
        eng.add_request(
            "h", prompt,
            SamplingParams(
                max_tokens=31, temperature=0.0, stop_token_ids=stops,
                guided=g, guided_gate="harmony",
            ),
        )
        toks = []
        for _ in range(500):
            for o in eng.step():
                if o.token_id >= 0:
                    toks.append(o.token_id)
            if not eng.has_work():
                break
        return toks, eng

    want, _ = run(0, False)
    got, eng = run(3, True)
    assert got == want
    assert eng.metrics.get("sync_steps", 0) == 0
    assert eng.metrics.get("spec_proposed", 0) > 0
    assert eng.metrics.get("spec_accepted", 0) > 0
    # header verbatim, content grammatical
    assert got[:7] == [ch, f, i_, n, a, l, msg]
    body = tok.decode([t for t in got[7:] if t not in stops])
    assert re.fullmatch(r"(xy){1,40}|((xy)*x)", body)  # length-cut prefix ok


def test_final_channel_contract_host_device_parity():
    """is_final_channel_name (host) and final_channel_tables (device)
    decide identically — including Python-whitespace lookalikes
    (\\x1c, \\x85, \\xa0) that str.strip()/split() would treat as
    separators but the shared ASCII contract deliberately rejects."""
    from gpt_oss_vllm_tpu.serving.guided import (
        final_channel_tables,
        is_final_channel_name,
    )

    trans, accept = final_channel_tables()

    def dev(name: bytes) -> bool:
        s = 0
        for b in name:
            s = int(trans[s, b])
        return bool(accept[s])

    cases = [b"final", b" final", b"final ", b"final json", b"\tfinal",
             b"\tfinal\tx", b"fin", b"finally", b"xfinal", b"",
             b"\x1cfinal", b"final\x1c", b"\x85final",
             "\xa0final".encode(), b"f inal", b"  final  x"]
    for name in cases:
        host = is_final_channel_name(name.decode("utf-8", "replace"))
        assert host == dev(name), name


def test_session_gate_skips_byteless_specials_in_channel_name():
    """A byteless special buffered into a channel name contributes nothing
    on either side: the device walk holds (all-pad byte row) and the host
    decode now skips it — '<|channel|>final<|pad|><|message|>' activates
    consistently instead of diverging (review finding r5)."""
    from gpt_oss_vllm_tpu.serving.guided import final_channel_tables

    tok = ByteTokenizer(harmony=True)
    g = compile_guided("choice", ["ok"], tok)
    trans, _ = final_channel_tables()
    s = g.new_session("harmony")
    s.advance(tok.special("channel"))
    for t in tok.encode("final"):
        s.advance(t)
    s.advance(tok.special("pad"))  # byteless special mid-name
    assert s.device_gate_state(trans) == 2 + 5  # device holds at 'final'
    s.advance(tok.special("message"))
    assert s.active  # host skipped the special too: both sides ACTIVE
