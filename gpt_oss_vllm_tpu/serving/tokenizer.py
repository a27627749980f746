"""Tokenizer abstraction + harmony-style chat rendering.

GPT-OSS uses the o200k_harmony tiktoken encoding with role/channel special
tokens. Three backends:

- ``tiktoken:<encoding>`` — production (requires the BPE file, cached or
  fetchable);
- ``hf:<path>`` — a local HuggingFace tokenizer;
- ``byte`` — self-contained byte-level vocab (256 bytes + specials), no
  files needed: what tests and offline benches use.

Chat rendering follows the harmony message framing
(``<|start|>role<|message|>content<|end|>`` ... ``<|start|>assistant<|message|>``
with ``<|return|>`` as the generation stop). The reference delegates all of
this to vLLM's OpenAI server (``gpt_oss_server.py:64-67``); here it is
first-class and offline-testable.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence


class Tokenizer:
    """Uniform interface over the backends.

    ``harmony`` marks tokenizers whose chat stack speaks the full GPT-OSS
    channel protocol: assistant turns carry a ``<|channel|>`` header
    (``analysis`` for chain-of-thought, ``final`` for the user-visible
    reply, ``commentary`` for tool preambles) and generation stops at
    ``<|return|>``/``<|call|>``, NOT at ``<|end|>`` (which only closes one
    channeled message — the model continues into the next channel). The
    reference inherits this from vLLM's harmony-aware OpenAI server
    (``gpt_oss_server.py:64-67``); here rendering is first-class below and
    parsing lives in ``serving.harmony``."""

    name: str
    eos_id: int
    stop_ids: Sequence[int]
    harmony: bool = False

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    @property
    def vocab_size(self) -> int:
        raise NotImplementedError

    def token_bytes(self) -> List[Optional[bytes]]:
        """Per-id byte string of every vocab entry (``None`` for specials
        and other non-text ids). Drives grammar-constrained decoding
        (``serving.guided``): the byte-level DFA walks these to build the
        per-state allowed-token mask tables."""
        raise NotImplementedError

    # -- chat --------------------------------------------------------------

    def special(self, name: str) -> int:
        raise NotImplementedError

    @property
    def chat_stop_ids(self) -> Sequence[int]:
        """Stop ids for CHAT generation. Harmony: <|return|> (+ <|call|>)
        only — <|end|> merely closes one channel message and generation
        must continue into the next channel."""
        if not self.harmony:
            return self.stop_ids
        ids = [self.special("return"), self.eos_id]
        try:
            ids.append(self.special("call"))
        except KeyError:
            pass
        return tuple(dict.fromkeys(ids))

    def render_chat(
        self, messages: List[Dict[str, str]], tools: Optional[List[Dict]] = None
    ) -> List[int]:
        """Harmony message framing. Non-harmony (plain) tokenizers render
        ``<|start|>{role}<|message|>{content}<|end|>`` per message and open
        the assistant header THROUGH ``<|message|>`` (content follows
        directly). Harmony tokenizers render assistant history into the
        ``final`` channel and end the prompt at ``<|start|>assistant`` —
        the model itself emits ``<|channel|>analysis<|message|>...`` (the
        o200k_harmony generation contract).

        Tool calling (harmony only): ``tools`` render into a developer
        message's ``# Tools / namespace functions`` section; assistant
        history turns with ``tool_calls`` render as
        ``<|channel|>commentary to=functions.NAME<|message|>{args}<|call|>``
        and ``role == "tool"`` results come back as
        ``<|start|>functions.NAME to=assistant<|channel|>commentary``."""
        ids: List[int] = []
        # standard OpenAI clients send tool results with tool_call_id but no
        # name — resolve names from the prior assistant turn's tool_calls
        call_names: Dict[str, str] = {}
        for m in messages:
            for tc in m.get("tool_calls") or ():
                fn = tc.get("function", {}) or {}
                if tc.get("id") and fn.get("name"):
                    call_names[tc["id"]] = fn["name"]

        def msg(role: str, content: str, channel: Optional[str] = None,
                terminator: str = "end"):
            ids.append(self.special("start"))
            ids.extend(self.encode(role))
            if self.harmony and channel is not None:
                ids.append(self.special("channel"))
                ids.extend(self.encode(channel))
            ids.append(self.special("message"))
            ids.extend(self.encode(content))
            ids.append(self.special(terminator))

        if self.harmony and tools:
            lines = ["# Tools", "", "## functions", "", "namespace functions {", ""]
            import json as _json

            for t in tools:
                fn = t.get("function", t)
                if fn.get("description"):
                    lines.append(f"// {fn['description']}")
                params = fn.get("parameters")
                sig = _json.dumps(params) if params else "{}"
                lines.append(f"type {fn.get('name', 'tool')} = (_: {sig}) => any;")
                lines.append("")
            lines.append("} // namespace functions")
            msg("developer", "\n".join(lines))
        for m in messages:
            role = m.get("role", "user")
            content = m.get("content", "") or ""
            if self.harmony and role == "assistant" and m.get("tool_calls"):
                if content:
                    msg("assistant", content, channel="final")
                for tc in m["tool_calls"]:
                    fn = tc.get("function", {}) or {}
                    msg(
                        "assistant",
                        fn.get("arguments", "") or "",
                        channel=f"commentary to=functions.{fn.get('name', '')}",
                        terminator="call",
                    )
                continue
            if self.harmony and role == "tool":
                name = (
                    m.get("name")
                    or call_names.get(m.get("tool_call_id") or "")
                    or "tool"
                )
                msg(f"functions.{name} to=assistant", content, channel="commentary")
                continue
            msg(role, content, channel="final" if self.harmony and role == "assistant" else None)
        ids.append(self.special("start"))
        ids.extend(self.encode("assistant"))
        if not self.harmony:
            ids.append(self.special("message"))
        return ids


class ByteTokenizer(Tokenizer):
    """Byte-level vocab: ids 0-255 are raw bytes; specials follow.

    Self-contained (no downloads) and lossless on any UTF-8 text — the
    hermetic default for tests/benches in this egress-free environment.
    """

    SPECIALS = ("pad", "start", "message", "end", "return", "eos", "channel", "call")

    def __init__(self, name: str = "byte", harmony: bool = False):
        self.name = name
        self.harmony = harmony
        self._special_ids = {s: 256 + i for i, s in enumerate(self.SPECIALS)}
        self.eos_id = self._special_ids["eos"]
        self.stop_ids = (self._special_ids["return"], self._special_ids["end"], self.eos_id)

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.SPECIALS)

    def special(self, name: str) -> int:
        return self._special_ids[name]

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    def token_bytes(self) -> List[Optional[bytes]]:
        return [bytes([i]) for i in range(256)] + [None] * len(self.SPECIALS)


class TiktokenTokenizer(Tokenizer):
    _HARMONY_SPECIALS = {
        "start": "<|start|>",
        "message": "<|message|>",
        "end": "<|end|>",
        "return": "<|return|>",
        "channel": "<|channel|>",
        "call": "<|call|>",
    }

    def __init__(self, encoding: str):
        import tiktoken

        self.name = f"tiktoken:{encoding}"
        self._enc = tiktoken.get_encoding(encoding)
        specials = dict(self._enc._special_tokens)
        self._special_ids = {}
        for k, tok in self._HARMONY_SPECIALS.items():
            if tok in specials:
                self._special_ids[k] = specials[tok]
        # an encoding that ships <|channel|> (o200k_harmony) speaks the
        # full channel protocol
        self.harmony = "channel" in self._special_ids
        self.eos_id = self._special_ids.get("return", max(specials.values(), default=self._enc.n_vocab - 1))
        self.stop_ids = tuple(
            v for k, v in self._special_ids.items() if k in ("return", "end")
        ) or (self.eos_id,)

    @property
    def vocab_size(self) -> int:
        return self._enc.n_vocab

    def special(self, name: str) -> int:
        return self._special_ids[name]

    def encode(self, text: str) -> List[int]:
        return self._enc.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        return self._enc.decode(list(ids))

    def token_bytes(self) -> List[Optional[bytes]]:
        if getattr(self, "_token_bytes", None) is None:
            special = set(self._enc._special_tokens.values())
            out: List[Optional[bytes]] = [None] * self._enc.n_vocab
            for i in range(self._enc.n_vocab):
                if i in special:
                    continue
                try:
                    out[i] = self._enc.decode_single_token_bytes(i)
                except Exception:
                    out[i] = None  # unassigned id in a sparse vocab
            self._token_bytes = out
        return self._token_bytes


class HFTokenizer(Tokenizer):
    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.name = f"hf:{path}"
        self._tok = AutoTokenizer.from_pretrained(path)
        self.eos_id = self._tok.eos_token_id or 0
        self.stop_ids = (self.eos_id,)
        try:
            self.harmony = self.special("channel") >= 0
        except KeyError:
            self.harmony = False

    @property
    def vocab_size(self) -> int:
        return len(self._tok)

    def special(self, name: str) -> int:
        mapping = {
            "start": "<|start|>", "message": "<|message|>", "end": "<|end|>",
            "return": "<|return|>", "channel": "<|channel|>", "call": "<|call|>",
        }
        tid = self._tok.convert_tokens_to_ids(mapping[name])
        # many HF fast tokenizers return unk_token_id (not None) for unknown
        # tokens — treating unk as a real special would flip a non-harmony
        # tokenizer into harmony mode and corrupt every chat prompt
        if tid is None or tid < 0 or tid == getattr(self._tok, "unk_token_id", None):
            raise KeyError(name)
        return tid

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)

    def token_bytes(self) -> List[Optional[bytes]]:
        """Best-effort per-token bytes: byte-level-BPE vocabs map through
        the GPT-2 unicode<->byte table; SentencePiece vocabs map the U+2581
        word-boundary marker to a leading space. Specials and unmappable
        tokens return None (the grammar never allows them)."""
        if getattr(self, "_token_bytes", None) is None:
            from transformers.models.gpt2.tokenization_gpt2 import (
                bytes_to_unicode,
            )

            u2b = {u: b for b, u in bytes_to_unicode().items()}
            special = set(self._tok.all_special_ids or [])
            added = getattr(self._tok, "added_tokens_decoder", {}) or {}
            special |= set(added.keys())
            V = len(self._tok)
            toks = self._tok.convert_ids_to_tokens(list(range(V)))
            out: List[Optional[bytes]] = [None] * V
            byte_level_hits = sum(
                1 for t in toks[:256] if t and all(c in u2b for c in t)
            )
            byte_level = byte_level_hits > 128
            for i, t in enumerate(toks):
                if t is None or i in special:
                    continue
                if byte_level:
                    try:
                        out[i] = bytes(u2b[c] for c in t)
                    except KeyError:
                        out[i] = None
                else:
                    out[i] = t.replace("▁", " ").encode("utf-8")
            self._token_bytes = out
        return self._token_bytes


def get_tokenizer(spec: str) -> Tokenizer:
    if spec == "byte" or spec == "test":
        return ByteTokenizer()
    if spec == "byte-harmony":
        # byte backend speaking the full channel protocol: what harmony
        # chat tests use in this egress-free environment
        return ByteTokenizer(name="byte-harmony", harmony=True)
    if spec.startswith("hf:"):
        return HFTokenizer(spec[3:])
    if spec.startswith("tiktoken:"):
        return TiktokenTokenizer(spec.removeprefix("tiktoken:"))
    # bare names: try tiktoken, fall back to byte (offline environments)
    try:
        return TiktokenTokenizer(spec)
    except Exception:
        return ByteTokenizer(name=f"byte(fallback:{spec})")


class IncrementalDetokenizer:
    """Streaming-safe detokenization: emits only complete UTF-8 text deltas.

    Re-decodes the full output each call and diff-emits; replacement chars at
    the tail are held back until the sequence completes (partial multi-byte
    codepoints mid-stream)."""

    def __init__(self, tok: Tokenizer):
        self._tok = tok
        self._ids: List[int] = []
        self._emitted = 0

    def push(self, token_id: int, final: bool = False) -> str:
        self._ids.append(token_id)
        text = self._tok.decode(self._ids)
        if not final and text.endswith("�"):
            return ""
        delta = text[self._emitted :]
        self._emitted = len(text)
        return delta

    def flush(self) -> str:
        """Drain text held back as a possibly-partial multi-byte codepoint
        (segment/stream end: nothing more is coming)."""
        text = self._tok.decode(self._ids)
        delta = text[self._emitted :]
        self._emitted = len(text)
        return delta
