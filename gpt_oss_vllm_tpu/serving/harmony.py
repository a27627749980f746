"""Incremental parser for GPT-OSS harmony channeled output.

A real GPT-OSS checkpoint generates CHANNELED messages after the
``<|start|>assistant`` prompt header::

    <|channel|>analysis<|message|>...chain of thought...<|end|>
    <|start|>assistant<|channel|>final<|message|>...user-visible reply...<|return|>

The reference serves this through vLLM's harmony-aware OpenAI server
(``/root/reference/patches/gpt_oss_server.py:64-67``); without parsing, chat
responses would interleave raw analysis text and channel markers into
``delta.content``. This parser consumes token ids incrementally (SSE-safe:
only complete UTF-8 is emitted) and routes each channel's body:

- ``final``  -> ``content`` (the OpenAI ``message.content`` field)
- everything else (``analysis``, ``commentary``, tool-recipient channels)
  -> ``reasoning`` (served as ``reasoning_content``, the de-facto
  OpenAI-extension field for chain-of-thought)

Lenient mode: a model that never emits a channel marker (tiny test models,
plain fine-tunes) streams everything to ``content`` unchanged.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from gpt_oss_vllm_tpu.serving.tokenizer import IncrementalDetokenizer, Tokenizer


class HarmonyStreamParser:
    """Feed token ids with :meth:`push`; get back ``[(dest, text_delta)]``
    where dest is ``"content"`` or ``"reasoning"``. Marker tokens are
    consumed, header/role tokens suppressed."""

    def __init__(self, tok: Tokenizer):
        self._tok = tok

        def _sid(name: str) -> Optional[int]:
            try:
                return tok.special(name)
            except (KeyError, AttributeError):
                return None

        self._id_start = _sid("start")
        self._id_channel = _sid("channel")
        self._id_message = _sid("message")
        self._id_end = _sid("end")
        self.harmony = bool(getattr(tok, "harmony", False)) and self._id_channel is not None
        # harmony: <|end|> is NOT a stream terminator (it closes one channel
        # message) — use the chat stop set (return/call/eos) instead
        base_stops = tok.chat_stop_ids if self.harmony else tok.stop_ids
        self._stops = set(base_stops) | {tok.eos_id}
        for name in ("return", "call"):
            sid = _sid(name)
            if sid is not None:
                self._stops.add(sid)
        if self.harmony:
            self._stops.discard(self._id_end)
        # states: body (emitting), header (consuming role tokens after
        # <|start|> / at generation start), channel (consuming channel name)
        self._state = "header" if self.harmony else "body"
        self._channel = "final" if not self.harmony else None
        self._name_ids: List[int] = []
        self._detok = IncrementalDetokenizer(tok)
        self._seen_marker = False
        self._seen_header_text = False
        self._tool_seg = -1  # index of the current tool-call segment
        # True when the LAST pushed token was body text of a content (final)
        # channel — the OpenAI chat-logprobs contract covers content tokens
        # only, and held-back partial-UTF8 tokens count even though their
        # delta is empty
        self.last_was_content = False

    @property
    def channel(self) -> str:
        return self._channel or "final"

    def _dest(self) -> str:
        """Routing for the current segment: ``content`` (final channel),
        ``tool:{seg}:{name}`` (commentary addressed to a function — the
        OpenAI tool_calls surface) or ``reasoning`` (analysis / plain
        commentary)."""
        ch = (self._channel or "final").strip()
        if ch.startswith("final"):
            return "content"
        if " to=functions." in f" {ch}" or ch.startswith("functions."):
            name = ch.split("functions.", 1)[1].split()[0].strip()
            return f"tool:{self._tool_seg}:{name}"
        return "reasoning"

    def push(self, token_id: int, final: bool = False) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = []
        self.last_was_content = False
        if token_id in self._stops:
            # <|return|>/<|call|>/eos terminate generation; drain held UTF-8
            tail = self._detok.flush() if self._state == "body" else ""
            if tail:
                out.append((self._dest(), tail))
            return out
        if self.harmony and token_id == self._id_channel:
            self._state = "channel"
            self._name_ids = []
            self._seen_marker = True
            return out
        if self.harmony and token_id == self._id_message:
            if self._state == "channel":
                self._channel = self._tok.decode(self._name_ids).strip() or "final"
            elif self._channel is None:
                self._channel = "final"  # channel-less message header
            if "functions." in (self._channel or ""):
                self._tool_seg += 1
            self._state = "body"
            self._detok = IncrementalDetokenizer(self._tok)
            self._seen_marker = True
            return out
        if self.harmony and token_id == self._id_end:
            # closes ONE channel message; the model continues with the next
            tail = self._detok.flush() if self._state == "body" else ""
            if tail:
                out.append((self._dest(), tail))
            self._state = "header"
            self._channel = None
            self._seen_marker = True
            return out
        if self.harmony and token_id == self._id_start:
            self._state = "header"
            self._seen_marker = True
            return out
        if self._state == "channel":
            self._name_ids.append(token_id)
            return out
        if self._state == "header":
            # Role text between <|start|> and the next marker — suppressed.
            # Lenient fallback: if NO marker has been seen yet (a model that
            # doesn't speak harmony at all), treat the stream as a plain
            # final body so text is not silently swallowed.
            if self._seen_marker:
                self._seen_header_text = True
                return out
            self._state = "body"
            self._channel = "final"
            # fall through: this token is body text
        self.last_was_content = self._dest() == "content"
        delta = self._detok.push(token_id, final=final)
        if delta:
            out.append((self._dest(), delta))
        return out

    def finish(self) -> List[Tuple[str, str]]:
        """Drain any held-back partial UTF-8 at stream end."""
        if self._state != "body":
            return []
        tail = self._detok.flush()
        return [(self._dest(), tail)] if tail else []
