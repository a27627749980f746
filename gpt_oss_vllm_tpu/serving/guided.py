"""Grammar-constrained decoding (structured outputs).

Implements the OpenAI ``response_format`` surface (``json_object`` /
``json_schema``) plus vLLM's ``guided_json`` / ``guided_regex`` /
``guided_choice`` extensions. The reference inherits structured outputs
from vLLM's OpenAI server (``/root/reference/patches/gpt_oss_server.py:64-67``
delegates to ``vllm.entrypoints.openai.api_server``, whose protocol accepts
``response_format`` and the ``guided_*`` params); here the whole pipeline is
first-class and TPU-shaped:

- grammars compile to a **byte-level DFA** (regex subset -> Thompson NFA ->
  subset construction), so constraints are tokenizer-independent;
- per (grammar, tokenizer) a vectorized numpy walk precomputes a
  ``[num_states, vocab]`` allowed-token mask table ONCE (each vocab token's
  byte string is pushed through the DFA from every state simultaneously);
  decoding then just gathers a mask row per step — no per-step trie walks;
- JSON schemas lower to regexes (the Outlines construction): a *specific*
  schema has finite structure, so a regular grammar is exact for the
  supported subset (no recursive ``$ref``);
- schemaless ``json_object`` uses a bounded-nesting JSON grammar.

Masks are applied to logits before sampling. On the zero-sync device
decode chain the per-request DFA state lives ON DEVICE: the engine gathers
a packed mask row per step and advances the state with a DFA byte-walk over
the emitted token's bytes (``TokenTable.byte_matrix``), so guided rows ride
the fused chain with no host round-trip. The harmony gate — on channeled
(GPT-OSS) chat the constraint activates only inside the ``final`` channel's
message, so analysis/commentary channels stay free-form — ALSO runs on
device: the fused program tracks a per-row gate state over the harmony
special ids and walks channel names through the ``final_channel_tables``
byte-DFA, so harmony-gated guided chat keeps the zero-sync chain too. The
host-side ``GuidedSession.advance`` mirrors both walks for the sync path
(tool-choice rows, min_tokens rows) and re-seeds the device state on chain
rebuilds.
"""

from __future__ import annotations

import json
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "GuidedGrammar",
    "GuidedSession",
    "ToolChoiceGrammar",
    "ToolChoiceSession",
    "compile_guided",
    "compile_tool_choice",
    "final_channel_tables",
    "json_schema_to_regex",
    "GuidedError",
]


class GuidedError(ValueError):
    """Unsupported or invalid grammar spec (surfaced as HTTP 400)."""


# ---------------------------------------------------------------------------
# Regex subset -> byte-level NFA
#
# AST nodes (tuples):
#   ("lit", bytes)            literal byte sequence
#   ("set", bitmask_int)      one byte from a 256-bit set
#   ("anymb",)                any UTF-8 multi-byte sequence (2-4 bytes)
#   ("cat", [nodes])
#   ("alt", [nodes])
#   ("rep", node, min, max)   max=None => unbounded
# ---------------------------------------------------------------------------

_ALL_BYTES = (1 << 256) - 1

# Compile-cost guards: bounded quantifiers expand by literal NFA duplication,
# so an unauthenticated request with {1,200000} (or an equivalent schema
# maxLength/maxItems) would build hundreds of thousands of NFA states and pin
# a core in subset construction long before MAX_DFA_STATES fires. Reject at
# parse time instead; the NFA state cap catches nested-rep products
# ((a{1000}){1000}) that per-rep caps alone would miss.
MAX_REP_BOUND = 4096
MAX_NFA_STATES = 200_000


def _mask_of(bs: Sequence[int]) -> int:
    m = 0
    for b in bs:
        m |= 1 << b
    return m


def _mask_range(lo: int, hi: int) -> int:
    return ((1 << (hi + 1)) - 1) ^ ((1 << lo) - 1)


_D_MASK = _mask_of(range(0x30, 0x3A))
_W_MASK = (
    _mask_of(range(0x30, 0x3A))
    | _mask_of(range(0x41, 0x5B))
    | _mask_of(range(0x61, 0x7B))
    | (1 << 0x5F)
)
_S_MASK = _mask_of(b" \t\n\r\f\v")
_ASCII_MASK = (1 << 128) - 1

# UTF-8 multi-byte sequence byte sets (RFC 3629 well-formed ranges,
# conservative: C2-DF | E0-EF | F0-F4 lead bytes, 80-BF continuations)
_CONT = _mask_range(0x80, 0xBF)
_LEAD2 = _mask_range(0xC2, 0xDF)
_LEAD3 = _mask_range(0xE0, 0xEF)
_LEAD4 = _mask_range(0xF0, 0xF4)


class _Parser:
    """Recursive-descent parser for the supported regex subset:
    literals, escapes, ``.``, classes ``[...]`` (ASCII members), groups
    (capturing and ``(?:``), ``|``, and quantifiers ``* + ? {m} {m,} {m,n}``.
    Patterns are implicitly anchored (fullmatch semantics)."""

    def __init__(self, pat: str):
        self.p = pat
        self.i = 0

    def error(self, msg: str):
        raise GuidedError(f"regex: {msg} at {self.i} in {self.p!r}")

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.alt()
        if self.i != len(self.p):
            self.error("unbalanced ')'")
        return node

    def alt(self):
        branches = [self.cat()]
        while self.peek() == "|":
            self.next()
            branches.append(self.cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def cat(self):
        parts = []
        while True:
            c = self.peek()
            if c is None or c in "|)":
                break
            parts.append(self.repeat())
        if not parts:
            return ("lit", b"")
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def repeat(self):
        node = self.atom()
        c = self.peek()
        if c == "*":
            self.next()
            node = ("rep", node, 0, None)
        elif c == "+":
            self.next()
            node = ("rep", node, 1, None)
        elif c == "?":
            self.next()
            node = ("rep", node, 0, 1)
        elif c == "{":
            save = self.i
            self.next()
            digits = ""
            while self.peek() and self.peek().isdigit():
                digits += self.next()
            if not digits:
                self.i = save  # literal '{'
                return node
            lo = int(digits)
            hi = lo
            if self.peek() == ",":
                self.next()
                digits = ""
                while self.peek() and self.peek().isdigit():
                    digits += self.next()
                hi = int(digits) if digits else None
            if self.peek() != "}":
                self.i = save
                return node
            self.next()
            if hi is not None and hi < lo:
                self.error("bad {m,n}")
            if lo > MAX_REP_BOUND or (hi is not None and hi > MAX_REP_BOUND):
                raise GuidedError(
                    f"quantifier bound > {MAX_REP_BOUND} unsupported "
                    f"(got {{{lo},{hi if hi is not None else ''}}})"
                )
            node = ("rep", node, lo, hi)
        # lazy-quantifier marker: a*? matches the same LANGUAGE as a*
        # (laziness affects capture order, not membership) — accept+ignore
        if (
            isinstance(node, tuple) and node[0] == "rep" and c is not None
            and self.peek() == "?"
        ):
            self.next()
        # reject double quantifiers like a** (ambiguous, unsupported)
        if self.peek() in ("*", "+") and isinstance(node, tuple) and node[0] == "rep":
            self.error("double quantifier")
        return node

    def atom(self):
        c = self.next()
        if c == "(":
            if self.peek() == "?":
                self.next()
                k = self.peek()
                if k == ":":
                    self.next()
                else:
                    self.error(f"unsupported group (?{k}")
            node = self.alt()
            if self.peek() != ")":
                self.error("missing ')'")
            self.next()
            return node
        if c == "[":
            return self.char_class()
        if c == ".":
            # any char except newline: ASCII minus \n, or multi-byte UTF-8
            return ("alt", [("set", _ASCII_MASK & ~(1 << 0x0A)), ("anymb",)])
        if c == "\\":
            return self.escape(in_class=False)
        if c in "^$":
            # anchors are no-ops under fullmatch semantics (every pattern
            # is implicitly anchored); mid-pattern anchors are degenerate
            # either way, so epsilon keeps schema "pattern" fields working
            return ("lit", b"")
        if c in "*+?{":
            self.error(f"dangling quantifier {c!r}")
        if c in ")|":  # unreachable via cat(), defensive
            self.error(f"unexpected {c!r}")
        return self.literal_char(c)

    def literal_char(self, c: str):
        b = c.encode("utf-8")
        return ("lit", b)

    def escape(self, in_class: bool):
        if self.peek() is None:
            self.error("trailing backslash")
        c = self.next()
        simple = {
            "n": b"\n", "t": b"\t", "r": b"\r", "f": b"\f", "v": b"\v",
            "0": b"\0", "a": b"\a", "b": b"\b" if in_class else None,
        }
        if c in simple and simple[c] is not None:
            return ("lit", simple[c])
        if c in "bBAZ" and not in_class:
            # zero-width assertions have no DFA byte realization; rejecting
            # beats silently matching a literal letter
            self.error(f"unsupported assertion \\{c}")
        if c == "d":
            return ("set", _D_MASK)
        if c == "D":
            return ("alt", [("set", _ASCII_MASK & ~_D_MASK), ("anymb",)])
        if c == "w":
            return ("set", _W_MASK)
        if c == "W":
            return ("alt", [("set", _ASCII_MASK & ~_W_MASK), ("anymb",)])
        if c == "s":
            return ("set", _S_MASK)
        if c == "S":
            return ("alt", [("set", _ASCII_MASK & ~_S_MASK), ("anymb",)])
        if c == "x":
            h = self.p[self.i : self.i + 2]
            if len(h) != 2:
                self.error("bad \\x")
            self.i += 2
            return ("lit", bytes([int(h, 16)]))
        if c == "u":
            h = self.p[self.i : self.i + 4]
            if len(h) != 4:
                self.error("bad \\u")
            self.i += 4
            return ("lit", chr(int(h, 16)).encode("utf-8"))
        # punctuation / metacharacter escape
        return ("lit", c.encode("utf-8"))

    def char_class(self):
        neg = False
        if self.peek() == "^":
            self.next()
            neg = True
        mask = 0
        extra_lits: List[tuple] = []  # non-ASCII members (positive classes)
        covers_mb = False  # class body already covers multi-byte UTF-8
        first = True
        while True:
            c = self.peek()
            if c is None:
                self.error("missing ']'")
            if c == "]" and not first:
                self.next()
                break
            first = False
            c = self.next()
            if c == "\\":
                node = self.escape(in_class=True)
                if node[0] == "set":
                    mask |= node[1]
                    continue
                if node[0] == "alt":  # \D \W \S inside a class
                    for sub in node[1]:
                        if sub[0] == "set":
                            mask |= sub[1]
                    # the class body itself covers all multi-byte chars; a
                    # NEGATED class must then exclude them (``[^\D]`` is
                    # digits only), so record coverage instead of relying on
                    # the unconditional anymb append below
                    covers_mb = True
                    if not neg:
                        extra_lits.append(("anymb",))
                    continue
                lit = node[1]
                if len(lit) == 1:
                    c_ord = lit[0]
                else:
                    if neg:
                        raise GuidedError(
                            "non-ASCII char in negated class unsupported"
                        )
                    extra_lits.append(("lit", lit))
                    continue
            else:
                enc = c.encode("utf-8")
                if len(enc) > 1:
                    if neg:
                        raise GuidedError(
                            "non-ASCII char in negated class unsupported"
                        )
                    extra_lits.append(("lit", enc))
                    continue
                c_ord = enc[0]
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.next()
                c2 = self.next()
                if c2 == "\\":
                    node = self.escape(in_class=True)
                    if node[0] != "lit" or len(node[1]) != 1:
                        self.error("bad range end")
                    hi_ord = node[1][0]
                else:
                    enc2 = c2.encode("utf-8")
                    if len(enc2) > 1:
                        raise GuidedError("non-ASCII range unsupported")
                    hi_ord = enc2[0]
                if hi_ord < c_ord:
                    self.error("reversed range")
                mask |= _mask_range(c_ord, hi_ord)
            else:
                mask |= 1 << c_ord
        if neg:
            # complement within ASCII; a multi-byte char matches a negated
            # class only when the class body did NOT already cover all
            # multi-byte chars (via \D/\W/\S)
            inv = _ASCII_MASK & ~mask
            if covers_mb:
                if not inv:
                    self.error("negated class matches nothing")
                return ("set", inv)
            return ("alt", [("set", inv), ("anymb",)])
        branches = []
        if mask:
            branches.append(("set", mask))
        branches.extend(extra_lits)
        if not branches:
            self.error("empty class")
        return branches[0] if len(branches) == 1 else ("alt", branches)


class _NFA:
    """Thompson NFA: states with epsilon edges and byte-set edges."""

    def __init__(self):
        self.eps: List[List[int]] = []
        self.edges: List[List[Tuple[int, int]]] = []  # (byte bitmask, target)

    def new_state(self) -> int:
        if len(self.eps) >= MAX_NFA_STATES:
            raise GuidedError(
                f"grammar too large (> {MAX_NFA_STATES} NFA states)"
            )
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def add_eps(self, a: int, b: int):
        self.eps[a].append(b)

    def add_edge(self, a: int, mask: int, b: int):
        if mask:
            self.edges[a].append((mask, b))

    # compile an AST node; returns (start, accept)
    def compile(self, node) -> Tuple[int, int]:
        kind = node[0]
        if kind == "lit":
            s = self.new_state()
            cur = s
            for b in node[1]:
                nxt = self.new_state()
                self.add_edge(cur, 1 << b, nxt)
                cur = nxt
            return s, cur
        if kind == "set":
            s, a = self.new_state(), self.new_state()
            self.add_edge(s, node[1], a)
            return s, a
        if kind == "anymb":
            s, a = self.new_state(), self.new_state()
            # 2-byte
            m1 = self.new_state()
            self.add_edge(s, _LEAD2, m1)
            self.add_edge(m1, _CONT, a)
            # 3-byte
            m2, m3 = self.new_state(), self.new_state()
            self.add_edge(s, _LEAD3, m2)
            self.add_edge(m2, _CONT, m3)
            self.add_edge(m3, _CONT, a)
            # 4-byte
            m4, m5, m6 = (self.new_state() for _ in range(3))
            self.add_edge(s, _LEAD4, m4)
            self.add_edge(m4, _CONT, m5)
            self.add_edge(m5, _CONT, m6)
            self.add_edge(m6, _CONT, a)
            return s, a
        if kind == "cat":
            s = a = None
            for sub in node[1]:
                ss, sa = self.compile(sub)
                if s is None:
                    s, a = ss, sa
                else:
                    self.add_eps(a, ss)
                    a = sa
            if s is None:
                s = a = self.new_state()
            return s, a
        if kind == "alt":
            s, a = self.new_state(), self.new_state()
            for sub in node[1]:
                ss, sa = self.compile(sub)
                self.add_eps(s, ss)
                self.add_eps(sa, a)
            return s, a
        if kind == "rep":
            _, sub, lo, hi = node
            s = a = None

            def attach(ss, sa):
                nonlocal s, a
                if s is None:
                    s, a = ss, sa
                else:
                    self.add_eps(a, ss)
                    a = sa

            for _ in range(lo):
                attach(*self.compile(sub))
            if hi is None:
                ss, sa = self.compile(sub)
                loop_in, loop_out = self.new_state(), self.new_state()
                self.add_eps(loop_in, ss)
                self.add_eps(sa, loop_in)
                self.add_eps(loop_in, loop_out)
                attach(loop_in, loop_out)
            else:
                for _ in range(hi - lo):
                    ss, sa = self.compile(sub)
                    skip_in, skip_out = self.new_state(), self.new_state()
                    self.add_eps(skip_in, ss)
                    self.add_eps(sa, skip_out)
                    self.add_eps(skip_in, skip_out)
                    attach(skip_in, skip_out)
            if s is None:
                s = a = self.new_state()
            return s, a
        raise GuidedError(f"internal: unknown AST node {kind}")


MAX_DFA_STATES = 20000


class DFA:
    """Byte-level DFA. ``trans`` is ``[S, 256] int32`` (``dead`` absorbing),
    ``accepting`` ``[S] bool``. State 0 is the start state by construction."""

    def __init__(self, trans: np.ndarray, accepting: np.ndarray, dead: int):
        self.trans = trans
        self.accepting = accepting
        self.dead = dead

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]

    def matches(self, data: bytes) -> bool:
        s = 0
        for b in data:
            s = int(self.trans[s, b])
            if s == self.dead:
                return False
        return bool(self.accepting[s])

    # viable = some path to an accepting state exists (non-dead by
    # construction after pruning, but keep for safety)
    def walk(self, s: int, data: bytes) -> int:
        for b in data:
            s = int(self.trans[s, b])
            if s == self.dead:
                return s
        return s


def _nfa_to_dfa(nfa: _NFA, start: int, accept: int) -> DFA:
    nloc = len(nfa.eps)

    # epsilon closures (iterative DFS per state, memoized)
    closures: List[Optional[frozenset]] = [None] * nloc

    def closure(seed: frozenset) -> frozenset:
        out = set(seed)
        stack = list(seed)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)

    start_set = closure(frozenset([start]))
    ids: Dict[frozenset, int] = {start_set: 0}
    order = [start_set]
    trans_rows: List[np.ndarray] = []
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        # targets[b] = set of NFA states reachable on byte b
        targets: List[set] = [set() for _ in range(256)]
        for s in cur:
            for mask, t in nfa.edges[s]:
                if mask == _ALL_BYTES:
                    for b in range(256):
                        targets[b].add(t)
                    continue
                m = mask
                while m:
                    b = (m & -m).bit_length() - 1
                    targets[b].add(t)
                    m &= m - 1
        row = np.empty(256, np.int32)
        cache: Dict[frozenset, int] = {}
        for b in range(256):
            tgt = frozenset(targets[b])
            if not tgt:
                row[b] = -1
                continue
            tid = cache.get(tgt)
            if tid is None:
                cset = closure(tgt)
                tid = ids.get(cset)
                if tid is None:
                    tid = len(order)
                    if tid >= MAX_DFA_STATES:
                        raise GuidedError(
                            f"grammar too large (> {MAX_DFA_STATES} DFA states)"
                        )
                    ids[cset] = tid
                    order.append(cset)
                cache[tgt] = tid
            row[b] = tid
        trans_rows.append(row)
    S = len(order)
    dead = S
    trans = np.vstack(trans_rows + [np.full((1, 256), dead, np.int32)])
    trans[trans == -1] = dead
    accepting = np.zeros(S + 1, bool)
    for st, sid in ids.items():
        if accept in st:
            accepting[sid] = True

    # prune states that cannot reach acceptance (they are semantically dead:
    # masking must not allow tokens that lead into them)
    reach = accepting.copy()
    changed = True
    while changed:
        changed = False
        can = reach[trans].any(axis=1)
        new = reach | can
        new[dead] = False
        if (new != reach).any():
            reach = new
            changed = True
    reach[dead] = False
    if not reach[0]:
        raise GuidedError("grammar matches nothing")
    trans = np.where(reach[trans], trans, dead).astype(np.int32)
    return DFA(trans, accepting, dead)


def _minimize(dfa: DFA) -> DFA:
    """Moore partition refinement (numpy-vectorized): the regex lowering of
    a nested JSON grammar duplicates whole sub-expressions (the bounded-depth
    construction), so the raw subset-construction DFA carries many
    equivalent states — minimization shrinks it ~5-10x, which bounds the
    [states, vocab] token-mask table a 200k-vocab tokenizer builds."""
    S = dfa.num_states
    # initial partition: accepting / non-accepting / dead
    labels = dfa.accepting.astype(np.int64).copy()
    labels[dfa.dead] = 2
    while True:
        # exact signature = (own label | labels of the 256 successors):
        # np.unique over rows splits classes with any distinguishable byte
        sig = np.concatenate(
            [labels[:, None], labels[dfa.trans]], axis=1
        )  # [S, 257]
        _, new = np.unique(sig, axis=0, return_inverse=True)
        if len(np.unique(new)) == len(np.unique(labels)):
            break
        labels = new.astype(np.int64)
    # canonicalize: state 0 keeps id 0, dead gets its own id
    n_classes = int(labels.max()) + 1
    remap = np.full(n_classes, -1, np.int64)
    order = [int(labels[0])]
    seen = {int(labels[0])}
    for s in range(S):
        c = int(labels[s])
        if c not in seen:
            seen.add(c)
            order.append(c)
    for i, c in enumerate(order):
        remap[c] = i
    new_of = remap[labels]  # [S]
    S2 = len(order)
    trans2 = np.empty((S2, 256), np.int32)
    accepting2 = np.zeros(S2, bool)
    rep_of = np.full(S2, -1, np.int64)
    for s in range(S):
        ns = int(new_of[s])
        if rep_of[ns] < 0:
            rep_of[ns] = s
            accepting2[ns] = bool(dfa.accepting[s])
    trans2 = new_of[dfa.trans[rep_of]].astype(np.int32)
    return DFA(trans2, accepting2, int(new_of[dfa.dead]))


def compile_regex(pattern: str) -> DFA:
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    s, a = nfa.compile(ast)
    return _minimize(_nfa_to_dfa(nfa, s, a))


# ---------------------------------------------------------------------------
# JSON schema -> regex (the Outlines lowering: a specific schema has finite
# structure, so its language is regular for this subset)
# ---------------------------------------------------------------------------

_WS = "[ \\n\\t]{0,2}"  # bounded whitespace keeps the DFA small
_STR_CHAR = '([^"\\\\\\x00-\\x1f]|\\\\["\\\\/bfnrt]|\\\\u[0-9a-fA-F]{4})'
_STRING_RE = f'"{_STR_CHAR}*"'
_INT_RE = "-?(0|[1-9]\\d*)"
_NUM_RE = "-?(0|[1-9]\\d*)(\\.\\d+)?([eE][+-]?\\d+)?"
_BOOL_RE = "(true|false)"
_NULL_RE = "null"


def _regex_escape(text: str) -> str:
    out = []
    for c in text:
        if c in "\\^$.|?*+()[]{}":
            out.append("\\" + c)
        elif c == "\n":
            out.append("\\n")
        elif c == "\t":
            out.append("\\t")
        elif c == "\r":
            out.append("\\r")
        else:
            out.append(c)
    return "".join(out)


def _json_literal_regex(value) -> str:
    return _regex_escape(json.dumps(value, ensure_ascii=False))


def json_schema_to_regex(schema, depth: int = 0) -> str:
    """Lower a JSON-schema subset to a regex over the serialized document.

    Supported: type object (properties in declared order; all properties are
    required, the OpenAI ``strict`` semantics), string (+ enum/const/
    minLength/maxLength/pattern), integer/number (+ minimum is ignored),
    boolean, null, array (+ items/minItems/maxItems), enum, const, anyOf/
    oneOf, and non-recursive local ``$ref``. Unsupported constructs raise
    ``GuidedError`` (HTTP 400), never silently mis-constrain.
    """
    if depth > 32:
        raise GuidedError("schema nesting too deep (recursive $ref?)")
    if schema is True or schema == {}:
        return _json_value_regex(3)
    if not isinstance(schema, dict):
        raise GuidedError(f"unsupported schema: {schema!r}")
    if "$ref" in schema:
        raise GuidedError("$ref must be resolved before lowering")
    if "enum" in schema:
        return "(" + "|".join(_json_literal_regex(v) for v in schema["enum"]) + ")"
    if "const" in schema:
        return _json_literal_regex(schema["const"])
    for comb in ("anyOf", "oneOf"):
        if comb in schema:
            return (
                "("
                + "|".join(
                    json_schema_to_regex(s, depth + 1) for s in schema[comb]
                )
                + ")"
            )
    t = schema.get("type")
    if isinstance(t, list):
        return (
            "("
            + "|".join(
                json_schema_to_regex({**schema, "type": one}, depth + 1)
                for one in t
            )
            + ")"
        )
    if t == "string":
        if "pattern" in schema:
            # the schema's pattern constrains the *content*; our subset
            # compiles it directly inside the quotes
            return f'"({schema["pattern"]})"'
        lo = schema.get("minLength")
        hi = schema.get("maxLength")
        if lo is not None or hi is not None:
            lo = int(lo or 0)
            if lo > MAX_REP_BOUND or (hi is not None and int(hi) > MAX_REP_BOUND):
                raise GuidedError(
                    f"minLength/maxLength > {MAX_REP_BOUND} unsupported"
                )
            rep = f"{{{lo},{int(hi)}}}" if hi is not None else f"{{{lo},}}"
            return f'"{_STR_CHAR}{rep}"'
        return _STRING_RE
    if t == "integer":
        return _INT_RE
    if t == "number":
        return _NUM_RE
    if t == "boolean":
        return _BOOL_RE
    if t == "null":
        return _NULL_RE
    if t == "array":
        item = json_schema_to_regex(schema.get("items", True), depth + 1)
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        if lo > MAX_REP_BOUND or (hi is not None and int(hi) > MAX_REP_BOUND):
            raise GuidedError(
                f"minItems/maxItems > {MAX_REP_BOUND} unsupported"
            )
        first = f"{_WS}{item}"
        more = f"{_WS},{_WS}{item}"
        if hi is not None:
            hi = int(hi)
            if hi < lo:
                raise GuidedError("maxItems < minItems")
            if hi == 0:
                return f"\\[{_WS}\\]"
            body = f"{first}({more}){{{max(lo - 1, 0)},{hi - 1}}}{_WS}"
            if lo == 0:
                return f"\\[({_WS}|{body})\\]"
            return f"\\[{body}\\]"
        body = f"{first}({more}){{{max(lo - 1, 0)},}}{_WS}"
        if lo == 0:
            return f"\\[({_WS}|{body})\\]"
        return f"\\[{body}\\]"
    if t == "object" or (t is None and "properties" in schema):
        props = schema.get("properties", {})
        if not props:
            # free-form object: bounded-depth generic JSON object
            return _json_object_regex(3)
        parts = []
        for i, (name, sub) in enumerate(props.items()):
            key = _json_literal_regex(name)
            val = json_schema_to_regex(sub, depth + 1)
            sep = f",{_WS}" if i else ""
            parts.append(f"{sep}{key}{_WS}:{_WS}{val}")
        inner = "".join(parts)
        return f"\\{{{_WS}{inner}{_WS}\\}}"
    raise GuidedError(f"unsupported schema type: {t!r}")


def _json_value_regex(depth: int) -> str:
    """Generic JSON value with nesting bounded at ``depth`` levels."""
    scalar = f"({_STRING_RE}|{_NUM_RE}|{_BOOL_RE}|{_NULL_RE})"
    v = scalar
    for _ in range(depth):
        obj = (
            f"\\{{({_WS}|{_WS}{_STRING_RE}{_WS}:{_WS}{v}"
            f"({_WS},{_WS}{_STRING_RE}{_WS}:{_WS}{v})*{_WS})\\}}"
        )
        arr = f"\\[({_WS}|{_WS}{v}({_WS},{_WS}{v})*{_WS})\\]"
        v = f"({scalar}|{obj}|{arr})"
    return v


def _json_object_regex(depth: int) -> str:
    v = _json_value_regex(depth)
    return (
        f"\\{{({_WS}|{_WS}{_STRING_RE}{_WS}:{_WS}{v}"
        f"({_WS},{_WS}{_STRING_RE}{_WS}:{_WS}{v})*{_WS})\\}}"
    )


def _resolve_refs(schema, root, depth: int = 0):
    """Inline local ``$ref`` (#/...) with a depth cap (recursion raises)."""
    if depth > 16:
        raise GuidedError("recursive $ref unsupported")
    if isinstance(schema, dict):
        if "$ref" in schema:
            ref = schema["$ref"]
            if not ref.startswith("#/"):
                raise GuidedError(f"external $ref unsupported: {ref}")
            node = root
            for part in ref[2:].split("/"):
                part = part.replace("~1", "/").replace("~0", "~")
                if not isinstance(node, dict) or part not in node:
                    raise GuidedError(f"bad $ref: {ref}")
                node = node[part]
            return _resolve_refs(node, root, depth + 1)
        return {
            k: _resolve_refs(v, root, depth + 1) if k != "enum" else v
            for k, v in schema.items()
        }
    if isinstance(schema, list):
        return [_resolve_refs(s, root, depth + 1) for s in schema]
    return schema


# ---------------------------------------------------------------------------
# Token mask tables: DFA x tokenizer vocab -> [S, V] allowed + token-level
# transitions, built once per (grammar, tokenizer) with a vectorized walk
# ---------------------------------------------------------------------------


def _token_byte_matrix(token_bytes: List[Optional[bytes]], V: int):
    lens = np.array(
        [len(b) if b else 0 for b in token_bytes], np.int32
    )
    Lmax = max(1, int(lens.max()) if len(lens) else 1)
    mat = np.full((V, Lmax), 256, np.int16)  # 256 = pad column
    for v, b in enumerate(token_bytes):
        if b:
            mat[v, : len(b)] = np.frombuffer(b, np.uint8)
    return mat, lens


class TokenTable:
    """Precomputed per-state allowed-token masks for one (DFA, vocab).

    A token is allowed at state ``s`` iff pushing its bytes from ``s`` stays
    out of the dead state (non-coaccessible states were pruned, so staying
    alive == a completion remains reachable). Stop/EOS ids are allowed
    exactly in accepting states.

    Storage is **bit-packed** (``[S, ceil(V/8)] uint8``): at a 200k vocab a
    dense bool would cost V bytes/state; packed rows are ~25 KB/state and
    unpack with one ``np.unpackbits`` per decode step. Token advance walks
    the emitted token's bytes through ``dfa.trans`` directly (a handful of
    scalar lookups) instead of materializing a [S, V] transition table.
    """

    def __init__(self, dfa: DFA, token_bytes: List[Optional[bytes]],
                 stop_ids: Sequence[int]):
        V = len(token_bytes)
        S = dfa.num_states  # includes dead
        mat, lens = _token_byte_matrix(token_bytes, V)
        Lmax = mat.shape[1]
        self._vbytes = token_bytes
        self.V = V
        self.dfa = dfa
        self.stop_ids = tuple(int(t) for t in stop_ids if 0 <= t < V)
        stop_arr = np.array(self.stop_ids, np.int64)
        empty = lens == 0
        packed = np.empty((S, (V + 7) // 8), np.uint8)
        self.has_continuation = np.zeros(S, bool)
        # walk all (state, token) pairs at once; chunk states to bound memory
        chunk = max(1, int(2e7) // max(V, 1))
        for s0 in range(0, S, chunk):
            s1 = min(S, s0 + chunk)
            cur = np.repeat(
                np.arange(s0, s1, dtype=np.int32)[:, None], V, axis=1
            )
            for col in range(Lmax):
                # advance only the tokens that HAVE a byte at this column:
                # column cost is (states x live tokens), so the whole walk
                # is O(states x total vocab bytes), not O(states x V x Lmax)
                # — the tail columns of a 200k-vocab BPE hold a handful of
                # long tokens
                live_idx = np.nonzero(mat[:, col] < 256)[0]
                if live_idx.size == 0:
                    break
                b = mat[live_idx, col].astype(np.int64)
                cur[:, live_idx] = dfa.trans[cur[:, live_idx], b[None, :]]
            allowed = cur != dfa.dead
            # tokens with no bytes (specials, empty strings) never advance
            # the grammar: disallow them outright
            allowed[:, empty] = False
            has_cont = allowed.any(axis=1)
            self.has_continuation[s0:s1] = has_cont
            # stop/EOS ids close the document: allowed exactly at acceptance
            # — and at tokenizer-granularity dead-ends (no single token
            # realizes any viable byte path), where forcing termination
            # beats sampling from an all -inf row. Baked into the table so
            # the host path and the device-chained mask agree exactly.
            if len(stop_arr):
                allowed[:, stop_arr] = (
                    dfa.accepting[s0:s1] | ~has_cont
                )[:, None]
            packed[s0:s1] = np.packbits(allowed, axis=1)
        self.allowed_bits = packed
        self._byte_mat = None  # lazy [V, Lmax] int32 (-1 pads) device walk

    def allowed_row(self, state: int) -> np.ndarray:
        return np.unpackbits(
            self.allowed_bits[state], count=self.V
        ).astype(bool)

    def advance(self, state: int, token_id: int) -> int:
        if token_id in self.stop_ids:
            return state
        b = self._vbytes[token_id] if 0 <= token_id < self.V else None
        if not b:
            return self.dfa.dead
        return self.dfa.walk(state, b)

    def byte_matrix(self) -> np.ndarray:
        """[V, Lmax] int32 token-byte matrix (-1 pads; stop ids all-pad so a
        device byte walk leaves their state unchanged) — the advance table
        for the zero-sync decode chain."""
        if self._byte_mat is None:
            lens = [len(b) if b else 0 for b in self._vbytes]
            Lmax = max(1, max(lens) if lens else 1)
            mat = np.full((self.V, Lmax), -1, np.int32)
            for v, b in enumerate(self._vbytes):
                if b and v not in self.stop_ids:
                    mat[v, : len(b)] = np.frombuffer(b, np.uint8)
            self._byte_mat = mat
        return self._byte_mat


class GuidedGrammar:
    """A compiled grammar bound to a tokenizer's vocab."""

    def __init__(self, dfa: DFA, table: TokenTable, spec_key: str,
                 specials: Optional[Dict[str, int]] = None,
                 decode_fn=None):
        self.dfa = dfa
        self.table = table
        self.spec_key = spec_key
        # harmony special ids + detok fn, bound at compile time so sessions
        # can gate on channel headers without a tokenizer reference
        self.specials = specials or {}
        self.decode_fn = decode_fn

    @property
    def start_state(self) -> int:
        return 0

    def allowed_row(self, state: int) -> np.ndarray:
        return self.table.allowed_row(state)

    def advance(self, state: int, token_id: int) -> int:
        return self.table.advance(state, token_id)

    def accepting(self, state: int) -> bool:
        return bool(self.dfa.accepting[state])

    def forces_stop(self, state: int) -> bool:
        """True when no continuation token is grammatical (the request must
        emit a stop id now — min_tokens cannot override grammar death)."""
        return not bool(self.table.has_continuation[state])

    def new_session(self, gate: str = "none") -> "GuidedSession":
        return GuidedSession(self, gate)


# harmony gate states (GuidedSession._gate)
_GATE_ACTIVE = 0  # constraint live (non-harmony, or inside final channel)
_GATE_FREE = 1  # free-form (analysis/commentary channels, headers)
_GATE_CHANNEL = 2  # after <|channel|>, collecting the channel name


_ASCII_WS = b" \t\n\r\x0b\x0c"
_ASCII_WS_STR = " \t\n\r\x0b\x0c"
_final_channel_cache: Optional[Tuple[np.ndarray, np.ndarray]] = None


def is_final_channel_name(name: str) -> bool:
    """The harmony-gate channel-name contract, host form: optional ASCII
    whitespace, the literal ``final``, then end-of-name or ASCII whitespace
    followed by anything. Deliberately ASCII-only (harmony channel names
    are ASCII) so the host session and the device byte-DFA
    (``final_channel_tables``) decide identically — Python's wider
    ``str.strip()``/``str.split()`` whitespace class (``\\x1c``-``\\x1f``,
    ``\\x85``, ``\\xa0``, Unicode spaces) would diverge from the byte walk."""
    i, n = 0, len(name)
    while i < n and name[i] in _ASCII_WS_STR:
        i += 1
    j = i
    while j < n and name[j] not in _ASCII_WS_STR:
        j += 1
    return name[i:j] == "final"


def final_channel_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Byte-DFA recognizing a harmony channel name that selects the
    ``final`` channel — the device form of :func:`is_final_channel_name`
    (optional ASCII whitespace, the literal ``final``, then either
    end-of-name or whitespace followed by anything).

    States: 0 ws-prefix, 1-4 partial literal, 5 ``final`` seen (accepting),
    6 whitespace tail (accepting), 7 dead. Returns
    ``(trans [8, 256] int32, accept [8] bool)`` — the tables the fused
    decode program walks so harmony-gated guided rows ride the zero-sync
    chain (the gate used to transition on host-parsed headers)."""
    global _final_channel_cache
    if _final_channel_cache is None:
        trans = np.full((8, 256), 7, np.int32)
        for b in _ASCII_WS:
            trans[0, b] = 0
        lit = b"final"
        for i, ch in enumerate(lit):
            trans[i, ch] = i + 1
        # "f" also leaves the ws-prefix state via the literal row above;
        # state 5 closes on whitespace into the accept-anything tail
        for b in _ASCII_WS:
            trans[5, b] = 6
        trans[6, :] = 6
        accept = np.zeros(8, bool)
        accept[5] = accept[6] = True
        _final_channel_cache = (trans, accept)
    return _final_channel_cache


class GuidedSession:
    """Per-request constraint state: DFA state plus the harmony gate.

    On harmony (channeled) chat the constraint applies only to the ``final``
    channel's message content — analysis and commentary channels (and tool
    calls) stay free-form, matching how a reasoning model must be allowed to
    think before emitting the structured answer. ``gate="harmony"`` starts
    FREE and activates after ``<|channel|>final<|message|>``.
    """

    def __init__(self, grammar: GuidedGrammar, gate: str = "none"):
        self.grammar = grammar
        self.state = grammar.start_state
        self._specials: Dict[str, int] = grammar.specials
        self._decode_fn = grammar.decode_fn
        self._gate = _GATE_ACTIVE if gate != "harmony" else _GATE_FREE
        self._harmony = gate == "harmony"
        self._chan_buf: List[int] = []

    @property
    def active(self) -> bool:
        return self._gate == _GATE_ACTIVE

    def allowed_row(self) -> Optional[np.ndarray]:
        """Bool [V] allowed mask, or None when unconstrained (gate FREE)."""
        if self._gate != _GATE_ACTIVE:
            return None
        row = self.grammar.allowed_row(self.state)
        if not row.any():
            # tokenizer granularity dead-end (no single token realizes any
            # viable byte path): allow the stop ids so the request
            # terminates instead of sampling from an all -inf row
            row = row.copy()
            for t in self.grammar.table.stop_ids:
                row[t] = True
        return row

    def forces_stop(self) -> bool:
        return self._gate == _GATE_ACTIVE and self.grammar.forces_stop(self.state)

    @property
    def device_gate_ok(self) -> bool:
        """True when this session can ride the zero-sync device chain:
        either no harmony gate at all, or the gate's special ids are bound
        so the fused program can transition it on device (the channel-name
        check is the ``final_channel_tables`` byte-DFA)."""
        if not self._harmony:
            return True
        return "channel" in self._specials and "message" in self._specials

    def device_gate_state(self, chan_trans: np.ndarray) -> int:
        """Encode the gate for the device chain: -1 = no gate (mask always
        applies when the DFA state does), 0 = ACTIVE, 1 = FREE,
        2 + s = collecting a channel name with channel-DFA state ``s``
        (buffered name tokens replayed byte-wise; specials/stop ids hold,
        matching the all-pad rows of ``TokenTable.byte_matrix``)."""
        if not self._harmony:
            return -1
        if self._gate == _GATE_ACTIVE:
            return 0
        if self._gate == _GATE_FREE:
            return 1
        tab = self.grammar.table
        s = 0
        for t in self._chan_buf:
            b = tab._vbytes[t] if 0 <= t < tab.V else None
            if not b or t in tab.stop_ids:
                continue
            for byte in b:
                s = int(chan_trans[s, byte])
        return 2 + s

    def advance(self, token_id: int):
        if self._harmony and self._specials:
            ch = self._specials.get("channel")
            msg = self._specials.get("message")
            if self._gate == _GATE_CHANNEL:
                if token_id == msg:
                    self._gate = (
                        _GATE_ACTIVE
                        if is_final_channel_name(self._decode_chan())
                        else _GATE_FREE
                    )
                    self._chan_buf = []
                    return
                self._chan_buf.append(token_id)
                return
            if token_id == ch:
                self._gate = _GATE_CHANNEL
                self._chan_buf = []
                return
            if token_id in (
                self._specials.get("end"), self._specials.get("start")
            ):
                # a channel message closed (or a new turn header begins):
                # back to free-form until the next final channel
                self._gate = _GATE_FREE
                return
            if self._gate == _GATE_FREE:
                return
        if self._gate == _GATE_ACTIVE:
            self.state = self.grammar.advance(self.state, token_id)

    def _decode_chan(self) -> str:
        # only tokens that CARRY BYTES contribute to the name — specials
        # and stop ids buffered into a malformed header are skipped, the
        # exact semantics of the device walk (their byte-matrix rows are
        # all-pad, so the channel DFA holds)
        tab = self.grammar.table
        toks = [
            t for t in self._chan_buf
            if 0 <= t < tab.V and tab._vbytes[t] and t not in tab.stop_ids
        ]
        if self._decode_fn is not None:
            try:
                return self._decode_fn(toks)
            except Exception:
                return ""
        # byte-level fallback (ByteTokenizer ids are raw bytes)
        return bytes(t for t in toks if 0 <= t < 256).decode(
            "utf-8", "replace"
        )


# ---------------------------------------------------------------------------
# Forced tool_choice: token-level phases around byte-DFA grammars
# ---------------------------------------------------------------------------

_TC_MARK, _TC_NAME, _TC_ARGS = 0, 1, 2


class ToolChoiceGrammar:
    """Forcing grammar for ``tool_choice: {"type":"function",...}`` (one
    named function) or ``tool_choice: "required"`` (any declared function).

    The substrate server the reference delegates to backs forced tool
    choice with guided decoding (``/root/reference/patches/gpt_oss_server.py:64-67``
    → vLLM's OpenAI server); here the harmony token stream itself is
    constrained, in three phases:

    1. force the ``<|channel|>`` marker (a one-hot token mask);
    2. constrain the channel-name text to
       ``commentary to=functions.(NAME|...)`` with a byte-DFA, allowing
       ``<|message|>`` exactly at DFA acceptance;
    3. constrain the message body to the chosen tool's JSON-schema grammar,
       allowing ``<|call|>`` exactly at acceptance.

    Phase 2 → 3 is a host transition (the emitted channel text selects
    which tool's argument grammar applies), so tool-choice rows always ride
    the exact sync decode path (``guided_gate="tool"`` — same class as
    harmony-gated rows)."""

    def __init__(self, name_grammar: GuidedGrammar,
                 args_by_name: Dict[str, GuidedGrammar],
                 channel_id: int, message_id: int, call_id: int,
                 decode_fn, spec_key: str):
        self.name_grammar = name_grammar
        self.args_by_name = args_by_name
        self.channel_id = channel_id
        self.message_id = message_id
        self.call_id = call_id
        self.decode_fn = decode_fn
        self.spec_key = spec_key
        self.V = name_grammar.table.V

    def new_session(self, gate: str = "tool") -> "ToolChoiceSession":
        return ToolChoiceSession(self)


class ToolChoiceSession:
    """Per-request state for a :class:`ToolChoiceGrammar` — same interface
    the engine's sync decode path drives (``active`` / ``allowed_row`` /
    ``forces_stop`` / ``advance``)."""

    def __init__(self, grammar: ToolChoiceGrammar):
        self.grammar = grammar
        self._phase = _TC_MARK
        self._name_state = 0
        self._name_buf: List[int] = []
        self._args: Optional[GuidedGrammar] = None
        self._args_state = 0

    @property
    def active(self) -> bool:
        return True

    def allowed_row(self) -> Optional[np.ndarray]:
        g = self.grammar
        if self._phase == _TC_MARK:
            row = np.zeros(g.V, bool)
            if 0 <= g.channel_id < g.V:
                row[g.channel_id] = True
            return row
        if self._phase == _TC_NAME:
            row = g.name_grammar.allowed_row(self._name_state).copy()
            # the name grammar's table allows stop ids at acceptance; the
            # channel header ends with <|message|>, not a stop
            for t in g.name_grammar.table.stop_ids:
                row[t] = False
            if g.name_grammar.accepting(self._name_state):
                if 0 <= g.message_id < g.V:
                    row[g.message_id] = True
            elif not row.any():
                # tokenizer-granularity dead-end mid-name (no single token
                # realizes any viable byte path): allow the stop ids so the
                # request terminates instead of sampling an all -inf row
                row = g.name_grammar.allowed_row(self._name_state).copy()
                for t in g.name_grammar.table.stop_ids:
                    row[t] = True
            return row
        # _TC_ARGS: the chosen tool's schema grammar; the call marker is the
        # only stop the harmony tool-call framing accepts
        args = self._args
        row = args.allowed_row(self._args_state).copy()
        if 0 <= g.call_id < g.V:
            for t in args.table.stop_ids:
                if t != g.call_id:
                    row[t] = False
        return row

    def forces_stop(self) -> bool:
        if self._phase == _TC_ARGS:
            return self._args.forces_stop(self._args_state)
        return False

    @property
    def device_gate_ok(self) -> bool:
        # the name -> argument-grammar selection is a host transition
        # (which schema applies depends on the decoded channel text), so
        # tool-choice rows always take the exact sync path
        return False

    def advance(self, token_id: int):
        g = self.grammar
        if self._phase == _TC_MARK:
            if token_id == g.channel_id:
                self._phase = _TC_NAME
            return
        if self._phase == _TC_NAME:
            if token_id == g.message_id:
                name = self._decode_name()
                self._args = g.args_by_name.get(name)
                if self._args is None and len(g.args_by_name) == 1:
                    # masking guarantees a declared name; defensive fallback
                    self._args = next(iter(g.args_by_name.values()))
                if self._args is None:
                    raise GuidedError(
                        f"internal: channel named undeclared tool {name!r}"
                    )
                self._args_state = 0
                self._phase = _TC_ARGS
                return
            self._name_buf.append(token_id)
            self._name_state = g.name_grammar.table.advance(
                self._name_state, token_id
            )
            return
        if token_id in self._args.table.stop_ids:
            return
        self._args_state = self._args.advance(self._args_state, token_id)

    def _decode_name(self) -> str:
        text = ""
        if self.grammar.decode_fn is not None:
            try:
                text = self.grammar.decode_fn(self._name_buf)
            except Exception:
                text = ""
        if not text:
            text = bytes(
                t for t in self._name_buf if 0 <= t < 256
            ).decode("utf-8", "replace")
        if "functions." in text:
            tail = text.split("functions.", 1)[1].split()
            return tail[0].strip() if tail else ""
        return text.strip()


def compile_tool_choice(tools: Sequence[Dict], names: Sequence[str],
                        tokenizer) -> ToolChoiceGrammar:
    """Compile a forcing grammar for ``tool_choice``. ``tools`` are OpenAI
    tool definitions (dicts); ``names`` the function names generation may
    call (one for a named forcing, all declared names for ``"required"``).
    Raises :class:`GuidedError` (→ HTTP 400) on unknown names or a
    non-harmony tokenizer (the commentary-channel framing needs the
    channel/message/call specials)."""
    by_name: Dict[str, Dict] = {}
    for t in tools or ():
        fn = t.get("function", t) if isinstance(t, dict) else {}
        n = fn.get("name")
        if n:
            by_name[n] = fn
    names = list(dict.fromkeys(names))
    if not names:
        raise GuidedError("tool_choice requires at least one tool")
    unknown = [n for n in names if n not in by_name]
    if unknown:
        raise GuidedError(f"tool_choice names undeclared tool(s): {unknown}")
    # OpenAI's function-name contract (^[a-zA-Z0-9_-]{1,64}$). Enforcing it
    # here also keeps ToolChoiceSession._decode_name's whitespace-delimited
    # parse sound: a name containing whitespace or 'functions.' would parse
    # to the wrong args grammar and raise out of engine.step()
    allowed = set(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-"
    )
    bad = [
        n for n in names
        if not n or len(n) > 64 or not all(c in allowed for c in n)
    ]
    if bad:
        raise GuidedError(
            f"tool function names must match [a-zA-Z0-9_-]{{1,64}}: {bad}"
        )
    try:
        if not getattr(tokenizer, "harmony", False):
            raise KeyError("harmony")
        channel_id = tokenizer.special("channel")
        message_id = tokenizer.special("message")
        call_id = tokenizer.special("call")
    except Exception:
        raise GuidedError(
            "forced tool_choice requires a harmony tokenizer "
            "(channel/message/call specials)"
        )
    alts = "|".join(_regex_escape(n) for n in names)
    name_g = compile_guided(
        "regex", f"commentary to=functions\\.({alts})", tokenizer
    )
    args_by_name: Dict[str, GuidedGrammar] = {}
    for n in names:
        params = by_name[n].get("parameters")
        if params:
            args_by_name[n] = compile_guided("json_schema", params, tokenizer)
        else:
            # no declared parameters: any JSON object (bounded nesting)
            args_by_name[n] = compile_guided("json_object", None, tokenizer)
    key = f"tool_choice:{tokenizer.name}:{json.dumps(sorted(names))}"
    return ToolChoiceGrammar(
        name_g, args_by_name, channel_id, message_id, call_id,
        tokenizer.decode, key,
    )


# ---------------------------------------------------------------------------
# Spec parsing + caching
# ---------------------------------------------------------------------------

_cache_lock = threading.Lock()
_grammar_cache: Dict[Tuple[str, str], GuidedGrammar] = {}


def _spec_to_regex(kind: str, value) -> str:
    if kind == "regex":
        if not isinstance(value, str):
            raise GuidedError("guided_regex must be a string")
        return value
    if kind == "choice":
        if not isinstance(value, (list, tuple)) or not value:
            raise GuidedError("guided_choice must be a non-empty list")
        return "(" + "|".join(_regex_escape(str(v)) for v in value) + ")"
    if kind == "json_object":
        return _json_object_regex(3)
    if kind == "json_schema":
        if isinstance(value, str):
            try:
                value = json.loads(value)
            except json.JSONDecodeError as e:
                raise GuidedError(f"invalid JSON schema: {e}")
        value = _resolve_refs(value, value)
        return json_schema_to_regex(value)
    raise GuidedError(f"unknown guided kind: {kind}")


def compile_guided(kind: str, value, tokenizer) -> GuidedGrammar:
    """Compile a guided spec against a tokenizer (cached)."""
    key = (
        tokenizer.name,
        f"{kind}:{json.dumps(value, sort_keys=True) if not isinstance(value, str) else value}",
    )
    with _cache_lock:
        g = _grammar_cache.get(key)
    if g is not None:
        return g
    regex = _spec_to_regex(kind, value)
    dfa = compile_regex(regex)
    token_bytes = tokenizer.token_bytes()
    # union of completion and chat stop ids: whichever mode the request
    # uses, its stop tokens are allowed exactly at grammar acceptance
    stops = tuple(dict.fromkeys(
        tuple(tokenizer.stop_ids) + tuple(tokenizer.chat_stop_ids)
    ))
    table = TokenTable(dfa, token_bytes, stop_ids=stops)
    specials = {}
    for name in ("channel", "message", "end", "start", "call", "return"):
        try:
            specials[name] = tokenizer.special(name)
        except Exception:
            pass
    g = GuidedGrammar(dfa, table, key[1], specials=specials,
                      decode_fn=tokenizer.decode)
    with _cache_lock:
        _grammar_cache[key] = g
    return g
