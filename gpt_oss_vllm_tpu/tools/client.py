"""CLI client for the OpenAI-compatible server.

Covers the reference's client tooling surface (``quick_client.py``,
``client_test.py``, ``test_client_connection.py``, ``smoke_suite.py``):
health pre-check, completions + chat endpoints, SSE stream parsing
(``data:`` lines, ``[DONE]`` sentinel, delta.content vs .text), interactive
REPL, concurrent load generation with client-side tok/s from
``usage.completion_tokens``.

Usage::

    python -m gpt_oss_vllm_tpu.tools.client --url http://localhost:8000 health
    python -m gpt_oss_vllm_tpu.tools.client complete "Once upon a time"
    python -m gpt_oss_vllm_tpu.tools.client chat --stream "Hello!"
    python -m gpt_oss_vllm_tpu.tools.client repl
    python -m gpt_oss_vllm_tpu.tools.client bench --concurrency 8 --requests 32
    python -m gpt_oss_vllm_tpu.tools.client smoke       # deterministic ladder
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import sys
import time

import httpx


class Client:
    def __init__(self, url: str, model: str = "default", timeout: float = 300.0):
        self.url = url.rstrip("/")
        self.model = model
        self.http = httpx.Client(timeout=timeout)

    def health(self) -> dict:
        r = self.http.get(f"{self.url}/health")
        r.raise_for_status()
        return r.json()

    def models(self) -> list:
        r = self.http.get(f"{self.url}/v1/models")
        r.raise_for_status()
        data = r.json()["data"]
        if data and self.model == "default":
            self.model = data[0]["id"]
        return data

    def complete(self, prompt: str, max_tokens=64, temperature=0.7, **kw) -> dict:
        r = self.http.post(
            f"{self.url}/v1/completions",
            json={
                "model": self.model,
                "prompt": prompt,
                "max_tokens": max_tokens,
                "temperature": temperature,
                **kw,
            },
        )
        r.raise_for_status()
        return r.json()

    def chat(self, content: str, max_tokens=64, temperature=0.7, **kw) -> dict:
        r = self.http.post(
            f"{self.url}/v1/chat/completions",
            json={
                "model": self.model,
                "messages": [{"role": "user", "content": content}],
                "max_tokens": max_tokens,
                "temperature": temperature,
                **kw,
            },
        )
        r.raise_for_status()
        return r.json()

    def stream(self, content: str, chat=True, max_tokens=64, temperature=0.7):
        """Yield text deltas from an SSE stream."""
        if chat:
            path, body = "/v1/chat/completions", {
                "model": self.model,
                "messages": [{"role": "user", "content": content}],
            }
        else:
            path, body = "/v1/completions", {"model": self.model, "prompt": content}
        body.update({"max_tokens": max_tokens, "temperature": temperature, "stream": True})
        with self.http.stream("POST", f"{self.url}{path}", json=body) as r:
            r.raise_for_status()
            for line in r.iter_lines():
                if not line.startswith("data: "):
                    continue
                payload = line[6:]
                if payload == "[DONE]":
                    return
                chunk = json.loads(payload)
                choice = chunk["choices"][0]
                d = choice.get("delta") or {}
                delta = d.get("content") or choice.get("text") or ""
                # harmony extras: render chain-of-thought dim-style inline
                # and tool-call argument deltas tagged by function name
                if d.get("reasoning_content"):
                    delta = d["reasoning_content"] + delta
                for tc in d.get("tool_calls") or []:
                    fn = tc.get("function", {})
                    if fn.get("name"):
                        delta += f"\n[tool:{fn['name']}] "
                    delta += fn.get("arguments") or ""
                if delta:
                    yield delta


def cmd_smoke(c: Client) -> int:
    """The reference smoke ladder (``smoke_suite.py``): readiness, a
    deterministic single-token completion (twice, must match), and a
    streamed chat with at least one content chunk."""
    print("health:", c.health())
    print("models:", [m["id"] for m in c.models()])
    t1 = c.complete("The capital of France is", max_tokens=1, temperature=0.0)
    t2 = c.complete("The capital of France is", max_tokens=1, temperature=0.0)
    det = t1["choices"][0]["text"] == t2["choices"][0]["text"]
    print(f"deterministic single-token: {'OK' if det else 'MISMATCH'}")
    chunks = list(c.stream("Say hi", max_tokens=8))
    print(f"streamed chat: {len(chunks)} content chunks")
    ok = det and len(chunks) >= 1
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def cmd_bench(c: Client, concurrency: int, requests: int, max_tokens: int) -> int:
    c.models()

    def one(i):
        t0 = time.time()
        r = c.complete(f"Request {i}: tell me something.", max_tokens=max_tokens, temperature=0.8)
        dt = time.time() - t0
        return r["usage"]["completion_tokens"], dt

    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(max_workers=concurrency) as ex:
        results = list(ex.map(one, range(requests)))
    wall = time.time() - t0
    toks = sum(r[0] for r in results)
    lat = sorted(r[1] for r in results)
    print(
        f"{requests} requests x {max_tokens} tokens, concurrency {concurrency}: "
        f"{toks} tokens in {wall:.1f}s = {toks / wall:.1f} tok/s aggregate; "
        f"p50 latency {lat[len(lat) // 2]:.2f}s"
    )
    return 0


def cmd_repl(c: Client) -> int:
    c.models()
    print(f"model: {c.model} — streaming chat REPL, ctrl-D to exit")
    while True:
        try:
            line = input("> ")
        except EOFError:
            return 0
        for delta in c.stream(line, max_tokens=256):
            sys.stdout.write(delta)
            sys.stdout.flush()
        print()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--model", default="default")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("health")
    sub.add_parser("models")
    sub.add_parser("smoke")
    sub.add_parser("repl")
    for name in ("complete", "chat"):
        p = sub.add_parser(name)
        p.add_argument("prompt")
        p.add_argument("--max-tokens", type=int, default=64)
        p.add_argument("--temperature", type=float, default=0.7)
        p.add_argument("--stream", action="store_true")
        # structured outputs (serving/guided.py)
        p.add_argument("--json-schema", help="JSON schema the output must match")
        p.add_argument("--json", action="store_true", help="json_object mode")
        p.add_argument("--regex", help="guided_regex pattern")
        p.add_argument("--choice", action="append", help="guided_choice (repeat)")
    p = sub.add_parser("bench")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--max-tokens", type=int, default=32)
    args = ap.parse_args(argv)

    c = Client(args.url, args.model)
    if args.cmd == "health":
        print(json.dumps(c.health(), indent=1))
    elif args.cmd == "models":
        print(json.dumps(c.models(), indent=1))
    elif args.cmd == "smoke":
        sys.exit(cmd_smoke(c))
    elif args.cmd == "repl":
        sys.exit(cmd_repl(c))
    elif args.cmd == "bench":
        sys.exit(cmd_bench(c, args.concurrency, args.requests, args.max_tokens))
    elif args.cmd in ("complete", "chat"):
        guided = {}
        if getattr(args, "json_schema", None):
            guided["guided_json"] = json.loads(args.json_schema)
        if getattr(args, "json", False):
            guided["response_format"] = {"type": "json_object"}
        if getattr(args, "regex", None):
            guided["guided_regex"] = args.regex
        if getattr(args, "choice", None):
            guided["guided_choice"] = args.choice
        if args.stream:
            if guided:
                print("(guided flags apply to non-stream requests only in this client)",
                      file=sys.stderr)
            for d in c.stream(args.prompt, chat=args.cmd == "chat", max_tokens=args.max_tokens,
                              temperature=args.temperature):
                sys.stdout.write(d)
                sys.stdout.flush()
            print()
        else:
            fn = c.chat if args.cmd == "chat" else c.complete
            c.models()
            r = fn(args.prompt, max_tokens=args.max_tokens, temperature=args.temperature,
                   **guided)
            ch = r["choices"][0]
            msg = ch.get("message", {})
            print(ch.get("text") or msg.get("content") or "")
            for tc in msg.get("tool_calls") or []:
                fn = tc.get("function", {})
                print(f"[tool:{fn.get('name')}] {fn.get('arguments')}")
            print(f"[{r['usage']['completion_tokens']} tokens]", file=sys.stderr)


if __name__ == "__main__":
    main()
