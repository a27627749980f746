"""OpenAI-compatible HTTP server (aiohttp + asyncio, single process).

Replaces the reference's subprocess-spawning launcher + patched vLLM API
server (``gpt_oss_server.py:52-70``) with a first-class asyncio app: a
background task drives ``InferenceEngine.step()`` in a thread executor
(continuous batching), per-request asyncio queues fan tokens out to HTTP
responses, SSE streams emit ``data: {...}`` chunks with the ``data: [DONE]``
terminator (the ``quick_client.py:118-145`` contract).

Endpoints: GET /health, GET /v1/models, POST /v1/completions,
POST /v1/chat/completions, GET /metrics. A real readiness endpoint replaces
the reference's log-scraping probe (``check_server_status.py:35-53``).

Run::

    python -m gpt_oss_vllm_tpu.serving.api_server --tiny --port 8000
    python -m gpt_oss_vllm_tpu.serving.api_server --checkpoint /path/native \
        --quant nf4 --max-model-len 4096
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import logging
import time
import uuid
from typing import AsyncIterator, List, Optional, Tuple

from aiohttp import web

from gpt_oss_vllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
    SchedulerConfig,
    ServingConfig,
)
from gpt_oss_vllm_tpu.engine.engine import InferenceEngine, StepOutput
from gpt_oss_vllm_tpu.engine.request import SamplingParams
from gpt_oss_vllm_tpu.serving import protocol as proto
from gpt_oss_vllm_tpu.serving.guided import GuidedError, compile_guided
from gpt_oss_vllm_tpu.serving.tokenizer import IncrementalDetokenizer, Tokenizer, get_tokenizer

logger = logging.getLogger("gpt_oss_vllm_tpu.server")


class AsyncEngine:
    """Asyncio facade over the synchronous engine: one pump task calls
    ``step()`` in a thread executor; outputs are routed to per-request
    queues."""

    def __init__(self, engine: InferenceEngine, tokenizer: Tokenizer):
        self.engine = engine
        self.tokenizer = tokenizer
        self._queues: dict[str, asyncio.Queue] = {}
        self._pump_task: Optional[asyncio.Task] = None
        self._ready = False
        self.start_time = time.time()

    async def start(self):
        # idempotent: a second pump task would race concurrent engine.step()
        # calls on the donated KV cache (build_app's on_startup hook plus a
        # caller-side start() must not double-pump)
        if self._pump_task is not None and not self._pump_task.done():
            return
        self._pump_task = asyncio.create_task(self._pump())
        self._ready = True

    async def stop(self):
        if self._pump_task:
            self._pump_task.cancel()
            try:
                await self._pump_task
            except asyncio.CancelledError:
                pass

    @property
    def ready(self) -> bool:
        return self._ready

    async def _pump(self):
        loop = asyncio.get_running_loop()
        while True:
            if self.engine.has_work():
                try:
                    outputs: List[StepOutput] = await loop.run_in_executor(
                        None, self.engine.step
                    )
                except Exception:
                    # an engine.step() exception would otherwise kill this
                    # task silently and hang every in-flight AND future
                    # request on an un-drained queue: fail the in-flight
                    # requests loudly and keep pumping (a persistent fault
                    # keeps failing fast instead of wedging the server).
                    # WAITING requests were never part of the failing step
                    # — they stay queued for the next iteration.
                    logger.exception(
                        "engine.step failed; failing in-flight requests"
                    )
                    from gpt_oss_vllm_tpu.engine.request import RequestState

                    reqs = getattr(self.engine, "requests", {})
                    for rid, q in list(self._queues.items()):
                        r = reqs.get(rid)
                        if r is not None and r.state == RequestState.WAITING:
                            continue
                        try:
                            self.engine.abort_request(rid)
                        except Exception:
                            pass
                        q.put_nowait(StepOutput(rid, -1, True, "error"))
                    # bounded retry pace: a persistent fault must not spin
                    # a hot exception loop on this 2-CPU host
                    await asyncio.sleep(0.2)
                    continue
                for out in outputs:
                    q = self._queues.get(out.request_id)
                    if q is not None:
                        q.put_nowait(out)
            else:
                await asyncio.sleep(0.002)

    async def submit(
        self, prompt_ids: List[int], sampling: SamplingParams
    ) -> Tuple[str, asyncio.Queue]:
        request_id = uuid.uuid4().hex
        q: asyncio.Queue = asyncio.Queue()
        self._queues[request_id] = q
        self.engine.add_request(request_id, prompt_ids, sampling)
        return request_id, q

    def finish(self, request_id: str):
        self._queues.pop(request_id, None)

    def abort(self, request_id: str):
        self.engine.abort_request(request_id)
        self.finish(request_id)

    async def stream_tokens(
        self, prompt_ids: List[int], sampling: SamplingParams
    ) -> AsyncIterator[StepOutput]:
        request_id, q = await self.submit(prompt_ids, sampling)
        finished = False
        try:
            while not finished:
                out = await q.get()
                finished = out.finished
                yield out
        finally:
            if not finished:
                # consumer bailed (client disconnect / stop string): free the slot
                self.engine.abort_request(request_id)
            self.finish(request_id)


# ---------------------------------------------------------------------------
# HTTP handlers
# ---------------------------------------------------------------------------


def _guided_spec(req):
    """Resolve the structured-outputs spec of a request: the OpenAI
    ``response_format`` (json_object / json_schema) or the vLLM
    ``guided_json`` / ``guided_regex`` / ``guided_choice`` extensions, at
    most one of which may be present. Returns (kind, value) or None."""
    specs = []
    rf = getattr(req, "response_format", None)
    if rf:
        t = rf.get("type", "text")
        if t == "json_object":
            specs.append(("json_object", None))
        elif t == "json_schema":
            js = rf.get("json_schema") or {}
            schema = js.get("schema") if isinstance(js, dict) else None
            if schema is None:
                raise GuidedError("response_format.json_schema.schema missing")
            specs.append(("json_schema", schema))
        elif t != "text":
            raise GuidedError(f"unsupported response_format type: {t!r}")
    if getattr(req, "guided_json", None) is not None:
        specs.append(("json_schema", req.guided_json))
    if getattr(req, "guided_regex", None) is not None:
        specs.append(("regex", req.guided_regex))
    if getattr(req, "guided_choice", None) is not None:
        specs.append(("choice", req.guided_choice))
    if len(specs) > 1:
        raise GuidedError("multiple guided specs in one request")
    return specs[0] if specs else None


def _tool_choice_names(req) -> Optional[List[str]]:
    """Function names a forced ``tool_choice`` restricts generation to, or
    None when tool choice is auto/none. Raises GuidedError (→ 400) on a
    malformed or undeclared choice."""
    tc = getattr(req, "tool_choice", None)
    if tc is None or tc in ("auto", "none"):
        return None
    declared = [
        t.function.name for t in (req.tools or []) if t.function.name
    ]
    if tc == "required":
        if not declared:
            raise GuidedError('tool_choice "required" needs tools')
        return declared
    if isinstance(tc, dict):
        if tc.get("type") != "function":
            raise GuidedError(f"unsupported tool_choice type: {tc.get('type')!r}")
        name = (tc.get("function") or {}).get("name")
        if not name:
            raise GuidedError("tool_choice.function.name missing")
        if name not in declared:
            raise GuidedError(f"tool_choice names undeclared tool: {name!r}")
        return [name]
    raise GuidedError(f"unsupported tool_choice: {tc!r}")


def _sampling_from(
    req, tokenizer: Tokenizer, max_model_len: int, chat: bool = False,
    guided=None, guided_gate: Optional[str] = None,
) -> SamplingParams:
    max_tokens = getattr(req, "max_tokens", None) or getattr(req, "max_completion_tokens", None) or 16
    lp = getattr(req, "logprobs", None)
    if isinstance(lp, bool):  # chat API: logprobs: true + top_logprobs: N
        if lp:
            tl = getattr(req, "top_logprobs", None)
            lp = tl if tl is not None else 1  # 0 is valid: chosen-only
        else:
            lp = None
    if lp is not None:
        lp = int(lp)
        if lp < 0:
            raise ValueError(f"logprobs must be non-negative, got {lp}")
        lp = min(lp, 16)  # engine top-k cap (OpenAI allows up to 20)
    # vLLM prompt_logprobs; OpenAI echo+logprobs implies it (completions
    # logprobs then cover the echoed prompt too). NOT implied for streaming
    # requests: streamed echo+logprobs keeps its long-standing behavior
    # (echoed text + completion logprobs) instead of tripping the
    # explicit-prompt_logprobs stream rejection below (review finding r5)
    plp = getattr(req, "prompt_logprobs", None)
    if (plp is None and not chat and getattr(req, "echo", False)
            and lp is not None and not getattr(req, "stream", False)):
        plp = lp
    if plp is not None:
        plp = int(plp)
        if plp < 0:
            raise ValueError(
                f"prompt_logprobs must be non-negative, got {plp}"
            )
        plp = min(plp, 16)
    # chat on a harmony model must NOT stop at <|end|> (it closes one channel
    # message; generation continues into the final channel) — only at
    # <|return|>/<|call|>/eos
    stop_ids = tokenizer.chat_stop_ids if chat else tokenizer.stop_ids
    # guided is precompiled by the handler (off the event loop — a cold
    # grammar x 200k-vocab table build takes seconds); channeled chat
    # constrains only the final channel's message
    if guided_gate is not None:
        gate = guided_gate
    else:
        gate = "harmony" if (guided is not None and chat and tokenizer.harmony) else "none"
    return SamplingParams(
        max_tokens=min(max_tokens, max_model_len),
        temperature=req.temperature,
        top_p=req.top_p,
        top_k=req.top_k,
        min_p=getattr(req, "min_p", 0.0) or 0.0,
        min_tokens=getattr(req, "min_tokens", 0) or 0,
        stop_token_ids=tuple(stop_ids),
        ignore_eos=bool(getattr(req, "ignore_eos", False)),
        seed=req.seed,
        logprobs=lp,
        prompt_logprobs=plp,
        presence_penalty=getattr(req, "presence_penalty", 0.0) or 0.0,
        frequency_penalty=getattr(req, "frequency_penalty", 0.0) or 0.0,
        repetition_penalty=getattr(req, "repetition_penalty", 1.0) or 1.0,
        logit_bias=tuple(
            (int(t), float(b)) for t, b in (getattr(req, "logit_bias", None) or {}).items()
        ) or None,
        guided=guided,
        guided_gate=gate,
    )


def _stop_strings(stop) -> List[str]:
    if stop is None:
        return []
    return [stop] if isinstance(stop, str) else list(stop)


def _prometheus_text(metrics: dict, prefix: str = "gpt_oss_tpu") -> str:
    """Flatten the metrics dict into Prometheus text exposition format
    (nested dicts join with '_'; non-numeric leaves are dropped). The
    substrate vLLM serves /metrics as Prometheus; ops tooling pointed at a
    vLLM deployment can scrape this endpoint unchanged."""
    lines: List[str] = []

    def walk(prefix_parts, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                safe = "".join(
                    c if c.isalnum() or c == "_" else "_" for c in str(k)
                )
                walk(prefix_parts + [safe], v)
            return
        if isinstance(obj, bool) or not isinstance(obj, (int, float)):
            return
        name = "_".join(prefix_parts)
        kind = "counter" if name.endswith(
            ("_tokens", "_proposed", "_accepted", "_hits", "_misses",
             "preemptions")
        ) else "gauge"
        lines.append(f"# TYPE {name} {kind}")
        lines.append(f"{name} {obj}")

    walk([prefix], metrics)
    return "\n".join(lines) + "\n"


class Server:
    def __init__(self, async_engine: AsyncEngine, serving: ServingConfig, max_model_len: int):
        self.ae = async_engine
        self.serving = serving
        self.max_model_len = max_model_len

    # -- helpers -----------------------------------------------------------

    def _encode_prompts(self, prompt) -> List[List[int]]:
        """OpenAI completions accept one prompt or a LIST of prompts (each
        producing its own choice(s), prompt-major index order)."""
        if isinstance(prompt, str):
            return [self.ae.tokenizer.encode(prompt)]
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            return [list(prompt)]
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], str):
            return [self.ae.tokenizer.encode(p) for p in prompt]
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], list):
            return [list(p) for p in prompt]
        raise web.HTTPBadRequest(
            text=proto.ErrorResponse.make("invalid prompt").model_dump_json(),
            content_type="application/json",
        )

    def _chat_lp_token(self, out) -> "proto.ChatLogprobToken":
        return proto.ChatLogprobToken(
            token=self.ae.tokenizer.decode([out.token_id]),
            logprob=out.logprob,
            top_logprobs=[
                proto.ChatTopLogprob(
                    token=self.ae.tokenizer.decode([t]), logprob=v
                )
                for t, v in (out.top_logprobs or [])
            ],
        )

    # -- endpoints ---------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        if not self.ae.ready:
            return web.json_response({"status": "starting"}, status=503)
        return web.json_response(
            {
                "status": "ok",
                "uptime_s": time.time() - self.ae.start_time,
                "running": self.ae.engine.num_running(),
                "waiting": len(self.ae.engine.waiting),
            }
        )

    async def metrics(self, request: web.Request) -> web.Response:
        m = dict(self.ae.engine.metrics)
        m["kv_blocks_free"] = self.ae.engine.allocator.num_free
        m["kv_blocks_total"] = self.ae.engine.allocator.num_blocks
        m["step_latency"] = self.ae.engine.timer.summary()
        if hasattr(self.ae.engine.allocator, "stats"):
            m["prefix_cache"] = self.ae.engine.allocator.stats()
        from gpt_oss_vllm_tpu.utils.telemetry import memory_report

        # backend HBM stats when the runtime exposes them, plus model-derived
        # weight/KV accounting that works on every backend (reference parity:
        # log_mem VRAM telemetry, streaming_unsloth_bnb.py:20-27)
        m["memory"] = memory_report(
            params=self.ae.engine.params, cache=self.ae.engine.cache
        )
        if "hbm" in m["memory"]:
            m["device_memory"] = m["memory"]["hbm"]  # backward-compat alias
        m["num_requests_running"] = self.ae.engine.num_running()
        m["num_requests_waiting"] = len(self.ae.engine.waiting)
        # Prometheus text exposition (the substrate vLLM's /metrics format)
        # on Accept: text/plain or ?format=prometheus; JSON stays the
        # default for the in-repo tooling
        accept = request.headers.get("Accept", "")
        if request.query.get("format") == "prometheus" or (
            "text/plain" in accept and "application/json" not in accept
        ):
            return web.Response(
                text=_prometheus_text(m),
                content_type="text/plain",
                charset="utf-8",
            )
        return web.json_response(m)

    # -- profiling (SURVEY.md §5: jax.profiler trace endpoints replacing the
    #    reference's wall-clock-only telemetry) -----------------------------

    async def profile_start(self, request: web.Request) -> web.Response:
        trace_dir = request.query.get("dir", "/tmp/gpt_oss_vllm_tpu_trace")
        import jax

        try:
            jax.profiler.start_trace(trace_dir)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=409)
        return web.json_response({"status": "tracing", "dir": trace_dir})

    async def profile_stop(self, request: web.Request) -> web.Response:
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception as e:
            return web.json_response({"error": str(e)}, status=409)
        return web.json_response({"status": "stopped"})

    async def version(self, request: web.Request) -> web.Response:
        from gpt_oss_vllm_tpu.version import __version__

        return web.json_response({"version": __version__})

    async def tokenize(self, request: web.Request) -> web.Response:
        """vLLM-compatible /tokenize: encode a prompt or chat messages."""
        try:
            req = proto.TokenizeRequest(**await request.json())
        except Exception as e:
            return web.json_response(
                proto.ErrorResponse.make(f"invalid request: {e}").model_dump(), status=400
            )
        if req.messages is not None:
            tools = [t.model_dump() for t in req.tools] if req.tools else None
            ids = self.ae.tokenizer.render_chat(
                [m.model_dump() for m in req.messages], tools=tools
            )
        elif req.prompt is not None:
            ids = self.ae.tokenizer.encode(req.prompt)
        else:
            return web.json_response(
                proto.ErrorResponse.make("need prompt or messages").model_dump(), status=400
            )
        return web.json_response(
            proto.TokenizeResponse(
                tokens=list(ids), count=len(ids), max_model_len=self.max_model_len
            ).model_dump()
        )

    async def detokenize(self, request: web.Request) -> web.Response:
        try:
            req = proto.DetokenizeRequest(**await request.json())
        except Exception as e:
            return web.json_response(
                proto.ErrorResponse.make(f"invalid request: {e}").model_dump(), status=400
            )
        return web.json_response(
            proto.DetokenizeResponse(prompt=self.ae.tokenizer.decode(req.tokens)).model_dump()
        )

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response(
            proto.ModelList(data=[proto.ModelCard(id=self.serving.served_model_name)]).model_dump()
        )

    async def completions(self, request: web.Request) -> web.StreamResponse:
        try:
            req = proto.CompletionRequest(**await request.json())
        except Exception as e:
            return web.json_response(
                proto.ErrorResponse.make(f"invalid request: {e}").model_dump(), status=400
            )
        prompts = self._encode_prompts(req.prompt)
        try:
            guided = await self._compile_guided(req)
            sampling = _sampling_from(
                req, self.ae.tokenizer, self.max_model_len, guided=guided
            )
            if req.stream:
                if (req.best_of or 0) > max(1, req.n or 1):
                    raise ValueError("best_of > n cannot be streamed")
                if sampling.prompt_logprobs is not None:
                    raise ValueError("prompt_logprobs cannot be streamed")
                return await self._stream_completion(request, req, prompts, sampling, chat=False)
            return await self._full_completion(req, prompts, sampling, chat=False)
        except ValueError as e:
            return web.json_response(proto.ErrorResponse.make(str(e)).model_dump(), status=400)

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            req = proto.ChatCompletionRequest(**await request.json())
        except Exception as e:
            return web.json_response(
                proto.ErrorResponse.make(f"invalid request: {e}").model_dump(), status=400
            )
        tools = None
        if req.tools and req.tool_choice != "none":
            tools = [t.model_dump() for t in req.tools]
        prompt_ids = self.ae.tokenizer.render_chat(
            [m.model_dump() for m in req.messages], tools=tools
        )
        try:
            guided = await self._compile_guided(req)
            gate = None
            forced = _tool_choice_names(req)
            if forced is not None:
                if guided is not None:
                    raise GuidedError(
                        "forced tool_choice cannot combine with "
                        "response_format/guided_* constraints"
                    )
                # compile off the event loop (cold grammar x vocab table
                # builds take seconds; cached per (tools, names))
                from gpt_oss_vllm_tpu.serving.guided import compile_tool_choice

                guided = await asyncio.get_event_loop().run_in_executor(
                    None, compile_tool_choice, tools, forced,
                    self.ae.tokenizer,
                )
                gate = "tool"  # host phase transitions -> exact sync path
            sampling = _sampling_from(
                req, self.ae.tokenizer, self.max_model_len, chat=True,
                guided=guided, guided_gate=gate,
            )
            if req.stream:
                if sampling.prompt_logprobs is not None:
                    raise ValueError("prompt_logprobs cannot be streamed")
                return await self._stream_completion(request, req, [prompt_ids], sampling, chat=True)
            return await self._full_completion(req, [prompt_ids], sampling, chat=True)
        except ValueError as e:
            return web.json_response(proto.ErrorResponse.make(str(e)).model_dump(), status=400)

    async def _compile_guided(self, req):
        """Resolve + compile a request's guided spec OFF the event loop (a
        cold grammar x 200k-vocab mask-table build takes seconds; cached
        grammars return instantly). Raises GuidedError (-> 400)."""
        spec = _guided_spec(req)
        if spec is None:
            return None
        import asyncio as _asyncio

        return await _asyncio.get_event_loop().run_in_executor(
            None, compile_guided, spec[0], spec[1], self.ae.tokenizer
        )

    # -- generation paths --------------------------------------------------

    @staticmethod
    def _nth_sampling(sampling: SamplingParams, i: int) -> SamplingParams:
        """Choice i of an n>1 request: an independent stream. A user seed
        derives per-choice seeds (seed+i) so the whole response is
        reproducible; unseeded requests get engine-assigned seeds."""
        if i == 0 or sampling.seed is None:
            return sampling
        import dataclasses

        return dataclasses.replace(sampling, seed=sampling.seed + i)

    async def _full_completion(self, req, prompts, sampling, chat: bool) -> web.Response:
        import dataclasses

        stops = _stop_strings(req.stop)
        n = max(1, getattr(req, "n", 1) or 1)
        # OpenAI `best_of` (completions only): generate best_of candidates
        # per prompt, return the n with the highest cumulative logprob.
        # Scoring needs per-token logprobs, so candidates run with
        # logprobs=0 (chosen-only) even when the user didn't ask — the
        # response surfaces logprobs only if they did.
        best_of = n
        if not chat:
            bo = getattr(req, "best_of", None) or n
            if bo < n:
                raise ValueError(f"best_of ({bo}) must be >= n ({n})")
            cap = max(16, n)
            if bo > cap:
                # reject (OpenAI/vLLM error on out-of-range best_of) rather
                # than silently running fewer candidates than billed
                raise ValueError(f"best_of ({bo}) exceeds the supported "
                                 f"maximum ({cap})")
            best_of = bo
        user_lp = sampling.logprobs is not None
        run_sampling = sampling
        if best_of > n and not user_lp:
            run_sampling = dataclasses.replace(sampling, logprobs=0)

        async def one_choice(prompt_ids, i: int, samp=None):
            from gpt_oss_vllm_tpu.serving.harmony import HarmonyStreamParser

            if samp is None:
                samp = run_sampling

            detok = IncrementalDetokenizer(self.ae.tokenizer)
            parser = HarmonyStreamParser(self.ae.tokenizer) if chat else None
            text = ""
            reasoning = ""
            tool_parts: dict = {}  # seg -> [name, arguments]
            finish_reason = None
            n_tokens = 0

            def route(dest: str, d: str):
                nonlocal text, reasoning
                if dest == "content":
                    text += d
                elif dest.startswith("tool:"):
                    _, seg, name = dest.split(":", 2)
                    tool_parts.setdefault(int(seg), [name, ""])[1] += d
                else:
                    reasoning += d

            lp = proto.LogProbs() if user_lp and not chat else None
            chat_lp = proto.ChatLogprobs() if chat and user_lp else None
            score = 0.0  # cumulative logprob (best_of ranking)
            plp_raw = None  # prompt logprobs (attached to the first output)
            async for out in self.ae.stream_tokens(
                prompt_ids, self._nth_sampling(samp, i)
            ):
                if out.prompt_logprobs is not None:
                    plp_raw = out.prompt_logprobs
                if out.token_id >= 0:
                    n_tokens += 1  # -1 = finish-only sentinel, not a token
                    if out.logprob is not None:
                        score += out.logprob
                # logprob collection stops once a stop string truncated the
                # text (OpenAI truncates logprobs with the content)
                if lp is not None and out.logprob is not None and finish_reason is None:
                    lp.tokens.append(
                        self.ae.tokenizer.decode([out.token_id]) if out.token_id >= 0 else ""
                    )
                    lp.token_logprobs.append(out.logprob)
                    lp.top_logprobs.append(
                        {
                            self.ae.tokenizer.decode([t]): v
                            for t, v in (out.top_logprobs or [])
                        }
                    )
                    lp.text_offset.append(len(text))
                if chat:
                    # harmony channel routing: final -> content, analysis/
                    # commentary -> reasoning, function-addressed commentary
                    # -> tool_calls; markers consumed by the parser
                    if out.token_id >= 0:
                        for dest, d in parser.push(out.token_id, final=out.finished):
                            route(dest, d)
                        # chat logprobs cover CONTENT tokens only (the
                        # OpenAI contract); markers and analysis/commentary
                        # tokens never appear in message.content
                        if (
                            chat_lp is not None
                            and out.logprob is not None
                            and parser.last_was_content
                            and finish_reason is None
                        ):
                            chat_lp.content.append(self._chat_lp_token(out))
                    if out.finished:
                        for dest, d in parser.finish():
                            route(dest, d)
                elif out.token_id >= 0 and out.token_id not in self.ae.tokenizer.stop_ids:
                    text += detok.push(out.token_id, final=out.finished)
                if out.finished:
                    finish_reason = out.finish_reason
                for s in stops:
                    if s and s in text:
                        text = text[: text.index(s)]
                        finish_reason = "stop"
            tool_calls = [
                proto.ToolCall(function=proto.FunctionCall(name=n, arguments=a))
                for _, (n, a) in sorted(tool_parts.items())
            ] or None
            if tool_calls and finish_reason in (None, "stop"):
                finish_reason = "tool_calls"
            return (text, reasoning, tool_calls, finish_reason, n_tokens,
                    chat_lp if chat else lp, score, (prompt_ids, plp_raw))

        # prompt-major choice order across the prompt list (OpenAI multi-
        # prompt completions); n>1/best_of candidates run concurrently
        # through the engine's continuous batch and the prefix cache shares
        # prompt KV. Prompt logprobs are computed ONCE per distinct prompt
        # (candidate 0): they are sampling-independent, and the PLP prefill
        # is ~2x a normal one with prefix reuse force-disabled — per-
        # candidate recomputation was pure waste (review finding r5).
        samp_rest = run_sampling
        if run_sampling.prompt_logprobs is not None and best_of > 1:
            samp_rest = dataclasses.replace(
                run_sampling, prompt_logprobs=None
            )
        results = await asyncio.gather(
            *(one_choice(p, j, run_sampling if j == 0 else samp_rest)
              for p in prompts for j in range(best_of))
        )
        if samp_rest is not run_sampling:
            # share candidate 0's prompt logprobs across its prompt group
            fixed = []
            for pi in range(len(prompts)):
                grp = list(results[pi * best_of : (pi + 1) * best_of])
                pl0 = grp[0][7]
                fixed.extend([grp[0]] + [r[:7] + (pl0,) for r in grp[1:]])
            results = fixed
        # usage counts ALL generated tokens, including discarded best_of
        # candidates (the OpenAI accounting)
        total_completion = sum(r[4] for r in results)
        if best_of > n:
            picked = []
            for pi in range(len(prompts)):
                grp = results[pi * best_of : (pi + 1) * best_of]
                picked.extend(sorted(grp, key=lambda r: -r[6])[:n])
            results = picked
        total_prompt = sum(len(p) for p in prompts)
        usage = proto.Usage(
            prompt_tokens=total_prompt,
            completion_tokens=total_completion,
            total_tokens=total_prompt + total_completion,
        )
        if chat:
            resp = proto.ChatCompletionResponse(
                model=req.model,
                choices=[
                    proto.ChatChoice(
                        index=i,
                        message=proto.ChatChoiceMessage(
                            # OpenAI schema: content is null on pure
                            # tool-call turns, not ""
                            content=text if (text or not tool_calls) else None,
                            reasoning_content=reasoning or None,
                            tool_calls=tool_calls,
                        ),
                        finish_reason=finish_reason or "stop",
                        logprobs=clp,
                        prompt_logprobs=self._render_prompt_logprobs(*pl),
                    )
                    for i, (text, reasoning, tool_calls, finish_reason, _, clp, _s, pl) in enumerate(results)
                ],
                usage=usage,
            )
        else:
            # OpenAI `echo`: prepend each choice's OWN prompt text; with
            # logprobs, the echoed prompt's per-token logprobs lead the list
            # (position 0 has no conditional -> null, the OpenAI shape)
            echo = getattr(req, "echo", False)
            choices = []
            for i, (text, _, _, finish_reason, _, lp, _s, pl) in enumerate(results):
                prompt_ids, plp_raw = pl
                if echo and lp is not None and plp_raw is not None:
                    lp = self._merge_echo_logprobs(prompt_ids, plp_raw, lp)
                choices.append(proto.CompletionChoice(
                    index=i,
                    text=(self.ae.tokenizer.decode(prompts[i // n]) if echo else "")
                    + text,
                    finish_reason=finish_reason or "stop", logprobs=lp,
                    prompt_logprobs=(
                        self._render_prompt_logprobs(prompt_ids, plp_raw)
                        if getattr(req, "prompt_logprobs", None) is not None
                        else None
                    ),
                ))
            resp = proto.CompletionResponse(
                model=req.model, choices=choices, usage=usage,
            )
        return web.json_response(resp.model_dump())

    def _render_prompt_logprobs(self, prompt_ids, entries):
        """vLLM-style prompt_logprobs list: one entry per prompt token —
        null at position 0, then token/logprob/top_logprobs dicts."""
        if entries is None:
            return None
        dec = self.ae.tokenizer.decode
        out = []
        for i, e in enumerate(entries):
            if e is None or i >= len(prompt_ids):
                out.append(None)
                continue
            chosen, top = e
            out.append({
                "token": dec([prompt_ids[i]]),
                "logprob": chosen,
                # list-of-entries, not a dict keyed by decoded text: two
                # distinct ids can decode identically (partial UTF-8)
                "top_logprobs": [
                    {"token": dec([t]), "logprob": v} for t, v in top
                ],
            })
        return out

    def _merge_echo_logprobs(self, prompt_ids, entries,
                             lp: "proto.LogProbs") -> "proto.LogProbs":
        """OpenAI echo+logprobs: completion logprobs are PREFIXED with the
        echoed prompt's per-token logprobs (first token null)."""
        dec = self.ae.tokenizer.decode
        merged = proto.LogProbs()
        offset = 0
        for i, e in enumerate(entries):
            if i >= len(prompt_ids):
                break
            tok = dec([prompt_ids[i]])
            merged.tokens.append(tok)
            if e is None:
                merged.token_logprobs.append(None)
                merged.top_logprobs.append(None)
            else:
                chosen, top = e
                merged.token_logprobs.append(chosen)
                merged.top_logprobs.append({dec([t]): v for t, v in top})
            merged.text_offset.append(offset)
            offset += len(tok)
        merged.tokens.extend(lp.tokens)
        merged.token_logprobs.extend(lp.token_logprobs)
        merged.top_logprobs.extend(lp.top_logprobs)
        merged.text_offset.extend(o + offset for o in lp.text_offset)
        return merged

    async def _stream_completion(
        self, http_request, req, prompts, sampling, chat: bool
    ) -> web.StreamResponse:
        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
            },
        )
        await resp.prepare(http_request)
        rid = proto._id("chatcmpl" if chat else "cmpl")
        stops = _stop_strings(req.stop)
        n = max(1, getattr(req, "n", 1) or 1)

        async def send(obj):
            await resp.write(f"data: {obj.model_dump_json()}\n\n".encode())

        if chat:
            for i in range(n):
                await send(
                    proto.ChatCompletionChunk(
                        id=rid,
                        model=req.model,
                        choices=[
                            proto.ChatChunkChoice(
                                index=i, delta=proto.DeltaMessage(role="assistant")
                            )
                        ],
                    )
                )

        if not chat and getattr(req, "echo", False):
            # OpenAI streamed echo: the prompt text leads each choice's
            # stream as its first chunk. Prompt logprobs are NOT implied on
            # streams (_sampling_from) — explicit prompt_logprobs + stream
            # stays a 400; echoed-text + completion logprobs streams fine.
            for pi, pids in enumerate(prompts):
                ptxt = self.ae.tokenizer.decode(pids)
                for j in range(n):
                    await send(proto.CompletionChunk(
                        id=rid, model=req.model,
                        choices=[proto.CompletionChoice(
                            index=pi * n + j, text=ptxt)],
                    ))

        # one pump per choice; deltas interleave on the wire tagged by index
        # (the OpenAI stream contract for n>1)
        queue: asyncio.Queue = asyncio.Queue()
        DONE = object()

        async def pump(prompt_ids, i: int):
            from gpt_oss_vllm_tpu.serving.harmony import HarmonyStreamParser

            detok = IncrementalDetokenizer(self.ae.tokenizer)
            parser = HarmonyStreamParser(self.ae.tokenizer) if chat else None
            want_lp = sampling.logprobs is not None
            emitted = ""
            stopped = False
            n_tokens = 0
            # logprob entries pending attachment to the NEXT content chunk
            # (OpenAI attaches logprobs to the chunk carrying the token's
            # delta; held-back partial-UTF8 tokens wait for theirs)
            pend_lp: list = []
            try:
                async for out in self.ae.stream_tokens(
                    prompt_ids, self._nth_sampling(sampling, i % n)
                ):
                    if out.token_id >= 0:
                        n_tokens += 1
                    # (dest, delta) pairs; completions emit content only
                    deltas = []
                    if chat:
                        if out.token_id >= 0:
                            deltas = parser.push(out.token_id, final=out.finished)
                            if (
                                want_lp
                                and out.logprob is not None
                                and parser.last_was_content
                                and not stopped
                            ):
                                pend_lp.append(self._chat_lp_token(out))
                        if out.finished:
                            deltas = deltas + parser.finish()
                    elif out.token_id >= 0 and out.token_id not in self.ae.tokenizer.stop_ids:
                        d = detok.push(out.token_id, final=out.finished)
                        if d:
                            deltas = [("content", d)]
                        if want_lp and out.logprob is not None and not stopped:
                            pend_lp.append((
                                self.ae.tokenizer.decode([out.token_id]),
                                out.logprob,
                                {
                                    self.ae.tokenizer.decode([t]): v
                                    for t, v in (out.top_logprobs or [])
                                },
                            ))
                    content_delta = ""
                    reason_delta = ""
                    tool_deltas = []
                    for dest, d in deltas:
                        if dest == "content":
                            content_delta += d
                        elif dest.startswith("tool:"):
                            tool_deltas.append((dest, d))
                        else:
                            reason_delta += d
                    # stop strings match user-visible content only
                    if stops and content_delta:
                        candidate = emitted + content_delta
                        hit = next((s for s in stops if s and s in candidate), None)
                        if hit:
                            content_delta = candidate[: candidate.index(hit)][len(emitted) :]
                            stopped = True
                    emitted += content_delta
                    finish = out.finish_reason if out.finished else ("stop" if stopped else None)
                    if finish == "stop" and chat and parser._tool_seg >= 0:
                        finish = "tool_calls"
                    if reason_delta:
                        await queue.put((i, "reasoning", reason_delta, None, None))
                    for dest, d in tool_deltas:
                        await queue.put((i, dest, d, None, None))
                    if content_delta or finish:
                        await queue.put(
                            (i, "content", content_delta, finish, pend_lp or None)
                        )
                        pend_lp = []
                    if stopped and not out.finished:
                        break  # generator cleanup aborts the engine request
            finally:
                await queue.put((i, "done", DONE, n_tokens, None))

        tasks = [
            asyncio.create_task(pump(pids, pi * n + j))
            for pi, pids in enumerate(prompts)
            for j in range(n)
        ]
        total_choices = len(prompts) * n
        # completions chunks are schema-static: serialize via a bytes
        # template instead of per-token pydantic construction (~the largest
        # per-token host cost of the SSE path on this 2-CPU box)
        cmpl_head = (
            b'data: {"id":"' + rid.encode() + b'","object":"text_completion",'
            b'"created":' + str(int(time.time())).encode() + b',"model":'
            + json.dumps(req.model).encode() + b',"choices":[{"index":'
        )
        done = 0
        completion_tokens = 0
        tool_ids: dict = {}  # (choice, seg) -> stable call id
        try:
            while done < total_choices:
                # drain everything already queued and ship ONE transport
                # write: the engine's burst flush emits several tokens per
                # wakeup, and per-token write()+event-loop hops were most of
                # the measured ~14% HTTP tax over the raw engine loop
                # (VERDICT r3 weak #3)
                items = [await queue.get()]
                while True:
                    try:
                        items.append(queue.get_nowait())
                    except asyncio.QueueEmpty:
                        break
                buf = bytearray()
                for i, dest, delta, finish, lps in items:
                    if delta is DONE:
                        done += 1
                        completion_tokens += finish  # pump's final token count
                        continue
                    if chat:
                        if dest.startswith("tool:"):
                            # OpenAI tool-call stream contract: first delta
                            # of an index carries id+name, later ones only
                            # argument increments
                            _, seg, name = dest.split(":", 2)
                            seg = int(seg)
                            first = (i, seg) not in tool_ids
                            if first:
                                tool_ids[(i, seg)] = proto._id("call")
                            dm = proto.DeltaMessage(tool_calls=[
                                proto.ToolCall(
                                    id=tool_ids[(i, seg)], index=seg,
                                    function=proto.FunctionCall(
                                        name=name if first else "",
                                        arguments=delta,
                                    ),
                                )
                            ])
                        elif dest == "reasoning":
                            dm = proto.DeltaMessage(reasoning_content=delta)
                        else:
                            dm = proto.DeltaMessage(content=delta or None)
                        obj = proto.ChatCompletionChunk(
                            id=rid,
                            model=req.model,
                            choices=[
                                proto.ChatChunkChoice(
                                    index=i, delta=dm, finish_reason=finish,
                                    # logprobs attach to the chunk carrying
                                    # their tokens' content delta (OpenAI)
                                    logprobs=(
                                        proto.ChatLogprobs(content=lps)
                                        if lps else None
                                    ),
                                )
                            ],
                        )
                        buf += b"data: " + obj.model_dump_json().encode() + b"\n\n"
                        continue
                    if lps:
                        # completions logprobs ride the pydantic path (the
                        # bytes template hard-codes logprobs: null)
                        lpm = proto.LogProbs()
                        for tok_s, lp_v, top in lps:
                            lpm.tokens.append(tok_s)
                            lpm.token_logprobs.append(lp_v)
                            lpm.top_logprobs.append(top)
                            lpm.text_offset.append(0)
                        obj = proto.CompletionChunk(
                            id=rid, model=req.model,
                            choices=[proto.CompletionChoice(
                                index=i, text=delta, finish_reason=finish,
                                logprobs=lpm,
                            )],
                        )
                        buf += b"data: " + obj.model_dump_json().encode() + b"\n\n"
                        continue
                    buf += (
                        cmpl_head + str(i).encode() + b',"text":'
                        + json.dumps(delta).encode() + b',"finish_reason":'
                        + json.dumps(finish).encode()
                        + b',"logprobs":null}],"usage":null}\n\n'
                    )
                if buf:
                    await resp.write(bytes(buf))
        finally:
            for t in tasks:
                t.cancel()
        opts = getattr(req, "stream_options", None)
        if opts is not None and opts.include_usage:
            usage = proto.Usage(
                prompt_tokens=sum(len(p) for p in prompts),
                completion_tokens=completion_tokens,
                total_tokens=sum(len(p) for p in prompts) + completion_tokens,
            )
            cls = proto.ChatCompletionChunk if chat else proto.CompletionChunk
            await send(cls(id=rid, model=req.model, choices=[], usage=usage))
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp


def build_app(async_engine: AsyncEngine, serving: ServingConfig, max_model_len: int) -> web.Application:
    s = Server(async_engine, serving, max_model_len)
    app = web.Application()
    app.router.add_get("/health", s.health)
    app.router.add_get("/metrics", s.metrics)
    app.router.add_post("/debug/profile/start", s.profile_start)
    app.router.add_post("/debug/profile/stop", s.profile_stop)
    app.router.add_get("/version", s.version)
    app.router.add_post("/tokenize", s.tokenize)
    app.router.add_post("/detokenize", s.detokenize)
    app.router.add_get("/v1/models", s.models)
    app.router.add_post("/v1/completions", s.completions)
    app.router.add_post("/v1/chat/completions", s.chat_completions)

    async def on_startup(app):
        await async_engine.start()

    async def on_cleanup(app):
        await async_engine.stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def _mesh_from(args):
    """Device mesh + ParallelConfig from the CLI (multi-chip serving:
    ``--dp/--ep/--tp`` shard the engine over the local devices; with
    ``--moe-dispatch a2a`` the MoE routes through the explicit all-to-all
    token dispatch). Returns (mesh, parallel) — (None, default) when the
    requested world size is 1."""
    import jax as _jax

    from gpt_oss_vllm_tpu.config import ParallelConfig
    from gpt_oss_vllm_tpu.parallel.mesh import make_mesh

    if getattr(args, "dp", 1) > 1:
        # single-engine serving shards ep/tp only; data parallelism means N
        # independent replicas behind a router — sharding a serving engine
        # over a 'data' axis would just replicate weights and KV
        raise SystemExit("serving shards --ep/--tp; run one server per "
                         "data-parallel replica instead of --dp")
    parallel = ParallelConfig(
        ep=getattr(args, "ep", 1), tp=getattr(args, "tp", 1),
        moe_dispatch=getattr(args, "moe_dispatch", "implicit"),
    )
    if parallel.world_size <= 1:
        return None, parallel
    n = parallel.world_size
    devs = _jax.devices()
    if len(devs) < n:
        raise SystemExit(
            f"requested dp*ep*tp = {n} devices but only {len(devs)} visible"
        )
    return make_mesh(parallel, devices=devs[:n]), parallel


def make_engine(args) -> Tuple[InferenceEngine, Tokenizer, EngineConfig]:
    # mxfp4 ships E8M0 exponent-byte scales (decoded in-kernel); storing
    # them bf16 would double scale bytes for nothing (bench.py parity).
    # --scale-dtype overrides for checkpoint serving that wants float32
    # NF4 absmax scales (the QuantConfig default before r3; ADVICE r3 low).
    scale_dtype = getattr(args, "scale_dtype", None) or (
        "e8m0" if args.quant == "mxfp4" else "bfloat16"
    )
    quant = QuantConfig(
        method=args.quant, vocab_int8=getattr(args, "vocab_int8", False),
        scale_dtype=scale_dtype,
    )
    mesh, parallel = _mesh_from(args)
    kv_dtype = getattr(args, "kv_cache_dtype", "bfloat16")
    if args.tiny:
        # --tokenizer byte-harmony serves the tiny model through the full
        # channel protocol stack (chat parser, reasoning_content routing)
        tok_spec = getattr(args, "tokenizer", "") or ""
        tokenizer = get_tokenizer(tok_spec if tok_spec.startswith("byte") else "byte")
        model_cfg = ModelConfig.tiny(vocab_size=max(512, tokenizer.vocab_size))
        config = EngineConfig(
            model=model_cfg,
            quant=quant,
            cache=CacheConfig(block_size=8, num_blocks=256, max_blocks_per_seq=32,
                              dtype=kv_dtype),
            scheduler=SchedulerConfig(max_num_seqs=8, max_model_len=args.max_model_len or 256,
                                      spec_tokens=args.spec_tokens),
            serving=ServingConfig(served_model_name="gpt-oss-tiny", port=args.port),
            parallel=parallel,
        )
        from gpt_oss_vllm_tpu.models.params import random_params

        params = random_params(config.model, quant, seed=0)
    elif getattr(args, "random_full", False):
        # full-size GPT-OSS-20B with random weights: the serving-path bench
        # configuration (no checkpoint artifact exists in this environment;
        # perf is weight-value independent modulo routing entropy — see
        # CLAUDE.md "routing honesty")
        tokenizer = get_tokenizer("byte")
        model_cfg = dataclasses.replace(ModelConfig(), tie_word_embeddings=True)
        mml = args.max_model_len or 512
        nseq = getattr(args, "max_num_seqs", 16)
        bps = mml // 16 + 2
        config = EngineConfig(
            model=model_cfg,
            quant=quant,
            cache=CacheConfig(block_size=16, num_blocks=nseq * bps + 8,
                              max_blocks_per_seq=bps, dtype=kv_dtype,
                              enable_prefix_caching=False),
            scheduler=SchedulerConfig(
                max_num_seqs=nseq, max_model_len=mml,
                spec_tokens=args.spec_tokens,
                async_depth=getattr(args, "async_depth", 8),
                async_flush_burst=getattr(args, "flush_burst", 1),
                prefill_chunk=getattr(args, "prefill_chunk", 512),
            ),
            serving=ServingConfig(served_model_name="gpt-oss-20b-random", port=args.port),
            parallel=parallel,
        )
        from gpt_oss_vllm_tpu.models.params import prepare_serving_params

        # repacked-before-engine temporary (see prepare_serving_params)
        return (
            InferenceEngine(
                config,
                prepare_serving_params(model_cfg, quant, seed=0),
                attn_backend=args.attn_backend,
                mesh=mesh,
            ),
            tokenizer,
            config,
        )
    elif args.checkpoint:
        from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
        from gpt_oss_vllm_tpu.models.params import load_params_from_store

        store = TensorStore(args.checkpoint)
        mc = store.metadata.get("model_config")
        model_cfg = ModelConfig(**mc) if mc else ModelConfig()
        tokenizer = get_tokenizer(args.tokenizer)
        config = EngineConfig(
            model=model_cfg,
            quant=quant,
            cache=CacheConfig(dtype=kv_dtype),
            scheduler=SchedulerConfig(max_model_len=args.max_model_len or 4096,
                                      spec_tokens=args.spec_tokens,
                                      prefill_chunk=getattr(args, "prefill_chunk", 512)),
            serving=ServingConfig(served_model_name=model_cfg.name, port=args.port),
            parallel=parallel,
        )
        params = load_params_from_store(store, model_cfg, quant)
    else:
        raise SystemExit("need --tiny or --checkpoint")
    engine = InferenceEngine(config, params, attn_backend=args.attn_backend,
                             mesh=mesh)
    return engine, tokenizer, config


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="gpt_oss_vllm_tpu OpenAI-compatible server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--checkpoint", default=None, help="native TensorStore dir")
    ap.add_argument("--tiny", action="store_true", help="tiny random model (smoke)")
    ap.add_argument(
        "--random-full", dest="random_full", action="store_true",
        help="full-size GPT-OSS-20B with random weights (serving-path bench)",
    )
    ap.add_argument("--max-num-seqs", dest="max_num_seqs", type=int, default=16)
    ap.add_argument(
        "--async-depth", dest="async_depth", type=int, default=8,
        help="in-flight decode steps (tunnel-attached chip wants 4-8)",
    )
    ap.add_argument(
        "--flush-burst", dest="flush_burst", type=int, default=1,
        help="batch token readbacks as one stacked transfer per N steps "
             "(throughput mode on a high-latency link; raises emission lag)",
    )
    ap.add_argument("--quant", default="nf4", choices=["nf4", "mxfp4", "none"])
    ap.add_argument("--ep", type=int, default=1, help="expert-parallel mesh axis")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis")
    ap.add_argument(
        "--moe-dispatch", dest="moe_dispatch", default="implicit",
        choices=["implicit", "a2a"],
        help="MoE dispatch under an expert-sharded mesh: implicit GSPMD "
             "psum, or explicit capacity-bucketed all-to-all token dispatch",
    )
    ap.add_argument(
        "--scale-dtype", dest="scale_dtype", default=None,
        choices=["float32", "bfloat16", "e8m0"],
        help="quant scale storage dtype (default: e8m0 for mxfp4, bfloat16 "
             "otherwise; float32 restores full-precision NF4 absmax for "
             "checkpoint serving)",
    )
    ap.add_argument("--tokenizer", default="o200k_harmony")
    ap.add_argument("--max-model-len", type=int, default=None)
    ap.add_argument(
        "--spec-tokens", type=int, default=4,
        help="prompt-lookup speculative decoding: max draft tokens verified "
             "per step (0 = off). DEFAULT ON: the adaptive draft-length "
             "policy halves the window on unprofitable text and backs off "
             "to plain decode entirely (exponential re-probe), so low-"
             "acceptance workloads pay only a bounded probe tax while "
             "repetitive/structured output gains up to ~3x (engine "
             "_spec_rate_update; measured in docs/STATUS.md)",
    )
    ap.add_argument(
        "--prefill-chunk", dest="prefill_chunk", type=int, default=512,
        help="chunked-prefill token budget per step. Bigger chunks pack more "
             "admissions per expert-weight sweep (c=32 measured: 2048 -> +9%% "
             "aggregate tok/s, TTFT p99 halved) at the cost of longer "
             "worst-case inter-token stalls for running streams",
    )
    ap.add_argument(
        "--vocab-int8", dest="vocab_int8", action="store_true",
        help="per-row int8 vocab table (tied embed + lm_head): halves the "
             "decode step's largest fixed HBM read and frees ~0.58 GB",
    )
    ap.add_argument(
        "--kv-cache-dtype", default="bfloat16", choices=["bfloat16", "fp8"],
        help="fp8 (float8_e4m3fn) halves KV memory and paged-attention HBM "
             "traffic (the vLLM --kv-cache-dtype analog)",
    )
    ap.add_argument(
        "--attn-backend", default="auto", choices=["auto", "xla", "pallas"],
        help="auto = Pallas paged decode on TPU, XLA gather elsewhere",
    )
    return ap


def main(argv=None):
    from gpt_oss_vllm_tpu.utils.platform import ensure_platform

    ensure_platform()
    args = build_arg_parser().parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    engine, tokenizer, config = make_engine(args)
    ae = AsyncEngine(engine, tokenizer)
    app = build_app(ae, config.serving, config.scheduler.max_model_len)
    logger.info("starting server on %s:%d (model=%s)", args.host, args.port, config.serving.served_model_name)
    print("Application startup complete", flush=True)  # readiness line, cf. check_server_status.py:35
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
