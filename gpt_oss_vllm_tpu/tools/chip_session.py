"""One-process chip measurement session.

The tunnel-attached chip pays a multi-minute handover stall per PROCESS
(observed 5-18 min before the first device op completes when processes run
back-to-back). This driver batches every outstanding measurement into one
process so the stall is paid once:

  phase serving   engine-loop tok/s at c=1/8/32 (the reference's-8.3-tok/s
                  contract, STATUS serving table)
  phase serving_hi  engine-loop tok/s at c=32/64/128 on a cmax=128 engine
                  with per-phase timer decomposition (VERDICT r4 next #1:
                  the b128 kernel chain does 1141 tok/s; r4 serving topped
                  out at 278 steady with nothing measured past c=32)
  phase spec      FLAGSHIP (24L) n-gram speculative decoding through the
                  engine: repetitive + random workloads vs a spec-off
                  baseline (acceptance rate + tok/s; VERDICT r4 next #2)
  phase batched   kernel-chain decode at b=8/64 (bench.py secondary)
  phase b256      kernel-chain decode at b=128/256 — the batch-scaling
                  knee past the VPU 4-bit-decode floor (VERDICT r4 next #8)
  phase ttft      prefill TTFT: pallas flash vs xla gather at 128..2048
                  (the long-context tile-skipping evidence; 512+ exercises
                  the row-blocked gmm unsliced on chip)
  phase gmm_ab    row-blocked unsliced vs r2's sliced emulation, T=512
  phase plp       flagship prompt-logprobs request (201k vocab): validates
                  the sub-blocked PLP program's memory bound end to end
  phase spec_script  flagship speculative-decoding CEILING: rewires params
                  into a repeat-last-token model at unchanged per-step
                  cost (accept=1.0). DESTRUCTIVE to params — run LAST

Each phase is independent (try/except); one JSON line per phase on stdout.

Usage: python -m gpt_oss_vllm_tpu.tools.chip_session [--phases a,b,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import gc
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_oss_tpu_jit_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gpt_oss_vllm_tpu.utils.platform import ensure_platform


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(obj):
    print(json.dumps(obj), flush=True)


def settle(s=2.0):
    # frees are async on this backend; a value readback is the only sync
    x = jnp.zeros((8,), jnp.int32) + 1
    np.asarray(x)
    time.sleep(s)


def main():
    backend = ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="serving,spec,batched,ttft,gmm_ab")
    ap.add_argument("--quant", default="mxfp4", choices=["nf4", "mxfp4"])
    ap.add_argument("--ttft-lens", type=int, nargs="+", default=[128, 512, 2048])
    ap.add_argument("--hi-cmax", type=int, default=128,
                    help="serving_hi engine slot count (falls back down "
                         "128/96/64 on allocation failure)")
    ap.add_argument("--hi-arms", default="32,64,128",
                    help="serving_hi concurrency arms (comma list)")
    ap.add_argument("--hi-burst", type=int, default=8,
                    help="serving_hi async_flush_burst")
    ap.add_argument("--knee-arms", default="128,256",
                    help="b256 phase batch widths (comma list)")
    ap.add_argument("--script-k", type=int, default=4,
                    help="spec_script draft window (at accept=1.0 the spec "
                         "step costs ~a b(1+k) sweep, so bigger k amortizes "
                         "the VPU decode floor further)")
    args = ap.parse_args()
    phases = args.phases.split(",")
    log(f"backend={backend} phases={phases}")

    from gpt_oss_vllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
    )
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.models.params import prepare_serving_params
    from gpt_oss_vllm_tpu.tools.serving_bench import measure_readback_rtt, run_load

    mc = dataclasses.replace(ModelConfig(), tie_word_embeddings=True)
    sdt = "e8m0" if args.quant == "mxfp4" else "bfloat16"
    quant = QuantConfig(method=args.quant, scale_dtype=sdt, vocab_int8=True)

    t0 = time.monotonic()
    needs_params = bool(
        {"serving", "serving_hi", "spec", "spec_script", "batched", "b256",
         "ttft", "gmm_ab", "tune", "chunk_ab", "http", "plp", "prefix",
         "fp8"} & set(phases)
    )
    params = prepare_serving_params(mc, quant, seed=0) if needs_params else None
    log(f"[t+{time.monotonic() - t0:.0f}s] serving params "
        f"{'ready' if needs_params else 'skipped'}")

    def make_engine(cmax, spec_tokens=0, max_tokens=96, prompt_len=128,
                    async_depth=8, flush_burst=8, prefill_chunk=512):
        blocks_per_seq = (prompt_len + max_tokens + 16 * (1 + spec_tokens)) // 16 + 2
        cfg = EngineConfig(
            model=mc,
            quant=quant,
            cache=CacheConfig(
                block_size=16,
                num_blocks=cmax * blocks_per_seq + 8,
                max_blocks_per_seq=blocks_per_seq + 2,
                enable_prefix_caching=False,
            ),
            scheduler=SchedulerConfig(
                max_num_seqs=cmax, max_model_len=4096,
                spec_tokens=spec_tokens,
                async_decode=True, async_depth=async_depth,
                async_flush_burst=flush_burst,
                prefill_chunk=prefill_chunk,
            ),
        )
        return InferenceEngine(cfg, params)

    rtt = measure_readback_rtt() if backend == "tpu" else 0.0
    log(f"[t+{time.monotonic() - t0:.0f}s] readback RTT {rtt * 1e3:.1f} ms")

    engine = None
    if "serving" in phases:
        engine = make_engine(32)
        log(f"[t+{time.monotonic() - t0:.0f}s] engine ready")

    if "serving" in phases:
        try:
            import os as _os

            results = []
            for c in (1, 8, 32):
                r = run_load(engine, mc.vocab_size, c, 128, 8, seed=99)
                log(f"  (warm c={c}: {r['wall_s']}s)")
                r = run_load(engine, mc.vocab_size, c, 128, 96)
                r["readback_rtt_ms"] = round(rtt * 1e3, 1)
                results.append(r)
                log(f"[t+{time.monotonic() - t0:.0f}s] c={c}: {r['tok_s']} tok/s "
                    f"(steady {r['steady_tok_s']}), TTFT p50 {r['ttft_p50_ms']} ms")
            # A/B: is copy_to_host_async secretly blocking per dispatch?
            _os.environ["GPT_OSS_NO_COPY_ASYNC"] = "1"
            r = run_load(engine, mc.vocab_size, 1, 128, 96)
            log(f"[t+{time.monotonic() - t0:.0f}s] c=1 NO-copy-async: "
                f"{r['tok_s']} tok/s (steady {r['steady_tok_s']})")
            results.append({**r, "variant": "no_copy_async", "concurrency": 1})
            del _os.environ["GPT_OSS_NO_COPY_ASYNC"]
            emit({"metric": "serving_engine_loop", "quant": args.quant,
                  "vocab8": True, "layers": mc.num_layers, "async": True,
                  "results": results})
        except Exception as e:
            log(f"serving phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "spec" in phases:
        # FLAGSHIP (24L mxfp4) speculative decoding A/B (VERDICT r4 next
        # #2): adaptive async-spec vs plain async on the favorable
        # (repetitive) and worst-case (random) workloads — the random arm
        # shows what the adaptive backoff costs when nothing drafts
        try:
            del engine
            gc.collect()
            settle()
            eng = make_engine(4, spec_tokens=4)
            # converge the adaptive-k descent DURING the warm (short rate
            # window + a warm longer than it): random-weight outputs never
            # draft, so without this the k=2/k=1 program compiles and the
            # backoff transient land inside the measured run (observed
            # 2.5 tok/s — compile time, not steady state)
            eng.SPEC_RATE_WINDOW = 8
            arms = (("repetitive", (1, 4)), ("random", (1,)))
            rows = []
            for wl, cs in arms:
                for c in cs:
                    # warm long enough that n-gram drafts actually fire and
                    # the widened verify program compiles BEFORE the
                    # measured run
                    r = run_load(eng, mc.vocab_size, c, 128, 96, seed=99,
                                 workload=wl)
                    log(f"  (spec warm {wl} c={c}: {r['wall_s']}s "
                        f"proposed={eng.metrics['spec_proposed']})")
                    eng.metrics["spec_proposed"] = 0
                    eng.metrics["spec_accepted"] = 0
                    r = run_load(eng, mc.vocab_size, c, 128, 96,
                                 workload=wl)
                    r["workload"] = wl
                    r["final_k"] = eng._spec_k
                    r["spec_backed_off"] = bool(
                        eng._spec_off_until > eng._step_counter
                    )
                    rows.append(r)
                    log(f"[t+{time.monotonic() - t0:.0f}s] spec {wl} c={c}: "
                        f"{r['tok_s']} tok/s accept={r.get('spec_accept_rate')} "
                        f"k={r['final_k']} off={r['spec_backed_off']}")
            # plain-async baseline on the same workloads, spec off
            del eng
            gc.collect()
            settle()
            eng = make_engine(4, spec_tokens=0)
            base = []
            for wl, cs in arms:
                for c in cs:
                    r = run_load(eng, mc.vocab_size, c, 128, 8, seed=98,
                                 workload=wl)
                    r = run_load(eng, mc.vocab_size, c, 128, 96,
                                 workload=wl)
                    r["workload"] = wl
                    base.append(r)
                    log(f"[t+{time.monotonic() - t0:.0f}s] nospec {wl} c={c}: "
                        f"{r['tok_s']} tok/s")
            emit({"metric": "spec_decode_serving", "spec_tokens": 4,
                  "layers": mc.num_layers, "spec": rows, "baseline": base})
            del eng
            gc.collect()
            settle()
            engine = None
        except Exception as e:
            log(f"spec phase failed: {type(e).__name__}: {str(e)[:300]}")
    elif engine is not None:
        del engine
        gc.collect()
        settle()
        engine = None

    if "serving_hi" in phases:
        # VERDICT r4 next #1: the biggest unclaimed perf surface — the b128
        # kernel chain decodes 1141 tok/s while r4's serving path topped
        # out at 278 steady at c=32 with nothing measured higher. One
        # cmax=128 engine, arms at c=32/64/128, with the engine's host
        # timer decomposition emitted per arm so the residual gap is
        # attributable (prefill share / dispatch / flush / readback).
        try:
            hi = None
            hi_cmax = 0
            for cmax_try in dict.fromkeys(
                c for c in (args.hi_cmax, 128, 96, 64) if c <= args.hi_cmax
            ):
                try:
                    hi = make_engine(cmax_try, flush_burst=args.hi_burst)
                    hi_cmax = cmax_try
                    break
                except Exception as e:
                    log(f"  cmax={cmax_try} engine failed: "
                        f"{type(e).__name__}: {str(e)[:150]}")
                    hi = None
                    gc.collect()
                    settle()
            if hi is None:
                raise RuntimeError("no high-concurrency engine fits")
            log(f"[t+{time.monotonic() - t0:.0f}s] serving_hi engine ready "
                f"(cmax={hi_cmax})")
            results = []
            for c in (int(x) for x in args.hi_arms.split(",")):
                if c > hi_cmax:
                    continue
                r = run_load(hi, mc.vocab_size, c, 128, 8, seed=99)
                log(f"  (warm c={c}: {r['wall_s']}s)")
                hi.timer.samples.clear()
                r = run_load(hi, mc.vocab_size, c, 128, 96)
                r["readback_rtt_ms"] = round(rtt * 1e3, 1)
                # host-timer decomposition (rolling <=512 samples/kind)
                r["phase_totals_ms"] = {
                    k: round(sum(v) * 1e3, 1)
                    for k, v in hi.timer.samples.items()
                }
                r["phase_counts"] = {
                    k: len(v) for k, v in hi.timer.samples.items()
                }
                results.append(r)
                log(f"[t+{time.monotonic() - t0:.0f}s] hi c={c}: "
                    f"{r['tok_s']} tok/s (steady {r['steady_tok_s']}), "
                    f"TTFT p50 {r['ttft_p50_ms']} / p99 {r['ttft_p99_ms']} ms")
                log("    totals_ms: " + json.dumps(r["phase_totals_ms"]))
            emit({"metric": "serving_hi_concurrency", "quant": args.quant,
                  "cmax": hi_cmax, "flush_burst": args.hi_burst,
                  "results": results})
            del hi
            gc.collect()
            settle()
        except Exception as e:
            log(f"serving_hi phase failed: {type(e).__name__}: {str(e)[:300]}")

    import bench

    c24 = dataclasses.replace(mc)
    if "batched" in phases:
        try:
            rows = {}
            for bb in (8, 64):
                cc_b = CacheConfig(block_size=16, num_blocks=12 * bb + 16,
                                   max_blocks_per_seq=16)
                tok_s, lat = bench.time_decode(c24, params, cc_b, "pallas", bb, 32)
                rows[bb] = {"tok_s": round(tok_s, 2), "ms_step": round(lat * 1e3, 2)}
                log(f"[t+{time.monotonic() - t0:.0f}s] batch={bb}: {tok_s:.1f} tok/s")
            emit({"metric": "batched_decode_chain", "quant": args.quant,
                  "results": rows})
        except Exception as e:
            log(f"batched phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "b256" in phases:
        # batch-scaling knee (VERDICT r4 next #8): past the VPU
        # 4-bit-decode floor (~64 ms/step at 24L full routing) throughput
        # scales with rows per decode sweep — b128 cleared 1000 tok/s;
        # where does the curve bend next? KV at b256 is ~2.4 GB, so this
        # arm is the most OOM-exposed measurement in the session — run it
        # LAST and guard each batch independently.
        try:
            rows = {}
            for bb in (int(x) for x in args.knee_arms.split(",")):
                try:
                    cc_b = CacheConfig(block_size=16, num_blocks=12 * bb + 16,
                                       max_blocks_per_seq=16)
                    tok_s, lat = bench.time_decode(c24, params, cc_b,
                                                   "pallas", bb, 32)
                    rows[bb] = {"tok_s": round(tok_s, 2),
                                "ms_step": round(lat * 1e3, 2)}
                    log(f"[t+{time.monotonic() - t0:.0f}s] batch={bb}: "
                        f"{tok_s:.1f} tok/s ({lat * 1e3:.1f} ms/step)")
                except Exception as e:
                    log(f"  b{bb} failed: {type(e).__name__}: {str(e)[:200]}")
                settle()
            emit({"metric": "batch_scaling_knee", "quant": args.quant,
                  "results": rows})
        except Exception as e:
            log(f"b256 phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "ttft" in phases:
        try:
            rows = []
            for plen in args.ttft_lens:
                for ab in ("pallas", "xla"):
                    nblk = plen // 16 + 2
                    pf = CacheConfig(block_size=16, num_blocks=nblk + 2,
                                     max_blocks_per_seq=nblk)
                    try:
                        ttft = bench.time_prefill(c24, params, pf, "pallas",
                                                  attn_backend=ab, prefill_len=plen)
                        rows.append({"prefill_len": plen, "attn": ab,
                                     "ttft_ms": round(ttft * 1e3, 1)})
                        log(f"[t+{time.monotonic() - t0:.0f}s] ttft {plen} {ab}: "
                            f"{ttft * 1e3:.1f} ms")
                    except Exception as e:
                        log(f"  ttft {plen} {ab} failed: {type(e).__name__}: {str(e)[:200]}")
                    settle(1.0)
            emit({"metric": "prefill_ttft_curve", "quant": args.quant,
                  "results": rows})
        except Exception as e:
            log(f"ttft phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "chunk_ab" in phases:
        # bigger admission chunks at high concurrency: the row-blocked gmm
        # makes >512-token prefill passes compilable, so burst admission can
        # pack more rows per pass (fewer weight sweeps before steady decode)
        try:
            rows = []
            for chunk in (512, 1024, 2048):
                eng = make_engine(32, prefill_chunk=chunk)
                r = run_load(eng, mc.vocab_size, 32, 128, 8, seed=99)
                r = run_load(eng, mc.vocab_size, 32, 128, 96)
                rows.append({"prefill_chunk": chunk, "tok_s": r["tok_s"],
                             "steady": r["steady_tok_s"],
                             "ttft_p50_ms": r["ttft_p50_ms"],
                             "ttft_p99_ms": r["ttft_p99_ms"]})
                log(f"[t+{time.monotonic() - t0:.0f}s] chunk={chunk} c=32: "
                    f"{r['tok_s']} tok/s, TTFT p50 {r['ttft_p50_ms']} "
                    f"p99 {r['ttft_p99_ms']}")
                del eng
                gc.collect()
                settle()
            emit({"metric": "admission_chunk_ab", "results": rows})
        except Exception as e:
            log(f"chunk_ab phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "tune" in phases:
        # async-pipeline shape sweep: (depth, burst) at fixed concurrency —
        # burst sets how many token readbacks amortize one tunnel sync,
        # depth how far the device runs ahead of emission
        try:
            rows = []
            for depth, burst, c in ((8, 8, 8), (8, 16, 8), (16, 16, 8),
                                    (8, 8, 32), (16, 16, 32)):
                eng = make_engine(c, async_depth=depth, flush_burst=burst)
                r = run_load(eng, mc.vocab_size, c, 128, 8, seed=99)
                r = run_load(eng, mc.vocab_size, c, 128, 96)
                rows.append({"depth": depth, "burst": burst, "concurrency": c,
                             "tok_s": r["tok_s"], "steady": r["steady_tok_s"]})
                log(f"[t+{time.monotonic() - t0:.0f}s] tune d={depth} b={burst} "
                    f"c={c}: {r['tok_s']} ({r['steady_tok_s']} steady)")
                del eng
                gc.collect()
                settle()
            emit({"metric": "async_pipeline_tune", "results": rows})
        except Exception as e:
            log(f"tune phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "http" in phases:
        # HTTP tax: the SAME engine measured through the real aiohttp server
        # (in-process, one TPU process) vs the raw engine loop. The serving
        # phase's engine-loop numbers are the denominator; the target is a
        # <=5% delta (VERDICT r3 weak #3; SSE writes are batched per wakeup).
        try:
            import asyncio
            import threading
            import urllib.request

            from gpt_oss_vllm_tpu.config import ServingConfig
            from gpt_oss_vllm_tpu.serving.api_server import AsyncEngine, build_app
            from gpt_oss_vllm_tpu.serving.tokenizer import get_tokenizer

            eng = make_engine(16)
            tok = get_tokenizer("byte")
            ae = AsyncEngine(eng, tok)
            app = build_app(ae, ServingConfig(served_model_name="m"), 4096)
            loop = asyncio.new_event_loop()
            ready = threading.Event()

            def serve():
                asyncio.set_event_loop(loop)

                async def start():
                    from aiohttp import web

                    runner = web.AppRunner(app)
                    await runner.setup()
                    site = web.TCPSite(runner, "127.0.0.1", 8799)
                    await site.start()
                    ready.set()

                loop.run_until_complete(start())
                loop.run_forever()

            threading.Thread(target=serve, daemon=True).start()
            ready.wait(30)

            # client runs as COROUTINES in the server's own loop: blocking
            # urllib threads starved the 2-CPU host's event loop and
            # serialized responses (the r4 first-cut measurement artifact);
            # aiohttp requests interleave with the SSE writes instead
            import aiohttp as _aiohttp

            async def one_request(sess, max_tokens=64):
                n_tok = 0
                async with sess.post(
                    "http://127.0.0.1:8799/v1/completions",
                    json={"model": "m", "prompt": "x" * 128,
                          "max_tokens": max_tokens, "temperature": 0.0,
                          "stream": True},
                ) as r:
                    async for line in r.content:
                        if line.startswith(b"data: ") and b"[DONE]" not in line:
                            n_tok += 1
                return n_tok

            async def bench(c, max_tokens=64):
                async with _aiohttp.ClientSession() as sess:
                    tt = time.monotonic()
                    counts = await asyncio.gather(
                        *(one_request(sess, max_tokens) for _ in range(c))
                    )
                    return time.monotonic() - tt, sum(counts)

            rows = []
            for c in (1, 8):
                asyncio.run_coroutine_threadsafe(bench(c, 8), loop).result(120)
                dt, events = asyncio.run_coroutine_threadsafe(
                    bench(c), loop
                ).result(600)
                tok_s = 64 * c / dt
                rows.append({"concurrency": c, "tok_s": round(tok_s, 2),
                             "wall_s": round(dt, 2), "sse_events": events})
                log(f"[t+{time.monotonic() - t0:.0f}s] http c={c}: "
                    f"{tok_s:.1f} tok/s ({events} SSE events)")
            emit({"metric": "http_serving", "results": rows})
            loop.call_soon_threadsafe(loop.stop)
            del eng, ae
            gc.collect()
            settle()
        except Exception as e:
            log(f"http phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "spec_tiny" in phases:
        # End-to-end speculative decoding ON CHIP with a model whose output
        # is actually self-similar (the TRAINED tiny Markov model from
        # tools/accuracy_train_eval --save): random-weight GPT-OSS outputs
        # never repeat, so n-gram drafts never fire there (measured:
        # proposed=0). On a tunnel-attached chip the sync spec path pays
        # ~1 RTT per STEP, so accepted drafts amortize the link latency —
        # the measurement shows the machinery working end-to-end: accept
        # rate, tokens per step > 1, tok/s vs the no-spec sync baseline.
        try:
            import os as _os

            npz_path = _os.environ.get("SPEC_TINY_NPZ", "/tmp/spec_tiny.npz")
            data = np.load(npz_path)
            from gpt_oss_vllm_tpu.config import ModelConfig as MC, QuantConfig as QC
            from gpt_oss_vllm_tpu.engine.request import SamplingParams
            from gpt_oss_vllm_tpu.models.params import random_params

            tcfg = MC.tiny()
            template = random_params(tcfg, QC(method="none"), seed=0)
            leaves, treedef = jax.tree_util.tree_flatten(template)
            trained = [
                jnp.asarray(data[f"leaf_{i}"]).astype(leaves[i].dtype)
                for i in range(len(leaves))
            ]
            tparams = jax.tree_util.tree_unflatten(treedef, trained)
            corpus = data["corpus"]
            prompt = corpus[:96].tolist()

            rows = []
            for spec_t, use_async, temp in (
                (0, True, 0.0), (0, False, 0.0), (4, False, 0.0),
                (4, True, 0.0), (0, True, 0.8), (4, True, 0.8),
            ):
                ecfg = EngineConfig(
                    model=tcfg,
                    quant=QC(method="none"),
                    cache=CacheConfig(block_size=16, num_blocks=64,
                                      max_blocks_per_seq=16),
                    scheduler=SchedulerConfig(
                        max_num_seqs=2, max_model_len=256,
                        spec_tokens=spec_t, async_decode=use_async,
                    ),
                )
                eng = InferenceEngine(ecfg, tparams)
                if spec_t and temp > 0:
                    # the adaptive-k descent compiles k=2/k=1 programs
                    # mid-run at this acceptance rate; converge DURING the
                    # warm (short rate window) so the timed run measures the
                    # settled operating point, not remote-compile time
                    eng.SPEC_RATE_WINDOW = 8
                    warm_toks = 96
                else:
                    warm_toks = 8
                sp_warm = SamplingParams(max_tokens=warm_toks, temperature=temp, seed=5)
                eng.generate([prompt], sp_warm)
                eng.metrics["spec_proposed"] = 0
                eng.metrics["spec_accepted"] = 0
                eng.metrics["steps"] = 0
                tt = time.monotonic()
                out = eng.generate(
                    [prompt], SamplingParams(max_tokens=96, temperature=temp, seed=7)
                )
                dt = time.monotonic() - tt
                row = {
                    "spec_tokens": spec_t,
                    "async": use_async,
                    "temperature": temp,
                    "tok_s": round(len(out[0]) / dt, 2),
                    "steps": eng.metrics["steps"],
                    "tokens_per_step": round(len(out[0]) / max(1, eng.metrics["steps"]), 2),
                }
                if spec_t:
                    row["proposed"] = eng.metrics.get("spec_proposed", 0)
                    row["accepted"] = eng.metrics.get("spec_accepted", 0)
                    row["final_k"] = eng._spec_k
                    row["spec_off"] = eng._spec_off_until > eng._step_counter
                    if row["proposed"]:
                        row["accept_rate"] = round(row["accepted"] / row["proposed"], 3)
                rows.append(row)
                log(f"[t+{time.monotonic() - t0:.0f}s] spec_tiny spec={spec_t}: {row}")
                del eng
                gc.collect()
                settle()
            emit({"metric": "spec_decode_trained_tiny_on_chip", "results": rows})
        except Exception as e:
            log(f"spec_tiny phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "gmm_ab" in phases:
        try:
            from gpt_oss_vllm_tpu.ops.moe import moe_block

            l = params.layers[0]
            T = 512
            x0 = (jax.random.normal(jax.random.PRNGKey(1), (T, mc.hidden_size))
                  * 0.3).astype(jnp.dtype(mc.dtype))

            # weights are jit ARGUMENTS, not closure constants: closed-over
            # packed experts become HLO constants and the remote-compile
            # payload blows the helper's body limit (observed HTTP 413)
            def block(x, ll):
                return moe_block(
                    x, ll.router_w, ll.router_b, ll.w_gate_up, ll.b_gate_up,
                    ll.w_down, ll.b_down, mc, strategy="gmm", backend="pallas",
                )

            @jax.jit
            def f_rb(x, ll):
                return (block(x, ll) * 1e-3 + x0).astype(x.dtype)

            @jax.jit
            def f_sl(x, ll):
                outs = [block(x[s : s + 256], ll) for s in range(0, T, 256)]
                return (jnp.concatenate(outs, axis=0) * 1e-3 + x0).astype(x.dtype)

            def measure(fn, name):
                tc = time.monotonic()
                xx = fn(x0, l)
                np.asarray(xx[:1, :8])
                log(f"  {name} compile+first: {time.monotonic() - tc:.1f}s")

                def chain(n):
                    xx = x0
                    tt = time.monotonic()
                    for _ in range(n):
                        xx = fn(xx, l)
                    np.asarray(xx[:1, :8])
                    return time.monotonic() - tt

                chain(3)
                best = float("inf")
                for _ in range(3):
                    a, b = chain(4), chain(12)
                    best = min(best, (b - a) / 8)
                log(f"[t+{time.monotonic() - t0:.0f}s] {name}: {best * 1e3:.3f} ms")
                return best

            rb = measure(f_rb, "rowblocked")
            sl = measure(f_sl, "sliced-256")
            emit({"metric": "gmm_rowblocked_vs_sliced_ms", "tokens": T,
                  "quant": args.quant, "layout": "glu4",
                  "rowblocked_ms": round(rb * 1e3, 3),
                  "sliced_ms": round(sl * 1e3, 3),
                  "speedup": round(sl / rb, 3)})
        except Exception as e:
            log(f"gmm_ab phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "prefix" in phases:
        # radix prefix-cache serving evidence (the C++ block allocator's
        # prompt-prefix reuse has only ever been CPU-tested): c=32 requests
        # sharing a block-aligned 112-token prefix vs fully random prompts
        # — cached prefixes skip their prefill work, cutting TTFT
        try:
            bp = (128 + 96) // 16 + 2
            cfg_pc = EngineConfig(
                model=mc, quant=quant,
                cache=CacheConfig(block_size=16, num_blocks=32 * bp + 8,
                                  max_blocks_per_seq=bp + 2,
                                  enable_prefix_caching=True),
                scheduler=SchedulerConfig(
                    max_num_seqs=32, max_model_len=4096, async_decode=True,
                    async_depth=8, async_flush_burst=8,
                ),
            )
            eng = InferenceEngine(cfg_pc, params)
            rows = []
            for wl in ("shared_prefix", "random"):
                r = run_load(eng, mc.vocab_size, 32, 128, 8, seed=99,
                             workload=wl)
                base = eng.metrics.get("prefix_cached_tokens", 0)
                r = run_load(eng, mc.vocab_size, 32, 128, 96, seed=7,
                             workload=wl)
                r["workload"] = wl
                r["prefix_cached_tokens"] = (
                    eng.metrics.get("prefix_cached_tokens", 0) - base
                )
                rows.append(r)
                log(f"[t+{time.monotonic() - t0:.0f}s] prefix {wl}: "
                    f"{r['tok_s']} tok/s TTFT p50 {r['ttft_p50_ms']} "
                    f"p99 {r['ttft_p99_ms']} cached={r['prefix_cached_tokens']}")
            emit({"metric": "prefix_cache_serving", "concurrency": 32,
                  "results": rows})
            del eng
            gc.collect()
            settle()
        except Exception as e:
            log(f"prefix phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "fp8" in phases:
        # fp8 KV cache through the serving path on chip (CacheConfig
        # dtype="fp8": half the KV bytes + paged-attention traffic; only
        # CPU-tested until now) — c=32 arm vs the bf16 serving row
        try:
            bp = (128 + 96) // 16 + 2
            cfg_f8 = EngineConfig(
                model=mc, quant=quant,
                cache=CacheConfig(block_size=16, num_blocks=32 * bp + 8,
                                  max_blocks_per_seq=bp + 2, dtype="fp8",
                                  enable_prefix_caching=False),
                scheduler=SchedulerConfig(
                    max_num_seqs=32, max_model_len=4096, async_decode=True,
                    async_depth=8, async_flush_burst=8,
                ),
            )
            eng = InferenceEngine(cfg_f8, params)
            r = run_load(eng, mc.vocab_size, 32, 128, 8, seed=99)
            r = run_load(eng, mc.vocab_size, 32, 128, 96)
            log(f"[t+{time.monotonic() - t0:.0f}s] fp8 c=32: {r['tok_s']} "
                f"tok/s (steady {r['steady_tok_s']})")
            emit({"metric": "fp8_kv_serving", "concurrency": 32,
                  "kv_dtype": "fp8", "results": [r]})
            del eng
            gc.collect()
            settle()
        except Exception as e:
            log(f"fp8 phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "plp" in phases:
        # prompt-logprobs on the FLAGSHIP model + 201k vocab: validates the
        # sub-blocked PLP program's memory bound (the r5 review flagged the
        # full-chunk f32 log_softmax as ~200-300 MB transient — over a
        # serving config's HBM headroom; the fix bounds it to ~77 MB)
        try:
            from gpt_oss_vllm_tpu.engine.request import SamplingParams

            eng = make_engine(4)
            rng = np.random.default_rng(5)
            prompt = rng.integers(0, mc.vocab_size, 128).tolist()
            eng.add_request(
                "plp", prompt,
                SamplingParams(max_tokens=8, temperature=0.0,
                               prompt_logprobs=2),
            )
            tt = time.monotonic()
            plp = None
            toks = 0
            while eng.has_work():
                for o in eng.step():
                    if o.prompt_logprobs is not None:
                        plp = o.prompt_logprobs
                    if o.token_id >= 0:
                        toks += 1
            dt = time.monotonic() - tt
            ok = plp is not None and len(plp) == 128 and plp[0] is None
            vals = [e[0] for e in plp[1:]] if plp else []
            mnll = round(-float(np.mean(vals)), 3) if vals else None
            emit({"metric": "prompt_logprobs_flagship",
                  "prompt_len": 128, "vocab": mc.vocab_size,
                  "entries": len(plp or []), "ok": bool(ok),
                  "wall_s": round(dt, 2), "output_tokens": toks,
                  "mean_nll": mnll})
            log(f"[t+{time.monotonic() - t0:.0f}s] plp ok={ok} "
                f"wall={dt:.1f}s mean_nll={mnll}")
            del eng
            gc.collect()
            settle()
        except Exception as e:
            log(f"plp phase failed: {type(e).__name__}: {str(e)[:300]}")

    if "spec_script" in phases:
        # FLAGSHIP speculative-decoding ceiling (VERDICT r4 next #2).
        # Random weights produce non-repeating output, so the honest n-gram
        # drafter measures 0 acceptance on ANY prompt (the spec phase
        # proves it: proposed=0). This phase rewires the SAME 24-layer
        # production-format params into a deterministic repeat-the-last-
        # token model — attention out-projection and expert down-projection
        # zeroed IN PLACE (donated; zeros are dense data, so per-step
        # compute, HBM traffic, and routing stay production-equal) — and
        # A/Bs adaptive async-spec against plain async on a constant-token
        # stream: the drafter's acceptance ceiling at true flagship cost.
        # DESTRUCTIVE to params: must be the LAST phase of its session.
        try:
            import dataclasses as dc

            zf = jax.jit(
                lambda t: jax.tree_util.tree_map(lambda a: a * 0, t),
                donate_argnums=0,
            )
            # replace layers IN PLACE (the section_glu_experts pattern): a
            # rebuilt list would keep every pre-zero tensor alive until the
            # rebind (+GBs); with in-place mutation + periodic drains the
            # transient is one layer even if the backend ignores donation
            for i, l in enumerate(params.layers):
                params.layers[i] = dc.replace(
                    l,
                    wo=zf(l.wo),
                    bo=None if l.bo is None else zf(l.bo),
                    w_down=zf(l.w_down),
                    b_down=None if l.b_down is None else zf(l.b_down),
                )
                if (i + 1) % 2 == 0:
                    settle(0.2)
            settle()
            log(f"[t+{time.monotonic() - t0:.0f}s] scripted params ready "
                f"(repeat-last-token, production layout)")
            rows = []
            for spec_t in (args.script_k, 0):
                eng = make_engine(4, spec_tokens=spec_t)
                for c in (1, 4):
                    r = run_load(eng, mc.vocab_size, c, 128, 24, seed=99,
                                 workload="constant")
                    log(f"  (script warm spec={spec_t} c={c}: {r['wall_s']}s "
                        f"proposed={eng.metrics.get('spec_proposed', 0)})")
                    eng.metrics["spec_proposed"] = 0
                    eng.metrics["spec_accepted"] = 0
                    eng.metrics["steps"] = 0
                    r = run_load(eng, mc.vocab_size, c, 128, 96,
                                 workload="constant")
                    r["spec_tokens"] = spec_t
                    r["steps"] = eng.metrics["steps"]
                    if spec_t:
                        r["final_k"] = eng._spec_k
                    rows.append(r)
                    log(f"[t+{time.monotonic() - t0:.0f}s] script spec={spec_t} "
                        f"c={c}: {r['tok_s']} tok/s "
                        f"(steady {r['steady_tok_s']}) "
                        f"accept={r.get('spec_accept_rate')}")
                del eng
                gc.collect()
                settle()
            emit({"metric": "spec_decode_flagship_ceiling",
                  "layers": mc.num_layers, "quant": args.quant,
                  "workload": "constant(repeat-last-token script)",
                  "results": rows})
        except Exception as e:
            log(f"spec_script phase failed: {type(e).__name__}: {str(e)[:300]}")

    log(f"[t+{time.monotonic() - t0:.0f}s] session done")


if __name__ == "__main__":
    main()
