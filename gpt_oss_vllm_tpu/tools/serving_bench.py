"""Serving-path throughput bench: tokens/s THROUGH the engine loop.

bench.py measures the jitted model step in an on-device chain — the kernel
ceiling. The reference's 8.3 tok/s (``/root/reference/patches/USAGE.md:73``)
was measured through its server: scheduler, sampler, host round-trips and
all. This harness drives the real ``InferenceEngine.step()`` loop on random
full-size weights at concurrency c and reports:

- sustained output tokens/s over the run (admission + decode interleaved),
- steady-state decode tokens/s (window after the last admission),
- per-request TTFT p50/p99 (arrival -> first token),
- the gap vs the kernel-chain numbers (host/sync overheads + admission).

NOTE on this build environment: the chip is tunnel-attached, so every
device->host readback pays ~10-20 ms RTT that a PCIe-attached production
host does not; the engine-loop numbers here are a LOWER bound. The sync-gap
breakdown (readback RTT vs scheduler time) is printed to make that
attributable.

Usage::

    python -m gpt_oss_vllm_tpu.tools.serving_bench --quant mxfp4 --vocab8 \
        --concurrency 1 8 32 [--layers 24] [--http]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_oss_tpu_jit_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pctl(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


def run_load(engine, tokenizer_vocab: int, concurrency: int, prompt_len: int,
             max_tokens: int, seed: int = 0, workload: str = "random"):
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    rng = np.random.default_rng(seed)
    sp = SamplingParams(max_tokens=max_tokens, temperature=0.0)
    arrivals = {}
    first_tok = {}
    done = set()
    t0 = time.monotonic()
    shared = (
        rng.integers(0, tokenizer_vocab, max(1, prompt_len - 16))
        if workload == "shared_prefix" else None
    )
    for i in range(concurrency):
        rid = f"load-{concurrency}-{i}"
        if workload == "shared_prefix":
            # one common block-aligned prefix + a distinct 16-token tail:
            # the radix prefix cache should serve the prefix KV of every
            # request after the first from the shared blocks
            prompt = shared.tolist() + rng.integers(
                0, tokenizer_vocab, prompt_len - len(shared)
            ).tolist()
        elif workload == "repetitive":
            # cyclic pattern: the n-gram drafter's favorable case (code/
            # boilerplate-like text where prompt-lookup spec decode pays)
            pat = rng.integers(0, tokenizer_vocab, 24)
            prompt = np.tile(pat, -(-prompt_len // 24))[:prompt_len].tolist()
        elif workload == "constant":
            # one token repeated: with a scripted repeat-the-last-token
            # model (chip_session spec_script) the OUTPUT is draftable too
            # — the drafter's acceptance ceiling at full flagship cost
            prompt = [int(rng.integers(1, tokenizer_vocab))] * prompt_len
        else:
            prompt = rng.integers(0, tokenizer_vocab, prompt_len).tolist()
        engine.add_request(rid, prompt, sp)
        arrivals[rid] = t0
    out_tokens = 0
    last_admit_t = None
    steady_t0, steady_tokens = None, 0
    while engine.has_work():
        before_running = engine.num_running()
        outs = engine.step()
        if engine.num_running() > before_running or engine.waiting:
            last_admit_t = time.monotonic()
        for o in outs:
            if o.token_id >= 0:
                out_tokens += 1
                if o.request_id not in first_tok:
                    first_tok[o.request_id] = time.monotonic()
                if steady_t0 is not None:
                    steady_tokens += 1
            if o.finished:
                done.add(o.request_id)
        if steady_t0 is None and not engine.waiting and engine.num_running() == concurrency:
            steady_t0 = time.monotonic()
            steady_tokens = 0
    t1 = time.monotonic()
    ttfts = [first_tok[r] - arrivals[r] for r in first_tok]
    steady = None
    if steady_t0 is not None and t1 > steady_t0 and steady_tokens > 0:
        steady = steady_tokens / (t1 - steady_t0)
    res = {
        "concurrency": concurrency,
        "output_tokens": out_tokens,
        "wall_s": round(t1 - t0, 3),
        "tok_s": round(out_tokens / (t1 - t0), 2),
        "steady_tok_s": round(steady, 2) if steady else None,
        "ttft_p50_ms": round(pctl(ttfts, 50) * 1e3, 1),
        "ttft_p99_ms": round(pctl(ttfts, 99) * 1e3, 1),
        "completed": len(done),
    }
    if engine.metrics.get("spec_proposed", 0) > 0:
        res["spec_proposed"] = engine.metrics["spec_proposed"]
        res["spec_accepted"] = engine.metrics["spec_accepted"]
        res["spec_accept_rate"] = round(
            engine.metrics["spec_accepted"] / engine.metrics["spec_proposed"], 3
        )
    return res


def measure_readback_rtt() -> float:
    """One device->host readback of a tiny array, steady state (the tunnel
    RTT that pollutes every per-step host sync in this environment)."""
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.int32) + 1
    np.asarray(x)
    ts = []
    for _ in range(5):
        y = x + 1
        t = time.monotonic()
        np.asarray(y)
        ts.append(time.monotonic() - t)
        x = y
    return min(ts)


def main(argv=None):
    from gpt_oss_vllm_tpu.utils.platform import ensure_platform

    backend = ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="nf4", choices=["nf4", "mxfp4"])
    ap.add_argument("--vocab8", action="store_true")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--spec-tokens", type=int, default=0)
    ap.add_argument("--async-depth", type=int, default=8,
                    help="in-flight decode steps (tunnel-attached chip wants 4-8)")
    ap.add_argument("--flush-burst", type=int, default=8,
                    help="token readbacks batched as one stacked transfer "
                         "per this many steps (tunnel RTT amortization)")
    ap.add_argument("--attn-backend", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="decode attention path A/B: pallas paged kernel vs "
                         "XLA gather (short contexts can favor the gather)")
    ap.add_argument("--sync-decode", action="store_true",
                    help="disable the async (overlapped-readback) decode path")
    ap.add_argument("--workload", default="random",
                    choices=["random", "repetitive"],
                    help="repetitive = cyclic prompts (n-gram spec decode's "
                         "favorable case; use with --spec-tokens)")
    args = ap.parse_args(argv)

    from gpt_oss_vllm_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
    )
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.models.params import prepare_serving_params

    mc = dataclasses.replace(
        ModelConfig(),
        tie_word_embeddings=True,
        num_layers=args.layers or ModelConfig().num_layers,
    )
    sdt = "e8m0" if args.quant == "mxfp4" else "bfloat16"
    quant = QuantConfig(method=args.quant, scale_dtype=sdt, vocab_int8=args.vocab8)
    cmax = max(args.concurrency)
    blocks_per_seq = (args.prompt_len + args.max_tokens) // 16 + 2
    cfg = EngineConfig(
        model=mc,
        quant=quant,
        cache=CacheConfig(
            block_size=16,
            num_blocks=cmax * blocks_per_seq + 8,
            max_blocks_per_seq=blocks_per_seq + 2,
            enable_prefix_caching=False,  # random prompts share nothing
        ),
        scheduler=SchedulerConfig(
            max_num_seqs=cmax, max_model_len=4096,
            spec_tokens=args.spec_tokens,
            async_decode=not args.sync_decode,
            async_depth=args.async_depth,
            async_flush_burst=args.flush_burst,
        ),
    )
    log(f"backend={backend} quant={args.quant} vocab8={args.vocab8} "
        f"layers={mc.num_layers} async={not args.sync_decode}")
    t0 = time.monotonic()
    # repack BEFORE the engine allocates its KV pool (see
    # prepare_serving_params: pool-first + repack OOMs at 24L), and pass as
    # a TEMPORARY so no pre-repack tensor stays alive
    engine = InferenceEngine(
        cfg, prepare_serving_params(mc, quant, seed=0),
        attn_backend=args.attn_backend,
    )
    log(f"params + engine ready in {time.monotonic() - t0:.1f}s")
    rtt = measure_readback_rtt() if backend == "tpu" else 0.0
    log(f"device->host readback RTT (tunnel tax per host sync): {rtt * 1e3:.1f} ms")

    results = []
    for c in args.concurrency:
        # warm the decode program at this batch composition
        r = run_load(engine, mc.vocab_size, c, args.prompt_len, 8, seed=99,
                     workload=args.workload)
        log(f"  (warm c={c}: {r['wall_s']}s)")
        engine.timer.samples.clear()
        engine.metrics["spec_proposed"] = 0
        engine.metrics["spec_accepted"] = 0
        r = run_load(engine, mc.vocab_size, c, args.prompt_len, args.max_tokens,
                     workload=args.workload)
        r["readback_rtt_ms"] = round(rtt * 1e3, 1)
        results.append(r)
        log(f"c={c}: {r['tok_s']} tok/s (steady {r['steady_tok_s']}), "
            f"TTFT p50 {r['ttft_p50_ms']} ms / p99 {r['ttft_p99_ms']} ms")
        log(f"  phases: " + json.dumps(
            {k: round(v["p50_ms"], 2) for k, v in engine.timer.summary().items()}
        ))
    print(json.dumps({"metric": "serving_engine_loop", "quant": args.quant,
                      "vocab8": args.vocab8, "layers": mc.num_layers,
                      "async": not args.sync_decode, "results": results}))


if __name__ == "__main__":
    main()
