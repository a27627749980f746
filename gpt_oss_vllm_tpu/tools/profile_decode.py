"""Op-level profile of the decode step on the attached chip.

Traces N decode steps with jax.profiler, then parses the xplane proto via
the tensorboard profile plugin and prints per-op self-times aggregated by
fusion/op name — the measurement that decides WHERE the fused-decode-layer
work should aim (decomp_bench gives component deltas; this gives the
op-by-op picture inside a component).

Usage: python -m gpt_oss_vllm_tpu.tools.profile_decode --layers 8 --batch 1
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_oss_tpu_jit_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gpt_oss_vllm_tpu.utils.platform import ensure_platform

ensure_platform()


def main():
    import bench

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--quant", default="mxfp4", choices=["nf4", "mxfp4"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out", default="/tmp/gpt_oss_decode_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    from gpt_oss_vllm_tpu.config import CacheConfig, ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.engine.kv_cache import KVCache
    from gpt_oss_vllm_tpu.models.params import (
        fuse_qkv,
        random_params_on_device,
        section_glu_experts,
    )

    cfg = dataclasses.replace(
        bench.dataclasses_replace_tied(ModelConfig()), num_layers=args.layers
    )
    sdt = "e8m0" if args.quant == "mxfp4" else "bfloat16"
    quant = QuantConfig(method=args.quant, scale_dtype=sdt, vocab_int8=True)
    params = fuse_qkv(random_params_on_device(cfg, quant, seed=0, sync_every_layer=True))
    params = section_glu_experts(params)
    time.sleep(2.0)
    cache_cfg = CacheConfig(
        block_size=16, num_blocks=max(160, 12 * args.batch + 16), max_blocks_per_seq=16
    )
    cache = KVCache.create(cfg, cache_cfg)
    bt = np.full((args.batch, cache_cfg.max_blocks_per_seq), -1, np.int32)
    per_seq = 11
    blk = 0
    for b in range(args.batch):
        bt[b, :per_seq] = np.arange(blk, blk + per_seq)
        blk += per_seq
    bt = jnp.asarray(bt)
    step = bench.build_decode_step(cfg, "pallas", attn_backend="pallas")
    rtok = jax.random.randint(
        jax.random.PRNGKey(7), (64, args.batch), 0, cfg.vocab_size, dtype=jnp.int32
    )
    pos = jnp.full((args.batch,), bench.PREFILL_LEN, jnp.int32)
    tok = rtok[0]
    cache, tok, pos = step(params, cache, bt, tok, pos)
    _ = np.asarray(tok)
    print("warm; tracing", flush=True)

    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        cache, tok, pos = step(params, cache, bt, rtok[i % 64], pos)
    _ = np.asarray(tok)
    jax.profiler.stop_trace()
    print("trace done; parsing", flush=True)

    # parse the chrome-trace export: aggregate device-op durations per pid
    # (device lanes carry the XLA op/fusion events)
    import gzip
    import json as _json

    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit("no trace.json.gz found")
    with gzip.open(paths[-1], "rt") as f:
        tr = _json.load(f)
    events = tr["traceEvents"]
    # pid/tid names
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = {}
    lane_tot = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_name.get(e["pid"], "")
        if "TPU" not in pn and "Device" not in pn:
            continue
        tn = tid_name.get((e["pid"], e["tid"]), "")
        if "Steps" in tn or "step" == tn.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)  # us
        agg[(tn, name)] = agg.get((tn, name), 0.0) + dur
        lane_tot[tn] = lane_tot.get(tn, 0.0) + dur
    print("\nlane totals (us/step):")
    for tn, us in sorted(lane_tot.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {us/args.steps:9.1f}  {tn}")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"\ntop ops (us/step over {args.steps} steps):")
    for (tn, name), us in items[: args.top]:
        print(f"{us/args.steps:9.1f} us/step  [{tn[:20]:20s}] {name[:110]}")


if __name__ == "__main__":
    main()
