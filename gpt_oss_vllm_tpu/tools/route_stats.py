"""Per-layer distinct-expert counts under the bench's token streams.

Settles whether an NF4-vs-MXFP4 batched-throughput delta is a real kernel
gap or a routing artifact: batched gmm cost is proportional to the number
of DISTINCT activated experts per layer (each one's weights are DMA'd and
dequantized once), and with random weights the two formats' random scale
distributions can concentrate routing differently (the round-1 benchmark
honesty issue, docs/STATUS.md).

Runs on CPU (eager, no jit) with the exact same param-generation seeds and
token streams as bench.py; routing indices are captured by wrapping the
router. Usage:

    python -m gpt_oss_vllm_tpu.tools.route_stats --layers 8 --batch 8
"""

from __future__ import annotations

import argparse
import dataclasses
import os

os.environ["BENCH_ALLOW_CPU"] = "1"  # importing bench must not SystemExit here

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import gpt_oss_vllm_tpu.engine.step as step_mod
    from gpt_oss_vllm_tpu.config import CacheConfig, ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.engine.kv_cache import KVCache
    from gpt_oss_vllm_tpu.models.params import fuse_qkv, random_params

    import bench  # repo root: same config/token-stream recipe

    cfg = dataclasses.replace(
        bench.dataclasses_replace_tied(ModelConfig()), num_layers=args.layers
    )
    cache_cfg = CacheConfig(
        block_size=16, num_blocks=12 * args.batch + 16, max_blocks_per_seq=16
    )

    # capture routing by wrapping the moe block's router output
    captured: list[np.ndarray] = []
    orig_moe = step_mod.moe_block

    def capturing_moe(x, rw, rb, *a, **k):
        from gpt_oss_vllm_tpu.ops.moe import route_topk

        r = route_topk(x, rw, rb, cfg.experts_per_token)
        captured.append(np.asarray(r.indices))
        return orig_moe(x, rw, rb, *a, **k)

    step_mod.moe_block = capturing_moe

    for method in ("nf4", "mxfp4"):
        sdt = "e8m0" if method == "mxfp4" else "bfloat16"
        quant = QuantConfig(method=method, scale_dtype=sdt)
        params = fuse_qkv(random_params(cfg, quant, seed=0))
        cache = KVCache.create(cfg, cache_cfg)
        bt = np.full((args.batch, cache_cfg.max_blocks_per_seq), -1, np.int32)
        per_seq = (bench.PREFILL_LEN + args.steps + 16) // 16 + 1
        blk = 0
        for b in range(args.batch):
            bt[b, :per_seq] = np.arange(blk, blk + per_seq)
            blk += per_seq
        bt = jnp.asarray(bt)
        rtok = jax.random.randint(
            jax.random.PRNGKey(7), (64, args.batch), 0, cfg.vocab_size, dtype=jnp.int32
        )
        pos = jnp.full((args.batch,), bench.PREFILL_LEN, jnp.int32)
        counts = []
        for s in range(args.steps):
            captured.clear()
            out = step_mod.model_step(
                params,
                cfg,
                cache,
                rtok[s][:, None],
                pos[:, None],
                bt,
                jnp.zeros(args.batch, jnp.int32),
                moe_strategy="gather",
                attn_backend="xla",
                quant_backend="xla",
            )
            cache = out.cache
            pos = pos + 1
            counts.append([len(np.unique(ix)) for ix in captured])
        arr = np.asarray(counts)  # [steps, layers]
        print(
            f"{method}: distinct experts/layer (batch={args.batch}, k=4): "
            f"mean {arr.mean():.1f}  min {arr.min()}  max {arr.max()}  "
            f"per-layer means {np.round(arr.mean(0), 1).tolist()}",
            flush=True,
        )

    step_mod.moe_block = orig_moe


if __name__ == "__main__":
    main()
