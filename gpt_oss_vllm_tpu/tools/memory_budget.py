"""HBM budget accounting: model + KV bytes per chip for a sharded config.

The planning tool behind BASELINE config 5 (GPT-OSS-120B on a multi-host
mesh): given (ModelConfig, QuantConfig, ParallelConfig), report per-chip
resident bytes by component and whether the config fits a target chip.
Mirrors how the params are actually laid out by ``models.params`` +
``parallel.sharding`` (packed expert weights shard over the combined
expert axes; attention over 'model'; vocab tables replicated or
vocab-parallel).

Usage::

    python -m gpt_oss_vllm_tpu.tools.memory_budget --model 120b --ep 8 --tp 2 \
        --chip v5p
"""

from __future__ import annotations

import argparse
from typing import Dict

from gpt_oss_vllm_tpu.config import CacheConfig, ModelConfig, ParallelConfig, QuantConfig

# usable HBM per chip (GB) after runtime reservation, conservative
CHIP_HBM_GB = {"v5e": 15.75, "v5p": 93.0, "v4": 31.0}


def model_bytes_per_chip(
    cfg: ModelConfig,
    quant: QuantConfig,
    parallel: ParallelConfig,
    cache: CacheConfig | None = None,
) -> Dict[str, float]:
    H, FF, E, L, V = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.num_experts,
        cfg.num_layers,
        cfg.vocab_size,
    )
    ep, tp = parallel.ep, parallel.tp
    expert_shards = ep * tp if E % (ep * tp) == 0 else ep  # parallel/kernels
    bs = quant.effective_blocksize
    dt_bytes = 2  # bf16 non-quantized compute dtype

    expert_params = E * (2 * FF * H + H * FF)
    if quant.enabled:
        scale_bytes = {"e8m0": 1, "bfloat16": 2, "float16": 2, "float32": 4}[
            quant.scale_dtype
        ]
        expert_w = expert_params / 2 + (expert_params // bs) * scale_bytes
    else:
        expert_w = expert_params * dt_bytes
    expert_b = E * (2 * FF + H) * 4 if cfg.expert_bias else 0

    attn = (cfg.q_size * H * 2 + cfg.kv_size * H * 2 + H * cfg.q_size) * dt_bytes
    attn += (cfg.q_size + 2 * cfg.kv_size + H) * 4 if cfg.attention_bias else 0
    attn += cfg.num_heads * 4 if cfg.use_sinks else 0
    router = (E * H + E) * 4
    norms = 2 * H * 4

    vocab_tables = 1 if cfg.tie_word_embeddings else 2
    if quant.vocab_int8:
        vocab = vocab_tables * (V * H + 4 * V)
    else:
        vocab = vocab_tables * V * H * dt_bytes
    # untied lm_head is vocab-parallel over tp; the gather-side embedding
    # replicates
    if not cfg.tie_word_embeddings:
        vocab = V * H * (dt_bytes if not quant.vocab_int8 else 1) / tp + (
            V * H * (dt_bytes if not quant.vocab_int8 else 1)
        )

    per_chip = {
        "experts_gb": L * (expert_w + expert_b) / expert_shards / 1e9,
        "attention_gb": L * (attn / tp) / 1e9,
        "router_norms_gb": L * (router + norms) / 1e9,
        "vocab_gb": vocab / 1e9,
    }
    if cache is not None:
        kv_elem = 2 * L * cache.num_blocks * cache.block_size * cfg.kv_size
        kv_bytes = kv_elem * (1 if cache.dtype == "fp8" else 2)
        per_chip["kv_cache_gb"] = kv_bytes / tp / 1e9
    per_chip["total_gb"] = sum(per_chip.values())
    return per_chip


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="20b", choices=["20b", "120b"])
    ap.add_argument("--quant", default="mxfp4", choices=["nf4", "mxfp4", "none"])
    ap.add_argument("--ep", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--chip", default="v5e", choices=sorted(CHIP_HBM_GB))
    ap.add_argument("--kv-blocks", type=int, default=2048)
    args = ap.parse_args(argv)
    cfg = ModelConfig.gpt_oss_120b() if args.model == "120b" else ModelConfig()
    sdt = "e8m0" if args.quant == "mxfp4" else "bfloat16"
    quant = QuantConfig(method=args.quant, scale_dtype=sdt)
    par = ParallelConfig(ep=args.ep, tp=args.tp)
    cache = CacheConfig(num_blocks=args.kv_blocks)
    rep = model_bytes_per_chip(cfg, quant, par, cache)
    budget = CHIP_HBM_GB[args.chip]
    for k, v in rep.items():
        print(f"  {k:18s} {v:8.2f}")
    fit = "FITS" if rep["total_gb"] <= budget else "DOES NOT FIT"
    print(
        f"{args.model} {args.quant} ep={args.ep} tp={args.tp} on {args.chip} "
        f"({budget} GB usable): {rep['total_gb']:.2f} GB/chip -> {fit}"
    )


if __name__ == "__main__":
    main()
