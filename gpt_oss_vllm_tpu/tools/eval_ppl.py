"""Perplexity evaluation harness — the accuracy side of the BASELINE contract
("4-bit PPL delta <= 0.1 vs the CUDA BnB reference"; the reference itself
never published accuracy numbers, SURVEY.md §6).

Computes token-level NLL/PPL of text (or pre-tokenized streams) through the
full no-cache forward in sliding windows, for any two parameterizations of
the same checkpoint (e.g. NF4-packed vs dequantized-bf16), and reports the
delta. With no network egress in this build environment the harness is
exercised against synthetic checkpoints; on a real deployment point it at
the converted model + a text file.

Usage::

    python -m gpt_oss_vllm_tpu.tools.eval_ppl --checkpoint /data/native \
        --text wiki.txt --window 1024 [--compare-dense]
    python -m gpt_oss_vllm_tpu.tools.eval_ppl --tiny --synthetic-tokens 4096
"""

from __future__ import annotations

import argparse
import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def nll_of_tokens(
    params,
    cfg,
    token_ids: List[int],
    window: int = 512,
    stride: Optional[int] = None,
    quant_backend: str = "xla",
) -> Tuple[float, int]:
    """Mean NLL (nats/token) over the stream, sliding-window evaluation.

    Each window predicts its second half only (except the first), the
    standard strided-PPL protocol, so every scored token has >= window/2
    context.
    """
    from gpt_oss_vllm_tpu.models.gpt_oss import forward

    stride = stride or window // 2
    ids = np.asarray(token_ids, dtype=np.int32)
    total_nll, total_tok = 0.0, 0

    fwd = jax.jit(
        lambda p, t: forward(p, cfg, t, moe_strategy="all", quant_backend=quant_backend)
    )
    start = 0
    while start < len(ids) - 1:
        end = min(start + window, len(ids))
        chunk = ids[start:end]
        if len(chunk) < 2:
            break
        logits = np.asarray(fwd(params, jnp.asarray(chunk[None])))[0]
        logp = logits - _logsumexp(logits)
        # score only tokens past the overlap (except in the first window)
        score_from = 0 if start == 0 else (window - stride) - 1
        targets = chunk[1:]
        rows = np.arange(len(targets))
        nll = -logp[rows, targets]
        nll = nll[score_from:]
        total_nll += float(nll.sum())
        total_tok += len(nll)
        if end == len(ids):
            break
        start += stride
    return total_nll / max(total_tok, 1), total_tok


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def main(argv=None):
    # --cpu must act before any backend use (the env var alone cannot: the
    # axon sitecustomize force-sets jax_platforms — see CLAUDE.md)
    if argv is not None and "--cpu" in argv:
        jax.config.update("jax_platforms", "cpu")
    elif argv is None and "--cpu" in __import__("sys").argv:
        jax.config.update("jax_platforms", "cpu")
    from gpt_oss_vllm_tpu.utils.platform import ensure_platform

    ensure_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (a full-size DENSE comparison model "
             "cannot fit one TPU chip's HBM; host RAM holds it)",
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument(
        "--full-random", action="store_true",
        help="full-size GPT-OSS-20B with random weights: the quantized model "
             "packs the SAME dense draw (same seed), so the PPL delta "
             "isolates 4-bit quantization exactly — the strongest accuracy "
             "statement available without network egress (VERDICT r1 §missing-1)",
    )
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--text", default=None, help="UTF-8 text file to score")
    ap.add_argument("--synthetic-tokens", type=int, default=0)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--tokenizer", default="o200k_harmony")
    ap.add_argument("--compare-dense", action="store_true",
                    help="also score with dequantized-bf16 weights and report the PPL delta")
    ap.add_argument("--quant", default="nf4", choices=["nf4", "mxfp4"])
    ap.add_argument("--vocab-int8", dest="vocab_int8", action="store_true",
                    help="quantize the vocab table per-row int8 in the QUANTIZED "
                         "run (isolates the vocab8 PPL cost vs the same 4-bit run)")
    args = ap.parse_args(argv)

    import dataclasses
    import gc

    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig

    # params are built LAZILY and sequentially (quantized eval, free,
    # dense eval): a full-size quantized + dense pair resident together
    # plus the jit's dequant workspace would not fit host RAM
    if args.tiny or args.full_random:
        cfg = ModelConfig.tiny() if args.tiny else ModelConfig(tie_word_embeddings=True)
        if args.layers:
            cfg = dataclasses.replace(cfg, num_layers=args.layers)
        from gpt_oss_vllm_tpu.models.params import random_params

        sdt = "e8m0" if args.quant == "mxfp4" else "bfloat16"

        def make_q():
            # random_params quantizes the SAME rng draw the dense path
            # returns: the delta isolates quantization
            return random_params(
                cfg,
                QuantConfig(method=args.quant, scale_dtype=sdt,
                            vocab_int8=args.vocab_int8),
                seed=0,
            )

        def make_d():
            return random_params(cfg, QuantConfig(method="none"), seed=0)
    else:
        from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
        from gpt_oss_vllm_tpu.models.params import load_params_from_store

        store = TensorStore(args.checkpoint)
        cfg = ModelConfig(**store.metadata["model_config"])

        def make_q():
            return load_params_from_store(
                store, cfg, QuantConfig(method=args.quant, vocab_int8=args.vocab_int8)
            )

        def make_d():
            # NOTE: a converted store holds only the 4-bit payload, so its
            # 'dense' load is the dequantized 4-bit model (a converter-
            # fidelity check, delta ~0 by construction); for a true
            # quantization delta use --full-random
            return load_params_from_store(store, cfg, QuantConfig(method="none"))

    if args.text:
        from gpt_oss_vllm_tpu.serving.tokenizer import get_tokenizer

        tok = get_tokenizer(args.tokenizer)
        with open(args.text) as f:
            ids = tok.encode(f.read())
    elif args.synthetic_tokens:
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, args.synthetic_tokens).tolist()
    else:
        raise SystemExit("need --text or --synthetic-tokens")

    qp = make_q()
    nll_q, n = nll_of_tokens(qp, cfg, ids, window=args.window)
    label = args.quant + ("+vocab8" if args.vocab_int8 else "")
    print(f"{label}: nll {nll_q:.4f} nats/tok  ppl {math.exp(nll_q):.3f}  ({n} tokens)",
          flush=True)
    if args.compare_dense or args.tiny:
        del qp
        gc.collect()
        jax.clear_caches()
        dp = make_d()
        nll_d, _ = nll_of_tokens(dp, cfg, ids, window=args.window)
        print(f"dense: nll {nll_d:.4f} nats/tok  ppl {math.exp(nll_d):.3f}")
        print(f"ppl delta (quantized - dense): {math.exp(nll_q) - math.exp(nll_d):+.4f}")
        print(f"nll delta: {nll_q - nll_d:+.6f} nats/tok")


if __name__ == "__main__":
    main()
