"""Trained-model quantization accuracy: train dense -> quantize -> PPL delta.

The r2 accuracy measurement quantized a RANDOM dense draw; a random model's
logits are near-uniform (nll ~= ln V), so quantization barely perturbs them
and the deltas were noise-bound (VERDICT r2 missing #3). This harness makes
the measurement decision-grade:

1. build a STRUCTURED synthetic corpus (low-entropy first-order Markov
   chain — learnable, deterministic given the seed);
2. train the tiny-config model DENSE on CPU (training/train_step.py) until
   its held-out nll is far below uniform;
3. quantize the trained experts (models.params.quantize_params) to NF4 and
   MXFP4 and score the SAME held-out stream with each parameterization.

The deltas then measure what 4-bit quantization does to a model whose
logits have structure — the honest form of the BASELINE contract ("4-bit
PPL delta <= 0.1"; the reference never published accuracy at all,
SURVEY.md §6, and its own validation stops at a forward smoke test,
``validate_conversion.py:116-142``).

Usage::

    python -m gpt_oss_vllm_tpu.tools.accuracy_train_eval \
        [--steps 400] [--eval-tokens 6000] [--seed 0]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def markov_corpus(vocab: int, n_tokens: int, seed: int, branch: int = 4,
                  top_prob: float = 0.72) -> np.ndarray:
    """First-order Markov stream: each state transitions to `branch` fixed
    successors (one dominant). Entropy ~= 1.1 nats/token — far below
    ln(vocab) — so a trained model separates cleanly from a random one."""
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, vocab, size=(vocab, branch))
    rest = (1.0 - top_prob) / (branch - 1)
    probs = np.full(branch, rest)
    probs[0] = top_prob
    out = np.empty(n_tokens, dtype=np.int32)
    s = int(rng.integers(0, vocab))
    for i in range(n_tokens):
        out[i] = s
        s = int(succ[s, rng.choice(branch, p=probs)])
    return out


def main(argv=None):
    import jax

    jax.config.update("jax_platforms", "cpu")  # CPU-only: training + scoring
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seqlen", type=int, default=129)
    ap.add_argument("--eval-tokens", type=int, default=6000)
    ap.add_argument("--train-tokens", type=int, default=300_000)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--save", default=None,
                    help="save the TRAINED dense params + a corpus sample as "
                         ".npz (consumed by chip_session's spec_tiny phase: a "
                         "model with self-similar output is what n-gram "
                         "speculative decoding needs to demonstrate end-to-end)")
    args = ap.parse_args(argv)

    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.models.params import quantize_params, random_params
    from gpt_oss_vllm_tpu.tools.eval_ppl import nll_of_tokens
    from gpt_oss_vllm_tpu.training.train_step import next_token_loss

    cfg = ModelConfig.tiny()
    corpus = markov_corpus(cfg.vocab_size, args.train_tokens + args.eval_tokens,
                           seed=args.seed)
    train, held = corpus[: args.train_tokens], corpus[args.train_tokens :]
    log(f"corpus: {len(train)} train / {len(held)} held-out tokens, "
        f"vocab {cfg.vocab_size} (uniform nll = {math.log(cfg.vocab_size):.3f})")

    params = random_params(cfg, QuantConfig(method="none"), seed=args.seed)

    import optax

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(next_token_loss)(params, cfg, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.monotonic()
    for i in range(args.steps):
        starts = rng.integers(0, len(train) - args.seqlen, args.batch)
        batch = np.stack([train[s : s + args.seqlen] for s in starts])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch))
        if i % 50 == 0 or i == args.steps - 1:
            log(f"  step {i}: train nll {float(loss):.4f} "
                f"({time.monotonic() - t0:.0f}s)")

    held_ids = held.tolist()
    results = {}
    nll_d, n = nll_of_tokens(params, cfg, held_ids, window=args.window)
    results["bf16-dense"] = nll_d
    log(f"dense held-out: nll {nll_d:.4f} ({n} tokens scored)")
    assert nll_d < 0.6 * math.log(cfg.vocab_size), (
        "trained model is not separated from uniform; raise --steps"
    )
    for method, sdt in (("nf4", "bfloat16"), ("mxfp4", "e8m0")):
        q = QuantConfig(method=method, scale_dtype=sdt)
        qp = quantize_params(params, cfg, q)
        nll_q, _ = nll_of_tokens(qp, cfg, held_ids, window=args.window)
        results[method] = nll_q
        log(f"{method}: nll {nll_q:.4f}  delta {nll_q - nll_d:+.5f} nats/tok "
            f"(ppl {math.exp(nll_q):.3f} vs dense {math.exp(nll_d):.3f}, "
            f"delta {math.exp(nll_q) - math.exp(nll_d):+.4f})")

    if args.save:
        leaves, _ = jax.tree_util.tree_flatten(params)
        # float32 on disk: numpy savez stores bfloat16 as raw void bytes
        # that np.load cannot hand back to JAX; the loader casts to the
        # template leaf dtypes
        np.savez(
            args.save,
            corpus=held[:2048],
            **{f"leaf_{i}": np.asarray(l, dtype=np.float32)
               for i, l in enumerate(leaves)},
        )
        log(f"trained params saved to {args.save} ({len(leaves)} leaves)")

    import json

    print(json.dumps({
        "metric": "trained_quantization_nll_delta",
        "tokens_scored": n,
        "uniform_nll": round(math.log(cfg.vocab_size), 4),
        "dense_nll": round(results["bf16-dense"], 4),
        "nf4_nll": round(results["nf4"], 4),
        "mxfp4_nll": round(results["mxfp4"], 4),
        "nf4_delta": round(results["nf4"] - results["bf16-dense"], 5),
        "mxfp4_delta": round(results["mxfp4"] - results["bf16-dense"], 5),
        "dense_ppl": round(math.exp(results["bf16-dense"]), 3),
        "nf4_ppl_delta": round(math.exp(results["nf4"]) - math.exp(results["bf16-dense"]), 4),
        "mxfp4_ppl_delta": round(math.exp(results["mxfp4"]) - math.exp(results["bf16-dense"]), 4),
    }))


if __name__ == "__main__":
    main()
