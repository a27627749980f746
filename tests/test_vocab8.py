"""Int8 vocab table (quant/vocab8.py + ops/lm_head.py): quantization
numerics, the gather-embed path, the fused Pallas lm_head kernel vs its XLA
oracle (interpret mode), and end-to-end greedy decode through the engine
step with vocab_int8 enabled."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.ops.lm_head import lm_head_int8
from gpt_oss_vllm_tpu.quant.vocab8 import (
    Int8Vocab,
    embed_rows,
    int8_vocab_from_dense,
    lm_head_logits_xla,
    random_int8_vocab,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_roundtrip_error_bound(rng):
    w = rng.normal(0, 0.02, size=(100, 160)).astype(np.float32)
    v = int8_vocab_from_dense(jnp.asarray(w))
    deq = np.asarray(v.dequantize(jnp.float32))
    # symmetric per-row int8: |err| <= scale/2 = row_absmax/254
    bound = np.abs(w).max(axis=1, keepdims=True) / 254.0 + 1e-9
    assert np.all(np.abs(deq - w) <= bound)
    # padded regions are exactly zero
    assert v.qdata.shape[0] % 512 == 0 and v.qdata.shape[1] % 128 == 0
    assert np.asarray(v.scales)[100:].max() == 0.0


def test_embed_rows_matches_dequant_gather(rng):
    w = rng.normal(0, 0.02, size=(64, 128)).astype(np.float32)
    v = int8_vocab_from_dense(jnp.asarray(w))
    toks = jnp.asarray([[0, 5, 63], [7, 7, -1]], jnp.int32)  # -1 = pad slot
    got = np.asarray(embed_rows(v, toks, dtype=jnp.float32))
    want = np.asarray(v.dequantize(jnp.float32))[np.maximum(np.asarray(toks), 0)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("B,V,H", [(1, 512, 128), (5, 1024, 256), (16, 512, 384)])
def test_lm_head_kernel_matches_oracle(rng, B, V, H):
    v = int8_vocab_from_dense(jnp.asarray(rng.normal(0, 0.02, size=(V, H)).astype(np.float32)))
    h = jnp.asarray(rng.normal(0, 1, size=(B, H)), jnp.bfloat16)
    got = np.asarray(lm_head_int8(h, v, interpret=True))
    want = np.asarray(lm_head_logits_xla(v, h.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # pad-row logits are exactly zero in both
    assert got.shape == (B, v.padded_vocab)
    assert np.all(got[:, V:] == 0.0)


def test_random_int8_vocab_layout():
    v = random_int8_vocab(jax.random.PRNGKey(0), V=600, H=130)
    assert v.qdata.shape == (1024, 256) and v.scales.shape == (1024,)
    q = np.asarray(v.qdata)
    assert np.all(q[600:] == 0) and np.all(q[:, 130:] == 0)
    assert np.asarray(v.scales)[600:].max() == 0.0


def test_engine_step_greedy_parity_int8(rng):
    """Cached step with an int8 vocab produces the same greedy tokens as the
    no-cache oracle forward over the same int8 params (exact parity — both
    paths read identical quantized values)."""
    from gpt_oss_vllm_tpu.engine.kv_cache import KVCache
    from gpt_oss_vllm_tpu.engine.step import model_step
    from gpt_oss_vllm_tpu.models.gpt_oss import forward
    from gpt_oss_vllm_tpu.models.params import random_params
    from gpt_oss_vllm_tpu.config import CacheConfig

    cfg = ModelConfig.tiny()
    quant = QuantConfig(method="none", vocab_int8=True)
    params = random_params(cfg, quant, seed=3)
    assert isinstance(params.embedding, Int8Vocab)

    T0 = 7
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, T0)), jnp.int32)
    oracle_logits = forward(params, cfg, toks)
    want = int(jnp.argmax(oracle_logits[0, -1]))

    cache_cfg = CacheConfig(block_size=4, num_blocks=16, max_blocks_per_seq=8)
    cache = KVCache.create(cfg, cache_cfg)
    bt = jnp.asarray([[0, 1, 2, -1, -1, -1, -1, -1]], jnp.int32)
    out = model_step(
        params,
        cfg,
        cache,
        toks,
        jnp.arange(T0, dtype=jnp.int32)[None],
        bt,
        jnp.asarray([T0 - 1], jnp.int32),
    )
    assert out.logits.shape == (1, cfg.vocab_size)
    got = int(jnp.argmax(out.logits[0]))
    assert got == want
    np.testing.assert_allclose(
        np.asarray(out.logits[0]),
        np.asarray(oracle_logits[0, -1]),
        rtol=2e-2,
        atol=2e-2,
    )


def test_num_params_counts_int8_once():
    from gpt_oss_vllm_tpu.models.params import random_params

    cfg = ModelConfig.tiny()
    dense = random_params(cfg, QuantConfig(method="none"), seed=0)
    q8 = random_params(cfg, QuantConfig(method="none", vocab_int8=True), seed=0)
    # exact accounting: each of the two vocab tables (embedding + untied
    # lm_head) swaps its V*H bf16 leaf for Vp*Hp int8 qdata (1 param/byte —
    # only uint8 NF4 packs 2) plus Vp f32 scales
    from gpt_oss_vllm_tpu.quant.vocab8 import VOCAB_TILE, _LANE, _pad_to

    V, H = cfg.vocab_size, cfg.hidden_size
    Vp, Hp = _pad_to(V, VOCAB_TILE), _pad_to(H, _LANE)
    assert q8.num_params() == dense.num_params() + 2 * (Vp * Hp + Vp - V * H)


def test_lm_head_argmax_fused_matches_logits_argmax():
    """The fused argmax sweep must be bit-identical to argmax over the int8
    logits kernel (same f32 accumulator, first-index tie rule), with vocab
    pad lanes excluded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpt_oss_vllm_tpu.ops.lm_head import lm_head_argmax_int8, lm_head_int8
    from gpt_oss_vllm_tpu.quant.vocab8 import int8_vocab_from_dense

    rng = np.random.default_rng(7)
    V, H, B = 500, 128, 5  # V pads to the vocab tile; pad lanes must lose
    table = jnp.asarray(rng.normal(0, 1, (V, H)).astype(np.float32) * 0.05)
    vocab = int8_vocab_from_dense(table.astype(jnp.bfloat16))
    h = jnp.asarray(rng.normal(0, 1, (B, H)).astype(np.float32)).astype(jnp.bfloat16)
    # negative-max rows: force logits below zero so 0-valued pad lanes would
    # win if unmasked
    h = h.at[0].set(-jnp.abs(h[0]) * 0 - 1.0)
    want = jnp.argmax(lm_head_int8(h, vocab, interpret=True)[:, :V], axis=-1)
    got = lm_head_argmax_int8(h, vocab, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # tie handling: duplicate rows in the table -> first index wins
    table2 = table.at[7].set(table[300])
    vocab2 = int8_vocab_from_dense(table2.astype(jnp.bfloat16))
    want2 = jnp.argmax(lm_head_int8(h, vocab2, interpret=True)[:, :V], axis=-1)
    got2 = lm_head_argmax_int8(h, vocab2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))
