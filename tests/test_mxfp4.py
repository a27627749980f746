"""MXFP4 (OCP FP4-E2M1 + E8M0 block scales) numerics, container, and kernels.

GPT-OSS's native checkpoint quantization (the format the reference overrides
away on its hardware, ``patch_4_override_quant.py:26-41``), implemented
first-class: golden numerics, in-graph dequant, and the fused Pallas matmul
path (interpret mode; the real-chip validation mirrors these shapes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.quant.mxfp4 import (
    FP4_CODE,
    FP4_MAGNITUDES,
    e8m0_decode,
    e8m0_encode,
    mxfp4_dequantize,
    mxfp4_quantize,
    quantize_to_fp4,
)
from gpt_oss_vllm_tpu.quant.tensor import q4_tensor_from_dense


def test_e8m0_roundtrip():
    for e in (-127, -64, -1, 0, 1, 64, 127):
        u = e8m0_encode(np.array([2.0**e]))
        assert e8m0_decode(u)[0] == 2.0**e


def test_e8m0_rounds_to_nearest_pow2():
    assert e8m0_decode(e8m0_encode(np.array([3.0])))[0] in (2.0, 4.0)
    assert e8m0_decode(e8m0_encode(np.array([1.1])))[0] == 1.0
    assert e8m0_decode(e8m0_encode(np.array([0.0])))[0] == 2.0**-127


def test_fp4_codes_golden():
    # every representable value maps to its own code
    idx = quantize_to_fp4(FP4_CODE)
    np.testing.assert_array_equal(FP4_CODE[idx], FP4_CODE)
    # nearest rounding across boundaries
    assert FP4_CODE[quantize_to_fp4(np.array([0.7]))[0]] == 0.5
    assert FP4_CODE[quantize_to_fp4(np.array([0.8]))[0]] == 1.0
    assert FP4_CODE[quantize_to_fp4(np.array([-5.1]))[0]] == -6.0
    assert FP4_CODE[quantize_to_fp4(np.array([100.0]))[0]] == 6.0  # saturates
    # ties round to even mantissa: 0.25 -> 0 (m=0), 2.5 -> 2 (m=0), 5 -> 4
    assert FP4_CODE[quantize_to_fp4(np.array([0.25]))[0]] == 0.0
    assert FP4_CODE[quantize_to_fp4(np.array([2.5]))[0]] == 2.0
    assert FP4_CODE[quantize_to_fp4(np.array([5.0]))[0]] == 4.0


def test_mxfp4_quant_dequant_roundtrip_exact():
    """Blocks of exactly-representable values survive bit-exactly."""
    rng = np.random.default_rng(0)
    scale = 2.0 ** rng.integers(-8, 8, size=4)
    w = (rng.choice(FP4_MAGNITUDES[1:], size=(4, 32)) *
         rng.choice([-1.0, 1.0], size=(4, 32)) * scale[:, None])
    packed, scales_u8 = mxfp4_quantize(w.reshape(-1))
    got = mxfp4_dequantize(packed, scales_u8, (4 * 32,))
    np.testing.assert_array_equal(got, w.reshape(-1).astype(np.float32))


def test_mxfp4_quant_error_bound():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.05, size=(8, 64)).astype(np.float32)
    packed, scales_u8 = mxfp4_quantize(w.reshape(-1))
    got = mxfp4_dequantize(packed, scales_u8, w.reshape(-1).shape).reshape(w.shape)
    # worst case: scale = 2^round(log2(absmax/6)) can round DOWN by sqrt(2),
    # clamping the block max to 6*scale — error up to (1 - 1/sqrt(2)) * absmax
    per_block_max = np.abs(w).reshape(-1, 32).max(1, keepdims=True)
    bound = np.maximum(per_block_max * 0.3, 1e-6)
    assert (np.abs(got - w).reshape(-1, 32) <= bound).all()


def test_q4_tensor_mxfp4_dequantize_matches_reference():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.05, size=(3, 48, 64)).astype(np.float32)
    t = q4_tensor_from_dense(w, blocksize=32, codebook="mxfp4")
    assert t.codebook == "mxfp4" and t.blocksize == 32
    got = np.asarray(t.dequantize(jnp.float32))
    want = np.stack([
        mxfp4_dequantize(*mxfp4_quantize(w[i].reshape(-1)), out_shape=(48, 64))
        for i in range(3)
    ])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_lut_fp4_exact():
    from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut_fp4

    got = np.asarray(_lut_fp4(jnp.arange(16, dtype=jnp.int32)))
    np.testing.assert_allclose(got, FP4_CODE, rtol=0, atol=1e-5)


def test_mxfp4_matmul_kernel_matches_dequant_oracle():
    from gpt_oss_vllm_tpu.ops.nf4_matmul import nf4_matmul

    rng = np.random.default_rng(3)
    N, K, M = 128, 192, 8
    w = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(N, K)).astype(np.float32),
        blocksize=32, codebook="mxfp4",
    )
    x = jnp.asarray(rng.normal(0, 1, size=(M, K)).astype(np.float32))
    got = np.asarray(nf4_matmul(x, w, interpret=True))
    want = np.asarray(x @ w.dequantize(jnp.float32).T)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_mxfp4_gmm_moe_block_matches_oracle():
    from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block

    rng = np.random.default_rng(4)
    T, H, FF, E, k = 5, 64, 96, 8, 2
    wgu = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32),
        blocksize=32, codebook="mxfp4",
    )
    wdn = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32),
        blocksize=32, codebook="mxfp4",
    )
    x = jnp.asarray(rng.normal(0, 1, size=(T, H)).astype(np.float32))
    rw = jnp.asarray(rng.random((T, k)).astype(np.float32))
    ri = jnp.asarray(
        np.stack([rng.choice(E, size=k, replace=False) for _ in range(T)]).astype(np.int32)
    )

    def act(h):
        g, u = jnp.split(h, 2, axis=-1)
        return jax.nn.silu(g) * u

    got = np.asarray(
        moe_gmm_block(x, rw, ri, wgu, None, wdn, None, act, interpret=True)
    )
    # oracle: dense dequant per expert
    wg = np.asarray(wgu.dequantize(jnp.float32))
    wd = np.asarray(wdn.dequantize(jnp.float32))
    want = np.zeros((T, H), np.float32)
    for t in range(T):
        for j in range(k):
            e = int(ri[t, j])
            h = np.asarray(x)[t] @ wg[e].T
            g, u = h[:FF], h[FF:]
            a = (g / (1 + np.exp(-g))) * u
            want[t] += float(rw[t, j]) * (a @ wd[e].T)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_engine_mxfp4_greedy_matches_dense():
    """Tiny engine E2E: mxfp4-quantized experts decode close enough to the
    dense model that the plumbing (config -> params -> step) is exercised;
    greedy tokens come from the quantized model deterministically."""
    from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams
    from gpt_oss_vllm_tpu.models.params import random_params

    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, QuantConfig(method="mxfp4"), seed=5)
    eng = InferenceEngine(cfg, params)
    eng.add_request("r", list(range(3, 20)), SamplingParams(max_tokens=8, temperature=0.0))
    toks = []
    for _ in range(64):
        for out in eng.step():
            toks.append(out.token_id)
        if toks and len(toks) >= 8:
            break
    assert len(toks) == 8
    # determinism across a fresh engine
    eng2 = InferenceEngine(cfg, params)
    eng2.add_request("r", list(range(3, 20)), SamplingParams(max_tokens=8, temperature=0.0))
    toks2 = []
    for _ in range(64):
        for out in eng2.step():
            toks2.append(out.token_id)
        if len(toks2) >= 8:
            break
    assert toks == toks2


def test_mxfp4_checkpoint_roundtrip(tmp_path):
    """Synthetic GPT-OSS MXFP4 checkpoint -> reader -> native store -> params:
    the packed bits survive losslessly and the loaded expert dequantizes to
    exactly what the source encodes (interleaved gate_up normalized)."""
    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.checkpoint.gpt_oss_mxfp4 import (
        GptOssMxfp4Reader,
        convert_mxfp4_to_native,
        write_synthetic_gpt_oss_mxfp4,
    )
    from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
    from gpt_oss_vllm_tpu.models.params import load_params_from_store
    from gpt_oss_vllm_tpu.quant.mxfp4 import mxfp4_dequantize

    cfg = ModelConfig.tiny()
    src = str(tmp_path / "src")
    dst = str(tmp_path / "native")
    write_synthetic_gpt_oss_mxfp4(src, cfg, seed=7)
    reader = GptOssMxfp4Reader(src)
    assert reader.scan_structure()["num_layers"] == cfg.num_layers
    convert_mxfp4_to_native(reader, cfg, dst, progress=False)

    store = TensorStore(dst)
    assert store.metadata["quant"]["codebook"] == "mxfp4"
    params = load_params_from_store(store, cfg, QuantConfig(method="mxfp4"))
    w = params.layers[0].w_gate_up
    assert w.codebook == "mxfp4" and w.blocksize == 32

    # oracle: dequantize expert 0 from the raw source keys
    H, FF = cfg.hidden_size, cfg.intermediate_size
    eq, escale = reader.read_expert_quantized(0, 0, "gate_up", 2 * FF, H)
    from gpt_oss_vllm_tpu.quant.mxfp4 import e8m0_encode

    want = (
        np.stack([(eq & 0x0F), (eq >> 4)], axis=-1).reshape(2 * FF, H)
    )
    from gpt_oss_vllm_tpu.quant.mxfp4 import FP4_CODE

    want = FP4_CODE[want] * escale.reshape(2 * FF, H // 32).repeat(32, axis=1)
    got = np.asarray(w.dequantize(jnp.float32))[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_mxfp4_engine_from_converted_checkpoint(tmp_path):
    """Full path: synth mxfp4 ckpt -> convert -> load -> engine greedy decode."""
    from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig
    from gpt_oss_vllm_tpu.checkpoint.gpt_oss_mxfp4 import (
        GptOssMxfp4Reader,
        convert_mxfp4_to_native,
        write_synthetic_gpt_oss_mxfp4,
    )
    from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams
    from gpt_oss_vllm_tpu.models.params import load_params_from_store

    cfg = EngineConfig.tiny()
    src, dst = str(tmp_path / "s"), str(tmp_path / "n")
    write_synthetic_gpt_oss_mxfp4(src, cfg.model, seed=8)
    convert_mxfp4_to_native(GptOssMxfp4Reader(src), cfg.model, dst, progress=False)
    params = load_params_from_store(TensorStore(dst), cfg.model, QuantConfig(method="mxfp4"))
    eng = InferenceEngine(cfg, params)
    eng.add_request("r", [2, 9, 4, 17], SamplingParams(max_tokens=6, temperature=0.0))
    toks = []
    for _ in range(40):
        for out in eng.step():
            toks.append(out.token_id)
        if len(toks) >= 6:
            break
    assert len(toks) == 6


def test_e8m0_device_scales_match_float_scales():
    """uint8 E8M0 scale storage must dequantize and matmul identically to
    the float-decoded form (in-kernel decode is bitcast(u << 23))."""
    from gpt_oss_vllm_tpu.ops.nf4_matmul import nf4_matmul

    rng = np.random.default_rng(9)
    w = rng.normal(0, 0.05, size=(64, 128)).astype(np.float32)
    t_f = q4_tensor_from_dense(w, blocksize=32, codebook="mxfp4")
    t_u = q4_tensor_from_dense(w, blocksize=32, codebook="mxfp4", scale_dtype="e8m0")
    assert t_u.scales.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(t_f.dequantize(jnp.float32)), np.asarray(t_u.dequantize(jnp.float32))
    )
    x = jnp.asarray(rng.normal(0, 1, size=(4, 128)).astype(np.float32))
    yf = np.asarray(nf4_matmul(x, t_f, interpret=True))
    yu = np.asarray(nf4_matmul(x, t_u, interpret=True))
    np.testing.assert_allclose(yu, yf, rtol=1e-6, atol=1e-6)


def test_e8m0_checkpoint_roundtrip(tmp_path):
    """Converter default keeps raw E8M0 bytes; engine loads and decodes."""
    from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig
    from gpt_oss_vllm_tpu.checkpoint.gpt_oss_mxfp4 import (
        GptOssMxfp4Reader,
        convert_mxfp4_to_native,
        write_synthetic_gpt_oss_mxfp4,
    )
    from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams
    from gpt_oss_vllm_tpu.models.params import load_params_from_store

    cfg = EngineConfig.tiny()
    src, dst = str(tmp_path / "s"), str(tmp_path / "n")
    write_synthetic_gpt_oss_mxfp4(src, cfg.model, seed=10)
    convert_mxfp4_to_native(GptOssMxfp4Reader(src), cfg.model, dst, progress=False)
    store = TensorStore(dst)
    assert store.metadata["quant"]["scale_dtype"] == "e8m0"
    assert store.manifest["layers.0.moe.gate_up.scales"]["dtype"] == "uint8"
    params = load_params_from_store(store, cfg.model, QuantConfig(method="mxfp4"))
    assert params.layers[0].w_gate_up.scales.dtype == jnp.uint8
    eng = InferenceEngine(cfg, params)
    eng.add_request("r", [2, 9, 4], SamplingParams(max_tokens=4, temperature=0.0))
    toks = []
    for _ in range(30):
        for out in eng.step():
            toks.append(out.token_id)
        if len(toks) >= 4:
            break
    assert len(toks) == 4
