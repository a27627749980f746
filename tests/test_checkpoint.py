"""Checkpoint subsystem tests: TensorStore round-trip, Unsloth reader,
streaming converter losslessness, validation contract, param loading.

SURVEY.md §7 stage 1-2 gates (the reference's ``validate_conversion.py``
ladder, made into real pytest).
"""

import dataclasses

import numpy as np
import pytest

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.checkpoint.convert import convert_unsloth_to_native
from gpt_oss_vllm_tpu.checkpoint.store import TensorStore, TensorStoreWriter
from gpt_oss_vllm_tpu.checkpoint.unsloth import (
    UnslothCheckpointReader,
    write_synthetic_unsloth_checkpoint,
)
from gpt_oss_vllm_tpu.checkpoint.validate import ValidationError, validate_native_checkpoint
from gpt_oss_vllm_tpu.models.params import load_params_from_store
from gpt_oss_vllm_tpu.quant.nf4 import nf4_dequantize


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig.tiny()


@pytest.fixture(scope="module")
def synth_ckpt(tmp_path_factory, tiny_cfg):
    d = tmp_path_factory.mktemp("unsloth_ckpt")
    paths = write_synthetic_unsloth_checkpoint(
        str(d), tiny_cfg, seed=7, num_files=3, drop_experts=((1, 3, "down"),)
    )
    return str(d), paths


@pytest.fixture(scope="module")
def native_ckpt(tmp_path_factory, tiny_cfg, synth_ckpt):
    d = tmp_path_factory.mktemp("native_ckpt")
    reader = UnslothCheckpointReader(synth_ckpt[0])
    convert_unsloth_to_native(reader, tiny_cfg, str(d), progress=False)
    return str(d)


def test_tensor_store_roundtrip(tmp_path, rng):
    import ml_dtypes

    arrays = {
        "a.b.c": rng.normal(size=(16, 8)).astype(np.float32),
        "packed": rng.integers(0, 255, size=(4, 32)).astype(np.uint8),
        "bf": rng.normal(size=(8,)).astype(np.float32).astype(ml_dtypes.bfloat16),
    }
    with TensorStoreWriter(str(tmp_path / "s"), shard_bytes=512) as w:
        for k, v in arrays.items():
            w.add(k, v)
        w.set_metadata("hello", {"x": 1})
    s = TensorStore(str(tmp_path / "s"))
    assert s.metadata["hello"] == {"x": 1}
    for k, v in arrays.items():
        got = s.read(k)
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    # tiny shard_bytes forces multiple shards
    assert len({i["file"] for i in s.manifest.values()}) >= 2
    with pytest.raises(ValueError):
        with TensorStoreWriter(str(tmp_path / "s2")) as w:
            w.add("dup", arrays["a.b.c"])
            w.add("dup", arrays["a.b.c"])


def test_reader_scan_structure(synth_ckpt, tiny_cfg):
    r = UnslothCheckpointReader(synth_ckpt[0])
    s = r.scan_structure()
    assert s["num_layers"] == tiny_cfg.num_layers
    assert s["num_experts"] == tiny_cfg.num_experts
    assert s["hidden_size"] == tiny_cfg.hidden_size
    # one expert tensor dropped
    assert (
        s["num_quantized_expert_tensors"]
        == tiny_cfg.num_layers * tiny_cfg.num_experts * 2 - 1
    )


def test_reader_dense_matches_manual_dequant(synth_ckpt, tiny_cfg):
    """Reader's dense path == manual decode of the raw checkpoint tensors."""
    r = UnslothCheckpointReader(synth_ckpt[0])
    H, FF = tiny_cfg.hidden_size, tiny_cfg.intermediate_size
    dense = r.read_expert_dense(0, 0, "gate_up", 2 * FF, H)
    key = "model.layers.0.mlp.experts.gate_up_projs.0.weight"
    from gpt_oss_vllm_tpu.quant.nf4 import dequantize_absmax_double

    qw = r.read(key).reshape(-1)
    absmax = dequantize_absmax_double(
        r.read(key + ".absmax"),
        r.read(key + ".nested_absmax"),
        r.read(key + ".nested_quant_map"),
    )
    manual = nf4_dequantize(qw, absmax, (2 * FF, H), 64, code=r.read(key + ".quant_map"))
    np.testing.assert_array_equal(dense, manual)


def test_converter_is_lossless_on_weight_bits(synth_ckpt, native_ckpt, tiny_cfg):
    """The converter must copy packed nibbles verbatim (repack-not-requantize)."""
    r = UnslothCheckpointReader(synth_ckpt[0])
    s = TensorStore(native_ckpt)
    H, FF = tiny_cfg.hidden_size, tiny_cfg.intermediate_size
    src = r.read("model.layers.0.mlp.experts.down_projs.5.weight").reshape(H, FF // 2)
    dst = s.read("layers.0.moe.down.qdata")[5]
    np.testing.assert_array_equal(np.asarray(dst), src)
    # and the dense decode through the native store equals the reader's dense path
    # (store scales are transposed [nb, out]; flat dequant wants [out, nb] order)
    scales = np.asarray(s.read("layers.0.moe.down.scales")[5], dtype=np.float32).T
    native_dense = nf4_dequantize(np.asarray(dst).reshape(-1), scales.reshape(-1), (H, FF), 64)
    ref_dense = r.read_expert_dense(0, 5, "down", H, FF)
    np.testing.assert_allclose(native_dense, ref_dense, atol=2e-6)


def test_converter_zero_fills_missing_expert(native_ckpt):
    s = TensorStore(native_ckpt)
    assert np.all(np.asarray(s.read("layers.1.moe.down.qdata")[3]) == 0)
    assert s.metadata["missing_experts"] == [[1, 3, "down"]]


def test_high_first_nibble_order_normalized(tmp_path, tiny_cfg):
    """A checkpoint packed in the upstream-bnb order decodes identically once
    the reader normalizes it."""
    cfg = dataclasses.replace(tiny_cfg, num_layers=1, num_experts=2, vocab_size=64)
    d = tmp_path / "hf_order"
    write_synthetic_unsloth_checkpoint(str(d), cfg, seed=3, nibble_order="high_first")
    r_wrong = UnslothCheckpointReader(str(d), nibble_order="low_first")
    r_right = UnslothCheckpointReader(str(d), nibble_order="high_first")
    H, FF = cfg.hidden_size, cfg.intermediate_size
    d_wrong = r_wrong.read_expert_dense(0, 0, "down", H, FF)
    d_right = r_right.read_expert_dense(0, 0, "down", H, FF)
    assert not np.array_equal(d_wrong, d_right)
    # right-order decode must match a fresh low_first synthesis of same seed?
    # (cross-check: re-reading with matching order is self-consistent)
    q = r_right.read_expert_quantized(0, 0, "down", H, FF)
    redec = nf4_dequantize(q[0].reshape(-1), q[1], (H, FF), q[2])
    np.testing.assert_array_equal(redec, d_right)


def test_offset_mode_roundtrip(tmp_path, tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg, num_layers=1, num_experts=2, vocab_size=64)
    d = tmp_path / "with_offset"
    write_synthetic_unsloth_checkpoint(str(d), cfg, seed=5, use_offset=True)
    r = UnslothCheckpointReader(str(d))
    H, FF = cfg.hidden_size, cfg.intermediate_size
    dense = r.read_expert_dense(0, 1, "gate_up", 2 * FF, H)
    assert np.isfinite(dense).all() and np.abs(dense).max() < 1.0


def test_validation_contract(native_ckpt, tiny_cfg):
    report = validate_native_checkpoint(TensorStore(native_ckpt), tiny_cfg, verbose=False)
    assert not report["errors"]
    assert (
        report["quantized_projections"]
        == tiny_cfg.num_layers * tiny_cfg.num_experts * 3
    )
    # wrong config must fail loudly
    bad = dataclasses.replace(tiny_cfg, num_experts=tiny_cfg.num_experts * 2)
    with pytest.raises(ValidationError):
        validate_native_checkpoint(TensorStore(native_ckpt), bad, verbose=False)


def test_load_params_quantized_and_dense_agree(native_ckpt, tiny_cfg):
    import jax.numpy as jnp

    store = TensorStore(native_ckpt)
    p_q = load_params_from_store(store, tiny_cfg, QuantConfig(method="nf4"))
    p_d = load_params_from_store(store, tiny_cfg, QuantConfig(method="none"))
    l0q, l0d = p_q.layers[0], p_d.layers[0]
    assert l0q.w_gate_up.qdata.dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(l0q.w_gate_up.dequantize(jnp.float32)),
        np.asarray(l0d.w_gate_up, dtype=np.float32),
        atol=1e-2,  # dense path loads via bf16
    )
    assert p_q.embedding.shape == (tiny_cfg.vocab_size, tiny_cfg.hidden_size)
    assert l0q.router_w.dtype == jnp.float32  # the stable-router-dtype contract
    assert p_q.num_params() > 0


@pytest.mark.parametrize("scheme", ["w13", "qweight"])
def test_alternate_key_schemes_convert_identically(tmp_path, tiny_cfg, scheme):
    """The reader tolerates the alternate expert-key generations the
    reference probes (``streaming_unsloth_loader.py:92-109``): same seed,
    different key scheme => bit-identical native conversion."""
    cfg = dataclasses.replace(tiny_cfg, num_layers=1, num_experts=4, vocab_size=64)
    d_can, d_alt = tmp_path / "canon", tmp_path / scheme
    write_synthetic_unsloth_checkpoint(str(d_can), cfg, seed=11)
    write_synthetic_unsloth_checkpoint(str(d_alt), cfg, seed=11, key_scheme=scheme)
    r_alt = UnslothCheckpointReader(str(d_alt))
    s = r_alt.scan_structure()
    assert s["num_layers"] == 1 and s["num_experts"] == 4
    assert s["num_quantized_expert_tensors"] == 8
    n_can, n_alt = tmp_path / "n_can", tmp_path / "n_alt"
    convert_unsloth_to_native(UnslothCheckpointReader(str(d_can)), cfg, str(n_can), progress=False)
    convert_unsloth_to_native(r_alt, cfg, str(n_alt), progress=False)
    sc, sa = TensorStore(str(n_can)), TensorStore(str(n_alt))
    for key in ("layers.0.moe.gate_up.qdata", "layers.0.moe.down.qdata",
                "layers.0.moe.gate_up.scales", "layers.0.moe.gate_up.bias"):
        np.testing.assert_array_equal(np.asarray(sc.read(key)), np.asarray(sa.read(key)))


def test_corrupt_packed_size_fails_loudly(tmp_path, tiny_cfg):
    """A truncated packed weight must raise with the offending key, not
    silently misdecode (the reference's planned-but-absent 'bail fast'
    hardening, ``STATUS.md:17``)."""
    from safetensors.numpy import save_file
    from safetensors import safe_open

    cfg = dataclasses.replace(tiny_cfg, num_layers=1, num_experts=2, vocab_size=64)
    d = tmp_path / "corrupt"
    paths = write_synthetic_unsloth_checkpoint(str(d), cfg, seed=2, num_files=1)
    tensors = {}
    with safe_open(paths[0], framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    key = "model.layers.0.mlp.experts.down_projs.0.weight"
    tensors[key] = tensors[key][: tensors[key].shape[0] // 2]  # truncate
    save_file(tensors, paths[0])
    r = UnslothCheckpointReader(str(d))
    H, FF = cfg.hidden_size, cfg.intermediate_size
    with pytest.raises(ValueError, match="down_projs.0.weight"):
        r.read_expert_quantized(0, 0, "down", H, FF)


def test_first_contact_report(synth_ckpt, tiny_cfg, tmp_path):
    from gpt_oss_vllm_tpu.checkpoint.validate import first_contact_report

    r = UnslothCheckpointReader(synth_ckpt[0])
    rep = first_contact_report(r, tiny_cfg, verbose=False)
    assert not rep["errors"]
    assert rep["gate_up_blocksize"] == 64
    assert len(rep["top5"]) == 5
    assert all(np.isfinite(v) for _, v in rep["top5"])
    # a wrong config must fail loudly before conversion
    bad = dataclasses.replace(tiny_cfg, intermediate_size=tiny_cfg.intermediate_size * 2)
    with pytest.raises(ValidationError, match="packed"):
        first_contact_report(r, bad, verbose=False)
