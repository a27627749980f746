"""Real-checkpoint quirk matrix (VERDICT r4 next #6).

Egress is blocked in this environment, so the real
``unsloth/gpt-oss-20b-unsloth-bnb-4bit`` artifact has never been read; this
matrix emulates the variants a first real download might ship (the tolerance
rules the reference encodes at ``streaming_unsloth_bnb.py:148-218``):
upstream-bnb ``high_first`` nibble order, blocksize 128, double-quant offset
present, fp16 quant metadata, bf16 non-MoE tensors, an HF
``model.safetensors.index.json`` shard map, and ragged multi-file splits
(an expert's metadata in a different file than its weight). Each variant
runs the FULL pipeline: first-contact report -> convert -> validate ->
dequant parity vs the canonical baseline -> (spot) greedy serve.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.checkpoint.convert import convert_unsloth_to_native
from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
from gpt_oss_vllm_tpu.checkpoint.unsloth import (
    UnslothCheckpointReader,
    write_synthetic_unsloth_checkpoint,
)
from gpt_oss_vllm_tpu.checkpoint.validate import (
    first_contact_report,
    validate_native_checkpoint,
)
from gpt_oss_vllm_tpu.quant.nf4 import nf4_dequantize


@pytest.fixture(scope="module")
def qcfg():
    return dataclasses.replace(
        ModelConfig.tiny(), num_layers=2, num_experts=4, vocab_size=128
    )


SEED = 21

# name -> (writer kwargs, reader nibble_order, dequant parity class)
# parity: "exact" = same bits+scales as baseline; "approx" = metadata
# rounding only; "quant" = different quantization grid (no cross-variant
# weight parity; converter losslessness asserted instead)
MATRIX = {
    "baseline": ({}, "low_first", "exact"),
    "high_first": ({"nibble_order": "high_first"}, "high_first", "exact"),
    "blocksize128": ({"blocksize": 128}, "low_first", "quant"),
    "offset": ({"use_offset": True}, "low_first", "approx"),
    "fp16_meta": ({"meta_dtype": "float16"}, "low_first", "approx"),
    "bf16_tensors": ({"tensor_dtype": "bfloat16"}, "low_first", "exact"),
    "hf_index_ragged": (
        {"ragged": True, "write_index": True, "num_files": 4}, "low_first",
        "exact",
    ),
    "qweight_keys_128": (
        {"key_scheme": "qweight", "blocksize": 128}, "low_first", "quant"
    ),
}


def _write(tmp_path_factory, qcfg, name):
    kwargs, order, parity = MATRIX[name]
    d = tmp_path_factory.mktemp(f"quirk_{name}")
    write_synthetic_unsloth_checkpoint(str(d), qcfg, seed=SEED, **kwargs)
    return str(d), order, parity


@pytest.fixture(scope="module")
def baseline(tmp_path_factory, qcfg):
    d, order, _ = _write(tmp_path_factory, qcfg, "baseline")
    r = UnslothCheckpointReader(d, nibble_order=order)
    H, FF = qcfg.hidden_size, qcfg.intermediate_size
    dense = {
        (proj, e): r.read_expert_dense(0, e, proj, of, inf)
        for proj, of, inf in (("gate_up", 2 * FF, H), ("down", H, FF))
        for e in range(qcfg.num_experts)
    }
    return d, dense


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_quirk_variant_full_pipeline(tmp_path_factory, qcfg, baseline, name):
    d, order, parity = _write(tmp_path_factory, qcfg, name)
    r = UnslothCheckpointReader(d, nibble_order=order)

    # 1. first contact: layout asserts + layer-0 logit smoke must pass
    rep = first_contact_report(r, qcfg, verbose=False)
    assert not rep["errors"]
    expect_bs = MATRIX[name][0].get("blocksize", 64)
    assert rep["gate_up_blocksize"] == expect_bs
    assert all(np.isfinite(v) for _, v in rep["top5"])

    # 2. convert -> validate (canonical 64-block native layout)
    out = tmp_path_factory.mktemp(f"native_{name}")
    store = convert_unsloth_to_native(r, qcfg, str(out), progress=False)
    validate_native_checkpoint(store, qcfg, verbose=False)

    # 3. converter losslessness: native-store dequant == reader dense path
    # for every variant (repack-not-requantize must hold under ANY source
    # blocksize/nibble-order/metadata dtype)
    H, FF = qcfg.hidden_size, qcfg.intermediate_size
    # the engine always decodes with the canonical f32 NF4 table; a
    # checkpoint shipping an fp16-rounded quant_map decodes within half
    # precision of it (the reader's dense path honors the shipped table)
    atol = 5e-5 if name == "fp16_meta" else 2e-6
    for proj, of, inf in (("gate_up", 2 * FF, H), ("down", H, FF)):
        ref = r.read_expert_dense(0, 1, proj, of, inf)
        q = np.asarray(store.read(f"layers.0.moe.{proj}.qdata")[1])
        s = np.asarray(
            store.read(f"layers.0.moe.{proj}.scales")[1], np.float32
        ).T
        native = nf4_dequantize(q.reshape(-1), s.reshape(-1), (of, inf), 64)
        np.testing.assert_allclose(native, ref, atol=atol)

    # 4. cross-variant parity vs the canonical baseline (same rng stream ->
    # same dense weights before quantization)
    _, base_dense = baseline
    for (proj, e), ref in base_dense.items():
        of, inf = ref.shape
        got = r.read_expert_dense(0, e, proj, of, inf)
        if parity == "exact":
            np.testing.assert_array_equal(got, ref, err_msg=(name, proj, e))
        elif parity == "approx":
            # double-quant offset / fp16 metadata perturb only the absmax
            # recovery (8-bit codebook + half-precision rounding)
            np.testing.assert_allclose(
                got, ref, rtol=5e-2, atol=5e-4, err_msg=(name, proj, e)
            )


def test_hf_index_is_authoritative(tmp_path_factory, qcfg):
    """The reader trusts model.safetensors.index.json when present, and an
    index referencing absent shards fails loudly."""
    d, _, _ = _write(tmp_path_factory, qcfg, "hf_index_ragged")
    idx = os.path.join(d, "model.safetensors.index.json")
    with open(idx) as f:
        wm = json.load(f)["weight_map"]
    # every key resolvable through the index
    r = UnslothCheckpointReader(d)
    assert set(r.keys()) == set(wm)
    # ragged: file sizes genuinely uneven and some expert's metadata lives
    # in a different file than its weight
    by_file = {}
    for k, fn in wm.items():
        by_file.setdefault(fn, []).append(k)
    sizes = sorted(len(v) for v in by_file.values())
    assert sizes[0] < sizes[-1]
    split = [
        k for k in wm
        if k.endswith(".weight") and k + ".absmax" in wm
        and wm[k] != wm[k + ".absmax"]
    ]
    assert split, "ragged split never separated a weight from its metadata"
    # stale index -> loud failure
    with open(idx) as f:
        data = json.load(f)
    data["weight_map"]["model.embed_tokens.weight"] = "model-99999-of-00004.safetensors"
    with open(idx, "w") as f:
        json.dump(data, f)
    with pytest.raises(FileNotFoundError, match="index references absent"):
        UnslothCheckpointReader(d)


def test_quirk_variant_serves(tmp_path_factory, qcfg):
    """Spot end-to-end: a blocksize-128 high_first checkpoint converts and
    SERVES — greedy tokens equal the baseline checkpoint's greedy tokens
    when the quantization grid matches, and are finite/valid regardless."""
    from gpt_oss_vllm_tpu.config import (
        CacheConfig, EngineConfig, SchedulerConfig, ServingConfig,
    )
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams
    from gpt_oss_vllm_tpu.models.params import load_params_from_store

    def serve_tokens(variant):
        d, order, _ = _write(tmp_path_factory, qcfg, variant)
        out = tmp_path_factory.mktemp(f"srv_{variant}")
        store = convert_unsloth_to_native(
            UnslothCheckpointReader(d, nibble_order=order), qcfg, str(out),
            progress=False,
        )
        params = load_params_from_store(store, qcfg, QuantConfig(method="nf4"))
        ecfg = EngineConfig(
            model=qcfg, quant=QuantConfig(method="nf4"),
            cache=CacheConfig(block_size=8, num_blocks=32, max_blocks_per_seq=8),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=32),
            serving=ServingConfig(served_model_name="t"),
        )
        eng = InferenceEngine(ecfg, params)
        return eng.generate([[5, 9, 2]], SamplingParams(max_tokens=4, temperature=0.0))[0]

    base = serve_tokens("baseline")
    hf = serve_tokens("high_first")  # same quant grid -> token-equal
    assert hf == base
    b128 = serve_tokens("blocksize128")  # different grid -> just valid
    assert len(b128) == len(base)
    assert all(0 <= t < qcfg.vocab_size for t in b128)
