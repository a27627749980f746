"""Conversion validation — the reference's ``validate_conversion.py`` contract.

Checks (reference ``validate_conversion.py:18-142``): expected config dims,
fused tensor shapes (w13 ``[E, 2FF, H]`` / w2 ``[E, H, FF]``,
``unsloth_direct_loader.py:185-192``), 4-bit parameter conservation, and
quantization coverage — ``num_layers x num_experts x 3`` logical projections
quantized (2304 for GPT-OSS-20B), everything else full precision.
"""

from __future__ import annotations

import argparse
import json
from typing import List

import numpy as np

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.checkpoint.store import TensorStore


class ValidationError(AssertionError):
    pass


def validate_native_checkpoint(store: TensorStore, cfg: ModelConfig, verbose: bool = True) -> dict:
    H, FF, E, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts, cfg.num_layers
    report = {"errors": [], "checks": 0}

    def check(cond, msg: str):
        report["checks"] += 1
        if not cond:
            report["errors"].append(msg)

    def shape_of(name: str):
        if name not in store:
            report["errors"].append(f"missing tensor: {name}")
            return None
        return store.shape(name)

    qmeta = store.metadata.get("quant", {})
    bs = qmeta.get("blocksize", 64)
    meta_cfg = store.metadata.get("model_config", {})
    for field, expect in (
        ("hidden_size", H),
        ("intermediate_size", FF),
        ("num_experts", E),
        ("num_layers", L),
        ("experts_per_token", cfg.experts_per_token),
    ):
        check(meta_cfg.get(field) == expect, f"config.{field}={meta_cfg.get(field)} != {expect}")

    check(shape_of("embedding") == (cfg.vocab_size, H), "embedding shape")
    quantized_projections = 0
    packed_bytes = 0
    for li in range(L):
        gu_q = f"layers.{li}.moe.gate_up.qdata"
        dn_q = f"layers.{li}.moe.down.qdata"
        if shape_of(gu_q) is None or shape_of(dn_q) is None:
            continue
        check(store.shape(gu_q) == (E, 2 * FF, H // 2), f"{gu_q} shape {store.shape(gu_q)}")
        check(store.shape(dn_q) == (E, H, FF // 2), f"{dn_q} shape {store.shape(dn_q)}")
        check(
            shape_of(f"layers.{li}.moe.gate_up.scales") == (E, H // bs, 2 * FF),
            f"gate_up scales shape layer {li}",
        )
        check(store.manifest[gu_q]["dtype"] == "uint8", f"{gu_q} dtype")
        # gate+up+down = 3 logical quantized projections per expert
        quantized_projections += 3 * E
        packed_bytes += store.manifest[gu_q]["byte_len"] + store.manifest[dn_q]["byte_len"]
        # full-precision partition: router/attention stay unquantized
        if f"layers.{li}.router_w" in store:
            check(store.manifest[f"layers.{li}.router_w"]["dtype"] == "float32", f"router dtype layer {li}")
            check(store.manifest[f"layers.{li}.wq"]["dtype"] == "bfloat16", f"wq dtype layer {li}")
        else:
            report["errors"].append(f"missing tensor: layers.{li}.router_w")

    expected_projections = L * E * 3
    check(
        quantized_projections == expected_projections,
        f"quantized projections {quantized_projections} != {expected_projections}",
    )
    # parameter conservation: packed bytes * 2 == 4-bit param count
    expected_4bit_params = L * E * (2 * FF * H + H * FF)
    check(
        packed_bytes * 2 == expected_4bit_params,
        f"4-bit params {packed_bytes * 2} != {expected_4bit_params}",
    )
    report["quantized_projections"] = quantized_projections
    report["packed_4bit_params"] = packed_bytes * 2
    report["total_bytes"] = store.total_bytes()
    if verbose:
        status = "OK" if not report["errors"] else f"FAILED: {report['errors']}"
        print(
            f"validate: {report['checks']} checks, {quantized_projections} quantized "
            f"projections, {report['total_bytes'] / 1e6:.1f} MB total -> {status}"
        )
    if report["errors"]:
        raise ValidationError("; ".join(report["errors"]))
    return report


def first_contact_report(reader, cfg: ModelConfig, verbose: bool = True) -> dict:
    """First contact with a REAL checkpoint artifact: fail loudly and
    diagnosably before a full conversion is attempted.

    The build environment has no egress, so the converter has only ever seen
    synthetic checkpoints with the same schema; this is the guard for the
    first real artifact (the ``validate_conversion.py:144-188`` role):

    1. raw layout asserts — packed byte sizes vs the model dims (the
       reference's probe at ``debug_shapes.py:52-54`` / explanation at
       ``unsloth_bnb_loader.py:299-336``), blocksize inference, double-quant
       metadata presence;
    2. codebook check — the in-checkpoint ``quant_map`` vs the published NF4
       table (a mismatch is reported, then the checkpoint's own table wins);
    3. layer-0 forward smoke — convert layer 0 only, run one token through
       embed -> layer -> logits and report top-5 ids/values + finiteness
       (the single-token smoke of ``validate_conversion.py:116-142``).
    """
    import tempfile

    from gpt_oss_vllm_tpu.quant.nf4 import NF4_CODE

    H, FF = cfg.hidden_size, cfg.intermediate_size
    rep: dict = {"errors": [], "warnings": []}

    structure = reader.scan_structure()
    rep["structure"] = structure
    for field, expect in (("num_layers", cfg.num_layers), ("num_experts", cfg.num_experts)):
        if structure[field] != expect:
            rep["errors"].append(f"{field}={structure[field]} != config {expect}")
    if structure["hidden_size"] not in (None, H):
        rep["errors"].append(f"hidden_size={structure['hidden_size']} != {H}")

    # raw packed layout of layer-0 expert 0 (bytes = out*in/2; the 20B artifact
    # numbers are gate_up [8294400,1] / down [4147200,1], debug_shapes.py:52-54)
    for proj, out_f, in_f in (("gate_up", 2 * FF, H), ("down", H, FF)):
        wkey = reader.expert_weight_key(0, 0, proj)
        if wkey not in reader:
            rep["errors"].append(f"layer-0 expert-0 {proj} weight missing ({wkey})")
            continue
        shape = reader.shape(wkey)
        n = int(np.prod(shape))
        if n * 2 != out_f * in_f:
            rep["errors"].append(
                f"{wkey}: packed {shape} = {n} bytes, expected {out_f}x{in_f}/2 = "
                f"{out_f * in_f // 2} (wrong dims or not 4-bit packed)"
            )
        qmk = reader._meta_key(wkey, "quant_map")
        if qmk in reader:
            code = reader.read(qmk).astype(np.float32).reshape(-1)
            if code.shape[0] != 16:
                rep["errors"].append(f"{qmk}: {code.shape[0]} entries, expected 16")
            elif not np.allclose(code, NF4_CODE, atol=1e-6):
                rep["warnings"].append(
                    f"{qmk} differs from the published NF4 table "
                    f"(max delta {np.abs(code - NF4_CODE).max():.2e}); "
                    "the checkpoint's own table will be used"
                )
        else:
            rep["warnings"].append(f"{qmk} absent; assuming the published NF4 table")
        try:
            r = reader.read_expert_quantized(0, 0, proj, out_f, in_f)
        except ValueError as e:
            rep["errors"].append(str(e))
            r = None
        if r is None:
            if not rep["errors"]:
                rep["errors"].append(f"layer-0 expert-0 {proj}: unreadable")
        else:
            _, absmax, blocksize = r
            rep[f"{proj}_blocksize"] = blocksize
            if not np.isfinite(absmax).all():
                rep["errors"].append(f"{proj} absmax has non-finite values")
            if (absmax < 0).any():
                rep["errors"].append(f"{proj} absmax has negative values")

    # layer-0 forward smoke (only when the layout survived)
    if not rep["errors"]:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from gpt_oss_vllm_tpu.checkpoint.convert import convert_unsloth_to_native
        from gpt_oss_vllm_tpu.config import QuantConfig
        from gpt_oss_vllm_tpu.models.gpt_oss import forward
        from gpt_oss_vllm_tpu.models.params import load_params_from_store

        cfg1 = dataclasses.replace(cfg, num_layers=1)
        with tempfile.TemporaryDirectory() as tmp:
            store = convert_unsloth_to_native(reader, cfg1, tmp, progress=False)
            params = load_params_from_store(store, cfg1, QuantConfig(method="nf4"))
            logits = np.asarray(
                forward(params, cfg1, jnp.zeros((1, 1), jnp.int32), moe_strategy="all")
            )[0, -1]
        if not np.isfinite(logits).all():
            rep["errors"].append("layer-0 smoke: non-finite logits")
        top = np.argsort(logits)[::-1][:5]
        rep["top5"] = [(int(t), float(logits[t])) for t in top]
        rep["logit_stats"] = {
            "mean": float(logits.mean()), "std": float(logits.std()),
            "max": float(logits.max()),
        }
    if verbose:
        print(f"first-contact structure: {structure}")
        for wmsg in rep["warnings"]:
            print(f"  WARNING: {wmsg}")
        if "top5" in rep:
            print(f"  layer-0 smoke top-5 logits: {rep['top5']}")
        status = "OK" if not rep["errors"] else f"FAILED: {rep['errors']}"
        print(f"first-contact: {status}")
    if rep["errors"]:
        raise ValidationError("; ".join(rep["errors"]))
    return rep


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument(
        "--first-contact", default=None, metavar="CKPT_DIR",
        help="run the raw-artifact verification (layout asserts + layer-0 "
             "logit smoke) against an Unsloth checkpoint directory",
    )
    args = ap.parse_args(argv)
    cfg = ModelConfig.tiny() if args.tiny else ModelConfig()
    if args.first_contact:
        from gpt_oss_vllm_tpu.checkpoint.unsloth import UnslothCheckpointReader

        first_contact_report(UnslothCheckpointReader(args.first_contact), cfg)
        return
    if not args.store:
        raise SystemExit("need --store or --first-contact")
    validate_native_checkpoint(TensorStore(args.store), cfg)


if __name__ == "__main__":
    main()
