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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)
    cfg = ModelConfig.tiny() if args.tiny else ModelConfig()
    validate_native_checkpoint(TensorStore(args.store), cfg)


if __name__ == "__main__":
    main()
