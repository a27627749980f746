"""Offline streaming converter: Unsloth NF4 checkpoint -> native TensorStore.

SURVEY.md §7 stage 2. One pass, one expert resident at a time, and — unlike
every loader generation in the reference (``unsloth_direct_loader.py``,
``streaming_unsloth_bnb.py``) — the 4-bit weight bits are **repacked, never
dequantized**: the Unsloth payload is already blockwise-64 NF4, so conversion
is nibble-order normalization plus double-dequant of the (tiny) absmax
stream. Bit-for-bit lossless on weights, O(read bandwidth), run once — this
deletes the reference's 15-20 minute per-boot conversion
(reference ``README.md:12``).

Native tensor naming (see ``models.params`` for the load side)::

    embedding                     [V, H]        bf16
    layers.{L}.attn_norm          [H]           f32
    layers.{L}.wq / wk / wv       [Dq|Dkv, H]   bf16 (kept separate so TP
                                  sharding stays head-aligned; the reference
                                  instead fuses q/k/v at load,
                                  ``patch_8_unsloth_loader.py:101-110``)
    layers.{L}.bq / bk / bv       [Dq|Dkv]      f32
    layers.{L}.wo / bo            [H, Dq] / [H]
    layers.{L}.sinks              [n_heads]     f32
    layers.{L}.mlp_norm           [H]           f32
    layers.{L}.router_w / _b      [E, H] / [E]  f32 (stable dtype: the
                                  reference's #1 blocker, STATUS.md:6)
    layers.{L}.moe.gate_up.qdata  [E, 2FF, H/2]   u8
    layers.{L}.moe.gate_up.scales [E, 2FF, H/64]  f32
    layers.{L}.moe.gate_up.bias   [E, 2FF]        f32
    layers.{L}.moe.down.{qdata,scales,bias}       (analogous, [E, H, FF/…])
    final_norm                    [H]           f32
    lm_head                       [V, H]        bf16
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

import ml_dtypes
import numpy as np

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.checkpoint.store import TensorStore, TensorStoreWriter
from gpt_oss_vllm_tpu.checkpoint.unsloth import UnslothCheckpointReader

BF16 = ml_dtypes.bfloat16


def _bf16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32).astype(BF16)


def convert_unsloth_to_native(
    reader: UnslothCheckpointReader,
    cfg: ModelConfig,
    out_dir: str,
    scale_dtype: str = "float32",
    progress: bool = True,
) -> TensorStore:
    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    sdt = {"float32": np.float32, "bfloat16": BF16, "float16": np.float16}[scale_dtype]
    t0 = time.time()
    missing = []

    with TensorStoreWriter(out_dir) as w:
        w.set_metadata("model_config", json.loads(json.dumps(cfg.__dict__)))
        w.set_metadata("quant", {"method": "nf4", "blocksize": 64, "scale_dtype": scale_dtype})

        w.add("embedding", _bf16(reader.read("model.embed_tokens.weight")))
        for L in range(cfg.num_layers):
            p = f"model.layers.{L}"
            for short, proj in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
                w.add(f"layers.{L}.w{short}", _bf16(reader.read(f"{p}.self_attn.{proj}.weight")))
                if f"{p}.self_attn.{proj}.bias" in reader:
                    w.add(
                        f"layers.{L}.b{short}",
                        reader.read(f"{p}.self_attn.{proj}.bias").astype(np.float32),
                    )
            w.add(f"layers.{L}.wo", _bf16(reader.read(f"{p}.self_attn.o_proj.weight")))
            if f"{p}.self_attn.o_proj.bias" in reader:
                w.add(f"layers.{L}.bo", reader.read(f"{p}.self_attn.o_proj.bias").astype(np.float32))
            if f"{p}.self_attn.sinks" in reader:
                w.add(f"layers.{L}.sinks", reader.read(f"{p}.self_attn.sinks").astype(np.float32))
            w.add(f"layers.{L}.attn_norm", reader.read(f"{p}.input_layernorm.weight").astype(np.float32))
            w.add(f"layers.{L}.mlp_norm", reader.read(f"{p}.post_attention_layernorm.weight").astype(np.float32))
            w.add(f"layers.{L}.router_w", reader.read(f"{p}.mlp.router.weight").astype(np.float32))
            if f"{p}.mlp.router.bias" in reader:
                w.add(f"layers.{L}.router_b", reader.read(f"{p}.mlp.router.bias").astype(np.float32))

            for proj, out_f, in_f in (("gate_up", 2 * FF, H), ("down", H, FF)):
                qdata = np.zeros((E, out_f, in_f // 2), dtype=np.uint8)
                # scales stored transposed [E, nb, out] — TPU lane-padding
                # economics, see quant/tensor.py layout contract
                scales = np.zeros((E, in_f // 64, out_f), dtype=np.float32)
                biases = np.zeros((E, out_f), dtype=np.float32)
                have_bias = False
                for e in range(E):
                    r = reader.read_expert_quantized(L, e, proj, out_f, in_f)
                    if r is None:
                        # zero-fill fallback for missing experts
                        # (reference streaming_unsloth_bnb.py:261-264)
                        missing.append((L, e, proj))
                        continue
                    eq, eabs, blocksize = r
                    if blocksize != 64:
                        # renormalize odd blocksizes into the canonical 64 layout
                        rep = 64 // blocksize if blocksize < 64 else 1
                        if blocksize > 64:
                            eabs = np.repeat(eabs, blocksize // 64)
                        elif blocksize < 64:
                            eabs = eabs.reshape(-1, rep).max(axis=1)  # conservative
                    qdata[e] = eq
                    scales[e] = eabs.reshape(out_f, in_f // 64).T
                    b = reader.read_expert_bias(L, e, proj)
                    if b is not None:
                        biases[e] = b
                        have_bias = True
                w.add(f"layers.{L}.moe.{proj}.qdata", qdata)
                w.add(f"layers.{L}.moe.{proj}.scales", scales.astype(sdt))
                if have_bias:
                    w.add(f"layers.{L}.moe.{proj}.bias", biases)
            if progress:
                # host-RSS counterpart of the reference's per-layer VRAM
                # telemetry during streaming conversion (log_mem,
                # streaming_unsloth_bnb.py:20-27) — this converter streams on
                # the host, so RSS is the residency that matters
                import resource

                rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
                print(
                    f"converted layer {L + 1}/{cfg.num_layers} "
                    f"({time.time() - t0:.1f}s, peak RSS {rss_gb:.2f} GB)"
                )

        w.add("final_norm", reader.read("model.norm.weight").astype(np.float32))
        if "lm_head.weight" in reader:
            w.add("lm_head", _bf16(reader.read("lm_head.weight")))
        if missing:
            w.set_metadata("missing_experts", [list(m) for m in missing])

    store = TensorStore(out_dir)
    if progress:
        gb = store.total_bytes() / 1e9
        print(f"wrote {gb:.2f} GB native checkpoint to {out_dir} in {time.time() - t0:.1f}s")
    return store


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description="Convert an Unsloth NF4 checkpoint to the native TPU format")
    ap.add_argument("--input", dest="inp", required=True, help="dir containing *.safetensors")
    ap.add_argument("--output", dest="out", required=True, help="output TensorStore dir")
    ap.add_argument("--config", default=None, help="EngineConfig json (default: GPT-OSS-20B)")
    ap.add_argument("--tiny", action="store_true", help="use the tiny test config")
    ap.add_argument("--nibble-order", default="low_first", choices=["low_first", "high_first"])
    ap.add_argument("--scale-dtype", default="float32", choices=["float32", "bfloat16", "float16"])
    ap.add_argument(
        "--format", default="unsloth", choices=["unsloth", "gpt-oss-mxfp4"],
        help="source checkpoint schema: Unsloth NF4 (the reference's artifact) "
             "or the official GPT-OSS MXFP4 release",
    )
    ap.add_argument("--gate-up-layout", default="interleaved", choices=["interleaved", "stacked"])
    ap.add_argument(
        "--first-contact", action="store_true",
        help="verify the raw artifact (layout asserts + layer-0 logit smoke, "
             "checkpoint/validate.py) BEFORE converting — recommended the "
             "first time a real downloaded checkpoint is used",
    )
    args = ap.parse_args(argv)

    if args.config:
        with open(args.config) as f:
            cfg = ModelConfig(**json.load(f)["model"])
    elif args.tiny:
        cfg = ModelConfig.tiny()
    else:
        cfg = ModelConfig()
    if args.format == "gpt-oss-mxfp4":
        from gpt_oss_vllm_tpu.checkpoint.gpt_oss_mxfp4 import (
            GptOssMxfp4Reader,
            convert_mxfp4_to_native,
        )

        mreader = GptOssMxfp4Reader(
            args.inp, nibble_order=args.nibble_order, gate_up_layout=args.gate_up_layout
        )
        print(f"checkpoint structure: {mreader.scan_structure()}")
        convert_mxfp4_to_native(mreader, cfg, args.out, scale_dtype=args.scale_dtype)
        return
    reader = UnslothCheckpointReader(args.inp, nibble_order=args.nibble_order)
    structure = reader.scan_structure()
    print(f"checkpoint structure: {structure}")
    if args.first_contact:
        from gpt_oss_vllm_tpu.checkpoint.validate import first_contact_report

        first_contact_report(reader, cfg)
    convert_unsloth_to_native(reader, cfg, args.out, scale_dtype=args.scale_dtype)


if __name__ == "__main__":
    main()
