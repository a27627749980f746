"""Official GPT-OSS MXFP4 checkpoint reader + synthetic writer.

GPT-OSS ships its experts MXFP4-quantized (the upstream format the reference
detects and overrides away on pre-Hopper hardware,
``patch_4_override_quant.py:26-41``). The HF artifact stores, per layer::

    model.layers.{L}.mlp.experts.gate_up_proj_blocks   u8 [E, 2FF, K/32, 16]
    model.layers.{L}.mlp.experts.gate_up_proj_scales   u8 [E, 2FF, K/32] (E8M0)
    model.layers.{L}.mlp.experts.gate_up_proj_bias         [E, 2FF]
    model.layers.{L}.mlp.experts.down_proj_{blocks,scales,bias}

i.e. experts are FUSED tensors (not the per-expert keys of the Unsloth
schema), 32-element MX blocks along the contracting dim, 16 bytes/block, two
FP4-E2M1 values per byte. Gate and up rows are interleaved in
``gate_up_proj`` (row 2i = gate_i, row 2i+1 = up_i) in the upstream artifact;
the converter normalizes to this framework's stacked [gate; up] layout with a
row permutation — free on packed data since packing runs along the IN dim.
Non-expert tensors (attention, router, norms, embeddings, sinks) are plain
bf16 under standard HF names.

No network egress exists in the build environment, so tests/benches exercise
the real reader/converter against :func:`write_synthetic_gpt_oss_mxfp4`,
which emits the same schema; ``gate_up_layout``/``nibble_order`` are
configurable in case the upstream artifact's conventions differ.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
from typing import Dict, List, Optional, Tuple

import ml_dtypes
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.quant.mxfp4 import e8m0_decode, mxfp4_quantize
from gpt_oss_vllm_tpu.quant.nf4 import pack_nibbles, unpack_nibbles

BF16 = ml_dtypes.bfloat16
BLOCK = 32  # MX block size (fixed by the OCP spec)


def _swap_nibbles(packed: np.ndarray) -> np.ndarray:
    p = packed.astype(np.uint8)
    return (((p & 0x0F) << 4) | (p >> 4)).astype(np.uint8)


class GptOssMxfp4Reader:
    """Streaming reader over a multi-file GPT-OSS MXFP4 checkpoint."""

    def __init__(self, paths_or_dir, nibble_order: str = "low_first",
                 gate_up_layout: str = "interleaved"):
        if isinstance(paths_or_dir, str) and os.path.isdir(paths_or_dir):
            paths = sorted(glob.glob(os.path.join(paths_or_dir, "*.safetensors")))
        else:
            paths = sorted(paths_or_dir)
        if not paths:
            raise FileNotFoundError(f"no safetensors under {paths_or_dir}")
        self.paths = paths
        self.nibble_order = nibble_order
        self.gate_up_layout = gate_up_layout
        self._index: Dict[str, str] = {}
        for p in paths:
            with safe_open(p, framework="numpy") as f:
                for k in f.keys():
                    self._index[k] = p

    def keys(self) -> List[str]:
        return sorted(self._index)

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def read(self, key: str) -> np.ndarray:
        path = self._index[key]
        with safe_open(path, framework="numpy") as f:
            return f.get_tensor(key)

    def expert_prefix(self, layer: int, proj: str) -> str:
        return f"model.layers.{layer}.mlp.experts.{proj}_proj"

    def read_expert_quantized(
        self, layer: int, expert: int, proj: str, out_f: int, in_f: int,
        raw_scales: bool = False,
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """One expert's (packed u8 [out, in/2], scales [out*in/32]) normalized
        to low-first nibbles and (for gate_up) stacked rows. ``raw_scales``
        returns the E8M0 exponent bytes; otherwise decoded f32."""
        pre = self.expert_prefix(layer, proj)
        if f"{pre}_blocks" not in self:
            return None
        nb = in_f // BLOCK
        blocks = self.read(f"{pre}_blocks")[expert]  # [out, nb, 16]
        scales_u8 = self.read(f"{pre}_scales")[expert]  # [out, nb]
        if blocks.shape != (out_f, nb, BLOCK // 2):
            raise ValueError(f"{pre}_blocks[{expert}]: {blocks.shape} != {(out_f, nb, BLOCK // 2)}")
        packed = blocks.reshape(out_f, in_f // 2)
        if self.nibble_order == "high_first":
            packed = _swap_nibbles(packed)
        scales = scales_u8 if raw_scales else e8m0_decode(scales_u8).astype(np.float32)
        if proj == "gate_up" and self.gate_up_layout == "interleaved":
            perm = np.concatenate([np.arange(0, out_f, 2), np.arange(1, out_f, 2)])
            packed = packed[perm]
            scales = scales[perm]
        return packed, scales.reshape(-1)

    def read_expert_bias(self, layer: int, expert: int, proj: str) -> Optional[np.ndarray]:
        key = f"{self.expert_prefix(layer, proj)}_bias"
        if key not in self:
            return None
        b = self.read(key)[expert].astype(np.float32)
        if proj == "gate_up" and self.gate_up_layout == "interleaved":
            n = b.shape[0]
            perm = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])
            b = b[perm]
        return b

    def scan_structure(self) -> dict:
        layers = set()
        experts = 0
        for k in self._index:
            m = re.match(r"model\.layers\.(\d+)\.mlp\.experts\.gate_up_proj_blocks$", k)
            if m:
                layers.add(int(m.group(1)))
        if layers:
            first = self.read(f"model.layers.{min(layers)}.mlp.experts.gate_up_proj_blocks")
            experts = first.shape[0]
        return {"num_layers": len(layers), "num_experts": experts, "format": "mxfp4"}


def convert_mxfp4_to_native(
    reader: GptOssMxfp4Reader,
    cfg: ModelConfig,
    out_dir: str,
    scale_dtype: str = "e8m0",
    progress: bool = True,
):
    """GPT-OSS MXFP4 checkpoint -> native TensorStore, bits repacked losslessly
    (same discipline as ``convert.convert_unsloth_to_native``: stream one
    expert at a time, never dequantize the 4-bit payload; only the one-byte
    E8M0 scales are decoded to float)."""
    from gpt_oss_vllm_tpu.checkpoint.store import TensorStore, TensorStoreWriter

    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    # "e8m0" keeps the raw exponent bytes (1 B/block, decoded in-kernel) —
    # the storage-faithful default; float dtypes decode at conversion
    sdt = {"float32": np.float32, "bfloat16": BF16, "float16": np.float16,
           "e8m0": np.uint8}[scale_dtype]
    t0 = time.time()

    def bf16(x):
        return x.astype(np.float32).astype(BF16)

    with TensorStoreWriter(out_dir) as w:
        w.set_metadata("model_config", json.loads(json.dumps(cfg.__dict__)))
        w.set_metadata(
            "quant",
            {"method": "mxfp4", "codebook": "mxfp4", "blocksize": BLOCK,
             "scale_dtype": scale_dtype},
        )
        w.add("embedding", bf16(reader.read("model.embed_tokens.weight")))
        for L in range(cfg.num_layers):
            p = f"model.layers.{L}"
            for short, proj in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj")):
                w.add(f"layers.{L}.w{short}", bf16(reader.read(f"{p}.self_attn.{proj}.weight")))
                if f"{p}.self_attn.{proj}.bias" in reader:
                    w.add(f"layers.{L}.b{short}",
                          reader.read(f"{p}.self_attn.{proj}.bias").astype(np.float32))
            w.add(f"layers.{L}.wo", bf16(reader.read(f"{p}.self_attn.o_proj.weight")))
            if f"{p}.self_attn.o_proj.bias" in reader:
                w.add(f"layers.{L}.bo", reader.read(f"{p}.self_attn.o_proj.bias").astype(np.float32))
            if f"{p}.self_attn.sinks" in reader:
                w.add(f"layers.{L}.sinks", reader.read(f"{p}.self_attn.sinks").astype(np.float32))
            w.add(f"layers.{L}.attn_norm",
                  reader.read(f"{p}.input_layernorm.weight").astype(np.float32))
            w.add(f"layers.{L}.mlp_norm",
                  reader.read(f"{p}.post_attention_layernorm.weight").astype(np.float32))
            w.add(f"layers.{L}.router_w", reader.read(f"{p}.mlp.router.weight").astype(np.float32))
            if f"{p}.mlp.router.bias" in reader:
                w.add(f"layers.{L}.router_b", reader.read(f"{p}.mlp.router.bias").astype(np.float32))
            for proj, out_f, in_f in (("gate_up", 2 * FF, H), ("down", H, FF)):
                nb = in_f // BLOCK
                raw = scale_dtype == "e8m0"
                qdata = np.zeros((E, out_f, in_f // 2), dtype=np.uint8)
                scales = np.zeros((E, nb, out_f), dtype=np.uint8 if raw else np.float32)
                biases = np.zeros((E, out_f), dtype=np.float32)
                have_bias = False
                for e in range(E):
                    r = reader.read_expert_quantized(L, e, proj, out_f, in_f, raw_scales=raw)
                    if r is None:
                        continue
                    eq, escales = r
                    qdata[e] = eq
                    scales[e] = escales.reshape(out_f, nb).T
                    b = reader.read_expert_bias(L, e, proj)
                    if b is not None:
                        biases[e] = b
                        have_bias = True
                w.add(f"layers.{L}.moe.{proj}.qdata", qdata)
                w.add(f"layers.{L}.moe.{proj}.scales", scales.astype(sdt))
                if have_bias:
                    w.add(f"layers.{L}.moe.{proj}.bias", biases)
            if progress:
                print(f"converted layer {L + 1}/{cfg.num_layers} ({time.time() - t0:.1f}s)")
        w.add("final_norm", reader.read("model.norm.weight").astype(np.float32))
        if "lm_head.weight" in reader:
            w.add("lm_head", bf16(reader.read("lm_head.weight")))
    store = TensorStore(out_dir)
    if progress:
        print(f"wrote {store.total_bytes() / 1e9:.2f} GB to {out_dir} in {time.time() - t0:.1f}s")
    return store


def write_synthetic_gpt_oss_mxfp4(
    out_dir: str,
    cfg: ModelConfig,
    seed: int = 0,
    num_files: int = 2,
    nibble_order: str = "low_first",
    gate_up_layout: str = "interleaved",
    weight_scale: float = 0.02,
) -> List[str]:
    """Emit a random-weight checkpoint in the GPT-OSS MXFP4 schema."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    files: List[Dict[str, np.ndarray]] = [dict() for _ in range(num_files)]

    def put(key, arr, fidx):
        files[fidx % num_files][key] = arr

    def emit_bf16(key, shape, fidx, scale=0.02):
        put(key, rng.normal(0, scale, size=shape).astype(np.float32).astype(BF16), fidx)

    def emit_expert_quant(prefix, out_f, in_f, fidx, interleave):
        nb = in_f // BLOCK
        blocks = np.zeros((E, out_f, nb, BLOCK // 2), np.uint8)
        scales = np.zeros((E, out_f, nb), np.uint8)
        for e in range(E):
            w = rng.normal(0, weight_scale, size=(out_f, in_f)).astype(np.float32)
            packed, s_u8 = mxfp4_quantize(w.reshape(-1), blocksize=BLOCK, order=nibble_order)
            blocks[e] = packed.reshape(out_f, nb, BLOCK // 2)
            scales[e] = s_u8.reshape(out_f, nb)
        # stacked [gate; up] -> upstream interleaved rows
        half = out_f // 2
        inv = np.empty(out_f, np.int64)
        inv[0::2] = np.arange(half)
        inv[1::2] = np.arange(half, out_f)
        if interleave:
            blocks, scales = blocks[:, inv], scales[:, inv]
        put(f"{prefix}_blocks", blocks, fidx)
        put(f"{prefix}_scales", scales, fidx)
        if cfg.expert_bias:
            b = rng.normal(0, weight_scale, size=(E, out_f)).astype(np.float32).astype(BF16)
            if interleave:
                b = b[:, inv]
            put(f"{prefix}_bias", b, fidx)

    emit_bf16("model.embed_tokens.weight", (cfg.vocab_size, H), 0)
    for L in range(cfg.num_layers):
        p = f"model.layers.{L}"
        emit_bf16(f"{p}.self_attn.q_proj.weight", (cfg.q_size, H), L)
        emit_bf16(f"{p}.self_attn.k_proj.weight", (cfg.kv_size, H), L)
        emit_bf16(f"{p}.self_attn.v_proj.weight", (cfg.kv_size, H), L)
        emit_bf16(f"{p}.self_attn.o_proj.weight", (H, cfg.q_size), L)
        if cfg.attention_bias:
            emit_bf16(f"{p}.self_attn.q_proj.bias", (cfg.q_size,), L)
            emit_bf16(f"{p}.self_attn.k_proj.bias", (cfg.kv_size,), L)
            emit_bf16(f"{p}.self_attn.v_proj.bias", (cfg.kv_size,), L)
            emit_bf16(f"{p}.self_attn.o_proj.bias", (H,), L)
        if cfg.use_sinks:
            emit_bf16(f"{p}.self_attn.sinks", (cfg.num_heads,), L, scale=1.0)
        emit_bf16(f"{p}.input_layernorm.weight", (H,), L, scale=1.0)
        emit_bf16(f"{p}.post_attention_layernorm.weight", (H,), L, scale=1.0)
        emit_bf16(f"{p}.mlp.router.weight", (E, H), L)
        if cfg.router_bias:
            emit_bf16(f"{p}.mlp.router.bias", (E,), L)
        inter = gate_up_layout == "interleaved"
        emit_expert_quant(f"{p}.mlp.experts.gate_up_proj", 2 * FF, H, L, inter)
        emit_expert_quant(f"{p}.mlp.experts.down_proj", H, FF, L, False)
    emit_bf16("model.norm.weight", (H,), num_files - 1, scale=1.0)
    if not cfg.tie_word_embeddings:
        emit_bf16("lm_head.weight", (cfg.vocab_size, H), num_files - 1)

    paths = []
    for i, tensors in enumerate(files):
        path = os.path.join(out_dir, f"model-{i + 1:05d}-of-{num_files:05d}.safetensors")
        save_file(tensors, path)
        paths.append(path)
    return paths
