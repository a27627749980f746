"""Unsloth/BitsAndBytes NF4 checkpoint reader + synthetic writer.

The checkpoint schema (SURVEY.md §2.2; reference ``unsloth_bnb_loader.py:196-227``,
``debug_shapes.py:52-54``): multi-file safetensors with per-expert keys

    model.layers.{L}.mlp.experts.{gate_up_projs|down_projs}.{E}.weight

holding flat packed uint8 ``[N, 1]`` NF4 data, with metadata suffixes
``.absmax`` (uint8, double-quantized), ``.nested_absmax`` (f32),
``.nested_quant_map`` (f32 codebook), ``.quant_map`` (f32 NF4 codebook), and a
sibling ``.bias``. Router / attention / embeddings / lm_head are plain fp16 or
bf16 tensors under standard HF GPT-OSS names.

Because no network egress exists in the build environment, tests and benches
exercise the *real* reader/converter path against checkpoints produced by
:func:`write_synthetic_unsloth_checkpoint`, which emits the exact same schema.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.quant.nf4 import (
    NF4_CODE,
    dequantize_absmax_double,
    infer_blocksize,
    nf4_quantize,
    quantize_absmax_double,
)

_EXPERT_KEY_RE = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(gate_up_projs|down_projs)\.(\d+)\.weight$"
)
# alternate key generations tolerated by the reference's loaders
# (``streaming_unsloth_loader.py:92-109``): fused w13/w2 names and the
# ``.qweight`` scheme
_EXPERT_ALT_KEY_RE = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\."
    r"(w13_weight|w2_weight|gate_up_proj\.qweight|down_proj\.qweight)$"
)


def _swap_nibbles(packed: np.ndarray) -> np.ndarray:
    p = packed.astype(np.uint8)
    return (((p & 0x0F) << 4) | (p >> 4)).astype(np.uint8)


class UnslothCheckpointReader:
    """Streaming reader over a multi-file Unsloth NF4 checkpoint.

    Tensors are fetched one at a time via ``safe_open`` so only a single
    expert is ever resident (the reference's streaming discipline,
    ``streaming_unsloth_bnb.py:133-142``), but with a global key->file index
    instead of the reference's per-key linear file search
    (``streaming_unsloth_bnb.py:131-136``).
    """

    def __init__(self, paths_or_dir, nibble_order: str = "low_first"):
        index: Optional[Dict[str, str]] = None
        if isinstance(paths_or_dir, str):
            if not os.path.isdir(paths_or_dir):
                raise FileNotFoundError(f"checkpoint dir not found: {paths_or_dir}")
            # HF multi-file artifacts ship model.safetensors.index.json; use
            # its weight_map when present (skips opening every shard header,
            # and a stale/incomplete index fails loudly below)
            idx_path = os.path.join(paths_or_dir, "model.safetensors.index.json")
            if os.path.exists(idx_path):
                with open(idx_path) as f:
                    index = json.load(f).get("weight_map", {})
                paths = sorted(
                    os.path.join(paths_or_dir, fn) for fn in set(index.values())
                )
                missing = [p for p in paths if not os.path.exists(p)]
                if missing:
                    raise FileNotFoundError(
                        f"index references absent shards: {missing}"
                    )
            else:
                paths = sorted(glob.glob(os.path.join(paths_or_dir, "*.safetensors")))
        else:
            paths = list(paths_or_dir)
        if not paths:
            raise FileNotFoundError(f"no safetensors files in {paths_or_dir}")
        self.paths = paths
        self.nibble_order = nibble_order
        self._key_to_path: Dict[str, str] = {}
        self._handles: Dict[str, object] = {}
        if index is not None:
            base = os.path.dirname(paths[0])
            self._key_to_path = {
                k: os.path.join(base, fn) for k, fn in index.items()
            }
        else:
            for p in paths:
                with safe_open(p, framework="np") as f:
                    for k in f.keys():
                        self._key_to_path[k] = p

    def keys(self) -> List[str]:
        return list(self._key_to_path.keys())

    def __contains__(self, key: str) -> bool:
        return key in self._key_to_path

    def read(self, key: str) -> np.ndarray:
        path = self._key_to_path[key]
        if path not in self._handles:
            self._handles[path] = safe_open(path, framework="np").__enter__()
        return self._handles[path].get_tensor(key)

    # -- structure ---------------------------------------------------------

    def scan_structure(self) -> dict:
        """Infer model dims from key parse — fresh derivation of the check the
        reference does at ``unsloth_to_vllm_converter.py:33-56``."""
        layers, experts = set(), set()
        quantized = 0
        for k in self._key_to_path:
            m = _EXPERT_KEY_RE.match(k)
            alt = None if m else _EXPERT_ALT_KEY_RE.match(k)
            if m:
                layers.add(int(m.group(1)))
                experts.add(int(m.group(3)))
            elif alt:
                layers.add(int(alt.group(1)))
                experts.add(int(alt.group(2)))
            if (m or alt) and self._meta_key(k, "absmax") in self._key_to_path:
                quantized += 1
        hidden = None
        if "model.embed_tokens.weight" in self._key_to_path:
            hidden = self.shape("model.embed_tokens.weight")[1]
        return {
            "num_layers": max(layers) + 1 if layers else 0,
            "num_experts": max(experts) + 1 if experts else 0,
            "hidden_size": hidden,
            "num_quantized_expert_tensors": quantized,
        }

    def shape(self, key: str) -> Tuple[int, ...]:
        path = self._key_to_path[key]
        with safe_open(path, framework="np") as f:
            return tuple(f.get_slice(key).get_shape())

    # -- experts -----------------------------------------------------------

    def _expert_key_candidates(self, layer: int, expert: int, proj: str) -> List[str]:
        """All expert-weight key schemes seen across checkpoint generations.

        The reference's loaders tolerate the same set: the canonical Unsloth
        per-expert scheme plus the ``w13_weight``/``w2_weight`` and
        ``gate_up_proj.qweight``/``down_proj.qweight`` alternates probed at
        ``streaming_unsloth_loader.py:92-109``."""
        group = "gate_up_projs" if proj == "gate_up" else "down_projs"
        fused = "w13_weight" if proj == "gate_up" else "w2_weight"
        qw = "gate_up_proj.qweight" if proj == "gate_up" else "down_proj.qweight"
        p = f"model.layers.{layer}.mlp.experts"
        return [
            f"{p}.{group}.{expert}.weight",
            f"{p}.{expert}.{fused}",
            f"{p}.{expert}.{qw}",
        ]

    def expert_weight_key(self, layer: int, expert: int, proj: str) -> str:
        """The key this checkpoint actually uses for (layer, expert, proj) —
        first present candidate, else the canonical scheme (for error text)."""
        cands = self._expert_key_candidates(layer, expert, proj)
        for k in cands:
            if k in self._key_to_path:
                return k
        return cands[0]

    @staticmethod
    def _meta_key(wkey: str, suffix: str) -> str:
        """Metadata key for a weight key, scheme-aware: the canonical scheme
        appends ``.absmax`` etc.; the ``.qweight`` alternate replaces the
        trailing ``qweight`` (reference ``streaming_unsloth_loader.py:112-115``,
        ``absmax_key = weight_key.replace('qweight', 'absmax')``), and the
        ``w13_weight`` alternate replaces the trailing ``weight``."""
        if wkey.endswith(".qweight"):
            return wkey[: -len("qweight")] + suffix
        if wkey.endswith("_weight"):
            return wkey[: -len("weight")] + suffix
        return wkey + "." + suffix

    def read_expert_quantized(
        self, layer: int, expert: int, proj: str, out_features: int, in_features: int
    ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
        """Read one expert projection WITHOUT dequantizing the weight.

        Returns ``(qdata [out, in//2] low_first, scales f32 flat, blocksize)``
        or None if the expert is absent (the converter zero-fills, mirroring
        the reference's fallback at ``streaming_unsloth_bnb.py:261-264``).
        The weight bits pass through untouched — conversion is lossless.
        """
        wkey = self.expert_weight_key(layer, expert, proj)
        if wkey not in self._key_to_path:
            return None
        qweight = self.read(wkey).reshape(-1)
        if qweight.dtype != np.uint8:
            # dense (unquantized) expert: quantize it ourselves
            dense = qweight.astype(np.float32).reshape(out_features, in_features)
            packed, absmax = nf4_quantize(dense, blocksize=64)
            return packed.reshape(out_features, in_features // 2), absmax, 64

        total = out_features * in_features
        if qweight.size * 2 != total:
            raise ValueError(
                f"{wkey}: packed size {qweight.size} bytes != {total} 4-bit values"
            )
        absmax = self._read_absmax(wkey, total)
        blocksize = infer_blocksize(total, absmax.size)
        if self.nibble_order == "high_first":
            qweight = _swap_nibbles(qweight)
        return qweight.reshape(out_features, in_features // 2), absmax, blocksize

    def _read_absmax(self, wkey: str, total_params: int) -> np.ndarray:
        mk = self._meta_key
        absmax_data = (
            self.read(mk(wkey, "absmax")) if mk(wkey, "absmax") in self._key_to_path else None
        )
        if absmax_data is None:
            return np.ones(total_params // 64, dtype=np.float32)
        if mk(wkey, "nested_absmax") in self._key_to_path:
            nested_absmax = self.read(mk(wkey, "nested_absmax")).astype(np.float32)
            nested_code = self.read(mk(wkey, "nested_quant_map")).astype(np.float32)
            offset = 0.0
            if mk(wkey, "offset") in self._key_to_path:
                offset = float(self.read(mk(wkey, "offset")).reshape(-1)[0])
            return dequantize_absmax_double(
                absmax_data.astype(np.uint8), nested_absmax, nested_code, offset=offset
            )
        return absmax_data.astype(np.float32)

    def read_expert_dense(
        self, layer: int, expert: int, proj: str, out_features: int, in_features: int
    ) -> Optional[np.ndarray]:
        """Full dequant of one expert (validation path — the reference's
        ``dequant_unsloth_expert_cpu`` contract)."""
        q = self.read_expert_quantized(layer, expert, proj, out_features, in_features)
        if q is None:
            return None
        qdata, absmax, blocksize = q
        code = NF4_CODE
        wkey = self.expert_weight_key(layer, expert, proj)
        qmk = self._meta_key(wkey, "quant_map")
        if qmk in self._key_to_path:
            code = self.read(qmk).astype(np.float32).reshape(-1)
        from gpt_oss_vllm_tpu.quant.nf4 import nf4_dequantize

        return nf4_dequantize(
            qdata.reshape(-1), absmax, (out_features, in_features), blocksize, code=code
        )

    def read_expert_bias(self, layer: int, expert: int, proj: str) -> Optional[np.ndarray]:
        candidates = [
            self._meta_key(w, "bias") for w in self._expert_key_candidates(layer, expert, proj)
        ]
        # canonical scheme: the sibling `.bias` replaces `.weight` rather than
        # suffixing it (reference ``unsloth_bnb_loader.py:196-227``)
        group = "gate_up_projs" if proj == "gate_up" else "down_projs"
        candidates.insert(0, f"model.layers.{layer}.mlp.experts.{group}.{expert}.bias")
        for key in candidates:
            if key in self._key_to_path:
                return self.read(key).astype(np.float32)
        return None


# ---------------------------------------------------------------------------
# Synthetic checkpoint writer (test / bench substitute for the HF download)
# ---------------------------------------------------------------------------


def write_synthetic_unsloth_checkpoint(
    out_dir: str,
    cfg: ModelConfig,
    seed: int = 0,
    num_files: int = 2,
    nibble_order: str = "low_first",
    use_offset: bool = False,
    weight_scale: float = 0.02,
    drop_experts: Tuple[Tuple[int, int, str], ...] = (),
    key_scheme: str = "canonical",
    blocksize: int = 64,
    meta_dtype: str = "float32",
    tensor_dtype: str = "float16",
    ragged: bool = False,
    write_index: bool = False,
) -> List[str]:
    """Emit a random-weight checkpoint in the exact Unsloth NF4 schema.

    ``drop_experts`` removes (layer, expert, proj) entries to exercise the
    zero-fill fallback. Non-MoE tensors are fp16, experts are double-quantized
    NF4 like the real ``unsloth/gpt-oss-20b-unsloth-bnb-4bit`` artifact.
    ``key_scheme`` picks the expert key generation: "canonical"
    (``gate_up_projs.{E}.weight``), "w13" (``{E}.w13_weight``), or "qweight"
    (``{E}.gate_up_proj.qweight``) — the alternates the reference probes at
    ``streaming_unsloth_loader.py:92-109``.

    Real-artifact quirk knobs (VERDICT r4 next #6 — the matrix of variants a
    first real download might ship, cf. the tolerance rules at
    ``streaming_unsloth_bnb.py:148-218``): ``blocksize`` (64 or the 128
    fallback the reference infers), ``meta_dtype`` (fp16 quant metadata
    instead of f32), ``tensor_dtype`` ("float16" | "bfloat16" non-MoE
    tensors), ``ragged`` (uneven key->file distribution, an expert's
    metadata in a different file than its weight), ``write_index``
    (HF ``model.safetensors.index.json`` weight map).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
    files: List[Dict[str, np.ndarray]] = [dict() for _ in range(num_files)]
    mdt = {"float32": np.float32, "float16": np.float16}[meta_dtype]
    if tensor_dtype == "bfloat16":
        import ml_dtypes

        tdt = ml_dtypes.bfloat16
    else:
        tdt = np.float16
    _rag = [0]  # running tensor counter for the ragged distribution

    def put(key: str, arr: np.ndarray, fidx: int):
        if ragged and num_files > 1:
            # uneven spread that also separates an expert's metadata from
            # its weight: file 0 gets every 7th tensor, the rest cycle over
            # the remaining files
            i = _rag[0]
            _rag[0] += 1
            fidx = 0 if i % 7 == 0 else 1 + (i % (num_files - 1))
        files[fidx % num_files][key] = arr

    def emit_quantized(key: str, shape, fidx: int):
        w = rng.normal(0, weight_scale, size=shape).astype(np.float32)
        packed, absmax = nf4_quantize(w, blocksize=blocksize, order=nibble_order)
        dq = quantize_absmax_double(absmax, use_offset=use_offset)
        mk = UnslothCheckpointReader._meta_key
        put(key, packed.reshape(-1, 1), fidx)
        put(mk(key, "absmax"), dq.qabsmax, fidx)
        put(mk(key, "nested_absmax"), dq.nested_absmax.astype(mdt), fidx)
        put(mk(key, "nested_quant_map"), dq.code.astype(mdt), fidx)
        put(mk(key, "quant_map"), NF4_CODE.astype(mdt), fidx)
        if use_offset:
            put(mk(key, "offset"), np.array([dq.offset], dtype=mdt), fidx)

    def expert_key(L: int, e: int, proj: str) -> str:
        p = f"model.layers.{L}.mlp.experts"
        if key_scheme == "w13":
            return f"{p}.{e}." + ("w13_weight" if proj == "gate_up" else "w2_weight")
        if key_scheme == "qweight":
            return f"{p}.{e}." + (
                "gate_up_proj.qweight" if proj == "gate_up" else "down_proj.qweight"
            )
        group = "gate_up_projs" if proj == "gate_up" else "down_projs"
        return f"{p}.{group}.{e}.weight"

    def expert_bias_key(L: int, e: int, proj: str) -> str:
        if key_scheme == "canonical":
            group = "gate_up_projs" if proj == "gate_up" else "down_projs"
            return f"model.layers.{L}.mlp.experts.{group}.{e}.bias"
        return UnslothCheckpointReader._meta_key(expert_key(L, e, proj), "bias")

    def emit_fp16(key: str, shape, fidx: int, scale=0.02):
        put(key, rng.normal(0, scale, size=shape).astype(np.float32).astype(tdt), fidx)

    emit_fp16("model.embed_tokens.weight", (cfg.vocab_size, H), 0)
    for L in range(cfg.num_layers):
        fidx = L  # spread layers across files
        p = f"model.layers.{L}"
        emit_fp16(f"{p}.self_attn.q_proj.weight", (cfg.q_size, H), fidx)
        emit_fp16(f"{p}.self_attn.k_proj.weight", (cfg.kv_size, H), fidx)
        emit_fp16(f"{p}.self_attn.v_proj.weight", (cfg.kv_size, H), fidx)
        emit_fp16(f"{p}.self_attn.o_proj.weight", (H, cfg.q_size), fidx)
        if cfg.attention_bias:
            emit_fp16(f"{p}.self_attn.q_proj.bias", (cfg.q_size,), fidx)
            emit_fp16(f"{p}.self_attn.k_proj.bias", (cfg.kv_size,), fidx)
            emit_fp16(f"{p}.self_attn.v_proj.bias", (cfg.kv_size,), fidx)
            emit_fp16(f"{p}.self_attn.o_proj.bias", (H,), fidx)
        if cfg.use_sinks:
            emit_fp16(f"{p}.self_attn.sinks", (cfg.num_heads,), fidx, scale=1.0)
        emit_fp16(f"{p}.input_layernorm.weight", (H,), fidx, scale=1.0)
        emit_fp16(f"{p}.post_attention_layernorm.weight", (H,), fidx, scale=1.0)
        emit_fp16(f"{p}.mlp.router.weight", (E, H), fidx)
        if cfg.router_bias:
            emit_fp16(f"{p}.mlp.router.bias", (E,), fidx)
        for e in range(E):
            if (L, e, "gate_up") not in drop_experts:
                emit_quantized(expert_key(L, e, "gate_up"), (2 * FF, H), fidx)
                if cfg.expert_bias:
                    emit_fp16(expert_bias_key(L, e, "gate_up"), (2 * FF,), fidx)
            if (L, e, "down") not in drop_experts:
                emit_quantized(expert_key(L, e, "down"), (H, FF), fidx)
                if cfg.expert_bias:
                    emit_fp16(expert_bias_key(L, e, "down"), (H,), fidx)
    emit_fp16("model.norm.weight", (H,), num_files - 1, scale=1.0)
    if not cfg.tie_word_embeddings:
        emit_fp16("lm_head.weight", (cfg.vocab_size, H), num_files - 1)

    paths = []
    weight_map: Dict[str, str] = {}
    total_size = 0
    for i, tensors in enumerate(files):
        fname = f"model-{i + 1:05d}-of-{num_files:05d}.safetensors"
        path = os.path.join(out_dir, fname)
        save_file(tensors, path)
        paths.append(path)
        for k, v in tensors.items():
            weight_map[k] = fname
            total_size += v.nbytes
    if write_index:
        # the HF multi-file shard index the real artifact ships
        with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
            json.dump(
                {"metadata": {"total_size": total_size},
                 "weight_map": weight_map},
                f,
            )
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "gpt_oss",
                "hidden_size": H,
                "intermediate_size": FF,
                "num_hidden_layers": cfg.num_layers,
                "num_local_experts": E,
                "num_experts_per_tok": cfg.experts_per_token,
                "num_attention_heads": cfg.num_heads,
                "num_key_value_heads": cfg.num_kv_heads,
                "head_dim": cfg.head_dim,
                "vocab_size": cfg.vocab_size,
                "sliding_window": cfg.sliding_window,
                "rope_theta": cfg.rope_theta,
            },
            f,
            indent=1,
        )
    return paths
