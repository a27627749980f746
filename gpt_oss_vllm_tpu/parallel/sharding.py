"""GSPMD sharding specifications for params, KV cache, and activations.

Layout (SURVEY.md §7 stage 6):

- attention: Megatron-style — q/k/v column-parallel over 'model' (head
  aligned because q/k/v are stored separately), o row-parallel (XLA inserts
  the psum); KV cache sharded over kv heads.
- MoE: experts sharded over 'expert' (leading dim of packed NF4 qdata/scales
  shards identically), fused gate_up additionally column-parallel over
  'model' and down row-parallel, so EP x TP compose.
- lm_head vocab-column-parallel; embedding replicated (tables are read-
  gathered, cheap); router replicated (f32, tiny).
- batch/token dims of activations ride 'data'.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt_oss_vllm_tpu.models.params import LayerParams, ModelParams
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


def layer_pspecs(l: LayerParams, expert_axes=None) -> LayerParams:
    def opt(x, spec):
        return spec if x is not None else None

    ex = expert_axes if expert_axes is not None else "expert"

    def expert_w(w, parallel_dim: int):
        # Packed NF4 weights shard over the COMBINED expert axes on dim 0
        # (experts are ~95% of GPT-OSS bytes — that is the memory-scaling
        # dim), matching parallel.kernels.moe_block_gmm_sharded's per-shard
        # gmm layout so no per-step weight resharding happens at the
        # shard_map boundary. Dense expert weights keep the EP x TP GSPMD
        # scheme ([E, out, in]: dim 1 sharded => column-parallel, dim 2 =>
        # row-parallel; scales are stored transposed, spec swaps last two).
        if isinstance(w, NF4Tensor):
            return NF4Tensor(
                qdata=P(ex, None, None), scales=P(ex, None, None),
                out_features=w.out_features, in_features=w.in_features,
                blocksize=w.blocksize, codebook=w.codebook,
                row_layout=w.row_layout,
            )
        spec = ["expert", None, None]
        spec[parallel_dim] = "model"
        return P(*spec)

    def expert_b(w, b):
        if b is None:
            return None
        if isinstance(w, NF4Tensor):
            return P(ex, None)
        return P("expert", "model") if w is l.w_gate_up else P("expert", None)

    if l.wqkv is not None:
        raise ValueError(
            "cannot shard fused-qkv params over 'model' (mixed q/kv head rows); "
            "fuse_qkv() is the single-shard fast path — load unfused for TP"
        )
    return LayerParams(
        attn_norm=P(None),
        wq=P("model", None),
        bq=opt(l.bq, P("model")),
        wk=P("model", None),
        bk=opt(l.bk, P("model")),
        wv=P("model", None),
        bv=opt(l.bv, P("model")),
        wo=P(None, "model"),
        bo=opt(l.bo, P(None)),
        sinks=opt(l.sinks, P("model")),
        mlp_norm=P(None),
        router_w=P(None, None),
        router_b=opt(l.router_b, P(None)),
        w_gate_up=expert_w(l.w_gate_up, 1),  # [E, 2FF, H]: column-parallel on 2FF
        b_gate_up=expert_b(l.w_gate_up, l.b_gate_up),
        w_down=expert_w(l.w_down, 2),  # [E, H, FF]: row-parallel on FF
        b_down=expert_b(l.w_down, l.b_down),
    )


def params_pspecs(params: ModelParams, mesh: Optional[Mesh] = None) -> ModelParams:
    from gpt_oss_vllm_tpu.quant.vocab8 import Int8Vocab

    def vocab_spec(w, head: bool):
        if w is None:
            return None
        if isinstance(w, Int8Vocab):
            # int8 head shards vocab-parallel like the bf16 head (padded V is
            # a multiple of 512 — head-tile aligned for any pow2 tp); sharded
            # engines route it through the GSPMD-partitionable XLA lm_head
            # path (engine picks lm_head_backend='xla' under a mesh). A tied
            # int8 embedding stays replicated: it also feeds the row gather.
            if head:
                return Int8Vocab(
                    qdata=P("model", None), scales=P("model"),
                    vocab_size=w.vocab_size, hidden_size=w.hidden_size,
                )
            return Int8Vocab(
                qdata=P(None, None), scales=P(None),
                vocab_size=w.vocab_size, hidden_size=w.hidden_size,
            )
        return P("model", None) if head else P(None, None)

    expert_axes = None
    if mesh is not None and params.layers and isinstance(params.layers[0].w_gate_up, NF4Tensor):
        from gpt_oss_vllm_tpu.parallel.kernels import expert_shard_axes

        ax = expert_shard_axes(mesh, params.layers[0].w_gate_up.qdata.shape[0])
        expert_axes = ax if ax else "expert"
    return ModelParams(
        embedding=vocab_spec(params.embedding, head=False),
        layers=[layer_pspecs(l, expert_axes=expert_axes) for l in params.layers],
        final_norm=P(None),
        lm_head=vocab_spec(params.lm_head, head=True),
    )


def cache_pspec() -> P:
    # [L, num_blocks, block_size, n_kv * D] (flat head-dim layout) — sharding
    # the last dim over 'model' is head-aligned whenever tp divides n_kv
    return P(None, None, None, "model")


def _to_sharding(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: ModelParams, mesh: Mesh) -> ModelParams:
    """device_put the param tree with its canonical shardings."""
    shardings = _to_sharding(mesh, params_pspecs(params, mesh))
    return jax.device_put(params, shardings)
