"""Cache-aware jitted step functions: one program for prefill chunks and
batched decode.

A single ``model_step`` covers both phases (T=chunk for prefill, T=1 for
decode): compute chunk K/V -> scatter into the paged cache -> attend against
the *gathered logical context* with causal + sliding-window + sink masking.
Because gathered pages are laid out in logical position order, positions
beyond the sequence length are masked by causality alone and cache garbage
can never leak — this is what makes chunked prefill and decode the same
program.

Logits are computed only at each row's last valid position (for GPT-OSS-20B a
full-chunk logit tensor would be T x 201k floats — never materialized).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import EngineConfig, ModelConfig
from gpt_oss_vllm_tpu.engine.kv_cache import KVCache, gather_kv, slot_mapping, write_kv
from gpt_oss_vllm_tpu.models.gpt_oss import rms_norm
from gpt_oss_vllm_tpu.models.params import LayerParams, ModelParams
from gpt_oss_vllm_tpu.ops.attention import mha_reference
from gpt_oss_vllm_tpu.ops.linear import dense_linear
from gpt_oss_vllm_tpu.ops.moe import moe_block
from gpt_oss_vllm_tpu.ops.lm_head import lm_head_logits
from gpt_oss_vllm_tpu.ops.rope import apply_rope, yarn_rope_tables
from gpt_oss_vllm_tpu.quant.vocab8 import Int8Vocab, embed_rows


class StepOut(NamedTuple):
    logits: jax.Array  # [B, V] f32 at each row's last valid position
    #        (or [B, T, V] when all_logits — the speculative-verify path;
    #         None when greedy_head short-circuits the logits)
    cache: KVCache
    # [L, B*T, k] routed expert ids when collect_routing (bench census)
    routing: Optional[jax.Array] = None
    # [B] int32 greedy tokens when greedy_head (fused argmax lm_head sweep:
    # the [B, 201k] logits are never materialized)
    greedy_tok: Optional[jax.Array] = None


def _embed(embedding, tokens: jax.Array) -> jax.Array:
    """Token embedding lookup, layout-robust for prefill chunks.

    The tied vocab table serves two consumers with opposing layout
    preferences: the lm-head reduce fusion (which makes XLA pick a
    column-major parameter layout) and this row gather. For multi-token
    chunks XLA resolves the conflict by relayout-COPYING the whole 1.16 GB
    table in front of the gather — ~3.6 ms per prefill chunk (profiler
    trace, 8L/128-token step). A one-hot MXU gather instead reads the table
    once in whatever layout it already has (~1.4 ms, memory-bound) and
    writes only [T, H]. Decode (tiny T) lowers to dynamic-slice without the
    copy, so the plain gather stays."""
    if isinstance(embedding, Int8Vocab):
        # int8 table: gather reads only T rows, and the heavy consumer (the
        # lm_head Pallas kernel) imposes no XLA layout on the table — the
        # one-hot detour below is a bf16-table workaround only
        return embed_rows(embedding, tokens)
    B, T = tokens.shape
    safe = jnp.maximum(tokens, 0)
    if T < 32:
        return jnp.take(embedding, safe, axis=0)
    V, H = embedding.shape
    oh = jax.nn.one_hot(safe.reshape(-1), V, dtype=embedding.dtype)
    x = jax.lax.dot_general(
        oh, embedding, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return x.astype(embedding.dtype).reshape(B, T, H)


def _cached_attention(
    p: LayerParams,
    cfg: ModelConfig,
    layer_idx: int,
    x: jax.Array,  # [B, T, H]
    positions: jax.Array,  # [B, T] int32, -1 = pad
    cache: KVCache,
    block_tables: jax.Array,  # [B, MB]
    backend: str,
    mesh=None,
    rope: Optional[Tuple[jax.Array, jax.Array]] = None,  # hoisted cos/sin
) -> Tuple[jax.Array, KVCache]:
    B, T, H = x.shape
    if p.wqkv is not None:
        qkv = dense_linear(x, p.wqkv, p.bqkv)
        q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    else:
        q = dense_linear(x, p.wq, p.bq)
        k = dense_linear(x, p.wk, p.bk)
        v = dense_linear(x, p.wv, p.bv)
    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    if rope is None:
        rope = yarn_rope_tables(cfg, jnp.maximum(positions, 0))
    cos, sin = rope
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    slots = slot_mapping(block_tables, positions, cache.block_size)
    cache = write_kv(cache, layer_idx, k, v, slots)

    window = cfg.sliding_window if cfg.layer_uses_sliding_window(layer_idx) else None
    sinks = p.sinks if cfg.use_sinks else None

    # decode attention backend policy (all shapes static at trace time):
    # the paged Pallas kernel is ~even with the gather at b1 (101.1 vs 99.3
    # tok/s, within estimator noise) and wins structurally at LONG tables
    # (windowed layers skip pages; the gather reads B x table-width x 512
    # bytes x2 regardless), while the XLA gather clearly wins when many
    # rows share a short table (b32: 458.8 vs 346.5 tok/s at a 256-token
    # table — per-(row, kv-group) kernel programs pay their DMA-ring fixed
    # cost 128 times for tiny walks). Batched decode over short tables
    # takes the gather; everything else keeps the kernel.
    use_decode_kernel = backend.startswith("pallas") and T == 1
    if use_decode_kernel and mesh is None and backend == "pallas":
        # "pallas_interpret" (kernel-coverage test mode) is never
        # auto-selected away from the kernel
        table_tokens = block_tables.shape[1] * cache.block_size
        if B >= 8 and table_tokens <= 1024:
            use_decode_kernel = False
    if use_decode_kernel:
        interp = backend == "pallas_interpret"
        if mesh is not None:
            # per-shard kernel on the local kv-head band — the sharded cache
            # is never gathered (parallel/kernels.py)
            from gpt_oss_vllm_tpu.parallel.kernels import paged_attention_decode_sharded

            out = paged_attention_decode_sharded(
                q[:, 0],
                cache.k[layer_idx],
                cache.v[layer_idx],
                block_tables,
                positions[:, 0],
                mesh,
                sinks=sinks,
                window=window,
                interpret=interp,
            )[:, None]
        else:
            from gpt_oss_vllm_tpu.ops.paged_attention import paged_attention_decode

            out = paged_attention_decode(
                q[:, 0],
                cache.k[layer_idx],
                cache.v[layer_idx],
                block_tables,
                positions[:, 0],
                sinks=sinks,
                window=window,
                interpret=interp,
            )[:, None]
    elif backend.startswith("pallas") and T >= 16:
        # prefill chunks: flash kernel over the gathered logical context —
        # online softmax, causal/window tile skipping (never reads key tiles
        # past the current position or below the window), sinks folded in.
        # Chunk rows sit at absolute positions via q_offsets; padded rows
        # (positions == -1) mask out through lens == 0.
        interp = backend == "pallas_interpret"
        k_ctx, v_ctx = gather_kv(cache, layer_idx, block_tables)  # [B, S, KV, D]
        lens = jnp.max(positions, axis=1) + 1  # [B] total context length
        q_off = jnp.maximum(positions[:, 0], 0)
        if mesh is not None:
            from gpt_oss_vllm_tpu.parallel.kernels import (
                flash_attention_prefill_sharded,
            )

            out = flash_attention_prefill_sharded(
                q, k_ctx, v_ctx, lens, q_off, mesh,
                sinks=sinks, window=window, interpret=interp,
            )
        else:
            from gpt_oss_vllm_tpu.ops.flash_attention import flash_attention

            out = flash_attention(
                q, k_ctx, v_ctx, lens,
                sinks=sinks, window=window, q_offsets=q_off, interpret=interp,
            )
    else:
        k_ctx, v_ctx = gather_kv(cache, layer_idx, block_tables)  # [B, S, KV, D]
        S = k_ctx.shape[1]
        k_pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # logical order
        q_pos = positions[:, :, None]
        mask = (k_pos[:, None, :] <= q_pos) & (q_pos >= 0)
        if window is not None and window > 0:
            mask = mask & (q_pos - k_pos[:, None, :] < window)
        out = mha_reference(q, k_ctx, v_ctx, sinks, mask)
    out = out.reshape(B, T, cfg.q_size)
    return dense_linear(out, p.wo, p.bo), cache


def model_step(
    params: ModelParams,
    cfg: ModelConfig,
    cache: KVCache,
    tokens: jax.Array,  # [B, T] int32 (0 on pads)
    positions: jax.Array,  # [B, T] int32, -1 = pad
    block_tables: jax.Array,  # [B, MB] int32, -1 = unallocated
    last_idx: jax.Array,  # [B] int32 index of last valid position per row
    moe_strategy: str = "auto",
    attn_backend: str = "xla",
    quant_backend: str = "xla",
    all_logits: bool = False,
    lm_head_backend: Optional[str] = None,
    mesh=None,
    ep_capacity_factor: float = 0.0,
    collect_routing: bool = False,
    greedy_head: bool = False,
) -> StepOut:
    # the lm_head backend is selected independently of the expert-quant
    # backend: the fused int8 kernel wants TPU and no mesh (pallas_call is
    # not GSPMD-partitionable), while expert quant may be off entirely
    # (method='none' --vocab-int8) — the engine passes this explicitly
    lm_backend = lm_head_backend if lm_head_backend is not None else quant_backend
    B, T = tokens.shape
    x = _embed(params.embedding, tokens)
    routed = [] if collect_routing else None
    # rope tables are position-only: computed ONCE and reused by all layers
    # (explicit hoist rather than relying on XLA CSE across 24 subgraphs)
    rope = yarn_rope_tables(cfg, jnp.maximum(positions, 0))
    for li, layer in enumerate(params.layers):
        attn_out, cache = _cached_attention(
            layer,
            cfg,
            li,
            rms_norm(x, layer.attn_norm, cfg.rms_norm_eps),
            positions,
            cache,
            block_tables,
            attn_backend,
            mesh=mesh,
            rope=rope,
        )
        x = x + attn_out
        flat = rms_norm(x, layer.mlp_norm, cfg.rms_norm_eps).reshape(B * T, -1)
        from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor

        if mesh is not None and moe_strategy == "ep_a2a":
            # explicit capacity-bucketed all-to-all token dispatch over the
            # expert shards (ParallelConfig.moe_dispatch == "a2a"): tokens
            # travel to their expert's device and back over ICI instead of
            # every shard computing every token (SURVEY.md §2.4 — the core
            # of the multi-host config). Lossless at the default capacity
            # (factor = ep), so greedy streams match the implicit path.
            from gpt_oss_vllm_tpu.ops.moe_ep import moe_block_ep

            moe = moe_block_ep(
                flat,
                layer.router_w,
                layer.router_b,
                layer.w_gate_up,
                layer.b_gate_up,
                layer.w_down,
                layer.b_down,
                cfg,
                mesh,
                capacity_factor=ep_capacity_factor,
                backend=quant_backend,
            )
        elif (
            mesh is not None
            and quant_backend.startswith("pallas")
            and isinstance(layer.w_gate_up, NF4Tensor)
        ):
            # any dispatch size: the per-shard moe_gmm_block selects the
            # row-blocked grid past GMM_RESIDENT_PAIR_CAP pairs (bounded
            # VMEM). The old <=2048-pair cap here silently dropped big
            # prefill chunks into an UNSHARDED pallas_call inside the
            # mesh-jitted program — unpartitionable, and a hard error for
            # glu4-sectioned weights.
            # per-shard fused-dequant gmm on the local expert slice + psum
            # combine — packed weights are never gathered (parallel/kernels)
            from gpt_oss_vllm_tpu.parallel.kernels import moe_block_gmm_sharded

            moe = moe_block_gmm_sharded(
                flat,
                layer.router_w,
                layer.router_b,
                layer.w_gate_up,
                layer.b_gate_up,
                layer.w_down,
                layer.b_down,
                cfg,
                mesh,
                interpret=quant_backend == "pallas_interpret",
            )
        else:
            moe = moe_block(
                flat,
                layer.router_w,
                layer.router_b,
                layer.w_gate_up,
                layer.b_gate_up,
                layer.w_down,
                layer.b_down,
                cfg,
                strategy=moe_strategy,
                backend=quant_backend,
                return_indices=collect_routing,
            )
            if collect_routing:
                moe, idx = moe
                routed.append(idx)
        x = x + moe.reshape(B, T, -1)
    routing_out = jnp.stack(routed) if routed else None
    x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
    head = params.embedding if params.lm_head is None else params.lm_head
    if all_logits:
        # speculative verify: logits at EVERY fed position (T is the small
        # draft window, never a prefill chunk — [B, T, V] stays tens of MB)
        h = x.reshape(B * T, -1)
        if isinstance(head, Int8Vocab):
            logits = lm_head_logits(head, h, backend=lm_backend)
            logits = logits[:, : cfg.vocab_size].reshape(B, T, -1)
        else:
            logits = jax.lax.dot_general(
                head, h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ).T.reshape(B, T, -1)
        return StepOut(logits=logits.astype(jnp.float32), cache=cache,
                       routing=routing_out)
    # only the last valid position's hidden state reaches the LM head
    h_last = jnp.take_along_axis(x, last_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    if greedy_head and mesh is None:
        # greedy decode: the argmax folds into the lm_head sweep (int8
        # kernel never materializes [B, 201k] logits; bit-identical to
        # argmax of the logits path)
        from gpt_oss_vllm_tpu.ops.lm_head import lm_head_greedy

        if isinstance(head, Int8Vocab):
            tok = lm_head_greedy(head, h_last, backend=lm_backend)
        else:
            logits = jax.lax.dot_general(
                head, h_last, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).T
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return StepOut(logits=None, cache=cache, routing=routing_out,
                       greedy_tok=tok)
    if isinstance(head, Int8Vocab):
        logits = lm_head_logits(head, h_last, backend=lm_backend)[:, : cfg.vocab_size]
        return StepOut(logits=logits, cache=cache, routing=routing_out)
    # contract over the head table's MINOR dim (head @ h^T) — the x @ W^T form
    # makes XLA:TPU relayout the 1.1 GB vocab table into a transposed copy
    logits = jax.lax.dot_general(
        head, h_last, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).T
    return StepOut(logits=logits.astype(jnp.float32), cache=cache,
                   routing=routing_out)
