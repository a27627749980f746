"""Fused int8-dequant lm_head matmul Pallas kernel.

The tied vocab table is the decode step's largest fixed read (~1.16 GB bf16,
~1.5 ms/step on v5e — docs/STATUS.md). With the table stored per-row int8
(``quant.vocab8.Int8Vocab``) this kernel streams the int8 bytes straight from
HBM, dequantizes in-register (int8 values are exact in bf16: |q| <= 127 fits
the 8-bit mantissa), and contracts against the resident hidden states —
halving the table traffic. Row scales multiply the f32 accumulator, so the
only rounding beyond int8 quantization itself is the bf16 matmul input cast
shared with the dense path.

Replaces the bitsandbytes-era "lm_head stays fp16" rule the reference
inherits (``gpt_oss_moe_architecture.md:12-26``); opt-in via
``QuantConfig.vocab_int8``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt_oss_vllm_tpu.quant.vocab8 import Int8Vocab, VOCAB_TILE, lm_head_logits_xla

_ROWS = 8  # sublane tile for the hidden-state block


def _lm_head_kernel(h_ref, q_ref, s_ref, o_ref):
    # h_ref [Bp, Hp] bf16 (resident), q_ref [TILE_V, Hp] int8,
    # s_ref [1, TILE_V] f32, o_ref [Bp, TILE_V] f32
    q = q_ref[...].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        h_ref[...], q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bp, TILE_V]
    o_ref[...] = acc * s_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_head_int8(
    h: jax.Array,  # [B, H] hidden states at the sampled positions
    vocab: Int8Vocab,
    interpret: bool = False,
) -> jax.Array:
    """Logits [B, Vp] f32 (pad rows are exactly 0; callers slice [:V])."""
    B, H = h.shape
    Vp, Hp = vocab.qdata.shape
    assert Vp % VOCAB_TILE == 0 and H <= Hp
    Bp = -(-B // _ROWS) * _ROWS
    hb = h.astype(jnp.bfloat16)
    if Bp != B or Hp != H:
        hb = jnp.pad(hb, ((0, Bp - B), (0, Hp - H)))
    grid = (Vp // VOCAB_TILE,)
    out = pl.pallas_call(
        _lm_head_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VOCAB_TILE, Hp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VOCAB_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, VOCAB_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Vp), jnp.float32),
        interpret=interpret,
    )(hb, vocab.qdata, vocab.scales.reshape(1, Vp))
    return out[:B]


def lm_head_logits(
    vocab: Int8Vocab, h: jax.Array, backend: str = "xla"
) -> jax.Array:
    """Dispatch: fused Pallas kernel on TPU serving paths, XLA oracle
    elsewhere. Returns [B, Vp] f32 — pad-row logits are exactly 0 and must
    be sliced off (callers use [:, :vocab.vocab_size])."""
    if backend == "pallas":
        return lm_head_int8(h, vocab)
    return lm_head_logits_xla(vocab, h)


def _lm_head_argmax_kernel(h_ref, q_ref, s_ref, val_ref, idx_ref, *, tile_v, v_real):
    # running (max, first-argmax) accumulated across vocab tiles — the
    # greedy decode step never materializes the [B, 201k] logits (saves the
    # f32 write + re-read + a separate XLA argmax op every step)
    i = pl.program_id(0)
    q = q_ref[...].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        h_ref[...], q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * s_ref[...]
    B = acc.shape[0]
    gidx = i * tile_v + jax.lax.broadcasted_iota(jnp.int32, (B, tile_v), 1)
    acc = jnp.where(gidx < v_real, acc, -jnp.inf)  # vocab pad lanes lose
    tile_max = jnp.max(acc, axis=1, keepdims=True)  # [B, 1]
    tile_idx = jnp.min(
        jnp.where(acc == tile_max, gidx, jnp.int32(2**31 - 1)), axis=1, keepdims=True
    )  # first max within the tile (jnp.argmax tie rule)

    # every lane of the accumulator blocks carries the same per-row value
    # (broadcast compares avoid sub-128 lane slicing, which Mosaic rejects)
    vmax = jnp.broadcast_to(tile_max, val_ref.shape)
    vidx = jnp.broadcast_to(tile_idx, idx_ref.shape)

    @pl.when(i == 0)
    def _init():
        val_ref[...] = vmax
        idx_ref[...] = vidx

    @pl.when(i > 0)
    def _update():
        best = val_ref[...]
        better = vmax > best  # strict: earlier tile wins ties
        val_ref[...] = jnp.where(better, vmax, best)
        idx_ref[...] = jnp.where(better, vidx, idx_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_head_argmax_int8(
    h: jax.Array,  # [B, H]
    vocab: Int8Vocab,
    interpret: bool = False,
) -> jax.Array:
    """Greedy token ids [B] int32 = argmax over the int8 lm_head logits,
    fused into the table sweep (bit-identical to
    ``jnp.argmax(lm_head_int8(h, vocab)[:, :V])``: same f32 accumulator,
    same first-index tie rule)."""
    B, H = h.shape
    Vp, Hp = vocab.qdata.shape
    assert Vp % VOCAB_TILE == 0 and H <= Hp
    Bp = -(-B // _ROWS) * _ROWS
    hb = h.astype(jnp.bfloat16)
    if Bp != B or Hp != H:
        hb = jnp.pad(hb, ((0, Bp - B), (0, Hp - H)))
    grid = (Vp // VOCAB_TILE,)
    val, idx = pl.pallas_call(
        functools.partial(
            _lm_head_argmax_kernel, tile_v=VOCAB_TILE, v_real=vocab.vocab_size
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp, Hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VOCAB_TILE, Hp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VOCAB_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(hb, vocab.qdata, vocab.scales.reshape(1, Vp))
    return idx[:B, 0]


def lm_head_greedy(vocab: Int8Vocab, h: jax.Array, backend: str = "xla") -> jax.Array:
    """Greedy token ids [B] int32; fused argmax sweep on the Pallas path."""
    if backend == "pallas":
        return lm_head_argmax_int8(h, vocab)
    logits = lm_head_logits_xla(vocab, h)
    return jnp.argmax(logits[:, : vocab.vocab_size], axis=-1).astype(jnp.int32)
