"""Int8Vocab — per-row symmetric int8 quantization of the vocab table.

The tied embedding / lm_head table is the single largest *fixed* cost of a
decode step: 201k x 2880 bf16 = 1.16 GB read at HBM bandwidth every step for
one row of logits (~1.5 ms measured on v5e — docs/STATUS.md "decode cost
structure"). Symmetric per-row int8 halves that read (and frees ~0.58 GB of
HBM for KV blocks) at a quantization error (~0.2% rms of each row's max)
far below the 4-bit expert weights' own step size.

The reference keeps embeddings/lm_head fp16 and pays the full read on every
step (the quantization partition of ``gpt_oss_moe_architecture.md:12-26``
quantizes only expert projections); this is an opt-in extension
(``QuantConfig.vocab_int8``) beyond that partition.

Layout contract:
- ``qdata``  : int8 ``[Vp, Hp]`` — row-major, V padded to the lm_head kernel
  tile (512) and H padded to the f32 lane width (128). Pad rows/cols are 0.
- ``scales`` : f32 ``[Vp]`` — per-row ``absmax/127``; pad rows 0 (their
  logits decode to exactly 0.0 and are sliced off before sampling).

Both consumers read the SAME array: the embedding path gathers T rows
(``embed_rows``), the lm_head path streams the whole table through a fused
dequant-matmul Pallas kernel (``ops.lm_head``). Because the heavy consumer
is a Pallas kernel (layout-agnostic), the bf16 table's layout conflict
between the lm-head reduce fusion and the row gather (engine/step.py
``_embed``) does not exist here — the gather path needs no one-hot detour.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# lm_head kernel vocab tile; V pads to a multiple of this (ops/lm_head.py)
VOCAB_TILE = 512
_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qdata", "scales"],
    meta_fields=["vocab_size", "hidden_size"],
)
@dataclass
class Int8Vocab:
    qdata: jax.Array  # int8 [Vp, Hp]
    scales: jax.Array  # f32 [Vp]
    vocab_size: int  # logical V (pad rows above are zero)
    hidden_size: int  # logical H

    @property
    def padded_vocab(self) -> int:
        return self.qdata.shape[0]

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Full dense [V, H] table (tests / tiny configs only)."""
        w = self.qdata.astype(jnp.float32) * self.scales[:, None]
        return w[: self.vocab_size, : self.hidden_size].astype(dtype)


def int8_vocab_from_dense(w: jax.Array, vocab_tile: int = VOCAB_TILE) -> Int8Vocab:
    """Quantize a dense [V, H] table to per-row symmetric int8 (padded)."""
    V, H = w.shape
    Vp, Hp = _pad_to(V, vocab_tile), _pad_to(H, _LANE)
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=1)
    scales = absmax / 127.0
    inv = jnp.where(scales > 0, 1.0 / jnp.where(scales > 0, scales, 1.0), 0.0)
    q = jnp.clip(jnp.round(wf * inv[:, None]), -127, 127).astype(jnp.int8)
    q = jnp.pad(q, ((0, Vp - V), (0, Hp - H)))
    scales = jnp.pad(scales, (0, Vp - V))
    return Int8Vocab(qdata=q, scales=scales, vocab_size=V, hidden_size=H)


def random_int8_vocab(
    key: jax.Array, V: int, H: int, scale: float = 0.02, vocab_tile: int = VOCAB_TILE
) -> Int8Vocab:
    """Random table generated directly in quantized form on-device (bench
    path — peak transient == final size, like the packed expert generator
    in ``models.params.random_params_on_device``)."""
    Vp, Hp = _pad_to(V, vocab_tile), _pad_to(H, _LANE)
    assert Hp % 4 == 0
    k1, k2 = jax.random.split(key)
    words = jax.random.bits(k1, (Vp, Hp // 4), dtype=jnp.uint32)
    q = jax.lax.bitcast_convert_type(words, jnp.int8).reshape(Vp, Hp)
    row_ok = jnp.arange(Vp) < V
    col_ok = jnp.arange(Hp) < H
    q = jnp.where(row_ok[:, None] & col_ok[None, :], q, jnp.zeros((), jnp.int8))
    scales = (
        jnp.abs(jax.random.normal(k2, (Vp,), jnp.float32)) * (scale / 127.0)
        + scale / 254.0
    )
    scales = jnp.where(row_ok, scales, 0.0)
    return Int8Vocab(qdata=q, scales=scales, vocab_size=V, hidden_size=H)


def embed_rows(vocab: Int8Vocab, tokens: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Token embedding lookup: gather T rows, dequant only those (reads
    T x Hp int8 bytes — no full-table traffic, no layout copies)."""
    safe = jnp.maximum(tokens, 0)
    rows = jnp.take(vocab.qdata, safe, axis=0).astype(jnp.float32)
    s = jnp.take(vocab.scales, safe, axis=0)
    x = rows * s[..., None]
    return x[..., : vocab.hidden_size].astype(dtype)


def lm_head_logits_xla(vocab: Int8Vocab, h: jax.Array) -> jax.Array:
    """XLA oracle for the fused kernel: logits [B, Vp] f32 (pad rows 0).

    Contracts over the table's minor dim like the bf16 path (q @ h^T) so
    XLA:TPU does not relayout the table; the int8->f32 convert fuses into
    the dot's operand fetch. Used on CPU/tests and as the interpret-mode
    reference; the serving path is ``ops.lm_head.lm_head_int8``.
    """
    B, H = h.shape
    Hp = vocab.qdata.shape[1]
    hf = jnp.pad(h.astype(jnp.float32), ((0, 0), (0, Hp - H)))
    acc = jax.lax.dot_general(
        vocab.qdata.astype(jnp.bfloat16),
        hf.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Vp, B]
    return (acc * vocab.scales[:, None]).T
