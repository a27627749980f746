"""Paged KV cache as sharded JAX arrays + host-side block allocator.

TPU-native replacement for vLLM's paged-attention block manager (SURVEY.md
§2.3: "paged KV cache as sharded JAX arrays + Pallas paged-attention
kernel"). The cache is a pytree of two arrays ``[L, num_blocks, block_size,
n_kv, D]``; a sequence's logical context maps to physical blocks through an
int32 block table. All device-side updates are functional scatters that XLA
aliases in place (the step functions donate the cache).

Padding convention: slot index ``-1`` means "discard" — out-of-bounds
scatter indices drop silently (``mode="drop"``), the same role vLLM's
null slot plays.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_oss_vllm_tpu.config import CacheConfig, ModelConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v"],
    meta_fields=["block_size", "num_kv_heads", "head_dim"],
)
@dataclass
class KVCache:
    # Stored FLAT over (head, dim): [L, num_blocks, block_size, n_kv * D].
    # A trailing dim of D=64 would lane-pad 2x on TPU (measured +192 MB on
    # GPT-OSS-20B); n_kv*D = 512 is pad-free. Views reshape after gather.
    k: jax.Array  # [L, num_blocks, block_size, n_kv * D]
    v: jax.Array  # [L, num_blocks, block_size, n_kv * D]
    block_size: int
    num_kv_heads: int
    head_dim: int

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @staticmethod
    def create(cfg: ModelConfig, cache: CacheConfig) -> "KVCache":
        shape = (
            cfg.num_layers,
            cache.num_blocks,
            cache.block_size,
            cfg.num_kv_heads * cfg.head_dim,
        )
        dt = cache.jax_dtype
        return KVCache(
            k=jnp.zeros(shape, dt),
            v=jnp.zeros(shape, dt),
            block_size=cache.block_size,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
        )

    def nbytes(self) -> int:
        return self.k.nbytes + self.v.nbytes


def slot_mapping(block_tables: jax.Array, positions: jax.Array, block_size: int) -> jax.Array:
    """Physical flat slot (block * block_size + offset) for each (seq, pos).

    block_tables [B, max_blocks] int32 (-1 for unallocated);
    positions [B, T] int32 (-1 for padding). Returns [B, T] int32 with -1
    preserved for dropped writes.
    """
    blk = jnp.where(positions >= 0, positions // block_size, 0)
    off = positions % block_size
    phys = jnp.take_along_axis(block_tables, blk, axis=1)
    slot = phys * block_size + off
    return jnp.where((positions >= 0) & (phys >= 0), slot, -1)


def write_kv(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,  # [B, T, n_kv, D]
    v_new: jax.Array,
    slots: jax.Array,  # [B, T] int32 flat slots, -1 to drop
) -> KVCache:
    L, NB, BS, KVD = cache.k.shape
    # scatter mode="drop" only drops OUT-OF-BOUNDS indices; negative indices
    # would wrap. Remap padding (-1) to NB*BS, which is out of bounds.
    flat_slots = slots.reshape(-1)
    flat_slots = jnp.where(flat_slots < 0, NB * BS, flat_slots)
    kf = cache.k.reshape(L, NB * BS, KVD)
    vf = cache.v.reshape(L, NB * BS, KVD)
    kf = kf.at[layer, flat_slots].set(k_new.reshape(-1, KVD).astype(kf.dtype), mode="drop")
    vf = vf.at[layer, flat_slots].set(v_new.reshape(-1, KVD).astype(vf.dtype), mode="drop")
    return KVCache(
        k=kf.reshape(cache.k.shape),
        v=vf.reshape(cache.v.shape),
        block_size=cache.block_size,
        num_kv_heads=cache.num_kv_heads,
        head_dim=cache.head_dim,
    )


def gather_kv(
    cache: KVCache,
    layer: int,
    block_tables: jax.Array,  # [B, max_blocks] int32
) -> Tuple[jax.Array, jax.Array]:
    """Materialize each sequence's paged context: [B, max_blocks*BS, n_kv, D].

    XLA correctness path; the Pallas paged-attention kernel reads pages
    directly from HBM instead (``ops.paged_attention``).
    """
    tables = jnp.maximum(block_tables, 0)
    k = jnp.take(cache.k[layer], tables, axis=0)  # [B, MB, BS, KVD]
    v = jnp.take(cache.v[layer], tables, axis=0)
    B, MB, BS, KVD = k.shape
    KV, D = cache.num_kv_heads, cache.head_dim
    return k.reshape(B, MB * BS, KV, D), v.reshape(B, MB * BS, KV, D)


class BlockAllocator:
    """Host-side free-list allocator over the physical block pool.

    The role of vLLM's block manager; deliberately simple (no copy-on-write /
    prefix sharing yet — those land with the radix cache). Block 0 is valid
    and allocatable; unallocated table entries are -1.
    """

    def __init__(self, num_blocks: int):
        self.num_blocks = num_blocks
        self._free: List[int] = list(range(num_blocks - 1, -1, -1))

    @property
    def num_free(self) -> int:
        return len(self._free)

    def can_allocate(self, n: int) -> bool:
        return len(self._free) >= n

    def allocate(self, n: int) -> List[int]:
        if n > len(self._free):
            raise RuntimeError(f"KV cache exhausted: want {n} blocks, have {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, blocks: Sequence[int]) -> None:
        for b in blocks:
            if b < 0 or b >= self.num_blocks:
                raise ValueError(f"freeing invalid block {b}")
            self._free.append(b)
