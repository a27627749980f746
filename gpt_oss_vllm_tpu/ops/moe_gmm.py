"""Ragged grouped-expert matmul with fused NF4 dequant (megablocks-style gmm).

The production decode MoE path (SURVEY.md §2.3 "Pallas grouped/ragged expert
matmul fused with NF4 dequant; top-k dispatch via sort/segment ops"):

1. in-graph: sort the T*k (token, expert) pairs by expert, compute group
   offsets (tiny device ops — no host round-trip, decode stays a pure device
   chain);
2. kernel: each program DMAs its expert's packed weight tile straight from
   the full [E, out, in/2] HBM array (scalar-prefetched expert id — no
   gathered weight copies), dequants in-register, and matmuls against that
   group's token rows.

HBM traffic = bytes of the *distinct activated experts* only — the decode
optimum — and empty groups/chunks skip their DMAs entirely.

Grid order is (out-tile, group, chunk) with the output block index ignoring
(group, chunk): consecutive grid steps revisit the same resident VMEM output
block, the supported accumulation pattern.

Sized for decode (T*k up to ~1k pairs; x must fit VMEM). Prefill uses the
dense all-experts/einsum path where compute amortizes anyway.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut, _scales_f32, _scales_mm_dtype
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor


ROW_ALIGN = 8  # Mosaic: dynamic sublane offsets must be provably 8-aligned

# Dispatches above this many (token, expert) pairs use the row-blocked grid:
# the resident-x kernel design holds every dispatched row in VMEM and
# overflows the 16 MB scoped-VMEM limit past ~1k pairs (observed on-chip at
# 2048). Below it the resident-x kernel keeps its measured decode advantage
# (fewer grid steps, no per-tile padding waste at tiny group sizes).
GMM_RESIDENT_PAIR_CAP = 1024
ROWBLOCK_TM = 64  # default row-tile: half-dead worst case still fills the MXU


class Grouping(NamedTuple):
    sorted_pair_to_row: jax.Array  # [P] int32: pair index sorted by expert
    pair_position: jax.Array  # [P] int32: padded-layout row of sorted pair i
    group_expert: jax.Array  # [G] int32 expert id of compact group (repeats
    #                           the previous id for unused slots -> their
    #                           pipeline loads are elided as unchanged)
    group_start: jax.Array  # [G] int32 8-ALIGNED offset into the padded rows
    group_size: jax.Array  # [G] int32 (0 for unused slots)


def num_groups(num_pairs: int, num_experts: int) -> int:
    """Compact group count: at most min(E, P) distinct experts activate."""
    return min(num_experts, num_pairs)


def build_grouping(
    expert_ids: jax.Array, num_experts: int, align: int = ROW_ALIGN
) -> Grouping:
    """Sort T*k routed pairs by expert into COMPACT groups (one slot per
    distinct activated expert — for batch-1 decode that is k slots, not E,
    which shrinks the kernel grid 8x for GPT-OSS).

    Each group's rows live at an ``align``-aligned offset in a padded layout
    (gaps between groups are dead rows) so kernel row windows satisfy
    Mosaic's alignment proof. The row-blocked kernel passes ``align = tm``
    so every row tile belongs to exactly one group (megablocks-style)."""
    P = expert_ids.shape[0]
    G = num_groups(P, num_experts)
    order = jnp.argsort(expert_ids).astype(jnp.int32)
    sorted_ids = jnp.take(expert_ids, order)
    is_new = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    slot_of_pair = jnp.cumsum(is_new).astype(jnp.int32) - 1  # [P] compact slot
    slot_sizes = jnp.zeros(G, jnp.int32).at[slot_of_pair].add(1, mode="drop")
    raw_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(slot_sizes)[:-1].astype(jnp.int32)]
    )
    padded_sizes = ((slot_sizes + align - 1) // align) * align
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_sizes)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(P, dtype=jnp.int32) - jnp.take(raw_starts, slot_of_pair)
    position = jnp.take(starts, slot_of_pair) + rank
    slot_expert = (
        jnp.zeros(G, jnp.int32).at[slot_of_pair].max(sorted_ids, mode="drop")
    )
    # unused slots repeat the last real expert id (cummax keeps them equal to
    # the previous slot's id so their block loads are elided)
    slot_expert = jnp.where(slot_sizes > 0, slot_expert, 0)
    slot_expert = jax.lax.associative_scan(jnp.maximum, slot_expert)
    return Grouping(order, position, slot_expert, starts, slot_sizes)


def padded_rows(num_pairs: int, num_experts: int, tm: int) -> int:
    """Static bound on the padded layout size (+ window overrun margin)."""
    return num_pairs + ROW_ALIGN * num_groups(num_pairs, num_experts) + tm


def padded_rows_blocked(num_pairs: int, num_experts: int, tm: int) -> int:
    """Static bound for the ROW-BLOCKED layout (groups padded to tm)."""
    G = num_groups(num_pairs, num_experts)
    worst = num_pairs + G * (tm - 1)
    return -(-worst // tm) * tm


def build_tile_maps(grouping: Grouping, tm: int, num_tiles: int):
    """Per-row-tile scalar maps for the row-blocked kernel. Tile m covers
    padded rows [m*tm, (m+1)*tm); with tm-aligned group starts each tile
    belongs to exactly one group.

    Returns (tile_expert, tile_rows, tile_first):
    - tile_expert: expert to load (dead tiles repeat the previous id so
      their weight DMAs are elided by the unchanged block index)
    - tile_rows: valid rows in the tile (0 = dead trailing tile, no work)
    - tile_first: 1 on the first tile of each group — the only step that
      dequants the expert tile into scratch; later tiles of the same group
      reuse the resident decoded planes (the weight-DMA/dequant elision
      that makes big dispatches read each activated expert ONCE)."""
    starts, sizes = grouping.group_start, grouping.group_size
    row0 = jnp.arange(num_tiles, dtype=jnp.int32) * tm
    g_of = jnp.searchsorted(starts, row0, side="right").astype(jnp.int32) - 1
    g_of = jnp.clip(g_of, 0, starts.shape[0] - 1)
    ends = starts + sizes
    tile_rows = jnp.clip(jnp.take(ends, g_of) - row0, 0, tm)
    tile_expert = jnp.take(grouping.group_expert, g_of)
    tile_first = jnp.where(
        (jnp.take(starts, g_of) == row0) & (tile_rows > 0), 1, 0
    ).astype(jnp.int32)
    return tile_expert, tile_rows, tile_first


def _gmm_kernel(
    # scalar prefetch
    expert_ref,  # [E] int32 (load-index expert per group, empty groups repeat)
    start_ref,  # [E]
    size_ref,  # [E]
    # pipelined blocks (index maps use the prefetched expert ids)
    xe_ref,  # [P_pad, K//2] VMEM (even columns of padded token rows)
    xo_ref,  # [P_pad, K//2] VMEM (odd columns)
    q_ref,  # [1, TN, K//2] VMEM block of this group's expert
    s_ref,  # [1, nb, TN] VMEM block — or [1, nb, N] when full_scales
    o_ref,  # [P_pad, TN] VMEM — or [1, P_pad, TN] when full_scales
    *,
    tn: int,
    kp: int,
    nb: int,
    block_j: int,
    tm: int,
    full_scales: bool = False,
    n_total: int = 0,
    codebook: str = "nf4",
):
    jn = pl.program_id(0)
    g = pl.program_id(1)
    size = size_ref[g]

    @pl.when(g == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(size > 0)
    def _work():
        # dequant ONCE per (out-tile, group); the row-chunk walk happens
        # in-kernel below (x is fully VMEM-resident), so big dispatches
        # (prefill chunks) don't re-decode the same expert tile per chunk
        we, wo = _dequant_expert_tile(
            q_ref, s_ref, jn, tn=tn, kp=kp, nb=nb, block_j=block_j,
            full_scales=full_scales, n_total=n_total, codebook=codebook,
        )
        we = we.astype(xe_ref.dtype)
        wo = wo.astype(xe_ref.dtype)

        def chunk(s, _):
            chunk_rows = size - s * tm
            # group starts are 8-aligned by construction (build_grouping) and
            # tm is a multiple of 8 — assert it for Mosaic's offset proof
            row0 = pl.multiple_of(start_ref[g] + s * tm, ROW_ALIGN)
            xe = xe_ref[pl.ds(row0, tm), :]
            xo = xo_ref[pl.ds(row0, tm), :]
            acc = jax.lax.dot_general(
                xe, we, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc += jax.lax.dot_general(
                xo, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
            valid = rows < chunk_rows
            if full_scales:
                cur = o_ref[0, pl.ds(row0, tm), :]
                o_ref[0, pl.ds(row0, tm), :] = jnp.where(valid, acc, cur)
            else:
                cur = o_ref[pl.ds(row0, tm), :]
                o_ref[pl.ds(row0, tm), :] = jnp.where(valid, acc, cur)
            return 0

        # dynamic trip count: only the chunks this group actually owns run
        jax.lax.fori_loop(0, pl.cdiv(size, tm), chunk, 0)


def _check_tm(tm: int) -> int:
    if tm % ROW_ALIGN != 0:
        raise ValueError(f"tm must be a multiple of {ROW_ALIGN}, got {tm}")
    return tm


def _dequant_expert_tile(q_ref, s_ref, jn, *, tn, kp, nb, block_j, full_scales,
                         n_total, codebook):
    """Decode one expert's packed [TN, Kp] tile into even/odd bf16 planes.
    Shared by the resident-x kernel (per (out-tile, group)) and the
    row-blocked kernel (into scratch, on each group's first row tile)."""
    q = q_ref[0][:].astype(jnp.int32)
    low = q & 0x0F
    high = q >> 4  # zero-extended u8: already in [0, 16), no mask needed
    # 0/1 expansion matrices have one nonzero per output column, so the
    # scale matmuls are exact in bf16 when scales are bf16/E8M0-stored —
    # 4x the f32 MXU rate (see ops.nf4_matmul._scales_mm_dtype)
    mmdt = _scales_mm_dtype(s_ref.dtype)
    col_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 1) // block_j
    row_block = jax.lax.broadcasted_iota(jnp.int32, (nb, kp), 0)
    expand = (col_block == row_block).astype(mmdt)
    if full_scales:
        # TN is not lane-tileable (e.g. 720 of N=2880): the whole expert's
        # scales [nb, N] are resident; select this tile's columns with a
        # one-hot matmul (lane slicing at non-128 offsets is illegal, the
        # MXU is not)
        s_full = _scales_f32(s_ref[0]).astype(mmdt)  # [nb, N]
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, n_total), 1)
        want = jn * tn + jax.lax.broadcasted_iota(jnp.int32, (tn, n_total), 0)
        sel = (col == want).astype(mmdt)  # [tn, N]
        s_sel = jax.lax.dot_general(
            sel, s_full, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tn, nb] — exact: one nonzero per row of sel
        scales = jax.lax.dot_general(
            s_sel.astype(mmdt), expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, Kp]
    else:
        scales = jax.lax.dot_general(
            _scales_f32(s_ref[0]).astype(mmdt), expand, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, Kp]
    we = _lut(low, codebook) * scales
    wo = _lut(high, codebook) * scales
    return we, wo


def _gmm_rowblocked_kernel(
    # scalar prefetch (per row tile)
    expert_ref,  # [MT] int32 expert to load (dead tiles repeat previous)
    rows_ref,  # [MT] int32 valid rows
    first_ref,  # [MT] int32 1 = first tile of its group (dequant step)
    # pipelined blocks
    xe_ref,  # [tm, Kp] VMEM row tile (even columns)
    xo_ref,  # [tm, Kp] VMEM row tile (odd columns)
    q_ref,  # [1, TN, Kp] VMEM expert weight tile
    s_ref,  # [1, nb, TN] VMEM — or [1, nb, N] when full_scales
    o_ref,  # [tm, TN] VMEM — or [1, tm, TN] when full_scales
    # scratch: the DECODED expert tile, resident across this group's tiles
    we_scr,  # [TN, Kp] x-dtype
    wo_scr,  # [TN, Kp]
    *,
    tn: int,
    kp: int,
    nb: int,
    block_j: int,
    tm: int,
    full_scales: bool = False,
    n_total: int = 0,
    codebook: str = "nf4",
):
    jn = pl.program_id(0)
    m = pl.program_id(1)
    rows = rows_ref[m]

    @pl.when(first_ref[m] == 1)
    def _dequant():
        we, wo = _dequant_expert_tile(
            q_ref, s_ref, jn, tn=tn, kp=kp, nb=nb, block_j=block_j,
            full_scales=full_scales, n_total=n_total, codebook=codebook,
        )
        we_scr[:] = we.astype(we_scr.dtype)
        wo_scr[:] = wo.astype(wo_scr.dtype)

    @pl.when(rows > 0)
    def _work():
        acc = jax.lax.dot_general(
            xe_ref[:], we_scr[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            xo_ref[:], wo_scr[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ridx = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        acc = jnp.where(ridx < rows, acc, 0.0)
        if full_scales:
            o_ref[0] = acc
        else:
            o_ref[:] = acc


def moe_gmm_nf4_rowblocked(
    xe_sorted: jax.Array,  # [P_pad, K//2] (P_pad = MT * tm, tm-aligned groups)
    xo_sorted: jax.Array,
    w: NF4Tensor,  # [E, N, K] packed
    grouping: Grouping,  # built with align=tm
    tm: int,
    num_pairs: int,
    block_n: int = 640,
    interpret: bool = False,
) -> jax.Array:
    """Row-blocked (megablocks-style) grouped matmul: grid (out-tile,
    row-tile) with row tiles innermost. Each expert's packed tile is DMAd
    and dequanted ONCE per out-tile (on its group's first row tile, into
    VMEM scratch); later row tiles of the same group reuse the resident
    decoded planes. VMEM per step is O(tm*K + tn*K) regardless of the
    dispatch size — this is what lets a 512-token prefill chunk (2048
    pairs) run unsliced, where the resident-x kernel design overflowed the
    16 MB scoped-VMEM limit and forced GMM_TOKEN_CAP weight re-reads
    (VERDICT r2 weak #3). Replaces the substrate's grouped CUDA kernels
    (reference patch_9_fusedmoe_unsloth.py:8)."""
    from gpt_oss_vllm_tpu.quant.tensor import kernel_out_tile

    P_pad, Kp = xe_sorted.shape
    assert Kp == w.kp_phys, (Kp, w.kp_phys)
    assert P_pad % tm == 0, (P_pad, tm)
    nb = w.nb_phys
    MT = P_pad // tm

    N = w.out_rows
    tn = kernel_out_tile(N, block_n)
    full_scales = tn is None
    if full_scales:
        for t in range(ROW_ALIGN, min(block_n, N) + 1, ROW_ALIGN):
            if N % t == 0:
                tn = t
        if tn is None:
            raise ValueError(f"no valid out tile for N={N}")
    NQ = N // tn
    grid = (NQ, MT)
    tile_expert, tile_rows, tile_first = build_tile_maps(grouping, tm, MT)
    kernel = functools.partial(
        _gmm_rowblocked_kernel, tn=tn, kp=Kp, nb=nb, block_j=Kp // nb, tm=tm,
        full_scales=full_scales, n_total=N, codebook=w.codebook,
    )
    if full_scales:
        s_spec = pl.BlockSpec(
            (1, nb, N), lambda j, m, e_ref, *_: (e_ref[m], 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (1, tm, tn), lambda j, m, *_: (j, m, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NQ, P_pad, tn), jnp.float32)
    else:
        s_spec = pl.BlockSpec(
            (1, nb, tn), lambda j, m, e_ref, *_: (e_ref[m], 0, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (tm, tn), lambda j, m, *_: (m, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((P_pad, N), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, Kp), lambda j, m, *_: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Kp), lambda j, m, *_: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tn, Kp),
                lambda j, m, e_ref, *_: (e_ref[m], j, 0),
                memory_space=pltpu.VMEM,
            ),
            s_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((tn, Kp), xe_sorted.dtype),
            pltpu.VMEM((tn, Kp), xe_sorted.dtype),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        tile_expert,
        tile_rows,
        tile_first,
        xe_sorted,
        xo_sorted,
        w.qdata,
        w.scales,
    )
    if full_scales:
        out = out.transpose(1, 0, 2).reshape(P_pad, N)
    if w.row_layout == "glu4":
        return out  # sectioned rows: interior pads, caller slices per section
    return out[:, : w.out_features]


def moe_gmm_nf4(
    xe_sorted: jax.Array,  # [P_pad, K//2]
    xo_sorted: jax.Array,  # [P_pad, K//2]
    w: NF4Tensor,  # [E, N, K] packed
    grouping: Grouping,
    tm: int,
    num_pairs: int,
    block_n: int = 640,
    interpret: bool = False,
) -> jax.Array:
    from gpt_oss_vllm_tpu.quant.tensor import kernel_out_tile

    P_pad, Kp = xe_sorted.shape  # Kp = physical packed width (may be padded)
    assert Kp == w.kp_phys, (Kp, w.kp_phys)
    nb = w.nb_phys
    G = grouping.group_expert.shape[0]

    # out-tile tn: prefer a 128-multiple divisor of the out dim (lane
    # constraint on the scales/out blocks). When none exists (2880), fall
    # back to any x8 divisor with FULL-last-dim block shapes: the output is
    # stored reshaped (NQ, P_pad, tn) and scales load whole [nb, N] per
    # group with an in-kernel one-hot column selection — no out-row padding.
    N = w.out_rows
    tn = kernel_out_tile(N, block_n)
    full_scales = tn is None
    if full_scales:
        for t in range(ROW_ALIGN, min(block_n, N) + 1, ROW_ALIGN):
            if N % t == 0:
                tn = t
        if tn is None:
            raise ValueError(f"no valid out tile for N={N}")
    NQ = N // tn
    grid = (NQ, G)
    kernel = functools.partial(
        _gmm_kernel, tn=tn, kp=Kp, nb=nb, block_j=Kp // nb, tm=tm,
        full_scales=full_scales, n_total=N, codebook=w.codebook,
    )
    # group_expert already repeats ids across unused compact slots, so their
    # unchanged block indices elide the pipeline DMAs
    load_expert = grouping.group_expert.astype(jnp.int32)
    if full_scales:
        s_spec = pl.BlockSpec(
            (1, nb, N), lambda j, g, e_ref, *_: (e_ref[g], 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (1, P_pad, tn), lambda j, g, *_: (j, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NQ, P_pad, tn), jnp.float32)
    else:
        s_spec = pl.BlockSpec(
            (1, nb, tn), lambda j, g, e_ref, *_: (e_ref[g], 0, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (P_pad, tn), lambda j, g, *_: (0, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((P_pad, N), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tn, Kp),
                lambda j, g, e_ref, *_: (e_ref[g], j, 0),
                memory_space=pltpu.VMEM,
            ),
            s_spec,
        ],
        out_specs=out_spec,
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        load_expert,
        grouping.group_start,
        grouping.group_size,
        xe_sorted,
        xo_sorted,
        w.qdata,
        w.scales,
    )
    if full_scales:
        out = out.transpose(1, 0, 2).reshape(P_pad, N)
    if w.row_layout == "glu4":
        return out  # sectioned rows: interior pads, caller slices per section
    return out[:, : w.out_features]


def _deinterleave(x: jax.Array, kp_phys: int):
    xp = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    xe, xo = xp[..., 0], xp[..., 1]
    pad = kp_phys - xe.shape[-1]
    if pad:
        widths = [(0, 0)] * xe.ndim
        widths[-1] = (0, pad)
        xe, xo = jnp.pad(xe, widths), jnp.pad(xo, widths)
    return xe, xo


def _moe_gmm_block_t1(
    x: jax.Array,  # [1, H]
    routing_weights: jax.Array,  # [1, k] f32
    routing_indices: jax.Array,  # [1, k] int32
    w_gate_up: NF4Tensor,
    b_gate_up: Optional[jax.Array],
    w_down: NF4Tensor,
    b_down: Optional[jax.Array],
    act_fn,
    interpret: bool = False,
) -> jax.Array:
    """Single-token decode fast path: the grouping is STATIC.

    ``top_k`` indices are distinct by construction, so one token always
    dispatches to exactly k singleton groups. Group order is irrelevant for
    correctness (the kernel accumulates disjoint row windows), so the whole
    sort/cumsum/scatter dispatch chain of the general path collapses into
    fixed 8-aligned row offsets — ~15 fewer small XLA ops per layer on the
    decode critical path (T=1 glue is op-overhead-bound, not FLOP-bound)."""
    from gpt_oss_vllm_tpu.quant.tensor import ensure_kernel_padded

    k = routing_indices.shape[1]
    H = x.shape[1]
    flat_ids = routing_indices[0].astype(jnp.int32)  # [k] distinct
    starts = jnp.arange(k, dtype=jnp.int32) * ROW_ALIGN
    grouping = Grouping(
        sorted_pair_to_row=jnp.arange(k, dtype=jnp.int32),
        pair_position=starts,
        group_expert=flat_ids,
        group_start=starts,
        group_size=jnp.ones(k, jnp.int32),
    )
    P_pad = k * ROW_ALIGN
    w_gate_up = ensure_kernel_padded(w_gate_up)
    w_down = ensure_kernel_padded(w_down)

    # every padded row is the same token: a broadcast, not a scatter
    x_padded = jnp.broadcast_to(x[0], (P_pad, H))
    xe, xo = _deinterleave(x_padded, w_gate_up.kp_phys)
    h = moe_gmm_nf4(xe, xo, w_gate_up, grouping, ROW_ALIGN, k, interpret=interpret)
    # each singleton group's result lives at row 8*i (strided slice, no gather)
    h = h.reshape(k, ROW_ALIGN, -1)[:, 0]  # [k, 2FF] f32
    if b_gate_up is not None:
        h = h + jnp.take(b_gate_up, flat_ids, axis=0)
    a = act_fn(h).astype(x.dtype)  # [k, FF]
    a_padded = jnp.broadcast_to(a[:, None, :], (k, ROW_ALIGN, a.shape[-1])).reshape(P_pad, -1)
    ae, ao = _deinterleave(a_padded, w_down.kp_phys)
    y = moe_gmm_nf4(ae, ao, w_down, grouping, ROW_ALIGN, k, interpret=interpret)
    y = y.reshape(k, ROW_ALIGN, -1)[:, 0]  # [k, H] f32
    if b_down is not None:
        y = y + jnp.take(b_down, flat_ids, axis=0)
    # weighted combine as one [1,k] x [k,H] matmul
    out = jax.lax.dot_general(
        routing_weights.astype(jnp.float32),
        y,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def moe_gmm_block(
    x: jax.Array,  # [T, H]
    routing_weights: jax.Array,  # [T, k] f32
    routing_indices: jax.Array,  # [T, k] int32
    w_gate_up: NF4Tensor,  # [E, 2FF, H] ("flat") or [E, 4*sec, H] ("glu4")
    b_gate_up: Optional[jax.Array],
    w_down: NF4Tensor,  # [E, H, FF]
    b_down: Optional[jax.Array],
    act_fn,
    tm: Optional[int] = None,
    interpret: bool = False,
    act_pair_fn=None,  # (gate, up) -> act; required for glu4 layouts
) -> jax.Array:
    """Full MoE block through the gmm kernel: dispatch -> gate_up -> act ->
    down -> weighted combine, all in-graph."""
    T, H = x.shape
    glu4 = w_gate_up.row_layout == "glu4"
    if glu4 and act_pair_fn is None:
        raise ValueError("glu4 layout needs act_pair_fn")
    if T == 1 and tm is None:
        if glu4:
            from gpt_oss_vllm_tpu.ops.moe_ffn_fused import moe_ffn_glu4_t1

            return moe_ffn_glu4_t1(
                x,
                routing_weights,
                routing_indices,
                w_gate_up,
                b_gate_up,
                w_down,
                b_down,
                act_pair_fn,
                interpret=interpret,
            )
        return _moe_gmm_block_t1(
            x,
            routing_weights,
            routing_indices,
            w_gate_up,
            b_gate_up,
            w_down,
            b_down,
            act_fn,
            interpret=interpret,
        )
    k = routing_indices.shape[1]
    E = w_gate_up.qdata.shape[0]
    P = T * k
    rowblocked = P > GMM_RESIDENT_PAIR_CAP
    if rowblocked:
        # megablocks-style row-blocked grid: bounded VMEM at any dispatch
        # size, each activated expert's bytes read+dequanted once per
        # out-tile. Group starts align to the row tile so tiles never span
        # groups.
        tm = _check_tm(ROWBLOCK_TM if tm is None else tm)
        flat_ids = routing_indices.reshape(-1)
        grouping = build_grouping(flat_ids, E, align=tm)
        P_pad = padded_rows_blocked(P, E, tm)

        def run_gmm(xe, xo, w):
            return moe_gmm_nf4_rowblocked(
                xe, xo, w, grouping, tm, P, interpret=interpret
            )
    else:
        if tm is None:
            # decode: one MXU pass per group; prefill chunks: 128-row chunks
            tm = min(128, ((P + 7) // 8) * 8)
        tm = _check_tm(max(ROW_ALIGN, min(tm, ((P + 7) // 8) * 8)))
        flat_ids = routing_indices.reshape(-1)
        grouping = build_grouping(flat_ids, E)
        P_pad = padded_rows(P, E, tm)

        def run_gmm(xe, xo, w):
            return moe_gmm_nf4(xe, xo, w, grouping, tm, P, interpret=interpret)

    token_of_pair = jnp.take(
        jnp.repeat(jnp.arange(T, dtype=jnp.int32), k), grouping.sorted_pair_to_row
    )
    sorted_experts = jnp.take(flat_ids, grouping.sorted_pair_to_row)
    pos = grouping.pair_position  # padded-layout rows (aligned group starts)
    from gpt_oss_vllm_tpu.quant.tensor import ensure_kernel_padded

    w_gate_up = ensure_kernel_padded(w_gate_up)
    w_down = ensure_kernel_padded(w_down)
    x_padded = jnp.zeros((P_pad, H), x.dtype).at[pos].set(jnp.take(x, token_of_pair, axis=0))
    xe, xo = _deinterleave(x_padded, w_gate_up.kp_phys)

    h = jnp.take(run_gmm(xe, xo, w_gate_up), pos, axis=0)
    if b_gate_up is not None:
        h = h + jnp.take(b_gate_up, sorted_experts, axis=0)
    if glu4:
        # sectioned h [P, 4*sec]: the activation's even/odd planes fall out
        # as aligned section pairs — no interleave/deinterleave round trip
        sec = h.shape[-1] // 4
        a_e = act_pair_fn(h[:, :sec], h[:, 2 * sec : 3 * sec]).astype(x.dtype)
        a_o = act_pair_fn(h[:, sec : 2 * sec], h[:, 3 * sec :]).astype(x.dtype)
        assert sec == w_down.kp_phys, (sec, w_down.kp_phys)
        ae = jnp.zeros((P_pad, sec), x.dtype).at[pos].set(a_e)
        ao = jnp.zeros((P_pad, sec), x.dtype).at[pos].set(a_o)
    else:
        a = act_fn(h).astype(x.dtype)
        a_padded = jnp.zeros((P_pad, a.shape[-1]), x.dtype).at[pos].set(a)
        ae, ao = _deinterleave(a_padded, w_down.kp_phys)
    y = jnp.take(run_gmm(ae, ao, w_down), pos, axis=0)
    if b_down is not None:
        y = y + jnp.take(b_down, sorted_experts, axis=0)
    wts = jnp.take(routing_weights.reshape(-1), grouping.sorted_pair_to_row)
    y = y * wts[:, None]
    return jnp.zeros((T, H), jnp.float32).at[token_of_pair].add(y).astype(x.dtype)
