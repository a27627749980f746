"""Ragged grouped-expert gmm kernel vs the gather-strategy oracle."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.ops.moe import expert_act, moe_gather, route_topk, RouterOut
from gpt_oss_vllm_tpu.ops.moe_gmm import build_grouping, moe_gmm_block
from gpt_oss_vllm_tpu.quant.tensor import nf4_tensor_from_dense


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny(num_experts=8, experts_per_token=2)


def test_build_grouping(rng):
    ids = jnp.asarray([3, 1, 3, 0, 1, 3], dtype=jnp.int32)
    g = build_grouping(ids, 5)
    sorted_ids = np.asarray(jnp.take(ids, g.sorted_pair_to_row))
    assert list(sorted_ids) == sorted(sorted_ids.tolist())
    # compact grouping: one slot per DISTINCT activated expert
    np.testing.assert_array_equal(np.asarray(g.group_size), [1, 2, 3, 0, 0])
    # starts are padded to 8-aligned group regions
    np.testing.assert_array_equal(np.asarray(g.group_start), [0, 8, 16, 24, 24])
    # unused slots repeat the previous expert id (DMA elision)
    np.testing.assert_array_equal(np.asarray(g.group_expert), [0, 1, 3, 3, 3])
    np.testing.assert_array_equal(np.asarray(g.pair_position), [0, 8, 9, 16, 17, 18])
    assert all(np.asarray(g.group_start) % 8 == 0)


@pytest.mark.parametrize("T", [1, 5, 9])
def test_gmm_block_matches_gather(rng, cfg, T):
    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    wgu = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32))
    wdn = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32))
    bgu = jnp.asarray(rng.normal(size=(E, 2 * FF)) * 0.01, dtype=jnp.float32)
    bdn = jnp.asarray(rng.normal(size=(E, H)) * 0.01, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(T, H)) * 0.3, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(E, H)), dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)

    oracle = moe_gather(x, routing, wgu, bgu, wdn, bdn, cfg, backend="xla")
    got = moe_gmm_block(
        x,
        routing.weights,
        routing.indices,
        wgu,
        bgu,
        wdn,
        bdn,
        act_fn=functools.partial(expert_act, cfg=cfg),
        tm=4,  # small window to exercise group chunking
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("codebook", ["nf4", "mxfp4"])
def test_gmm_t1_static_fast_path(rng, cfg, codebook):
    """T=1 takes the static-grouping fast path (no sort/scatter dispatch);
    must match the gather oracle, with and without biases."""
    from gpt_oss_vllm_tpu.quant.tensor import q4_tensor_from_dense

    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    kw = dict(blocksize=32, codebook="mxfp4") if codebook == "mxfp4" else {}
    wgu = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32), **kw
    )
    wdn = q4_tensor_from_dense(
        rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32), **kw
    )
    bgu = jnp.asarray(rng.normal(size=(E, 2 * FF)) * 0.01, dtype=jnp.float32)
    bdn = jnp.asarray(rng.normal(size=(E, H)) * 0.01, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, H)) * 0.3, dtype=jnp.float32)
    rw = jnp.asarray(rng.normal(size=(E, H)), dtype=jnp.float32)
    routing = route_topk(x, rw, None, cfg.experts_per_token)
    act = functools.partial(expert_act, cfg=cfg)
    for b1, b2 in [(bgu, bdn), (None, None)]:
        oracle = moe_gather(
            x, routing, wgu, b1, wdn, b2, cfg, backend="xla"
        )
        got = moe_gmm_block(
            x, routing.weights, routing.indices, wgu, b1, wdn, b2,
            act_fn=act, interpret=True,  # tm=None -> static T=1 path
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3
        )


def test_gmm_skewed_routing_all_one_expert(rng, cfg):
    """All pairs land on one expert: exercises multi-chunk groups."""
    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    wgu = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32))
    wdn = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32))
    T, k = 6, cfg.experts_per_token
    x = jnp.asarray(rng.normal(size=(T, H)) * 0.3, dtype=jnp.float32)
    indices = jnp.full((T, k), 3, dtype=jnp.int32)
    weights = jnp.full((T, k), 1.0 / k, dtype=jnp.float32)
    routing = RouterOut(weights=weights, indices=indices)
    oracle = moe_gather(x, routing, wgu, None, wdn, None, cfg, backend="xla")
    got = moe_gmm_block(
        x, weights, indices, wgu, None, wdn, None,
        act_fn=functools.partial(expert_act, cfg=cfg), tm=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)


def test_gmm_full_scales_branch(rng):
    """Out dims with no 128-multiple divisor (like GPT-OSS's 2880) use the
    full-scales block form with in-kernel column selection."""
    from gpt_oss_vllm_tpu.ops.moe_gmm import build_grouping, moe_gmm_nf4, padded_rows
    from gpt_oss_vllm_tpu.quant.tensor import kernel_out_tile

    E, N, K = 4, 288, 128  # 288: x8 divisors only -> full_scales, NQ=2
    assert kernel_out_tile(N) is None
    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, N, K)).astype(np.float32))
    ids = jnp.asarray([0, 2, 2, 3], dtype=jnp.int32)
    grouping = build_grouping(ids, E)
    P, tm = 4, 8
    P_pad = padded_rows(P, E, tm)
    x = rng.normal(size=(P_pad, K)).astype(np.float32)
    xp = x.reshape(P_pad, K // 2, 2)
    y = moe_gmm_nf4(
        jnp.asarray(xp[:, :, 0]), jnp.asarray(xp[:, :, 1]), w, grouping, tm, P,
        block_n=160, interpret=True,
    )
    # oracle: rows at pair positions should equal x_row @ W_expert^T
    wd = np.asarray(w.dequantize(jnp.float32))
    pos = np.asarray(grouping.pair_position)
    sorted_ids = np.asarray(jnp.take(ids, grouping.sorted_pair_to_row))
    got = np.asarray(y)
    for p_i in range(P):
        want = x[pos[p_i]] @ wd[sorted_ids[p_i]].T
        np.testing.assert_allclose(got[pos[p_i]], want, rtol=5e-3, atol=5e-3)


def test_gmm_prefill_sized_pairs_interpret():
    """Prefill-chunk-sized dispatch (hundreds of pairs, every expert active)
    through the grouped kernel matches the dense oracle."""
    import functools

    import numpy as np
    import jax.numpy as jnp

    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.models.params import random_params
    from gpt_oss_vllm_tpu.ops.moe import expert_act, moe_block, route_topk
    from gpt_oss_vllm_tpu.ops.moe_gmm import moe_gmm_block

    cfg = ModelConfig.tiny()
    l = random_params(cfg, QuantConfig(method="nf4"), seed=9).layers[0]
    rng = np.random.default_rng(21)
    T = 96  # T*k = 192 pairs over 8 experts - all experts active
    x = jnp.asarray(rng.normal(size=(T, cfg.hidden_size)) * 0.1, jnp.float32).astype(
        jnp.dtype(cfg.dtype)
    )
    routing = route_topk(x, l.router_w, l.router_b, cfg.experts_per_token)
    got = moe_gmm_block(
        x, routing.weights, routing.indices,
        l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        act_fn=functools.partial(expert_act, cfg=cfg), interpret=True,
    )
    oracle = moe_block(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, strategy="all",
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(oracle, np.float32),
        rtol=3e-2, atol=3e-3,
    )


def test_gmm_rowblocked_matches_resident(monkeypatch):
    """Dispatches past GMM_RESIDENT_PAIR_CAP take the row-blocked grid
    (bounded VMEM, per-group scratch-resident dequant) — it must equal the
    resident-x kernel exactly on the same routing (replaces the r2
    GMM_TOKEN_CAP slicing and its per-slice expert weight re-reads)."""
    import gpt_oss_vllm_tpu.ops.moe_gmm as gmm_mod
    from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
    from gpt_oss_vllm_tpu.models.params import random_params

    cfg = ModelConfig.tiny(num_experts=8, experts_per_token=2)
    params = random_params(cfg, QuantConfig(method="nf4"), seed=9)
    l = params.layers[0]
    import gpt_oss_vllm_tpu.ops.moe as moe_mod

    x = jax.random.normal(jax.random.PRNGKey(3), (10, cfg.hidden_size), jnp.bfloat16)
    want = moe_mod.moe_block(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, strategy="gmm", backend="pallas_interpret",
    )
    monkeypatch.setattr(gmm_mod, "GMM_RESIDENT_PAIR_CAP", 4)  # force row-blocked
    got = moe_mod.moe_block(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, strategy="gmm", backend="pallas_interpret",
    )
    # same dequanted weights, same per-token routing; only the row tiling
    # differs — bf16 matmul accumulation order within a row is identical
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_gmm_rowblocked_multitile_groups(monkeypatch, rng, cfg):
    """Skewed routing (all pairs on one expert) with a small row tile:
    groups span MANY tiles, so later tiles must reuse the scratch-resident
    decoded planes written on the group's first tile."""
    import gpt_oss_vllm_tpu.ops.moe_gmm as gmm_mod

    E, H, FF = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    wgu = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, 2 * FF, H)).astype(np.float32))
    wdn = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, H, FF)).astype(np.float32))
    T, k = 20, cfg.experts_per_token
    x = jnp.asarray(rng.normal(size=(T, H)) * 0.3, dtype=jnp.float32)
    indices = jnp.full((T, k), 3, dtype=jnp.int32)
    weights = jnp.full((T, k), 1.0 / k, dtype=jnp.float32)
    routing = RouterOut(weights=weights, indices=indices)
    oracle = moe_gather(x, routing, wgu, None, wdn, None, cfg, backend="xla")
    monkeypatch.setattr(gmm_mod, "GMM_RESIDENT_PAIR_CAP", 1)
    got = moe_gmm_block(
        x, weights, indices, wgu, None, wdn, None,
        act_fn=functools.partial(expert_act, cfg=cfg), tm=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=5e-3, atol=5e-3)


def test_gmm_rowblocked_full_scales_branch(rng):
    """Row-blocked kernel, out dim with no 128-multiple divisor (2880-style):
    full-scales block form + in-kernel column selection, direct call."""
    from gpt_oss_vllm_tpu.ops.moe_gmm import (
        build_grouping,
        build_tile_maps,
        moe_gmm_nf4_rowblocked,
        padded_rows_blocked,
    )
    from gpt_oss_vllm_tpu.quant.tensor import kernel_out_tile

    E, N, K = 4, 288, 128
    assert kernel_out_tile(N) is None
    w = nf4_tensor_from_dense(rng.normal(0, 0.05, size=(E, N, K)).astype(np.float32))
    ids = jnp.asarray([0, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3], dtype=jnp.int32)
    P, tm = ids.shape[0], 8
    grouping = build_grouping(ids, E, align=tm)
    P_pad = padded_rows_blocked(P, E, tm)
    x = rng.normal(size=(P_pad, K)).astype(np.float32)
    xp = x.reshape(P_pad, K // 2, 2)
    y = moe_gmm_nf4_rowblocked(
        jnp.asarray(xp[:, :, 0]), jnp.asarray(xp[:, :, 1]), w, grouping, tm, P,
        block_n=160, interpret=True,
    )
    wd = np.asarray(w.dequantize(jnp.float32))
    pos = np.asarray(grouping.pair_position)
    sorted_ids = np.asarray(jnp.take(ids, grouping.sorted_pair_to_row))
    got = np.asarray(y)
    for p_i in range(P):
        want = x[pos[p_i]] @ wd[sorted_ids[p_i]].T
        np.testing.assert_allclose(got[pos[p_i]], want, rtol=5e-3, atol=5e-3)


def test_build_tile_maps():
    """Tile maps: expert repeats over dead tiles (DMA elision), rows mask
    intra-group padding, first fires once per group."""
    from gpt_oss_vllm_tpu.ops.moe_gmm import build_tile_maps

    ids = jnp.asarray([3, 1, 3, 0, 1, 3, 3, 3, 3], dtype=jnp.int32)  # 0:1 1:2 3:6
    tm = 8
    g = build_grouping(ids, 5, align=tm)
    # groups: e0 rows[0:1)@0, e1 rows[8:10)@8, e3 rows[16:22)@16; total pad 24
    te, rows, first = (np.asarray(a) for a in build_tile_maps(g, tm, 6))
    np.testing.assert_array_equal(te, [0, 1, 3, 3, 3, 3])
    np.testing.assert_array_equal(rows, [1, 2, 6, 0, 0, 0])
    np.testing.assert_array_equal(first, [1, 1, 1, 0, 0, 0])
