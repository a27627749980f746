"""Expert-parallel all-to-all MoE: parity vs the single-device oracle on the
8-device virtual mesh (the multi-chip story the reference lacks, SURVEY §4),
plus capacity-overflow semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.ops.moe import moe_block
from gpt_oss_vllm_tpu.ops.moe_ep import ep_capacity, moe_block_ep


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig.tiny()


@pytest.fixture(scope="module")
def layer(cfg):
    params = random_params(cfg, QuantConfig(method="none"), seed=3)
    return params.layers[0]


def _mesh(ep: int) -> Mesh:
    devs = np.array(jax.devices()[:ep]).reshape(ep)
    return Mesh(devs, ("expert",))


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_ep_matches_single_device(cfg, layer, ep):
    if len(jax.devices()) < ep:
        pytest.skip("not enough devices")
    mesh = _mesh(ep)
    T = 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(T, cfg.hidden_size)) * 0.1, jnp.float32).astype(
        jnp.dtype(cfg.dtype)
    )
    oracle = moe_block(
        x, layer.router_w, layer.router_b,
        layer.w_gate_up, layer.b_gate_up, layer.w_down, layer.b_down,
        cfg, strategy="all",
    )
    # lossless capacity: every routed pair fits its destination bucket
    got = moe_block_ep(
        x, layer.router_w, layer.router_b,
        layer.w_gate_up, layer.b_gate_up, layer.w_down, layer.b_down,
        cfg, mesh, capacity_factor=float(ep),
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(oracle, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_ep_quantized_weights(cfg):
    """Packed NF4 expert weights shard over the expert axis and dispatch
    through the same all-to-all path (XLA dequant strategy on CPU)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    params = random_params(cfg, QuantConfig(method="nf4"), seed=5)
    l = params.layers[0]
    mesh = _mesh(4)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, cfg.hidden_size)) * 0.1, jnp.float32).astype(
        jnp.dtype(cfg.dtype)
    )
    oracle = moe_block(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, strategy="all",
    )
    got = moe_block_ep(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, mesh, capacity_factor=4.0,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(oracle, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_ep_capacity_overflow_drops_not_corrupts(cfg, layer):
    """With capacity 1 per destination, overflow pairs drop (zeros) — output
    stays finite and within the convex hull of expert outputs."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = _mesh(4)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(8, cfg.hidden_size)) * 0.1, jnp.float32).astype(
        jnp.dtype(cfg.dtype)
    )
    got = moe_block_ep(
        x, layer.router_w, layer.router_b,
        layer.w_gate_up, layer.b_gate_up, layer.w_down, layer.b_down,
        cfg, mesh, capacity_factor=0.25,
    )
    arr = np.asarray(got, np.float32)
    assert np.isfinite(arr).all()


def test_ep_capacity_helper():
    assert ep_capacity(16, 4, 4.0) == 16
    assert ep_capacity(16, 4, 1.0) == 4
    assert ep_capacity(3, 8, 1.0) == 1
