"""Multi-device tests on the 8-way virtual CPU mesh: sharded forward parity
vs single device, EP/TP sharding placement, sharded train step, and the
driver dry-run contract — the multi-node story the reference lacks entirely
(SURVEY.md §4 "Multi-node testing: none")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gpt_oss_vllm_tpu.config import ModelConfig, ParallelConfig, QuantConfig
from gpt_oss_vllm_tpu.models.gpt_oss import forward
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.parallel.mesh import make_mesh
from gpt_oss_vllm_tpu.parallel.sharding import shard_params


@pytest.fixture(scope="module")
def cfg():
    # dims divisible by ep=2/4 and tp=2
    return ModelConfig.tiny(num_heads=4, num_kv_heads=2, num_experts=8)


@pytest.fixture(scope="module")
def params(cfg):
    return random_params(cfg, QuantConfig(method="none"), seed=5)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    mesh = make_mesh(ParallelConfig(dp=2, ep=2, tp=2))
    assert mesh.axis_names == ("data", "expert", "model")
    assert mesh.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError):
        make_mesh(ParallelConfig(dp=16, ep=1, tp=1))


def test_sharded_params_placement(cfg, params):
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    sp = shard_params(params, mesh)
    l0 = sp.layers[0]
    # expert dim spread over 4 devices along 'expert'
    E = cfg.num_experts
    shard_shapes = {s.data.shape for s in l0.w_gate_up.addressable_shards}
    assert all(s[0] == E // 4 for s in shard_shapes)
    # q column-parallel over tp=2
    q_shards = {s.data.shape for s in l0.wq.addressable_shards}
    assert all(s[0] == cfg.q_size // 2 for s in q_shards)


def test_sharded_forward_matches_single_device(cfg, params):
    tokens = jnp.asarray([[7, 3, 9, 1, 4, 2]], dtype=jnp.int32)
    ref = np.asarray(forward(params, cfg, tokens, moe_strategy="all"))
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    sp = shard_params(params, mesh)
    with mesh:
        out = jax.jit(lambda p, t: forward(p, cfg, t, moe_strategy="all"))(sp, tokens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_sharded_forward_nf4(cfg):
    """NF4-packed expert weights shard over 'expert' and still agree with the
    unsharded quantized forward."""
    qparams = random_params(cfg, QuantConfig(method="nf4"), seed=6)
    tokens = jnp.asarray([[5, 8, 1]], dtype=jnp.int32)
    ref = np.asarray(forward(qparams, cfg, tokens, moe_strategy="all"))
    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=1))
    sp = shard_params(qparams, mesh)
    assert len({s.data.shape for s in sp.layers[0].w_gate_up.qdata.addressable_shards}) == 1
    with mesh:
        out = jax.jit(lambda p, t: forward(p, cfg, t, moe_strategy="all"))(sp, tokens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_train_step_decreases_loss(cfg, params):
    from gpt_oss_vllm_tpu.training.train_step import make_sharded_train_step, next_token_loss

    mesh = make_mesh(ParallelConfig(dp=2, ep=2, tp=2))
    with mesh:
        step, state, _ = make_sharded_train_step(cfg, mesh, params, learning_rate=5e-3)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, size=(4, 12)),
            dtype=jnp.int32,
        )
        losses = []
        for _ in range(3):
            state, loss = step(state, tokens)
            losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 3


def test_hybrid_dcn_mesh(cfg):
    """Multi-slice (DCN) mesh: data axis spans 2 'hosts' x 2 local replicas,
    ep/tp inside each slice — same axis names, same program (SURVEY.md §7
    'same program, bigger mesh'); train step runs and loss decreases."""
    from gpt_oss_vllm_tpu.training.train_step import make_sharded_train_step

    pc = ParallelConfig(dp=4, ep=2, tp=1, dcn_dp=2)
    mesh = make_mesh(pc)
    # fresh params: the train step donates them (the shared fixture may
    # already have been consumed by the earlier train-step test)
    params = random_params(cfg, QuantConfig(method="none"), seed=5)
    assert mesh.shape == {"data": 4, "expert": 2, "model": 1}
    # DCN factor outermost: slice 0 = first half of the device order
    devs = mesh.devices.reshape(2, -1)
    assert len({d.id for d in devs[0].ravel()} & {d.id for d in devs[1].ravel()}) == 0
    with mesh:
        step, state, _ = make_sharded_train_step(cfg, mesh, params, learning_rate=5e-3)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, size=(4, 12)),
            dtype=jnp.int32,
        )
        losses = []
        for _ in range(3):
            state, loss = step(state, tokens)
            losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()
