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


def _replica_groups(hlo_text, op_name):
    """Parse explicit replica_groups for a collective op from compiled HLO
    text. Returns a list of frozensets (one per group); iota-formatted
    groups ([G,S]<=[N]) are returned as None entries so callers fail loudly
    rather than silently passing."""
    import re

    groups = []
    for line in hlo_text.splitlines():
        if op_name not in line:
            continue
        m = re.search(r"replica_groups=\{\{([0-9,{} ]*)\}\}", line)
        if m:
            for g in m.group(1).split("},{"):
                groups.append(frozenset(int(v) for v in g.split(",") if v))
            continue
        if "replica_groups=" in line:
            groups.append(None)
    return groups


def test_dcn_hybrid_collectives_stay_on_ici(cfg, params):
    """EP all-to-all token dispatch must never cross the DCN boundary: on a
    dcn_dp=2 hybrid mesh every all-to-all replica group lies inside one
    slice (the first/second half of the device order — slices are outermost
    in the data axis). The gradient all-reduce is the only collective
    allowed to span slices. (VERDICT r4 next #7: pin collective axis
    placement.)"""
    from gpt_oss_vllm_tpu.ops.moe_ep import moe_block_ep

    pc = ParallelConfig(dp=4, ep=2, tp=1, dcn_dp=2)
    mesh = make_mesh(pc)
    n = 8
    slice0 = frozenset(range(n // 2))
    slice1 = frozenset(range(n // 2, n))
    l = params.layers[0]
    x = jnp.ones((8, cfg.hidden_size), jnp.bfloat16) * 0.1

    def fn(x, rw, rb, wg, bg, wd, bd):
        return moe_block_ep(
            x, rw, rb, wg, bg, wd, bd, cfg, mesh, capacity_factor=2.0
        )

    with mesh:
        txt = jax.jit(fn).lower(
            x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up,
            l.w_down, l.b_down,
        ).compile().as_text()
    a2a = _replica_groups(txt, "all-to-all")
    assert a2a, "expected EP all-to-all collectives in the compiled program"
    for g in a2a:
        assert g is not None, "iota replica_groups: extend the parser"
        assert g <= slice0 or g <= slice1, f"all-to-all crosses DCN: {g}"

    # the hybrid TRAIN step keeps data-replicated params in sync across
    # slices (the DCN-riding responsibility): after real optimizer steps on
    # data-sharded batches, every device's copy of a replicated param must
    # be identical — a missing cross-slice gradient sync would diverge them
    from gpt_oss_vllm_tpu.training.train_step import make_sharded_train_step

    fresh = random_params(cfg, QuantConfig(method="none"), seed=5)
    with mesh:
        step, state, _ = make_sharded_train_step(
            cfg, mesh, fresh, learning_rate=5e-3
        )
        rng = np.random.default_rng(1)
        for _ in range(2):
            # per-replica-distinct data: identical shards would mask a
            # missing sync (every replica would take the same step)
            tokens = jnp.asarray(
                rng.integers(0, cfg.vocab_size, size=(4, 12)), jnp.int32
            )
            state, loss = step(state, tokens)
        shards = state.params.final_norm.addressable_shards
    assert len({s.device.id for s in shards}) == 8
    vals = [np.asarray(s.data) for s in shards]
    for v in vals[1:]:
        np.testing.assert_array_equal(
            v, vals[0],
            err_msg="replicated param diverged across slices — the "
                    "cross-slice gradient sync is broken",
        )


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()
