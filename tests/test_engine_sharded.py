"""Multi-chip serving: the SAME engine + step functions over a sharded mesh
must produce identical greedy tokens to the single-device engine — the
multi-node serving story the reference never had (SURVEY.md §2.4)."""

import numpy as np
import pytest

import jax

from gpt_oss_vllm_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    QuantConfig,
    SchedulerConfig,
)
from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
from gpt_oss_vllm_tpu.engine.request import SamplingParams
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig(
        model=ModelConfig.tiny(num_heads=4, num_kv_heads=2, num_experts=8),
        quant=QuantConfig(method="none"),
        cache=CacheConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
    )
    params = random_params(cfg.model, cfg.quant, seed=21)
    return cfg, params


def test_sharded_engine_matches_single_device(setup):
    cfg, params = setup
    prompt = [7, 3, 11, 2]
    single = InferenceEngine(cfg, params)
    want = single.generate([prompt], SamplingParams(max_tokens=5, temperature=0.0))[0]

    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    with mesh:
        sharded = InferenceEngine(cfg, params, mesh=mesh)
        got = sharded.generate([prompt], SamplingParams(max_tokens=5, temperature=0.0))[0]
    assert got == want


def test_sharded_engine_nf4(setup):
    cfg, _ = setup
    import dataclasses

    qcfg = dataclasses.replace(cfg, quant=QuantConfig(method="nf4", backend="xla"))
    qparams = random_params(qcfg.model, qcfg.quant, seed=22)
    prompt = [5, 1, 9]
    single = InferenceEngine(qcfg, qparams)
    want = single.generate([prompt], SamplingParams(max_tokens=4, temperature=0.0))[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=2))
    with mesh:
        sharded = InferenceEngine(qcfg, qparams, mesh=mesh)
        got = sharded.generate([prompt], SamplingParams(max_tokens=4, temperature=0.0))[0]
    assert got == want


def test_sharded_engine_vocab_int8(setup):
    """vocab_int8 under a mesh: the int8 head shards vocab-parallel and the
    engine routes it through the GSPMD-partitionable XLA lm_head path
    (ADVICE r1: this combination used to be constructible but untested)."""
    cfg, _ = setup
    import dataclasses

    qcfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, tie_word_embeddings=False),
        quant=QuantConfig(method="none", vocab_int8=True),
    )
    qparams = random_params(qcfg.model, qcfg.quant, seed=23)
    prompt = [6, 2, 13, 1]
    single = InferenceEngine(qcfg, qparams)
    want = single.generate([prompt], SamplingParams(max_tokens=4, temperature=0.0))[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=2))
    with mesh:
        sharded = InferenceEngine(qcfg, qparams, mesh=mesh)
        got = sharded.generate([prompt], SamplingParams(max_tokens=4, temperature=0.0))[0]
    assert got == want


def test_sharded_engine_kernel_path(setup):
    """VERDICT r1 weak #3: the sharded engine must run the Pallas kernel
    paths (per-shard paged attention + per-shard fused-dequant gmm via
    shard_map, parallel/kernels.py), not the XLA gather fallbacks. Interpret
    mode on the CPU mesh; greedy tokens must match the single-device XLA
    engine exactly."""
    cfg, _ = setup
    import dataclasses

    qcfg = dataclasses.replace(cfg, quant=QuantConfig(method="nf4", backend="xla"))
    qparams = random_params(qcfg.model, qcfg.quant, seed=31)
    prompts = [[5, 1, 9, 12, 3], [2, 4]]
    single = InferenceEngine(qcfg, qparams)
    sp = SamplingParams(max_tokens=5, temperature=0.0)
    want = single.generate(prompts, sp)

    kcfg = dataclasses.replace(
        qcfg, quant=QuantConfig(method="nf4", backend="pallas_interpret")
    )
    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=2))
    with mesh:
        sharded = InferenceEngine(
            kcfg, qparams, attn_backend="pallas_interpret", mesh=mesh
        )
        got = sharded.generate(prompts, sp)
    assert got == want


def test_moe_block_gmm_sharded_matches_oracle():
    """Unit parity: the shard_map gmm MoE (masked local routing + psum)
    equals the single-device XLA oracle on the virtual mesh."""
    import jax
    import jax.numpy as jnp

    from gpt_oss_vllm_tpu.models.params import random_params as rp
    from gpt_oss_vllm_tpu.ops.moe import moe_block
    from gpt_oss_vllm_tpu.parallel.kernels import moe_block_gmm_sharded

    cfg = ModelConfig.tiny(num_experts=8, experts_per_token=2)
    params = rp(cfg, QuantConfig(method="nf4"), seed=5)
    l = params.layers[0]
    x = jax.random.normal(jax.random.PRNGKey(0), (6, cfg.hidden_size), jnp.bfloat16)
    want = moe_block(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, strategy="gather", backend="xla",
    )
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    got = moe_block_gmm_sharded(
        x, l.router_w, l.router_b, l.w_gate_up, l.b_gate_up, l.w_down, l.b_down,
        cfg, mesh, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


def test_120b_topology_sharded_engine_dryrun():
    """BASELINE config 5 stretch: the gpt-oss-120b TOPOLOGY (128 experts,
    top-4, 36-deep — depth cut to 3 to keep the CPU mesh test fast, widths
    cut likewise) decodes through the sharded kernel engine on the virtual
    mesh (ep=4 x tp=2 => 8-way combined expert shards, 16 experts local)."""
    import dataclasses

    from gpt_oss_vllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig

    base = ModelConfig.gpt_oss_120b(
        vocab_size=512,
        hidden_size=128,
        num_layers=3,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        intermediate_size=128,
        sliding_window=16,
        max_position_embeddings=1024,
        original_context_length=256,
    )
    assert base.num_experts == 128 and base.experts_per_token == 4
    ecfg = EngineConfig(
        model=base,
        quant=QuantConfig(method="nf4", backend="pallas_interpret"),
        cache=CacheConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64),
    )
    params = random_params(base, ecfg.quant, seed=41)
    prompt = [9, 2, 77, 4]
    sp = SamplingParams(max_tokens=3, temperature=0.0)
    want = InferenceEngine(ecfg, params, attn_backend="pallas_interpret").generate(
        [prompt], sp
    )[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    with mesh:
        eng = InferenceEngine(ecfg, params, attn_backend="pallas_interpret", mesh=mesh)
        got = eng.generate([prompt], sp)[0]
    assert got == want


def test_120b_topology_ep8_decode_parity():
    """VERDICT r2 next #9: pure expert-parallel ep=8 on the 128-expert 120B
    topology (16 experts per shard, no tp) — the v5p serving layout whose
    memory budget test below claims fits. Decode through the sharded kernel
    engine must match the single-device engine token-for-token."""
    import dataclasses

    from gpt_oss_vllm_tpu.config import CacheConfig, EngineConfig, SchedulerConfig

    base = ModelConfig.gpt_oss_120b(
        vocab_size=512,
        hidden_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        intermediate_size=128,
        sliding_window=16,
        max_position_embeddings=1024,
        original_context_length=256,
    )
    assert base.num_experts == 128 and base.experts_per_token == 4
    ecfg = EngineConfig(
        model=base,
        quant=QuantConfig(method="mxfp4", scale_dtype="e8m0", backend="pallas_interpret"),
        cache=CacheConfig(block_size=8, num_blocks=64, max_blocks_per_seq=16),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64),
    )
    params = random_params(base, ecfg.quant, seed=43)
    prompt = [12, 7, 101, 3, 55]
    sp = SamplingParams(max_tokens=3, temperature=0.0)
    want = InferenceEngine(ecfg, params, attn_backend="pallas_interpret").generate(
        [prompt], sp
    )[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
    with mesh:
        eng = InferenceEngine(ecfg, params, attn_backend="pallas_interpret", mesh=mesh)
        # ep=8 expert sharding active, glu4 sectioning composed on top
        assert eng.params.layers[0].w_gate_up.row_layout == "glu4"
        got = eng.generate([prompt], sp)[0]
    assert got == want


def test_engine_a2a_dispatch_matches_single_device(setup):
    """VERDICT r3 missing #2: the explicit all-to-all EP dispatch must be a
    selectable PRODUCT path — ParallelConfig(moe_dispatch='a2a') routes the
    engine's MoE through ops.moe_ep.moe_block_ep (capacity-bucketed
    lax.all_to_all over the expert shards). Lossless default capacity =>
    greedy token parity with the single-device engine, through prefill,
    batched admission and decode."""
    import dataclasses

    cfg, _ = setup
    qcfg = dataclasses.replace(
        cfg,
        quant=QuantConfig(method="nf4", backend="xla"),
        parallel=ParallelConfig(dp=1, ep=4, tp=1, moe_dispatch="a2a"),
    )
    qparams = random_params(qcfg.model, qcfg.quant, seed=47)
    prompts = [[5, 1, 9, 12, 3], [2, 4, 8]]
    sp = SamplingParams(max_tokens=5, temperature=0.0)
    want = InferenceEngine(qcfg, qparams).generate(prompts, sp)
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=1))
    with mesh:
        eng = InferenceEngine(qcfg, qparams, mesh=mesh)
        got = eng.generate(prompts, sp)
    assert got == want


def test_engine_a2a_ep_tp_kernel_path(setup):
    """a2a dispatch composed with tp and the Pallas kernel path (glu4
    sectioned shards, combined ('expert','model') all-to-all axes): the
    multi-host-shaped topology, token-exact vs single-device."""
    import dataclasses

    cfg, _ = setup
    qcfg = dataclasses.replace(
        cfg,
        quant=QuantConfig(method="mxfp4", scale_dtype="e8m0", backend="pallas_interpret"),
        parallel=ParallelConfig(dp=1, ep=4, tp=2, moe_dispatch="a2a"),
    )
    qparams = random_params(qcfg.model, qcfg.quant, seed=48)
    prompt = [7, 3, 11, 2, 9]
    sp = SamplingParams(max_tokens=3, temperature=0.0)
    want = InferenceEngine(qcfg, qparams, attn_backend="pallas_interpret").generate(
        [prompt], sp
    )[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    with mesh:
        eng = InferenceEngine(qcfg, qparams, attn_backend="pallas_interpret", mesh=mesh)
        assert eng.params.layers[0].w_gate_up.row_layout == "glu4"
        got = eng.generate([prompt], sp)[0]
    assert got == want


def test_120b_memory_budget_fits_v5p():
    """Projected HBM per chip for the real GPT-OSS-120B on a v5p-16 EP mesh
    (the BASELINE config 5 accounting; numbers published in docs/STATUS.md)."""
    from gpt_oss_vllm_tpu.config import CacheConfig
    from gpt_oss_vllm_tpu.tools.memory_budget import CHIP_HBM_GB, model_bytes_per_chip

    cfg = ModelConfig.gpt_oss_120b()
    quant = QuantConfig(method="mxfp4", scale_dtype="e8m0")
    rep = model_bytes_per_chip(
        cfg, quant, ParallelConfig(ep=8, tp=1), CacheConfig(num_blocks=4096)
    )
    assert rep["total_gb"] < CHIP_HBM_GB["v5p"]
    # and the 20B single-chip layout matches what the bench actually fits
    rep20 = model_bytes_per_chip(
        ModelConfig(tie_word_embeddings=True),
        QuantConfig(method="nf4", scale_dtype="bfloat16"),
        ParallelConfig(),
        CacheConfig(num_blocks=176, block_size=16),
    )
    assert rep20["total_gb"] < CHIP_HBM_GB["v5e"]


def test_sharded_engine_big_prefill_chunk(setup):
    """Prefill dispatches past the old 2048-pair cap must stay on the
    SHARDED gmm path (the per-shard row-blocked grid handles any size);
    they used to fall into an unsharded pallas_call inside the mesh-jitted
    program — unpartitionable, and a hard error for glu4 weights. A long
    prompt with a big prefill_chunk crosses the boundary (T*k > 2048)."""
    import dataclasses

    cfg, _ = setup
    qcfg = dataclasses.replace(
        cfg,
        quant=QuantConfig(method="nf4", backend="pallas_interpret"),
        cache=CacheConfig(block_size=8, num_blocks=256, max_blocks_per_seq=200),
        scheduler=SchedulerConfig(
            max_num_seqs=2, max_model_len=2048, prefill_chunk=1536
        ),
    )
    qparams = random_params(qcfg.model, qcfg.quant, seed=37)
    rng = np.random.default_rng(5)
    prompt = rng.integers(1, qcfg.model.vocab_size, 1400).tolist()
    sp = SamplingParams(max_tokens=2, temperature=0.0)
    want = InferenceEngine(qcfg, qparams, attn_backend="pallas_interpret").generate(
        [prompt], sp
    )[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=2))
    with mesh:
        eng = InferenceEngine(qcfg, qparams, attn_backend="pallas_interpret", mesh=mesh)
        assert eng.params.layers[0].w_gate_up.row_layout == "glu4"
        got = eng.generate([prompt], sp)[0]
    assert got == want


def test_sharded_engine_with_speculation(setup):
    """Speculative decoding composed with an expert-sharded mesh: the async
    device-chained spec programs jit over the mesh like every other step
    program; greedy streams must match the single-device no-spec engine."""
    import dataclasses

    import numpy as np

    cfg, _ = setup
    qcfg = dataclasses.replace(
        cfg,
        quant=QuantConfig(method="none"),
        scheduler=dataclasses.replace(
            cfg.scheduler, spec_tokens=3, async_decode=True,
            async_depth=2, async_flush_burst=2, max_model_len=128,
        ),
    )
    qparams = random_params(qcfg.model, qcfg.quant, seed=51)
    pat = np.random.default_rng(2).integers(1, qcfg.model.vocab_size, 7)
    prompt = np.tile(pat, 8)[:42].tolist()
    sp = SamplingParams(max_tokens=10, temperature=0.0)
    plain = dataclasses.replace(
        qcfg, scheduler=dataclasses.replace(qcfg.scheduler, spec_tokens=0,
                                            async_decode=False)
    )
    want = InferenceEngine(plain, qparams).generate([prompt], sp)[0]
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    with mesh:
        eng = InferenceEngine(qcfg, qparams, mesh=mesh)
        got = eng.generate([prompt], sp)[0]
    assert got == want
    # the device-chained spec program ran over the mesh (drafts fire only
    # when the model's own output self-repeats; parity is the invariant)
    assert eng._async_path == "spec"


def test_sharded_engine_guided(setup):
    """Guided decoding composes with GSPMD sharding: the device-chained
    mask/DFA tables enter the sharded fused program as replicated args and
    the constrained stream matches the single-device engine exactly."""
    cfg, params = setup
    from gpt_oss_vllm_tpu.serving.guided import compile_guided
    from gpt_oss_vllm_tpu.serving.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    g = compile_guided("choice", ["red", "green", "blue"], tok)
    sp = SamplingParams(
        max_tokens=10, temperature=0.9, seed=5,
        stop_token_ids=tuple(tok.stop_ids), guided=g,
    )
    prompt = tok.encode("c: ")
    single = InferenceEngine(cfg, params)
    want = single.generate([prompt], sp)[0]

    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    with mesh:
        sharded = InferenceEngine(cfg, params, mesh=mesh)
        got = sharded.generate([prompt], sp)[0]
    assert got == want
    body = tok.decode([t for t in got if t not in tok.stop_ids])
    assert body in ("red", "green", "blue")
