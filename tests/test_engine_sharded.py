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
