"""Continuous-batching inference engine.

The TPU-native reimagining of the vLLM v1 engine stack the reference patches
into (SURVEY.md §3.2, §7 "architecture stance"): no multi-process engine
core, no IPC handshake — one controller per host driving two jitted
programs (prefill over length buckets, fixed-width batched decode) over a
donated paged KV cache. Scheduling: admit waiting requests into free decode
slots via prefill (one per step, chunk-bounded), then decode every running
slot each step.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_oss_vllm_tpu.config import EngineConfig
from gpt_oss_vllm_tpu.engine.kv_cache import BlockAllocator, KVCache
from gpt_oss_vllm_tpu.engine.request import Request, RequestState, SamplingParams
from gpt_oss_vllm_tpu.engine.step import model_step
from gpt_oss_vllm_tpu.models.params import ModelParams
from gpt_oss_vllm_tpu.ops.sampling import sample_tokens_seeded


@dataclass
class StepOutput:
    request_id: str
    token_id: int
    finished: bool
    finish_reason: Optional[str] = None
    logprob: Optional[float] = None
    top_logprobs: Optional[list] = None  # [(token_id, logprob), ...]
    # per-prompt-token logprobs, attached ONCE to the admission (first)
    # output of a request with sampling.prompt_logprobs set: [None, (lp,
    # [(tid, lp), ...]), ...] — one entry per prompt token
    prompt_logprobs: Optional[list] = None


class _PLPOut(NamedTuple):
    """Shape-compatible stand-in for StepOut on the prompt-logprobs prefill
    path (logits already reduced to the final position in-program)."""
    logits: jax.Array  # [B, V]
    cache: object


def _next_bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _tok_byte_rows(g_bytes, tok):
    """[W, Lmax] byte rows for token column ``tok`` (-1 pads). Ids past the
    tokenizer vocab (lm_head padding — reachable only on unmasked rows) and
    -1 window pads carry no bytes: the clip must not alias them onto the
    last real token's byte row."""
    tb = g_bytes[jnp.clip(tok, 0, g_bytes.shape[0] - 1)]
    return jnp.where(
        ((tok >= 0) & (tok < g_bytes.shape[0]))[:, None], tb, -1
    )


def _harmony_gate_step(h_state, tok, tb, ch_trans, ch_accept, h_spec):
    """One token's device-side harmony-gate transition (mirrors
    ``GuidedSession.advance``'s gate branch; ``serving/guided.py``
    ``final_channel_tables``). ``h_state``: -1 = no gate, 0 = ACTIVE,
    1 = FREE, 2+s = collecting a channel name at channel-DFA state s.
    Returns ``(new_h, walk_ok)`` — ``walk_ok`` (computed from the PRE-token
    gate) gates the grammar DFA advance for this token, matching the host
    session which returns before the grammar on header specials."""
    ch_id, msg_id, end_id, start_id = h_spec
    is_ch = tok == ch_id
    is_msg = tok == msg_id
    is_es = (tok == end_id) | (tok == start_id)
    gated = h_state >= 0
    walk_ok = (h_state <= 0) & ~(gated & (is_ch | is_msg | is_es))
    chan_s = jnp.maximum(h_state - 2, 0)

    def _cwalk(s, b):
        return jnp.where(b >= 0, ch_trans[s, jnp.clip(b, 0)], s), None

    chan_w, _ = jax.lax.scan(_cwalk, chan_s, tb.T)
    in_chan = h_state >= 2
    new_h = jnp.where(
        ~gated,
        h_state,
        jnp.where(
            in_chan,
            jnp.where(is_msg, jnp.where(ch_accept[chan_s], 0, 1), 2 + chan_w),
            jnp.where(is_ch, 2, jnp.where(is_es, 1, h_state)),
        ),
    )
    return new_h, walk_ok


class InferenceEngine:
    def __init__(
        self,
        config: EngineConfig,
        params: ModelParams,
        attn_backend: str = "auto",
        mesh=None,
    ):
        """mesh: optional jax Mesh ('data','expert','model'). When given,
        params are GSPMD-sharded (EP over experts, head-aligned TP) and the
        KV cache is sharded over kv heads; the same jitted step functions
        then run SPMD — XLA inserts the collectives (SURVEY.md §2.3)."""
        self.config = config
        self.mesh = mesh
        cfg, cc, sc = config.model, config.cache, config.scheduler
        # allocate the KV pool BEFORE the param repacks below: the in-place
        # glu4 sectioning alternates alloc/free over 24 multi-hundred-MB
        # tensors and can fragment HBM enough that even a ~100 MB contiguous
        # cache allocation fails afterwards (observed at 24L mxfp4+vocab8)
        self.cache = KVCache.create(cfg, cc)
        if mesh is not None:
            from gpt_oss_vllm_tpu.parallel.sharding import (
                cache_pspec,
                shard_params,
            )
            from jax.sharding import NamedSharding

            qb_mesh = config.quant.backend if config.quant.enabled else "xla"
            if qb_mesh == "pallas" and jax.default_backend() != "tpu":
                qb_mesh = "xla"
            if qb_mesh.startswith("pallas"):
                from gpt_oss_vllm_tpu.models.params import section_glu_experts
                from gpt_oss_vllm_tpu.parallel.kernels import expert_shard_axes

                if expert_shard_axes(mesh, cfg.num_experts):
                    # glu4 sectioning composes with expert sharding: shards
                    # hold WHOLE experts and the sectioning is a per-expert
                    # row reorder, so the sharded gmm path gets the same
                    # fused-FFN layout as single-shard serving (closes the
                    # r2 "glu4 is single-shard only" gap). Section BEFORE
                    # sharding; pspecs carry row_layout through.
                    params = section_glu_experts(params)
            params = shard_params(params, mesh)
        else:
            from gpt_oss_vllm_tpu.models.params import fuse_qkv, section_glu_experts

            # single-shard: one fat qkv matmul beats three MXU-underfilled
            # skinny ones (decode is latency-bound on these reads)
            params = fuse_qkv(params)
            if (
                config.quant.enabled
                and config.quant.backend == "pallas"
                and jax.default_backend() == "tpu"
            ):
                # glu4 expert layout: one fused FFN kernel per MoE block at
                # decode (ops.moe_ffn_fused); bit-lossless row repack.
                # drain_every bounds the async-free transient so a
                # serving-sized KV pool still fits beside the repack
                params = section_glu_experts(params, drain_every=1)
                # drain the repack's deferred frees before any further
                # allocation: on this backend frees are async, and at 24
                # layers the headroom is tens of MB — without the drain even
                # a 32-byte alloc can hit RESOURCE_EXHAUSTED (bench.py
                # learned the same lesson)
                np.asarray(jax.tree_util.tree_leaves(params.layers[0].attn_norm)[0][:1])
                time.sleep(2.0)
        self.params = params
        if mesh is not None:
            from gpt_oss_vllm_tpu.parallel.sharding import cache_pspec
            from jax.sharding import NamedSharding

            sharding = NamedSharding(mesh, cache_pspec())
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, sharding),
                v=jax.device_put(self.cache.v, sharding),
                block_size=self.cache.block_size,
                num_kv_heads=self.cache.num_kv_heads,
                head_dim=self.cache.head_dim,
            )
        # prefix-sharing native allocator when available (radix-style prompt
        # reuse, SURVEY.md §2.3 block-manager row); free-list fallback keeps
        # the engine dependency-free
        self.prefix_caching = False
        self.allocator = None
        if cc.enable_prefix_caching:
            try:
                from gpt_oss_vllm_tpu.native import NativeBlockAllocator

                self.allocator = NativeBlockAllocator(cc.num_blocks)
                self.prefix_caching = True
            except Exception:
                self.allocator = None
        if self.allocator is None:
            self.allocator = BlockAllocator(cc.num_blocks)
        self.block_size = cc.block_size
        self.max_blocks = cc.max_blocks_per_seq
        self.num_slots = sc.max_num_seqs
        self.slots: List[Optional[Request]] = [None] * self.num_slots
        self.waiting: deque[Request] = deque()
        self.requests: Dict[str, Request] = {}
        # host mirrors of device-side per-slot state
        self.block_tables = np.full((self.num_slots, self.max_blocks), -1, dtype=np.int32)
        self.seq_lens = np.zeros(self.num_slots, dtype=np.int32)
        self.last_token = np.zeros(self.num_slots, dtype=np.int32)
        self._seed_rng = np.random.default_rng(config.seed)
        self._step_counter = 0
        self.metrics = {
            "prefill_tokens": 0,
            "decode_tokens": 0,
            "steps": 0,
            "prefix_cached_tokens": 0,
        }
        from gpt_oss_vllm_tpu.utils.telemetry import StepTimer

        self.timer = StepTimer()

        qb = config.quant.backend if config.quant.enabled else "xla"
        if qb == "pallas" and jax.default_backend() != "tpu":
            qb = "xla"  # compiled Pallas kernels are TPU-only; CPU uses the XLA
            #             path ("pallas_interpret" opts tests into the kernels)
        # lm_head backend is independent of the expert-quant method: the fused
        # int8 kernel runs whenever the vocab table is int8 and we're on a
        # single-shard TPU; under a mesh the XLA path is GSPMD-partitionable
        # (vocab-parallel logits, parallel/sharding.py)
        lm_backend = (
            "pallas"
            if (config.quant.vocab_int8 and jax.default_backend() == "tpu" and mesh is None)
            else "xla"
        )
        if attn_backend == "auto":
            # Pallas paged decode on real TPU (windowed layers read O(window)
            # KV; parity-proven vs the XLA gather oracle). Under a mesh the
            # kernel runs per shard on the local kv-head band via shard_map
            # (parallel/kernels.py) when the head split is tp-aligned.
            on_tpu = jax.default_backend() == "tpu"
            tp = mesh.shape.get("model", 1) if mesh is not None else 1
            head_aligned = cfg.num_kv_heads % tp == 0 and (128 // cfg.head_dim or 1) > 0
            attn_backend = "pallas" if (on_tpu and head_aligned) else "xla"
        # MoE dispatch under a mesh: implicit GSPMD (psum combine) or the
        # explicit all-to-all product path (ParallelConfig.moe_dispatch)
        moe_strategy = "auto"
        if mesh is not None and config.parallel.moe_dispatch == "a2a":
            from gpt_oss_vllm_tpu.parallel.kernels import expert_shard_axes

            if expert_shard_axes(mesh, cfg.num_experts):
                moe_strategy = "ep_a2a"
        step_fn = partial(
            model_step,
            cfg=cfg,
            moe_strategy=moe_strategy,
            attn_backend=attn_backend,
            quant_backend=qb,
            lm_head_backend=lm_backend,
            mesh=mesh,
            ep_capacity_factor=config.parallel.ep_capacity_factor,
        )
        self._prefill = jax.jit(step_fn, donate_argnames=("cache",))
        self._decode = jax.jit(step_fn, donate_argnames=("cache",))
        # per-length prefill backend auto-select (VERDICT r3 weak #2): short
        # chunks are MoE/dequant-bound and the XLA gather-einsum path's fixed
        # overhead is marginally lower (measured 128: 98.3 vs 102.0 ms; 512:
        # 134.6 vs 139.6), while the flash kernel's tile skipping wins from
        # ~2k context and is the ONLY path at 8k+. The engine picks per
        # chunk bucket instead of pinning one backend; each program compiles
        # only for the buckets it actually serves.
        self.FLASH_MIN_PREFILL = 1024
        # exact "pallas" only: pallas_interpret is the kernel-coverage test
        # mode and must NOT be silently auto-selected onto the XLA path
        if attn_backend == "pallas" and mesh is None:
            xla_fn = partial(
                model_step,
                cfg=cfg,
                moe_strategy=moe_strategy,
                attn_backend="xla",
                quant_backend=qb,
                lm_head_backend=lm_backend,
                mesh=mesh,
                ep_capacity_factor=config.parallel.ep_capacity_factor,
            )
            self._prefill_xla = jax.jit(xla_fn, donate_argnames=("cache",))
        else:
            self._prefill_xla = self._prefill
        # prompt-logprobs prefill programs (vLLM prompt_logprobs / OpenAI
        # echo+logprobs): all-position logits with log_softmax + top-k
        # computed over 32-position SUB-BLOCKS inside the program, built
        # lazily per top-N. Chunks are capped at PLP_CHUNK tokens so the
        # [T, V] logits stay bounded, and the sub-blocking avoids a second
        # full-chunk f32 copy (the "never T x 201k at once" memory rule —
        # step.py:12-13; at 64 tokens x 201k vocab the live transient is
        # ~51 MB logits + ~26 MB per sub-block, inside even a serving
        # config's HBM headroom)
        self.PLP_CHUNK = 64
        self._plp_cache: dict = {}
        self._plp_step_kwargs = dict(
            cfg=cfg,
            moe_strategy=moe_strategy,
            # PL chunks are <= 128 tokens, below FLASH_MIN_PREFILL: mirror
            # the per-length backend policy (XLA attention for short chunks;
            # pallas_interpret test mode keeps the kernels)
            attn_backend="xla" if attn_backend == "pallas" else attn_backend,
            quant_backend=qb,
            all_logits=True,
            lm_head_backend=lm_backend,
            mesh=mesh,
            ep_capacity_factor=config.parallel.ep_capacity_factor,
        )
        self.spec_tokens = sc.spec_tokens
        if self.spec_tokens > 0:
            spec_fn = partial(
                model_step,
                cfg=cfg,
                moe_strategy=moe_strategy,
                attn_backend=attn_backend,
                quant_backend=qb,
                all_logits=True,
                lm_head_backend=lm_backend,
                mesh=mesh,
                ep_capacity_factor=config.parallel.ep_capacity_factor,
            )
            from gpt_oss_vllm_tpu.ops.sampling import spec_verify

            def spec_step(params, cache, tokens, positions, block_tables,
                          last_idx, d_tok, d_len, seeds, ctrs, temp, top_p,
                          top_k, min_p):
                # ONE program: widened step + on-device verification. The
                # two-dispatch form paid separate n_acc and final readbacks
                # (each a tunnel RTT + stream drain) every spec step —
                # measured 96 tokens in 46.6 s on chip. The fused form
                # returns one stacked [2, B] int32 transfer; position-0
                # logits come back as a device handle and are only READ when
                # a non-drafted row needs the host sampler.
                out = spec_fn(
                    params, cache=cache, tokens=tokens, positions=positions,
                    block_tables=block_tables, last_idx=last_idx,
                )
                n_acc, final = spec_verify(
                    out.logits, d_tok, d_len, seeds, ctrs, temp, top_p,
                    top_k, min_p,
                )
                both = jnp.stack(
                    [n_acc.astype(jnp.int32), final.astype(jnp.int32)]
                )
                return out.cache, both, out.logits[:, 0]

            self._decode_spec_fused = jax.jit(spec_step, donate_argnames=("cache",))
            self.metrics["spec_proposed"] = 0
            self.metrics["spec_accepted"] = 0

            L = sc.max_model_len
            mm = sc.spec_min_match

            def spec_async_step(params, cache, hist, hist_len, block_tables,
                                pos_cap, seeds, ctrs, temp, top_p, top_k,
                                min_p, bias_ids, bias_vals, stop_ids,
                                min_toks, counts, pres, freq, rep,
                                g_state=None, g_bits=None, g_trans=None,
                                g_bytes=None, h_state=None, ch_trans=None,
                                ch_accept=None, post="none",
                                K=sc.spec_tokens, n_lp=0, guided=False,
                                h_spec=None):
                # FULLY device-chained speculative step: draft from the
                # per-row token-history ring, feed [last, draft...], verify
                # on device (rejection sampling against each row's exact
                # target distribution; temperature<=0 rows degrade to greedy
                # longest-prefix — ops.sampling.spec_verify), append the
                # emitted tokens back into the history — the next step
                # drafts from the updated ring with ZERO host syncs (the
                # async analog of _decode_spec_fused, which needs a readback
                # per step because the HOST drafts). Draw counters chain as
                # ctr += n_emitted, which equals the sync path's
                # len(output_token_ids) reseed exactly. Rejected drafts' KV
                # entries sit beyond the accepted frontier and are
                # overwritten when the real tokens are fed at those
                # positions (slot mapping is position-based).
                from gpt_oss_vllm_tpu.ops.sampling import spec_verify
                from gpt_oss_vllm_tpu.ops.spec_device import ngram_draft_device

                W = hist.shape[0]
                draft, nd = jax.vmap(
                    lambda h, n: ngram_draft_device(h, n, k=K, m=mm)
                )(hist, hist_len)
                live = hist_len > 0  # pad rows park at hist_len 0
                nd = jnp.where(live, nd, 0)
                last = hist[
                    jnp.arange(W), jnp.clip(hist_len - 1, 0, L - 1)
                ]
                tokens = jnp.concatenate([last[:, None], draft], axis=1)
                win = jnp.arange(1 + K, dtype=jnp.int32)[None, :]
                base = hist_len[:, None] - 1
                fed = win <= nd[:, None]
                # per-row position cap: in-flight steps past a request's
                # finish (stop token or max_tokens, host-unknown until the
                # flush) keep advancing hist_len; without the cap their
                # window positions can exceed the block table and the
                # clamped take_along_axis lookup in the KV slot mapping
                # would write into the LAST table entry, corrupting legit
                # KV (ADVICE r3 medium). Position -1 = dropped KV write.
                ok = fed & live[:, None] & (base + win < pos_cap[:, None])
                positions = jnp.where(ok, base + win, -1)
                out = spec_fn(
                    params, cache=cache, tokens=tokens, positions=positions,
                    block_tables=block_tables,
                    last_idx=jnp.zeros(W, jnp.int32),
                )
                draft_w = jnp.concatenate(
                    [draft, jnp.zeros((W, 1), jnp.int32)], axis=1
                )  # [W, 1+K]: the verify window's draft columns
                logits = out.logits
                if post != "none":
                    # host-sampler post-processing ON DEVICE (logit_bias /
                    # min_tokens stop masking / penalties with the
                    # within-window count cascade) so these rows keep the
                    # zero-sync chain instead of forfeiting it to the sync
                    # path (VERDICT r3 next #5)
                    from gpt_oss_vllm_tpu.ops.sampling import (
                        spec_postprocess_logits,
                    )

                    logits = spec_postprocess_logits(
                        logits, draft, ctrs,
                        bias_ids=bias_ids, bias_vals=bias_vals,
                        stop_ids=stop_ids, min_tokens=min_toks,
                        counts=counts if post == "full" else None,
                        presence=pres, frequency=freq, repetition=rep,
                    )

                def _gbyte_walk(s, tb):
                    # advance states by one token column's byte rows (stop
                    # ids / pads are all-pad -> state holds; rows with
                    # state -1 are unconstrained and hold too)
                    def bw(ss, b):
                        return jnp.where(
                            (b >= 0) & (ss >= 0),
                            g_trans[jnp.clip(ss, 0), jnp.clip(b, 0)],
                            ss,
                        ), None

                    s2, _ = jax.lax.scan(bw, s, tb.T)
                    return s2

                def _gmask_row(s, lg, on=None):
                    # gather + unpack the packed mask for states s; -inf
                    # everything the DFA disallows (rows with s -1 pass;
                    # `on` additionally gates masking — the harmony gate's
                    # per-position ACTIVE condition)
                    from gpt_oss_vllm_tpu.ops.sampling import NEG_INF

                    row_bits = g_bits[jnp.clip(s, 0)].astype(jnp.int32)
                    shifts = 7 - jnp.arange(8, dtype=jnp.int32)
                    b = (row_bits[:, :, None] >> shifts[None, None, :]) & 1
                    Vtok = g_bytes.shape[0]
                    allow = b.reshape(row_bits.shape[0], -1)[:, :Vtok] > 0
                    Vm = lg.shape[-1]
                    if Vm > Vtok:
                        allow = jnp.concatenate(
                            [allow,
                             jnp.zeros((allow.shape[0], Vm - Vtok), bool)],
                            axis=1,
                        )
                    live_m = s >= 0 if on is None else (s >= 0) & on
                    return jnp.where(
                        live_m[:, None] & ~allow, NEG_INF, lg
                    )

                if guided:
                    # guided x speculation: window position j's target
                    # distribution is masked by the DFA state AFTER drafts
                    # 0..j-1 (ungrammatical drafts get p=0 and are
                    # rejected; the residual/bonus draw samples from the
                    # masked distribution at a grammatical state) —
                    # structured outputs keep multi-token spec steps, which
                    # matters: constrained JSON is highly draftable. The
                    # harmony gate chains along the window the same way, so
                    # channel-gated guided chat speculates too.
                    cols = []
                    s_j = g_state
                    h_j = h_state
                    for j in range(1 + K):
                        on_j = None if h_spec is None else h_j <= 0
                        cols.append(_gmask_row(s_j, logits[:, j, :], on_j))
                        if j < K:
                            tok_j = draft[:, j]
                            tb_j = _tok_byte_rows(g_bytes, tok_j)
                            s_new = _gbyte_walk(s_j, tb_j)
                            if h_spec is None:
                                s_j = s_new
                            else:
                                h_j, wok = _harmony_gate_step(
                                    h_j, tok_j, tb_j, ch_trans, ch_accept,
                                    h_spec,
                                )
                                s_j = jnp.where(wok, s_new, s_j)
                    logits = jnp.stack(cols, axis=1)
                n_acc, final = spec_verify(
                    logits, draft_w, nd, seeds, ctrs, temp, top_p, top_k,
                    min_p,
                )
                n_acc = jnp.minimum(n_acc.astype(jnp.int32), nd)
                n_emit = jnp.where(live, n_acc + 1, 0)
                emit = win < n_emit[:, None]
                emitted = jnp.where(
                    win < n_acc[:, None],
                    jnp.concatenate(
                        [draft, jnp.zeros((W, 1), jnp.int32)], axis=1
                    ),
                    jnp.where(
                        win == n_acc[:, None],
                        final.astype(jnp.int32)[:, None],
                        -1,
                    ),
                )
                emitted = jnp.where(emit, emitted, -1)
                w_idx = jnp.where(emit, hist_len[:, None] + win, L)
                hist = jax.vmap(
                    lambda h, wi, em: h.at[wi].set(em, mode="drop")
                )(hist, w_idx, emitted)
                # payload row: [n_drafted | emitted tokens (-1 pads)] — one
                # [W, 2+K] readback carries tokens AND the proposal count
                # (for the acceptance metrics) per flushed step
                payload = jnp.concatenate([nd[:, None], emitted], axis=1)
                if n_lp > 0:
                    # speculation x logprobs (STATUS r4 gap): the window
                    # carries OpenAI logprob payloads PER POSITION — chosen
                    # logprob + top-n (ids, vals) over the post-processed
                    # logits, exactly what the plain chain's "lp" mode
                    # computes token-at-a-time — packed as one f32
                    # [W, 2+K, 2+2n] readback (ids < 2^24 exact in f32):
                    # row 0 is [nd | 0...], row 1+j is position j's
                    # [token | chosen | ids | vals]
                    logp = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1
                    )  # [W, 1+K, V]
                    chosen = jnp.take_along_axis(
                        logp, jnp.clip(emitted, 0)[..., None], axis=-1
                    )  # [W, 1+K, 1]
                    top_vals, top_ids = jax.lax.top_k(logp, n_lp)
                    per_pos = jnp.concatenate(
                        [
                            emitted[..., None].astype(jnp.float32),
                            chosen,
                            top_ids.astype(jnp.float32),
                            top_vals,
                        ],
                        axis=-1,
                    )  # [W, 1+K, 2+2n]
                    head = jnp.zeros(
                        (W, 1, 2 + 2 * n_lp), jnp.float32
                    ).at[:, 0, 0].set(nd.astype(jnp.float32))
                    payload = jnp.concatenate([head, per_pos], axis=1)
                if post == "full":
                    # occurrence counts chain with the emitted tokens (pads
                    # scatter out of bounds and drop)
                    Vv = counts.shape[1]
                    counts = counts.at[
                        jnp.arange(W, dtype=jnp.int32)[:, None],
                        jnp.where(emitted >= 0, emitted, Vv),
                    ].add(1, mode="drop")
                if guided:
                    # chain the grammar (and harmony gate) forward over the
                    # emitted tokens (-1 pads carry no bytes and hold both
                    # states; stop ids hold via their all-pad byte rows)
                    for j in range(1 + K):
                        tok_j = emitted[:, j]
                        tb_j = _tok_byte_rows(g_bytes, tok_j)
                        s_new = _gbyte_walk(g_state, tb_j)
                        live_j = tok_j >= 0
                        if h_spec is None:
                            g_state = jnp.where(live_j, s_new, g_state)
                        else:
                            h_new, wok = _harmony_gate_step(
                                h_state, tok_j, tb_j, ch_trans, ch_accept,
                                h_spec,
                            )
                            g_state = jnp.where(live_j & wok, s_new, g_state)
                            h_state = jnp.where(live_j, h_new, h_state)
                return (out.cache, payload, hist, hist_len + n_emit,
                        ctrs + n_emit, counts, g_state, h_state)

            self._decode_spec_async = jax.jit(
                spec_async_step,
                donate_argnames=("cache", "hist", "hist_len", "counts"),
                static_argnames=("post", "K", "n_lp", "guided", "h_spec"),
            )
            # spec-chain guided state (separate from the plain chain's —
            # the two chains never run concurrently; path switches flush)
            self._spec_gtabs = None
            self._spec_goffs = None
            self._spec_gstate = None
            self._spec_hspec = None
            self._spec_htabs = (None, None)
            self._spec_hstate = None
            # adaptive draft length (VERDICT r3 weak #4): the verify window
            # costs ~(1 + BETA*k) plain steps (measured k=4 draftless ~1.9x),
            # so the profitable emitted-rate threshold scales with k. On an
            # unprofitable window the engine HALVES k (cheaper window,
            # profitable at lower acceptance — the sampled-T regime) before
            # backing off entirely; the next probe restarts at full k.
            self._spec_k = sc.spec_tokens
            # async-spec device chain: compact [W, L] history + lengths;
            # None = rebuild from host (which must flush in-flight first —
            # unknown acceptance counts make host mirrors upper bounds only)
            self._hist_chain = None
            self._hlen_chain = None
            self._spec_key = None
            self._spec_post = "none"
            self._spec_postargs = (None,) * 4
            self._spec_counts = None
            self._spec_pen = (None,) * 3
            self._needs_counts_reseed = False
            # adaptive backoff: a spec step computes the full 1+k window
            # (all-position logits) — ~2x a plain step (measured 33.6 vs
            # 63.6 tok/s c=1 draftless; 60.7 vs 78.9 at 38.6% sampled
            # acceptance). Speculation pays only while emitted tokens/step
            # exceed the window's cost ratio, so the engine tracks the
            # recent rate over SPEC_RATE_WINDOW flushed steps and drops to
            # the plain chain (re-probing later) when it falls below
            # SPEC_MIN_RATE.
            self._spec_rate = deque()
            self._spec_off_until = 0
        self.SPEC_RATE_WINDOW = 64
        self.SPEC_MIN_RATE = 1.5
        self.SPEC_BACKOFF_STEPS = 256
        # which async chain currently owns the in-flight pipeline; switching
        # paths must flush (their position bookkeeping is incompatible)
        self._async_path = None
        self._sample = jax.jit(sample_tokens_seeded)
        # overlapped-readback decode (SchedulerConfig.async_decode): one jit
        # fuses step + on-device sampling so sampled tokens feed the next
        # dispatch WITHOUT a host round-trip; the host processes step k's
        # tokens while step k+1 runs on device
        self.async_decode = sc.async_decode
        self.async_depth = max(1, sc.async_depth)
        # FIFO of in-flight async steps: ([(row, req)], dev_tokens)
        self._pending: deque = deque()
        # device-side caches for the fused decode's per-step uploads: the
        # per-slot sampling params change only when the batch composition
        # does, and the block tables only when a block is added/released
        self._samp_key = None
        # channel-gate DFA device tables, uploaded once per engine
        # (_bind_harmony_gate; shared by the plain and spec chains)
        self._chan_tabs_dev = None
        self._samp_dev = None
        # compact-row -> slot map of the current async decode program width
        self._rows_host = None
        self._rows_dev = None
        # device-chained decode positions/counters (async path); None =
        # rebuild from host mirrors. Defined for all engines so the sync
        # fallback can invalidate it unconditionally.
        self._pos_dev = None
        self._ctr_dev = None
        # jitted k-ary stack for burst token readbacks (compiled per arity)
        self._stack_toks = None
        # background token-readback pipeline: (entries, Future) FIFO + a
        # single worker thread that blocks in np.asarray off the dispatch path
        self._rb_q: deque = deque()
        # (slot, id(req)) -> dispatched-but-unemitted async step count
        self._inflight: Dict[tuple, int] = {}
        self._counts_rows_fn = None  # jitted [W, Lb] -> [W, V] count seeder
        # host-side token_counts rows stale while a device count chain owns
        # them (async post="full"); re-seeded on the sync transition
        self._needs_counts_reseed = False
        self._rb_pool = None
        self._bt_version = 0
        self._bt_dev = None
        self._bt_dev_version = -1
        if self.async_decode:

            def fused_step(params, cache, full_tok, rows, positions,
                           block_tables, seeds, ctrs, temp, top_p, top_k,
                           min_p, bias_ids=None, bias_vals=None,
                           stop_ids=None, min_toks=None, counts=None,
                           pres=None, freq=None, rep=None, g_state=None,
                           g_bits=None, g_trans=None, g_bytes=None,
                           h_state=None, ch_trans=None, ch_accept=None,
                           mode="full", post="none", n_lp=0, guided=False,
                           h_spec=None):
                # COMPACT batch: the program width W = rows.shape[0] is the
                # bucketed count of RUNNING requests, not max_num_seqs — a
                # c=1 stream on a 32-slot engine decodes through a width-1
                # program (2-3x fewer FLOPs+reads per step at low occupancy;
                # vLLM's CUDA-graph batch-size buckets, done the XLA way).
                # rows maps compact row -> slot; pad rows carry the
                # out-of-range sentinel S (take clips, scatter drops).
                S = full_tok.shape[0]
                tokens = jnp.take(full_tok, jnp.clip(rows, 0, S - 1))
                out = step_fn(
                    params, cache=cache, tokens=tokens[:, None],
                    positions=positions[:, None], block_tables=block_tables,
                    last_idx=jnp.zeros(tokens.shape[0], jnp.int32),
                    # the fused lm_head argmax bypasses logits post-
                    # processing — it must stay off for guided batches
                    # (the grammar mask applies to logits)
                    greedy_head=mode == "greedy" and post == "none"
                    and not guided,
                )
                logits = out.logits
                if post != "none":
                    # host-sampler post-processing ON DEVICE (logit_bias /
                    # min_tokens stop masking / penalties with a chained
                    # [W, V] count state): penalized/biased rows keep the
                    # zero-sync plain chain with spec OFF too (the serving
                    # default), mirroring the async-spec program
                    from gpt_oss_vllm_tpu.ops.sampling import (
                        spec_postprocess_logits,
                    )

                    W = rows.shape[0]
                    logits = spec_postprocess_logits(
                        logits[:, None, :],
                        jnp.zeros((W, 1), jnp.int32),  # window of 1: no cascade
                        ctrs,
                        bias_ids=bias_ids, bias_vals=bias_vals,
                        stop_ids=stop_ids, min_tokens=min_toks,
                        counts=counts if post == "full" else None,
                        presence=pres, frequency=freq, repetition=rep,
                    )[:, 0, :]
                if guided:
                    # grammar-constrained rows ON the zero-sync chain
                    # (serving/guided.py): gather the row's bit-packed
                    # allowed-token mask (25 KB/state at a 200k vocab, vs
                    # V bytes dense), unpack MSB-first (np.packbits order),
                    # -inf everything the DFA disallows — applied after
                    # bias/penalties so nothing resurrects an ungrammatical
                    # token. Rows with g_state -1 are unconstrained.
                    from gpt_oss_vllm_tpu.ops.sampling import NEG_INF

                    live_g = g_state >= 0
                    if h_spec is not None:
                        # device-side harmony gate: the grammar masks only
                        # while the row is inside the final channel's
                        # message (h_state 0) or carries no gate (-1);
                        # FREE/collecting rows (1, 2+s) decode unmasked
                        live_g = live_g & (h_state <= 0)
                    row_bits = g_bits[jnp.clip(g_state, 0)].astype(jnp.int32)
                    shifts = 7 - jnp.arange(8, dtype=jnp.int32)
                    bits = (row_bits[:, :, None] >> shifts[None, None, :]) & 1
                    Vtok = g_bytes.shape[0]
                    allow = bits.reshape(row_bits.shape[0], -1)[:, :Vtok] > 0
                    Vm = logits.shape[-1]
                    if Vm > Vtok:  # lm_head padding ids: never grammatical
                        allow = jnp.concatenate(
                            [allow,
                             jnp.zeros((allow.shape[0], Vm - Vtok), bool)],
                            axis=1,
                        )
                    logits = jnp.where(
                        live_g[:, None] & ~allow, NEG_INF, logits
                    )
                # static sampler specialization: the full path costs two
                # [B, 201k] sorts + cumsum + Gumbel generation EVERY step
                # (jnp.where computes both sides) — ~6 ms/step of pure waste
                # for the common cases (measured: engine device step 18 ms
                # vs the 10.5 ms kernel chain before this).
                #   greedy: every running request is temperature 0 -> argmax
                #           (fused into the lm_head sweep on the int8 path)
                #   plain:  default top_p/top_k/min_p -> Gumbel only, no sorts
                payload = None
                if mode == "lp":
                    # logprobs ON the chain: the payload row packs
                    # [token | chosen logprob | top ids | top vals] as f32
                    # (ids < 2^24 are exact) — one readback carries
                    # everything the OpenAI logprobs surface needs, so even
                    # logprobs rows keep the zero-sync pipeline
                    from gpt_oss_vllm_tpu.ops.sampling import (
                        sample_with_logprobs,
                    )

                    nxt, chosen, ids, vals = sample_with_logprobs(
                        logits, seeds, ctrs, temp, top_p, top_k, n_lp,
                        min_p=min_p,
                    )
                    payload = jnp.concatenate(
                        [
                            nxt[:, None].astype(jnp.float32),
                            chosen[:, None].astype(jnp.float32),
                            ids.astype(jnp.float32),
                            vals.astype(jnp.float32),
                        ],
                        axis=1,
                    )
                elif mode == "greedy" and post == "none":
                    nxt = (
                        out.greedy_tok
                        if out.greedy_tok is not None
                        else jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    )
                elif mode == "greedy":
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                elif mode == "plain":
                    from gpt_oss_vllm_tpu.ops.sampling import _row_gumbel

                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    t = jnp.maximum(temp, 1e-6)[:, None]
                    g = _row_gumbel(seeds, ctrs, logits.shape[1])
                    sampled = jnp.argmax(logits / t + g, axis=-1).astype(jnp.int32)
                    nxt = jnp.where(temp <= 0.0, greedy, sampled)
                else:
                    nxt = sample_tokens_seeded(
                        logits, seeds, ctrs, temp, top_p, top_k, min_p
                    )
                if post == "full":
                    W = rows.shape[0]
                    counts = counts.at[
                        jnp.arange(W, dtype=jnp.int32), nxt
                    ].add(1)
                if guided:
                    # advance the DFA by walking the sampled token's bytes
                    # (g_bytes rows are -1-padded; stop ids are all-pad so
                    # their state stays put, matching the host session)
                    tb = _tok_byte_rows(g_bytes, nxt)

                    def _gwalk(s, b):
                        s2 = jnp.where(
                            (b >= 0) & (s >= 0),
                            g_trans[jnp.clip(s, 0), jnp.clip(b, 0)],
                            s,
                        )
                        return s2, None

                    g_new, _ = jax.lax.scan(_gwalk, g_state, tb.T)
                    if h_spec is None:
                        g_state = g_new
                    else:
                        # harmony gate transitions ON DEVICE — grammar
                        # advances only while the gate is ACTIVE and the
                        # token is not a header special
                        h_state, walk_ok = _harmony_gate_step(
                            h_state, nxt, tb, ch_trans, ch_accept, h_spec
                        )
                        g_state = jnp.where(walk_ok, g_new, g_state)
                # chain positions/counters ON DEVICE: between batch-
                # composition changes every running row advances by exactly
                # one token per step, so the host never re-uploads them —
                # on a tunnel-attached chip each per-step host->device hop
                # costs most of a ~23 ms RTT on the dispatch critical path
                # (measured: the engine loop ran 24 tok/s against a 95 tok/s
                # kernel before this). Empty rows stay parked at -1.
                new_pos = jnp.where(positions >= 0, positions + 1, positions)
                # keep the SLOT-indexed token array current on device (pad
                # rows drop); admissions/sync steps write it by slot, the
                # next chain rebuild gathers from it
                full_upd = full_tok.at[rows].set(nxt, mode="drop")
                if payload is None:
                    payload = nxt
                return (out.cache, nxt, payload, full_upd, new_pos, ctrs + 1,
                        counts, g_state, h_state)

            self._decode_fused = jax.jit(
                fused_step, donate_argnames=("cache", "full_tok", "counts"),
                static_argnames=("mode", "post", "n_lp", "guided", "h_spec"),
            )
            # device-chained grammar state for guided rows on the plain
            # chain: stacked (bits, trans, byte-matrix) tables + per-row
            # absolute DFA state (None = no guided rows / rebuild)
            self._g_tabs = None
            self._gstate_dev = None
            # device-side harmony gate for channel-gated guided rows:
            # specials tuple (static), final-channel DFA tables, per-row
            # gate state (rebuilt with the grammar state)
            self._h_specials = None
            self._h_tabs = (None, None)
            self._hstate_dev = None
            # plain-chain post-processing state (mirrors the spec chain)
            self._plain_post = "none"
            self._plain_postargs = (None,) * 4
            self._plain_counts = None
            self._plain_pen = (None,) * 3
            self._dev_last_tok = jnp.zeros((self.num_slots,), jnp.int32)
            # device-chained decode state; None = must rebuild from host
            # mirrors (composition change, sync-path interleave, preemption)
            self._pos_dev = None
            self._ctr_dev = None
            # NO donation: the in-flight pending step may still hold this
            # buffer as its sampled-token array
            self._dev_set_tok = jax.jit(lambda a, i, v: a.at[i].set(v))
        # per-slot token-occurrence counts (prompt+output) for OpenAI
        # presence/frequency and HF repetition penalties; rows are (re)seeded
        # at admit and updated per decode step only while some running
        # request asks for penalties. Allocated LAZILY on the first penalized
        # request: [slots, vocab] int32 is ~50 MB at default width and the
        # 24-layer model leaves only tens of MB of HBM headroom.
        self.token_counts = None
        from gpt_oss_vllm_tpu.ops.sampling import apply_logit_bias, apply_penalties

        self._penalize = jax.jit(apply_penalties)
        self._logit_bias = jax.jit(apply_logit_bias)
        self._counts_seed = jax.jit(
            lambda c, row, toks: c.at[row].set(0).at[row, toks].add(1),
            donate_argnums=0,
        )
        self._counts_add = jax.jit(
            lambda c, rows, toks: c.at[rows, toks].add(1), donate_argnums=0
        )
        from gpt_oss_vllm_tpu.ops.sampling import sample_with_logprobs

        self._sample_lp = jax.jit(sample_with_logprobs, static_argnames=("num_logprobs",))

    # -- public API --------------------------------------------------------

    def add_request(
        self, request_id: str, prompt_token_ids: List[int], sampling: SamplingParams
    ) -> Request:
        if len(prompt_token_ids) == 0:
            raise ValueError("empty prompt")
        if len(prompt_token_ids) >= self.config.scheduler.max_model_len:
            raise ValueError(
                f"prompt length {len(prompt_token_ids)} >= max_model_len "
                f"{self.config.scheduler.max_model_len}"
            )
        seed = sampling.seed
        if seed is None:
            seed = int(self._seed_rng.integers(0, 2**31 - 1))
        req = Request(
            request_id=request_id,
            prompt_token_ids=list(prompt_token_ids),
            sampling=sampling,
            seed_resolved=seed,
        )
        if sampling.guided is not None:
            # per-request DFA state (+ harmony channel gate). Gate-free and
            # harmony-gated guided rows ride the zero-sync fused chains
            # (device-side DFA byte walks advance the grammar AND the
            # final-channel gate, on the plain AND spec programs); only
            # tool-choice or min_tokens>0 guided rows fall back to the
            # sync path
            req.guided = sampling.guided.new_session(sampling.guided_gate)
        self.requests[request_id] = req
        self.waiting.append(req)
        return req

    def abort_request(self, request_id: str) -> None:
        req = self.requests.get(request_id)
        if req is None:
            return
        if req.state == RequestState.WAITING:
            self.waiting.remove(req)
        self._release(req, "abort")
        req.state = RequestState.ABORTED

    def has_work(self) -> bool:
        return (
            bool(self.waiting)
            or any(s is not None for s in self.slots)
            or bool(self._pending)
            # burst entries handed to the background reader but not yet
            # emitted are still pending work (otherwise the serving loop can
            # stop stepping with landed-but-unstreamed tokens stranded)
            or bool(self._rb_q)
        )

    def num_running(self) -> int:
        return sum(s is not None for s in self.slots)

    # -- scheduling --------------------------------------------------------

    def _counts(self):
        if self.token_counts is None:
            self.token_counts = jnp.zeros(
                (self.num_slots, self.config.model.vocab_size), jnp.int32
            )
        return self.token_counts

    def _prefill_for(self, bucket: int):
        """Prefill program for a chunk of this bucket width (per-length
        attention backend auto-select)."""
        return self._prefill if bucket >= self.FLASH_MIN_PREFILL else self._prefill_xla

    def _plp_program(self, n: int):
        """Prompt-logprobs prefill program (lazily jitted per top-N): one
        chunk pass returning (final-position logits for the sampler, cache,
        chosen-target logprob per position, top-N ids, top-N logprobs)."""
        fn = self._plp_cache.get(n)
        if fn is None:
            step = partial(model_step, **self._plp_step_kwargs)

            def prog(params, cache, tokens, positions, block_tables,
                     last_idx, targets):
                out = step(
                    params, cache=cache, tokens=tokens, positions=positions,
                    block_tables=block_tables, last_idx=last_idx,
                )
                logits = out.logits  # [B, T, V]
                B, T, V = logits.shape
                # log_softmax + top-k over 32-position sub-blocks: a full-
                # chunk f32 log_softmax would double the largest live
                # buffer (T x 201k f32 is ~50 MB per 64 tokens) on a chip
                # whose serving configs leave little headroom. T is a
                # power-of-two bucket, so SB divides it.
                SB = min(32, T)

                def blk(_, i):
                    sl = jax.lax.dynamic_slice_in_dim(logits, i * SB, SB, 1)
                    lse = jax.nn.log_softmax(
                        sl.astype(jnp.float32), axis=-1
                    )
                    tg = jax.lax.dynamic_slice_in_dim(targets, i * SB, SB, 1)
                    ch = jnp.take_along_axis(lse, tg[..., None], -1)[..., 0]
                    tv, ti = jax.lax.top_k(lse, max(n, 1))
                    return None, (ch, ti, tv)

                _, (chosen, top_i, top_v) = jax.lax.scan(
                    blk, None, jnp.arange(T // SB, dtype=jnp.int32)
                )
                chosen = jnp.moveaxis(chosen, 0, 1).reshape(B, T)
                top_i = jnp.moveaxis(top_i, 0, 1).reshape(B, T, -1)
                top_v = jnp.moveaxis(top_v, 0, 1).reshape(B, T, -1)
                final = jnp.take_along_axis(
                    out.logits, last_idx[:, None, None], axis=1
                )[:, 0]
                return final, out.cache, chosen, top_i, top_v

            fn = jax.jit(prog, donate_argnames=("cache",))
            self._plp_cache[n] = fn
        return fn

    def _seed_count_rows(self, running, W: int):
        """Occurrence-count rows [W, V] for a device count chain, seeded from
        the (exact) request contexts in ONE padded 2-D scatter-add — the
        per-request loop this replaces dispatched W eager scatters, each
        materializing a fresh [W, V] buffer, and compiled one program per
        distinct ctx length (ADVICE-class finding, r4 self-review)."""
        V = self.config.model.vocab_size
        Lb = _next_bucket(
            max(r.num_tokens for _, r in running), 16
        )
        toks = np.full((W, Lb), V, np.int32)  # V = out of bounds -> dropped
        for ci, (i, r) in enumerate(running):
            ctx = r.prompt_token_ids + r.output_token_ids
            toks[ci, : len(ctx)] = ctx
        if self._counts_rows_fn is None:
            self._counts_rows_fn = jax.jit(
                lambda t: jnp.zeros((t.shape[0], V), jnp.int32)
                .at[jnp.arange(t.shape[0], dtype=jnp.int32)[:, None], t]
                .add(1, mode="drop")
            )
        return self._counts_rows_fn(jnp.asarray(toks))

    def _effective_chunk(self) -> int:
        """Adaptive admission budget: scale the chunk with the WAITING-queue
        depth up to prefill_chunk_max. Deep queues pack more admissions per
        expert-weight sweep (measured c=32: 2048-token chunks +9% aggregate
        tok/s, p99 TTFT halved); a lone newcomer keeps the small chunk so
        running streams' inter-token stalls stay bounded."""
        sc = self.config.scheduler
        base = max(16, sc.prefill_chunk)
        cap = max(base, getattr(sc, "prefill_chunk_max", base))
        return min(cap, base * max(1, len(self.waiting)))

    def _free_slot(self) -> Optional[int]:
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return None

    def _blocks_for(self, num_tokens: int) -> int:
        return -(-num_tokens // self.block_size)

    def _release(self, req: Request, reason: Optional[str]) -> None:
        if req.slot is not None:
            self.slots[req.slot] = None
            self.block_tables[req.slot] = -1
            self._bt_version += 1
            self.seq_lens[req.slot] = 0
            req.slot = None
        if req.blocks:
            self.allocator.free(req.blocks)
            req.blocks = []
        if reason is not None and req.state != RequestState.ABORTED:
            req.state = RequestState.FINISHED
            req.finish_reason = reason
            req.finish_time = time.time()

    def _prefix_match(self, req: Request) -> List[int]:
        """Claim the longest chain of cached full prompt blocks (refcounts are
        incremented by lookup; caller owns releasing them)."""
        bs = self.block_size
        shared: List[int] = []
        # the final prompt token must always be prefilled (its logits feed the
        # sampler), so at most (n_prompt - 1) // bs full blocks can be shared
        parent = -1
        for bi in range((req.num_prompt_tokens - 1) // bs):
            chunk = req.prompt_token_ids[bi * bs : (bi + 1) * bs]
            b = self.allocator.prefix_lookup(parent, chunk)
            if b is None:
                break
            shared.append(b)
            parent = b
        return shared

    def _register_prefix_blocks(self, req: Request, n_shared_blocks: int) -> None:
        """Publish this request's freshly-filled full prompt blocks for reuse."""
        bs = self.block_size
        for bi in range(n_shared_blocks, req.num_prompt_tokens // bs):
            parent = req.blocks[bi - 1] if bi > 0 else -1
            chunk = req.prompt_token_ids[bi * bs : (bi + 1) * bs]
            self.allocator.register_prefix(parent, chunk, req.blocks[bi])

    def _admit_some(self) -> List[StepOutput]:
        """Token-budgeted batched admission: ALL waiting requests whose
        remaining prompts fit the per-step prefill budget prefill together as
        rows of ONE jitted pass (vLLM v1's token-budget scheduling, adapted
        to the two-program engine). The budget bounds per-step latency; a
        prompt longer than the budget falls back to the solo chunked path.

        Batching admissions is nearly free on TPU: a prefill pass is
        dominated by expert weight reads, which are shared across rows — the
        fix for admission-serialized TTFT under bursty load (VERDICT r1
        weak #5: one-prefill-per-step made every waiting request queue a
        full prefill behind its predecessors)."""
        budget = self._effective_chunk()
        bs = self.block_size
        selected = []  # (req, shared_blocks, ctx_tokens)
        bucket = 16
        while self.waiting:
            req = self.waiting[0]
            if (req.sampling.prompt_logprobs is not None
                    and req.prompt_logprobs_out is None):
                # prompt-logprob requests need the all-position-logits solo
                # path (and must not skip tokens via the prefix cache)
                if not selected:
                    return self._admit_one()
                break
            ctx = req.prompt_token_ids + req.output_token_ids
            shared = self._prefix_match(req) if self.prefix_caching else []
            remaining = len(ctx) - len(shared) * bs
            if remaining > budget:
                if shared:
                    self.allocator.free(shared)
                if not selected:
                    return self._admit_one()  # solo chunked admission
                break
            new_bucket = max(bucket, _next_bucket(remaining))
            if selected and (len(selected) + 1) * new_bucket > max(budget, new_bucket):
                if shared:
                    self.allocator.free(shared)
                break
            slot = self._free_slot()
            need = self._blocks_for(len(ctx) + 1) - len(shared)
            if slot is None or not self.allocator.can_allocate(need):
                if shared:
                    self.allocator.free(shared)
                break
            self.waiting.popleft()
            req.slot = slot
            req.state = RequestState.RUNNING
            req.blocks = shared + self.allocator.allocate(need)
            self.slots[slot] = req
            n_shared_tok = len(shared) * bs
            req.num_shared_prompt_tokens = n_shared_tok
            self.metrics["prefix_cached_tokens"] += n_shared_tok
            bucket = new_bucket
            selected.append((req, len(shared), ctx))
        if not selected:
            return []
        # one batched prefill pass; row count padded to a power of two so the
        # jit program set stays small ({1,2,4,..} x length buckets)
        k = len(selected)
        k_pad = 1
        while k_pad < k:
            k_pad *= 2
        tokens = np.zeros((k_pad, bucket), dtype=np.int32)
        positions = np.full((k_pad, bucket), -1, dtype=np.int32)
        bt = np.full((k_pad, self.max_blocks), -1, dtype=np.int32)
        last_idx = np.zeros(k_pad, dtype=np.int32)
        for r, (req, n_shared_blk, ctx) in enumerate(selected):
            start = n_shared_blk * bs
            size = len(ctx) - start
            tokens[r, :size] = ctx[start:]
            positions[r, :size] = np.arange(start, len(ctx))
            bt[r, : len(req.blocks)] = req.blocks
            last_idx[r] = size - 1
        out = self._prefill_for(bucket)(
            self.params,
            cache=self.cache,
            tokens=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            block_tables=jnp.asarray(bt),
            last_idx=jnp.asarray(last_idx),
        )
        self.cache = out.cache
        outputs: List[StepOutput] = []
        reqs = [req for req, _, _ in selected]
        rows = [req.slot for req in reqs]
        for r, (req, n_shared_blk, ctx) in enumerate(selected):
            self.metrics["prefill_tokens"] += len(ctx) - n_shared_blk * bs
            if self.prefix_caching:
                self._register_prefix_blocks(req, n_shared_blk)
            if req.sampling.has_penalties:
                self.token_counts = self._counts_seed(
                    self._counts(), req.slot, jnp.asarray(ctx, jnp.int32)
                )
        toks, lp = self._sample_row(out.logits[:k], reqs, slots=rows)
        for r, (req, _, ctx) in enumerate(selected):
            token = int(toks[r])
            slot = req.slot
            if req.sampling.has_penalties:
                self.token_counts = self._counts_add(
                    self.token_counts,
                    jnp.asarray([slot], jnp.int32),
                    jnp.asarray([token], jnp.int32),
                )
            if req.first_token_time is None:
                req.first_token_time = time.time()
            self.block_tables[slot] = bt[r]
            self._bt_version += 1
            self.seq_lens[slot] = len(ctx) + 1
            self.last_token[slot] = token
            outputs.append(self._append_token(req, token, lp, r))
        if self.async_decode:
            self._dev_last_tok = self._dev_set_tok(
                self._dev_last_tok,
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(toks[:k], jnp.int32),
            )
        return outputs

    def _admit_one(self) -> List[StepOutput]:
        """Prefill the next waiting request into a free slot.

        For a PREEMPTED request the context is prompt + tokens generated
        before preemption (vLLM's recompute semantics): the KV is rebuilt by
        prefill and decoding continues; the per-request (seed, counter)
        sampling stream makes the continuation identical to an uninterrupted
        run."""
        req = self.waiting[0]
        slot = self._free_slot()
        ctx_tokens = req.prompt_token_ids + req.output_token_ids
        n_prompt = len(ctx_tokens)
        # prompt logprobs: computed on THIS prefill (all-position logits);
        # prefix-cache reuse would skip the very positions whose logits are
        # needed, so PL requests prefill everything. Preemption recompute
        # keeps the already-collected entries and prefills normally.
        want_plp = (
            req.sampling.prompt_logprobs is not None
            and req.prompt_logprobs_out is None
        )
        shared = (
            self._prefix_match(req)
            if self.prefix_caching and not want_plp else []
        )
        # room for the prompt plus at least one generated token
        need = self._blocks_for(n_prompt + 1) - len(shared)
        if slot is None or not self.allocator.can_allocate(need):
            if shared:
                self.allocator.free(shared)  # drop claimed prefix refs
            return []
        self.waiting.popleft()
        req.slot = slot
        req.state = RequestState.RUNNING
        req.blocks = shared + self.allocator.allocate(need)
        self.slots[slot] = req
        n_shared_tok = len(shared) * self.block_size
        req.num_shared_prompt_tokens = n_shared_tok
        self.metrics["prefix_cached_tokens"] += n_shared_tok

        bt = np.full((1, self.max_blocks), -1, dtype=np.int32)
        bt[0, : len(req.blocks)] = req.blocks
        # chunked prefill: the unified step attends against the paged cache,
        # so long prompts stream through in prefill_chunk-bounded pieces
        # (bounding per-step latency under continuous batching) and only the
        # final chunk's logits reach the sampler. Prefix-cached tokens are
        # skipped entirely — their K/V already sit in the shared blocks.
        chunk_budget = self._effective_chunk()
        n_plp = 0
        plp_entries: List = [None]  # position 0 has no conditional
        if want_plp:
            chunk_budget = min(chunk_budget, self.PLP_CHUNK)
            n_plp = min(int(req.sampling.prompt_logprobs), 16)
        n_pr = req.num_prompt_tokens
        start = n_shared_tok
        out = None
        while start < n_prompt:
            size = min(chunk_budget, n_prompt - start)
            bucket = _next_bucket(size)
            tokens = np.zeros((1, bucket), dtype=np.int32)
            tokens[0, :size] = ctx_tokens[start : start + size]
            positions = np.full((1, bucket), -1, dtype=np.int32)
            positions[0, :size] = np.arange(start, start + size)
            if want_plp:
                # position j's logits predict token j+1: gather the NEXT
                # prompt token's logprob at every position of the chunk
                targets = np.zeros((1, bucket), dtype=np.int32)
                for j in range(size):
                    t = start + j + 1
                    if t < n_pr:
                        targets[0, j] = ctx_tokens[t]
                final, new_cache, chosen, top_i, top_v = self._plp_program(
                    n_plp
                )(
                    self.params,
                    cache=self.cache,
                    tokens=jnp.asarray(tokens),
                    positions=jnp.asarray(positions),
                    block_tables=jnp.asarray(bt),
                    last_idx=jnp.asarray([size - 1], dtype=jnp.int32),
                    targets=jnp.asarray(targets),
                )
                self.cache = new_cache
                ch = np.asarray(chosen[0])
                ti = np.asarray(top_i[0])
                tv = np.asarray(top_v[0])
                for j in range(size):
                    if start + j + 1 < n_pr:
                        plp_entries.append((
                            float(ch[j]),
                            [(int(a), float(b))
                             for a, b in zip(ti[j][:n_plp], tv[j][:n_plp])],
                        ))
                out = _PLPOut(final, new_cache)
            else:
                out = self._prefill_for(bucket)(
                    self.params,
                    cache=self.cache,
                    tokens=jnp.asarray(tokens),
                    positions=jnp.asarray(positions),
                    block_tables=jnp.asarray(bt),
                    last_idx=jnp.asarray([size - 1], dtype=jnp.int32),
                )
                self.cache = out.cache
            start += size
        if want_plp:
            req.prompt_logprobs_out = plp_entries
        self.metrics["prefill_tokens"] += n_prompt - n_shared_tok
        if self.prefix_caching:
            self._register_prefix_blocks(req, len(shared))
        if req.sampling.has_penalties:
            self.token_counts = self._counts_seed(
                self._counts(), slot, jnp.asarray(ctx_tokens, jnp.int32)
            )
        toks, lp = self._sample_row(out.logits, [req], slots=[slot])
        token = toks[0]
        if req.sampling.has_penalties:
            self.token_counts = self._counts_add(
                self._counts(),
                jnp.asarray([slot], jnp.int32),
                jnp.asarray([int(token)], jnp.int32),
            )
        if req.first_token_time is None:
            req.first_token_time = time.time()
        self.block_tables[slot] = bt[0]
        self._bt_version += 1
        self.seq_lens[slot] = n_prompt + 1
        self.last_token[slot] = token
        if self.async_decode:
            # seed the device-resident token row the fused decode reads from
            self._dev_last_tok = self._dev_set_tok(
                self._dev_last_tok, np.int32(slot), np.int32(token)
            )
        so = self._append_token(req, int(token), lp, 0)
        if want_plp:
            so.prompt_logprobs = req.prompt_logprobs_out
        return [so]

    def _sample_row(self, logits: jax.Array, reqs: List[Request], slots=None):
        """Sample one token per row; returns (tokens, per-req logprob info or
        None). Logprob/penalty computation only compiles/runs when a request
        asks."""
        # effective per-request logit biases: the user's logit_bias plus
        # -inf masking of stop tokens while min_tokens is unmet (the vLLM
        # min_tokens semantics — the stop id must not be *sampled*, not
        # merely ignored, or it would appear in the output text)
        def eff_bias(r: Request):
            bias = list(r.sampling.logit_bias or ())
            if len(r.output_token_ids) < r.sampling.min_tokens and not (
                r.guided is not None and r.guided.forces_stop()
            ):
                # min_tokens suppresses stop ids — unless the grammar has no
                # grammatical continuation, in which case finishing wins
                from gpt_oss_vllm_tpu.ops.sampling import NEG_INF

                bias += [(t, NEG_INF) for t in r.sampling.stop_token_ids]
            return bias

        biases = [eff_bias(r) for r in reqs]
        if any(biases):
            M = max(len(b) for b in biases)
            ids = np.full((len(reqs), M), -1, np.int32)
            vals = np.zeros((len(reqs), M), np.float32)
            for i, b in enumerate(biases):
                for j, (t, v) in enumerate(b):
                    ids[i, j], vals[i, j] = t, v
            logits = self._logit_bias(logits, jnp.asarray(ids), jnp.asarray(vals))
        if slots is not None and any(r.sampling.has_penalties for r in reqs):
            pres = np.array([r.sampling.presence_penalty for r in reqs], np.float32)
            freq = np.array([r.sampling.frequency_penalty for r in reqs], np.float32)
            rep = np.array([r.sampling.repetition_penalty for r in reqs], np.float32)
            logits = self._penalize(
                logits,
                self._counts()[np.asarray(slots)],
                jnp.asarray(pres), jnp.asarray(freq), jnp.asarray(rep),
            )
        if any(r.guided is not None and r.guided.active for r in reqs):
            # grammar-constrained rows: -inf everything the DFA disallows at
            # the row's current state (incl. ids past the tokenizer vocab —
            # the lm_head may be padded); applied after bias/penalties so
            # no post-processing can resurrect an ungrammatical token
            from gpt_oss_vllm_tpu.ops.sampling import NEG_INF

            V = int(logits.shape[-1])
            gb = np.zeros((len(reqs), V), np.float32)
            for i, r in enumerate(reqs):
                row = r.guided.allowed_row() if r.guided is not None else None
                if row is None:
                    continue
                n = min(len(row), V)
                gb[i, :n][~row[:n]] = NEG_INF
                gb[i, n:] = NEG_INF
            logits = logits + jnp.asarray(gb)
        temp = np.array([r.sampling.temperature for r in reqs], dtype=np.float32)
        top_p = np.array([r.sampling.top_p for r in reqs], dtype=np.float32)
        top_k = np.array([r.sampling.top_k for r in reqs], dtype=np.int32)
        min_p = np.array([r.sampling.min_p for r in reqs], dtype=np.float32)
        # per-request (seed, draw-counter) streams: reproducible whatever the
        # batch composition (the counter is the number of tokens emitted)
        seeds = np.array([r.seed_resolved for r in reqs], dtype=np.int32)
        ctrs = np.array([len(r.output_token_ids) for r in reqs], dtype=np.int32)
        want_lp = max((r.sampling.logprobs or 0) for r in reqs)
        # logprobs=0 still wants the CHOSEN token's logprob (with an empty
        # top list) — only rows with logprobs=None take the plain sampler
        if all(r.sampling.logprobs is None for r in reqs):
            toks = self._sample(
                logits, jnp.asarray(seeds), jnp.asarray(ctrs),
                jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(top_k),
                jnp.asarray(min_p),
            )
            return np.asarray(toks), None
        n = min(max(want_lp, 1), 16)
        toks, chosen, ids, vals = self._sample_lp(
            logits, jnp.asarray(seeds), jnp.asarray(ctrs),
            jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(top_k), n,
            min_p=jnp.asarray(min_p),
        )
        return np.asarray(toks), (np.asarray(chosen), np.asarray(ids), np.asarray(vals))

    def _append_token(self, req: Request, token: int, lp=None, row: int = 0) -> StepOutput:
        req.output_token_ids.append(token)
        if req.guided is not None:
            req.guided.advance(token)
        logprob = top_lp = None
        if lp is not None and req.sampling.logprobs is not None:
            chosen, ids, vals = lp
            logprob = float(chosen[row])
            n = req.sampling.logprobs
            top_lp = [(int(t), float(v)) for t, v in zip(ids[row][:n], vals[row][:n])]
        reason = None
        if token in req.sampling.stop_token_ids and not req.sampling.ignore_eos:
            reason = "stop"
        elif len(req.output_token_ids) >= req.sampling.max_tokens:
            reason = "length"
        elif req.num_tokens >= self.config.scheduler.max_model_len:
            reason = "length"
        if reason is not None:
            self._release(req, reason)
            return StepOutput(req.request_id, token, True, reason, logprob, top_lp)
        return StepOutput(req.request_id, token, False, None, logprob, top_lp)

    def _preempt(self, req: Request) -> None:
        """Release the slot + KV blocks and requeue at the FRONT of the
        waiting queue; the request re-prefills (recompute) when space frees."""
        if req.slot is not None:
            self.slots[req.slot] = None
            self.block_tables[req.slot] = -1
            self._bt_version += 1
            self.seq_lens[req.slot] = 0
            req.slot = None
        if req.blocks:
            self.allocator.free(req.blocks)
            req.blocks = []
        req.state = RequestState.WAITING
        req.num_shared_prompt_tokens = 0
        self.waiting.appendleft(req)
        self.metrics["preemptions"] = self.metrics.get("preemptions", 0) + 1

    def _grow_blocks(self, req: Request, new_tokens: int = 1) -> bool:
        """Ensure block capacity for ``new_tokens`` more tokens."""
        need = self._blocks_for(self.seq_lens[req.slot] + new_tokens)
        while len(req.blocks) < need:
            if len(req.blocks) >= self.max_blocks:
                # per-sequence table full. With async-spec optimism this can
                # be a phantom need (seq_lens is an upper bound until the
                # in-flight acceptance counts land) — _grow_all flushes
                # pending and retries before treating it as real exhaustion
                return False
            if not self.allocator.can_allocate(1):
                return False
            b = self.allocator.allocate(1)
            self.block_tables[req.slot, len(req.blocks)] = b[0]
            self._bt_version += 1
            req.blocks.extend(b)
        return True


    def _emit_snapshot(self, snapshot, toks) -> List[StepOutput]:
        outputs: List[StepOutput] = []
        # payload kinds by shape+dtype: 1-D int = plain tokens; 2-D int =
        # async-spec [W, 1+nd+K]; 2-D FLOAT = logprobs rows
        # [W, tok | chosen | top ids | top vals] (ids exact in f32);
        # 3-D FLOAT = spec x logprobs [W, 2+K, 2+2n] (row 0 = [nd|0...],
        # row 1+j = position j's [tok | chosen | ids | vals])
        nd_dims = getattr(toks, "ndim", 1)
        two_d = nd_dims == 2
        spec_lp = nd_dims == 3
        is_lp = two_d and np.issubdtype(np.asarray(toks).dtype, np.floating)
        spec = (two_d and not is_lp) or spec_lp
        step_rates: List[int] = []  # per-row emitted counts of THIS step
        for ci, slot, req in snapshot:
            k = (slot, id(req))
            n_in = self._inflight.get(k, 0)
            if n_in <= 1:
                self._inflight.pop(k, None)
            else:
                self._inflight[k] = n_in - 1
            if req.state != RequestState.RUNNING or req.slot != slot:
                continue  # finished/aborted/preempted since dispatch
            if spec:
                row = np.asarray(toks[ci])
                if spec_lp:
                    nd = int(row[0, 0])
                    n = (row.shape[1] - 2) // 2
                    entries = [
                        (
                            int(pos[0]),
                            (pos[1:2], pos[2 : 2 + n].astype(np.int64)[None],
                             pos[2 + n :][None]),
                        )
                        for pos in row[1:]
                    ]
                else:
                    nd = int(row[0])
                    entries = [(int(t), None) for t in row[1:]]
                self.metrics["spec_proposed"] += nd
                n_emitted = 0
                for tok, lpdata in entries:
                    if tok < 0:
                        break
                    self.metrics["decode_tokens"] += 1
                    n_emitted += 1
                    out = self._append_token(req, tok, lpdata, 0)
                    outputs.append(out)
                    if out.finished:
                        break
                    self.last_token[slot] = tok
                # accepted drafts = emitted tokens minus the bonus draw
                self.metrics["spec_accepted"] += max(0, n_emitted - 1)
                step_rates.append(n_emitted)
                if req.state == RequestState.RUNNING:
                    # optimistic seq_lens bump was the 1+K upper bound per
                    # dispatched step; correct to exact + the still-in-flight
                    # steps' margins (they advance by unknown <= 1+K each),
                    # capped at the request's own maximum (see dispatch)
                    margin = (1 + self.spec_tokens) * self._inflight_steps(slot, req)
                    cap = req.num_prompt_tokens + req.sampling.max_tokens
                    self.seq_lens[slot] = min(req.num_tokens + margin,
                                              max(cap, req.num_tokens))
                continue
            if is_lp:
                row = np.asarray(toks[ci])
                tok = int(row[0])
                n = (row.shape[0] - 2) // 2
                lpdata = (
                    row[1:2],
                    row[2 : 2 + n].astype(np.int64)[None],
                    row[2 + n :][None],
                )
                self.metrics["decode_tokens"] += 1
                out = self._append_token(req, tok, lpdata, 0)
                outputs.append(out)
                if not out.finished:
                    self.last_token[slot] = tok
                continue
            tok = int(toks[ci])
            self.metrics["decode_tokens"] += 1
            out = self._append_token(req, tok)
            outputs.append(out)
            if not out.finished:
                self.last_token[slot] = tok
        if step_rates:
            # profitability tracking: ONE sample per flushed ENGINE STEP (the
            # batch mean), not per emitted row — a per-row window at high
            # concurrency spanned ~2 steps and let one request's draftless
            # rows switch speculation off for everyone (ADVICE r3 low)
            self._spec_rate_update(sum(step_rates) / len(step_rates))
        return outputs

    def _spec_rate_update(self, rate: float) -> None:
        """Adaptive draft-length policy: the verify window costs
        ~(1 + BETA*k) plain steps, so the profitable emitted-rate bar scales
        with k (k = spec_tokens keeps the calibrated SPEC_MIN_RATE; k = 1
        only needs ~1.13). On an unprofitable window the engine HALVES k —
        low-acceptance (sampled-temperature) or short-loop text can be
        profitable at k=1 or 2 where k=4 is a loss — and only backs off
        entirely at k=1; the next probe restarts at full k."""
        self._spec_rate.append(rate)
        while len(self._spec_rate) > self.SPEC_RATE_WINDOW:
            self._spec_rate.popleft()  # window derives from SPEC_RATE_WINDOW
        k = self._spec_k
        thresh = 1.0 + (self.SPEC_MIN_RATE - 1.0) * k / max(1, self.spec_tokens)
        if len(self._spec_rate) >= self.SPEC_RATE_WINDOW:
            if sum(self._spec_rate) / len(self._spec_rate) >= thresh:
                # a full profitable window: future failed probes start from
                # the base backoff again
                self._spec_backoff_cur = self.SPEC_BACKOFF_STEPS
                return
            if k > 1:
                self._spec_k = k // 2
                self._hist_chain = None  # rebuild with the new window
            else:
                # EXPONENTIAL backoff on consecutive failed probes: the
                # re-probe tax on persistently unprofitable text decays to
                # ~0 duty cycle instead of a fixed ~8% (measured T=0.8
                # spec_tiny: 83.8 vs 90.8 plain with the fixed backoff)
                cur = getattr(self, "_spec_backoff_cur", self.SPEC_BACKOFF_STEPS)
                self._spec_off_until = self._step_counter + cur
                self._spec_backoff_cur = min(cur * 2, 16 * self.SPEC_BACKOFF_STEPS)
                self._spec_k = self.spec_tokens  # next probe: full k
            self._spec_rate.clear()

    def _stack_guided_tables(self, running):
        """Stack the distinct grammars' tables (bit-packed masks +
        offset-shifted byte transitions) into one device table; per-row
        states index it absolutely. All grammars in a process share the
        tokenizer, so one byte matrix serves. Returns ((bits, trans,
        byte_mat) or None, {id(table): offset} or None)."""
        tabs, offs, off = [], {}, 0
        for _, r in running:
            if r.guided is None:
                continue
            t = r.guided.grammar.table
            if id(t) not in offs:
                offs[id(t)] = off
                tabs.append(t)
                off += t.dfa.num_states
        if not tabs:
            return None, None
        bits = np.zeros((off, tabs[0].allowed_bits.shape[1]), np.uint8)
        trans = np.zeros((off, 256), np.int32)
        o = 0
        for t in tabs:
            n = t.dfa.num_states
            bits[o : o + n] = t.allowed_bits
            trans[o : o + n] = t.dfa.trans + o
            o += n
        return (
            jnp.asarray(bits), jnp.asarray(trans),
            jnp.asarray(tabs[0].byte_matrix()),
        ), offs

    def _bind_harmony_gate(self, running, W, seed_states=True):
        """Device bindings for the harmony-gated guided rows of ``running``:
        ``(h_spec tuple | None, (ch_trans, ch_accept) | (None, None),
        hstate [W] | None)``. One tokenizer per process, so the first
        harmony session's specials serve all rows and the channel-DFA
        device tables upload once per engine. ``seed_states=False`` skips
        the per-row host replay (callers that re-seed later in the chain-
        rebuild block). Host sessions must be exact (in-flight steps
        flushed) when the hstate is consumed."""
        harmony = [
            r for _, r in running
            if r.guided is not None and getattr(r.guided, "_harmony", False)
        ]
        if not harmony:
            return None, (None, None), None
        from gpt_oss_vllm_tpu.serving.guided import final_channel_tables

        sp = harmony[0].guided._specials
        h_spec = (
            sp.get("channel", -1), sp.get("message", -1),
            sp.get("end", -1), sp.get("start", -1),
        )
        chan_trans, chan_accept = final_channel_tables()
        if self._chan_tabs_dev is None:
            self._chan_tabs_dev = (
                jnp.asarray(chan_trans), jnp.asarray(chan_accept),
            )
        hstate_dev = None
        if seed_states:
            hstate = np.full(W, -1, np.int32)
            for ci, (i, r) in enumerate(running):
                if r.guided is not None:
                    hstate[ci] = r.guided.device_gate_state(chan_trans)
            hstate_dev = jnp.asarray(hstate)
        return h_spec, self._chan_tabs_dev, hstate_dev

    def _guided_states(self, running, W, offs) -> np.ndarray:
        """Per-compact-row absolute DFA states (-1 = unconstrained); host
        sessions must be exact (in-flight steps flushed) when called."""
        gstate = np.full(W, -1, np.int32)
        for ci, (i, r) in enumerate(running):
            if r.guided is not None:
                gstate[ci] = offs[id(r.guided.grammar.table)] + r.guided.state
        return gstate

    def _inflight_steps(self, slot: int, req: Request) -> int:
        """Dispatched-but-unemitted async steps still carrying this (slot,
        request) — incrementally maintained (+1 at dispatch, -1 at emission)
        instead of rescanning _pending and _rb_q per emitted row, which was
        O(async_depth x batch^2) host work per flush (ADVICE r3 low)."""
        return self._inflight.get((slot, id(req)), 0)

    def _track_dispatch(self, snapshot) -> None:
        for _ci, slot, req in snapshot:
            k = (slot, id(req))
            self._inflight[k] = self._inflight.get(k, 0) + 1

    def _flush_oldest(self) -> List[StepOutput]:
        """Read back and emit the OLDEST in-flight async step's tokens."""
        snapshot, dev_tokens = self._pending.popleft()
        _t0 = time.time()
        toks = np.asarray(dev_tokens)
        self.timer.record("async_readback", time.time() - _t0)
        return self._emit_snapshot(snapshot, toks)

    def _flush_burst(self, k: int) -> List[StepOutput]:
        """Hand the k oldest in-flight steps to the background reader as ONE
        stacked [k, B] device->host transfer, then emit whichever earlier
        bursts have landed. On the tunnel-attached chip a readback costs
        ~half an RTT no matter how old the step is (async host copies don't
        pre-land) AND synchronizes the device stream — so reading on the
        dispatch thread stalls decode for drain+RTT every burst. The worker
        thread blocks in np.asarray instead (the GIL is released during the
        device wait), the dispatch thread keeps the device fed, and host
        state is only ever mutated here, in dispatch order."""
        # entries must share a payload shape AND dtype (the stacked transfer
        # is [k, W], [k, W, 2+spec] for async-spec steps, or f32 logprob
        # payloads); a composition change or kind switch mid-burst splits
        # the burst at the boundary — the remainder flushes on a later call
        w0 = (self._pending[0][1].shape, self._pending[0][1].dtype)
        entries = []
        while (
            self._pending
            and len(entries) < k
            and (self._pending[0][1].shape, self._pending[0][1].dtype) == w0
        ):
            entries.append(self._pending.popleft())
        if self._stack_toks is None:
            import jax as _jax

            # one jitted stacker for every (arity, width): jax caches a
            # specialization per call signature
            self._stack_toks = _jax.jit(lambda *xs: jnp.stack(xs))
        stacked = self._stack_toks(*[e[1] for e in entries])
        if self._rb_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._rb_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="tok-readback"
            )
        self._rb_q.append((entries, self._rb_pool.submit(np.asarray, stacked)))
        outputs: List[StepOutput] = []
        # emit landed bursts (FIFO); bound in-flight readbacks to 2
        while self._rb_q and (self._rb_q[0][1].done() or len(self._rb_q) > 2):
            outputs.extend(self._emit_rb_front())
        return outputs

    def _emit_rb_front(self) -> List[StepOutput]:
        entries, fut = self._rb_q.popleft()
        _t0 = time.time()
        toks = fut.result()
        self.timer.record("async_readback", time.time() - _t0)
        outputs: List[StepOutput] = []
        for j, (snapshot, _) in enumerate(entries):
            outputs.extend(self._emit_snapshot(snapshot, toks[j]))
        return outputs

    def _flush_pending(self) -> List[StepOutput]:
        """Drain ALL in-flight async steps (oldest first). Called before any
        scheduling decision that needs exact host state (preemption, sync
        fallback, spec drafts) and when nothing is running."""
        outputs: List[StepOutput] = []
        # background-readback bursts are strictly OLDER than _pending entries
        while self._rb_q:
            outputs.extend(self._emit_rb_front())
        while self._pending:
            outputs.extend(self._flush_oldest())
        return outputs

    def _grow_all(self) -> List[StepOutput]:
        """Grow every running request's block table by one step's worth; on
        exhaustion, preempt the youngest request — free its blocks and
        requeue it for recompute (vLLM semantics; the reference's substrate
        preempts the same way) — and retry. Only when no other request
        holds blocks (nothing to reclaim) or the request can never fit does
        it finish truncated."""
        truncated: List[StepOutput] = []
        flushed: List[StepOutput] = []
        window = 1 + (self.spec_tokens if self.spec_tokens > 0 else 0)
        while True:
            running = [(i, r) for i, r in enumerate(self.slots) if r is not None]
            if not running:
                return truncated + flushed
            if all(self._grow_blocks(r, window) for _, r in running):
                return truncated + flushed
            # intervention needed: bring host state current first (a pending
            # async step OR an un-emitted burst readback may finish requests
            # and free their blocks)
            if self._pending or self._rb_q:
                flushed.extend(self._flush_pending())
                continue
            victim = max(running, key=lambda t: t[1].arrival_time)[1]
            never_fits = self._blocks_for(victim.num_tokens + 1) > self.allocator.num_blocks
            if len(running) == 1 or never_fits:
                self._release(victim, "kv_cache_exhausted")
                # token_id -1 = no new token this step, stream-final only
                truncated.append(StepOutput(
                    victim.request_id, -1, True, "kv_cache_exhausted"
                ))
            else:
                self._preempt(victim)

    def _decode_async_step(self, running) -> List[StepOutput]:
        """Dispatch one fused (step + on-device sampling) program, THEN read
        back the previous step's tokens — the readback overlaps this step's
        device compute, removing the host sync from the decode critical path
        (SchedulerConfig.async_decode)."""
        S = self.num_slots
        # per-row sampling params AND the position/counter chain: re-uploaded
        # only when the batch composition changes or the chain was invalidated
        # (sync-path interleave / preemption). Between rebuilds the fused step
        # advances positions and draw counters ON DEVICE — steady-state decode
        # dispatch does zero host->device uploads (block tables excepted, once
        # per crossed block boundary). The program width is BUCKETED to the
        # running count (compact rows), not max_num_seqs.
        # post-processing level (mirrors the spec chain): "full" chains a
        # [W, V] occurrence-count state for penalties, "bias" covers
        # logit_bias + min_tokens stop masking, "none" is the unchanged
        # common-case program
        if any(r.sampling.has_penalties for _, r in running):
            post = "full"
        elif any(
            r.sampling.logit_bias or r.sampling.min_tokens > 0
            for _, r in running
        ):
            post = "bias"
        else:
            post = "none"
        # logprobs rows: the chain computes OpenAI logprobs in-program and
        # packs them into the readback payload (the last host-sampler class
        # to join the zero-sync pipeline)
        want_lp = max((r.sampling.logprobs or 0) for _, r in running)
        n_lp = min(max(want_lp, 1), 16) if any(
            r.sampling.logprobs is not None for _, r in running
        ) else 0
        flushed: List[StepOutput] = []
        guided_present = any(r.guided is not None for _, r in running)
        key = (post, n_lp) + tuple((i, id(r)) for i, r in running)
        if key != self._samp_key:
            if post == "full" or guided_present:
                # count rows and grammar states are seeded from request
                # state, which is exact only after the in-flight pipeline
                # lands (the device chain runs ahead of the host mirrors)
                flushed = self._flush_pending()
                running = [
                    (i, r) for i, r in enumerate(self.slots) if r is not None
                ]
                if not running:
                    return flushed
                guided_present = any(r.guided is not None for _, r in running)
                key = (post, n_lp) + tuple((i, id(r)) for i, r in running)
            W = min(S, _next_bucket(max(1, len(running)), 1))
            rows = np.full(W, S, dtype=np.int32)  # pad sentinel = S
            seeds = np.zeros(W, np.int32)
            temp = np.zeros(W, np.float32)
            top_p = np.ones(W, np.float32)
            top_k = np.zeros(W, np.int32)
            min_p = np.zeros(W, np.float32)
            M = max(
                [len(r.sampling.logit_bias or ()) for _, r in running] + [1]
            )
            SS = max(
                [len(r.sampling.stop_token_ids) for _, r in running] + [1]
            )
            bias_ids = np.full((W, M), -1, np.int32)
            bias_vals = np.zeros((W, M), np.float32)
            stop_ids = np.full((W, SS), -1, np.int32)
            min_toks = np.zeros(W, np.int32)
            for ci, (i, req) in enumerate(running):
                sp = req.sampling
                rows[ci] = i
                seeds[ci] = req.seed_resolved
                temp[ci] = sp.temperature
                top_p[ci] = sp.top_p
                top_k[ci] = sp.top_k
                min_p[ci] = sp.min_p
                for j, (t, v) in enumerate(sp.logit_bias or ()):
                    bias_ids[ci, j], bias_vals[ci, j] = t, v
                stop_ids[ci, : len(sp.stop_token_ids)] = sp.stop_token_ids
                min_toks[ci] = sp.min_tokens
            self._rows_host = rows
            self._rows_dev = jnp.asarray(rows)
            self._samp_dev = tuple(
                jnp.asarray(a) for a in (seeds, temp, top_p, top_k, min_p)
            )
            self._plain_post = post
            if post == "none":
                self._plain_postargs = (None,) * 4
                self._plain_counts = None
                self._plain_pen = (None,) * 3
            else:
                self._plain_postargs = tuple(
                    jnp.asarray(a)
                    for a in (bias_ids, bias_vals, stop_ids, min_toks)
                )
                if post == "full":
                    self._plain_counts = self._seed_count_rows(running, W)
                    pres = np.array(
                        [r.sampling.presence_penalty for _, r in running]
                        + [0.0] * (W - len(running)), np.float32)
                    freq = np.array(
                        [r.sampling.frequency_penalty for _, r in running]
                        + [0.0] * (W - len(running)), np.float32)
                    rep = np.array(
                        [r.sampling.repetition_penalty for _, r in running]
                        + [1.0] * (W - len(running)), np.float32)
                    self._plain_pen = tuple(
                        jnp.asarray(a) for a in (pres, freq, rep)
                    )
                else:
                    self._plain_counts = None
                    self._plain_pen = (None,) * 3
            self._g_tabs, self._g_offs = self._stack_guided_tables(running)
            self._gstate_dev = None
            # harmony-gated rows: bind the gate's special ids and the
            # final-channel byte-DFA the fused program walks (the per-row
            # state is re-seeded in the chain-rebuild block below)
            self._h_specials, self._h_tabs, _ = self._bind_harmony_gate(
                running, W, seed_states=False
            )
            self._hstate_dev = None
            self._samp_key = key
            self._pos_dev = None  # composition changed: rebuild the chain
            self._bt_dev_version = -1  # block tables re-slice to new rows
        W = self._rows_host.shape[0]
        if self._pos_dev is None:
            # any chain invalidation (sync interleave, path switch,
            # preemption) also invalidates the device grammar state — both
            # rebuild from the (now exact) host mirrors together
            self._gstate_dev = None
            self._hstate_dev = None
            positions = np.full((W,), -1, dtype=np.int32)
            ctrs = np.zeros(W, np.int32)
            # in-flight sampled-but-unemitted tokens per (slot, request) —
            # keyed by the REQUEST: a finished request's leftover in-flight
            # steps must not inflate a slot-reusing newcomer's draw counter.
            # _inflight covers both _pending (dispatched, not yet handed to
            # the reader) AND _rb_q bursts (readback not landed or not yet
            # emitted). Missing the latter rebuilt counters too low and
            # replayed the Gumbel stream when a batch-composition change
            # raced a slow tunnel readback (ADVICE r2 high).
            inflight = self._inflight
            for ci, (i, req) in enumerate(running):
                positions[ci] = self.seq_lens[i] - 1
                # draw counter = tokens sampled so far, INCLUDING the not-
                # yet-emitted in-flight ones (same stream as the sync path)
                ctrs[ci] = len(req.output_token_ids) + inflight.get((i, id(req)), 0)
            self._pos_dev = jnp.asarray(positions)
            self._ctr_dev = jnp.asarray(ctrs)
        if guided_present and self._gstate_dev is None:
            # host sessions are exact here: a chain rebuild with guided
            # rows flushed above, and sync interleaves flush before
            # invalidating — assert-grade defensive flush otherwise
            if any(
                self._inflight.get((i, id(r)), 0) for i, r in running
                if r.guided is not None
            ):
                flushed.extend(self._flush_pending())
                self._samp_key = None  # flush may have changed composition
                running = [
                    (i, r) for i, r in enumerate(self.slots) if r is not None
                ]
                if not running:
                    return flushed
                return flushed + self._decode_async_step(running)
            self._gstate_dev = jnp.asarray(
                self._guided_states(running, W, self._g_offs)
            )
            if self._h_specials is not None:
                _, _, self._hstate_dev = self._bind_harmony_gate(running, W)
        if self._bt_dev_version != self._bt_version:
            bt = np.full((W, self.max_blocks), -1, dtype=np.int32)
            act = self._rows_host < S
            bt[act] = self.block_tables[self._rows_host[act]]
            self._bt_dev = jnp.asarray(bt)
            self._bt_dev_version = self._bt_version
        seeds_d, temp_d, top_p_d, top_k_d, min_p_d = self._samp_dev
        if n_lp > 0:
            mode = "lp"
        elif all(r.sampling.temperature <= 0.0 for _, r in running):
            mode = "greedy"
        elif all(
            r.sampling.top_p >= 1.0
            and r.sampling.top_k <= 0
            and r.sampling.min_p <= 0.0
            for _, r in running
        ):
            mode = "plain"
        else:
            mode = "full"
        _t_dispatch = time.time()
        bias_ids_d, bias_vals_d, stop_ids_d, min_toks_d = self._plain_postargs
        pres_d, freq_d, rep_d = self._plain_pen
        g_bits, g_trans, g_bytes = self._g_tabs or (None, None, None)
        ch_trans_d, ch_accept_d = self._h_tabs
        (cache, nxt, payload, self._dev_last_tok, self._pos_dev,
         self._ctr_dev, self._plain_counts,
         self._gstate_dev, self._hstate_dev) = self._decode_fused(
            self.params,
            self.cache,
            self._dev_last_tok,
            self._rows_dev,
            self._pos_dev,
            self._bt_dev,
            seeds_d,
            self._ctr_dev,
            temp_d,
            top_p_d,
            top_k_d,
            min_p_d,
            bias_ids_d, bias_vals_d, stop_ids_d, min_toks_d,
            self._plain_counts, pres_d, freq_d, rep_d,
            g_state=self._gstate_dev, g_bits=g_bits, g_trans=g_trans,
            g_bytes=g_bytes,
            h_state=self._hstate_dev, ch_trans=ch_trans_d,
            ch_accept=ch_accept_d,
            mode=mode,
            post=self._plain_post,
            n_lp=n_lp,
            guided=self._g_tabs is not None,
            h_spec=self._h_specials,
        )
        self.cache = cache
        if self._plain_post == "full":
            self._needs_counts_reseed = True
        self.timer.record("async_dispatch", time.time() - _t_dispatch)
        # start the device->host transfer NOW: by next step's flush the value
        # has already crossed the (tunnel) link, so np.asarray returns
        # immediately instead of paying a full round trip on the critical path
        # (GPT_OSS_NO_COPY_ASYNC=1 disables — A/B lever: on a backend where
        # this call secretly BLOCKS ~an RTT, it taxes every dispatch instead)
        import os as _os

        if not _os.environ.get("GPT_OSS_NO_COPY_ASYNC"):
            try:
                payload.copy_to_host_async()
            except Exception:
                pass  # backend without async host copies: flush pays the RTT
        snapshot = [(ci, i, r) for ci, (i, r) in enumerate(running)]
        self._track_dispatch(snapshot)
        self._pending.append((snapshot, payload))
        for i, _ in running:
            self.seq_lens[i] += 1  # optimistic; _release zeroes on finish
        outputs: List[StepOutput] = list(flushed)
        _t_flush = time.time()
        # snapshots with no live rows cost nothing to drain eagerly
        while self._pending and len(self._pending[0][0]) == 0:
            outputs.extend(self._flush_oldest())
        # burst flush: keep async_depth steps in flight for compute overlap
        # and read the older burst-of-K back as one stacked transfer
        burst = max(1, self.config.scheduler.async_flush_burst)
        if len(self._pending) >= self.async_depth + burst:
            if burst == 1:
                outputs.extend(self._flush_oldest())
            else:
                outputs.extend(self._flush_burst(burst))
        self.timer.record("async_flush", time.time() - _t_flush)
        return outputs

    def _decode_all(self) -> List[StepOutput]:
        truncated = self._grow_all()
        running = [(i, r) for i, r in enumerate(self.slots) if r is not None]
        if not running:
            return truncated + self._flush_pending()
        # BOTH async programs absorb host post-processing on device
        # (logit_bias, min_tokens stop masking, penalties with a chained
        # count state), and BOTH compute OpenAI logprobs in-program (the
        # plain chain's "lp" mode; the spec chain's per-window-position
        # payload rows) — every sampling feature rides the zero-sync
        # pipeline, and speculation composes with logprobs too.
        lp_free = all(r.sampling.logprobs is None for _, r in running)
        # grammar-constrained rows ride the plain zero-sync chain too: the
        # fused program gathers the row's bit-packed mask and advances the
        # DFA by a device byte walk — including harmony-gated sessions,
        # whose final-channel gate transitions on device over the header
        # special ids (serving/guided.py final_channel_tables). Only
        # tool-choice rows (the channel name selects which argument
        # grammar applies — a host transition) and min_tokens>0 rows
        # (stop-suppression can conflict with a grammar-forced stop) take
        # the exact sync path.
        guided_async = all(
            r.guided is None
            or (
                r.sampling.guided_gate in ("none", "harmony")
                and r.sampling.min_tokens == 0
                and getattr(r.guided, "device_gate_ok", False)
            )
            for _, r in running
        )
        # speculation composes with guided rows — including harmony-gated
        # ones: the spec window program chains the channel gate along the
        # draft positions exactly like the grammar DFA, so a guided harmony
        # chat in the batch no longer costs everyone else their drafts
        spec_capable = self.spec_tokens > 0 and guided_async
        use_spec = spec_capable and self._step_counter >= self._spec_off_until
        if self.async_decode and guided_async:
            # plain rows (greedy OR sampled) stay on device: the fused
            # spec program verifies sampled rows by rejection sampling with
            # chained draw counters; greedy rows degrade to longest-prefix
            # inside the same program
            path = "spec" if use_spec else "plain"
            if path != self._async_path:
                # the two chains account positions differently (exact +1 vs
                # optimistic +1+k); drain before switching
                truncated.extend(self._flush_pending())
                self._samp_key = None
                self._pos_dev = None
                if self.spec_tokens > 0:
                    self._hist_chain = None
                    # the spec chain advances tokens only in its history
                    # ring; re-seed the slot-indexed device token array the
                    # plain chain gathers from (host mirror is exact after
                    # the flush)
                    self._dev_last_tok = jnp.asarray(
                        self.last_token.astype(np.int32)
                    )
                self._async_path = path
                running = [
                    (i, r) for i, r in enumerate(self.slots) if r is not None
                ]
                if not running:
                    return truncated
            if use_spec:
                return truncated + self._decode_async_spec_step(running)
            return truncated + self._decode_async_step(running)
        # sync fallback (tool-choice/min_tokens guided rows, or async off):
        # host state must be exact before sampling decisions. Positions
        # advance host-side here, so the device position/counter chain is
        # stale even if the batch composition survives — force a rebuild; a
        # penalized plain chain must also re-seed its count state.
        self.metrics["sync_steps"] = self.metrics.get("sync_steps", 0) + 1
        self._pos_dev = None
        if getattr(self, "_plain_post", "none") == "full":
            self._samp_key = None
        if self.spec_tokens > 0:
            self._hist_chain = None  # sync steps advance history host-side
        truncated.extend(self._flush_pending())
        running = [(i, r) for i, r in enumerate(self.slots) if r is not None]
        if not running:
            return truncated
        if getattr(self, "_needs_counts_reseed", False):
            # the full-post spec chain owned the occurrence counts; re-seed
            # the host-side rows from the (now exact) request contexts
            # before any sync-path penalty sampling reads them
            for i, r in running:
                if r.sampling.has_penalties:
                    ctx = r.prompt_token_ids + r.output_token_ids
                    self.token_counts = self._counts_seed(
                        self._counts(), i, jnp.asarray(ctx, jnp.int32)
                    )
            self._needs_counts_reseed = False
        # prompt-lookup drafts (greedy, no logprobs/penalties rows only)
        drafts: Dict[int, list] = {}
        if self.spec_tokens > 0:
            from gpt_oss_vllm_tpu.engine.spec import propose_ngram

            mm = self.config.scheduler.spec_min_match
            for i, req in running:
                sp = req.sampling
                # greedy rows verify by longest argmax prefix; SAMPLED rows
                # verify by rejection sampling (ops.sampling.spec_verify) —
                # both preserve the request's exact target distribution.
                # Only logits that get post-processed host-side (logprobs,
                # penalties, user logit_bias, stop-masking while min_tokens
                # is unmet) must go through the real sampler path.
                if sp.logprobs is not None or sp.has_penalties:
                    continue
                if sp.logit_bias or len(req.output_token_ids) < sp.min_tokens:
                    continue
                if req.guided is not None:
                    # spec windows would need per-position grammar masks
                    continue
                budget = self.config.scheduler.max_model_len - req.num_tokens - 1
                k = min(self.spec_tokens, max(0, budget))
                d = propose_ngram(
                    req.prompt_token_ids + req.output_token_ids, k, min_match=mm
                )
                if d:
                    drafts[i] = d
        if drafts:
            return truncated + self._decode_spec_step(running, drafts)
        # bucketed program width: compact running rows, not max_num_seqs
        n = len(running)
        W = min(self.num_slots, _next_bucket(max(1, n), 1))
        tokens = np.zeros((W, 1), dtype=np.int32)
        positions = np.full((W, 1), -1, dtype=np.int32)
        bt = np.full((W, self.max_blocks), -1, dtype=np.int32)
        for ci, (i, req) in enumerate(running):
            tokens[ci, 0] = self.last_token[i]
            positions[ci, 0] = self.seq_lens[i] - 1  # position of the new token
            bt[ci] = self.block_tables[i]
        out = self._decode(
            self.params,
            cache=self.cache,
            tokens=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            block_tables=jnp.asarray(bt),
            last_idx=jnp.zeros(W, dtype=jnp.int32),
        )
        self.cache = out.cache
        reqs = [r for _, r in running]
        rows = [i for i, _ in running]
        sampled, lp = self._sample_row(out.logits[:n], reqs, slots=rows)
        if any(r.sampling.has_penalties for r in reqs):
            self.token_counts = self._counts_add(
                self._counts(),
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(sampled, jnp.int32),
            )
        outputs = list(truncated)
        for ri, ((i, req), tok) in enumerate(zip(running, sampled)):
            self.metrics["decode_tokens"] += 1
            slot = req.slot
            step_out = self._append_token(req, int(tok), lp, ri)
            if not step_out.finished:
                self.seq_lens[slot] += 1
                self.last_token[slot] = tok
            outputs.append(step_out)
        if self.async_decode:
            # keep the device token array current so a later async step can
            # resume from this sync one
            self._dev_last_tok = self._dev_set_tok(
                self._dev_last_tok,
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(sampled, jnp.int32),
            )
        return outputs

    def _decode_async_spec_step(self, running) -> List[StepOutput]:
        """Device-chained speculative decode for plain rows (greedy AND
        sampled): drafting, verification (rejection sampling / greedy
        longest-prefix) and history+counter advance happen inside ONE fused
        program (``_decode_spec_async``), so consecutive spec steps need no
        host sync at all — the spec analog of ``_decode_async_step``.
        Emission lags like the plain async path; each flushed entry carries
        [n_drafted | up to 1 + spec_tokens tokens] per row (-1 pads)."""
        K = self._spec_k  # adaptive draft length (may be < spec_tokens)
        L = self.config.scheduler.max_model_len
        # post-processing level of this batch: "full" chains occurrence
        # counts for penalties; "bias" covers logit_bias + min_tokens stop
        # masking; "none" is the plain program (no regression for the
        # common case — separate jit specializations per level)
        if any(r.sampling.has_penalties for _, r in running):
            post = "full"
        elif any(
            r.sampling.logit_bias or r.sampling.min_tokens > 0
            for _, r in running
        ):
            post = "bias"
        else:
            post = "none"
        # logprobs compose with speculation: the window program computes the
        # per-position OpenAI payload when any row asks (n_lp static; rows
        # with logprobs=None just ignore their payload at emission)
        if any(r.sampling.logprobs is not None for _, r in running):
            n_lp = min(
                max(max((r.sampling.logprobs or 0) for _, r in running), 1),
                16,
            )
        else:
            n_lp = 0
        key = (post, K, n_lp) + tuple((i, id(r)) for i, r in running)
        outputs: List[StepOutput] = []
        if key != self._spec_key or self._hist_chain is None:
            # acceptance counts of in-flight steps are host-unknown: bring
            # host state exact before rebuilding the history chain
            outputs.extend(self._flush_pending())
            running = [(i, r) for i, r in enumerate(self.slots) if r is not None]
            if not running:
                return outputs
            key = (post, K, n_lp) + tuple((i, id(r)) for i, r in running)
            W = min(self.num_slots, _next_bucket(max(1, len(running)), 1))
            hist = np.zeros((W, L), dtype=np.int32)
            hlen = np.zeros(W, dtype=np.int32)
            rows = np.full(W, self.num_slots, dtype=np.int32)
            ctrs = np.zeros(W, np.int32)
            seeds = np.zeros(W, np.int32)
            temp = np.zeros(W, np.float32)
            top_p = np.ones(W, np.float32)
            top_k = np.zeros(W, np.int32)
            min_p = np.zeros(W, np.float32)
            # post-processing state (logit_bias / stop-mask-under-min_tokens
            # / penalty counts); pad rows keep neutral values
            M = max(
                [len(r.sampling.logit_bias or ()) for _, r in running] + [1]
            )
            S = max(
                [len(r.sampling.stop_token_ids) for _, r in running] + [1]
            )
            bias_ids = np.full((W, M), -1, np.int32)
            bias_vals = np.zeros((W, M), np.float32)
            stop_ids = np.full((W, S), -1, np.int32)
            min_toks = np.zeros(W, np.int32)
            # per-row KV-write position cap: a request never legitimately
            # writes KV at positions >= prompt + max_tokens (tokens there are
            # discarded at emission), >= max_model_len, or past its block
            # table's capacity — in-flight zombie steps past a finish are
            # masked to dropped writes on device (ADVICE r3 medium)
            pos_cap = np.zeros(W, np.int32)
            table_cap = self.max_blocks * self.block_size
            for ci, (i, req) in enumerate(running):
                ctx = req.prompt_token_ids + req.output_token_ids
                hist[ci, : len(ctx)] = ctx
                hlen[ci] = len(ctx)
                rows[ci] = i
                pos_cap[ci] = min(
                    req.num_prompt_tokens + req.sampling.max_tokens,
                    L, table_cap,
                )
                sp = req.sampling
                # host state is exact (flushed above): the draw-counter
                # chain starts at tokens-emitted and advances by n_emit
                # on device — identical to the sync path's reseed
                ctrs[ci] = len(req.output_token_ids)
                seeds[ci] = req.seed_resolved
                temp[ci] = sp.temperature
                top_p[ci] = sp.top_p
                top_k[ci] = sp.top_k
                min_p[ci] = sp.min_p
                for j, (t, v) in enumerate(sp.logit_bias or ()):
                    bias_ids[ci, j], bias_vals[ci, j] = t, v
                stop_ids[ci, : len(sp.stop_token_ids)] = sp.stop_token_ids
                min_toks[ci] = sp.min_tokens
            self._hist_chain = jnp.asarray(hist)
            self._hlen_chain = jnp.asarray(hlen)
            self._spec_ctr = jnp.asarray(ctrs)
            self._spec_cap = jnp.asarray(pos_cap)
            self._spec_samp = tuple(
                jnp.asarray(a) for a in (seeds, temp, top_p, top_k, min_p)
            )
            self._spec_post = post
            if post == "none":
                self._spec_postargs = (None,) * 4
                self._spec_counts = None
                self._spec_pen = (None,) * 3
            else:
                self._spec_postargs = tuple(
                    jnp.asarray(a) for a in (bias_ids, bias_vals, stop_ids, min_toks)
                )
                if post == "full":
                    # occurrence-count chain rows seeded from exact host ctx
                    self._spec_counts = self._seed_count_rows(running, W)
                    pres = np.array(
                        [r.sampling.presence_penalty for _, r in running]
                        + [0.0] * (W - len(running)), np.float32)
                    freq = np.array(
                        [r.sampling.frequency_penalty for _, r in running]
                        + [0.0] * (W - len(running)), np.float32)
                    rep = np.array(
                        [r.sampling.repetition_penalty for _, r in running]
                        + [1.0] * (W - len(running)), np.float32)
                    self._spec_pen = tuple(
                        jnp.asarray(a) for a in (pres, freq, rep)
                    )
                else:
                    self._spec_counts = None
                    self._spec_pen = (None,) * 3
            # guided rows on the spec chain: tables + states seeded here
            # (host sessions are exact — this branch flushed above)
            self._spec_gtabs, self._spec_goffs = self._stack_guided_tables(
                running
            )
            self._spec_gstate = (
                jnp.asarray(self._guided_states(running, W, self._spec_goffs))
                if self._spec_gtabs is not None else None
            )
            (self._spec_hspec, self._spec_htabs,
             self._spec_hstate) = self._bind_harmony_gate(running, W)
            self._rows_host = rows
            self._spec_key = key
            self._samp_key = None  # plain-async chain must rebuild too
            self._pos_dev = None
            self._bt_dev_version = -1
        W = self._hist_chain.shape[0]
        if self._bt_dev_version != self._bt_version:
            bt = np.full((W, self.max_blocks), -1, dtype=np.int32)
            act = self._rows_host < self.num_slots
            bt[act] = self.block_tables[self._rows_host[act]]
            self._bt_dev = jnp.asarray(bt)
            self._bt_dev_version = self._bt_version
        _t = time.time()
        seeds_d, temp_d, top_p_d, top_k_d, min_p_d = self._spec_samp
        bias_ids_d, bias_vals_d, stop_ids_d, min_toks_d = self._spec_postargs
        pres_d, freq_d, rep_d = self._spec_pen
        sg_bits, sg_trans, sg_bytes = self._spec_gtabs or (None, None, None)
        sh_trans, sh_accept = self._spec_htabs
        (cache, emitted, self._hist_chain, self._hlen_chain, self._spec_ctr,
         self._spec_counts, self._spec_gstate,
         self._spec_hstate) = self._decode_spec_async(
            self.params, self.cache, self._hist_chain, self._hlen_chain,
            self._bt_dev, self._spec_cap, seeds_d, self._spec_ctr,
            temp_d, top_p_d, top_k_d, min_p_d,
            bias_ids_d, bias_vals_d, stop_ids_d, min_toks_d,
            self._spec_counts, pres_d, freq_d, rep_d,
            g_state=self._spec_gstate, g_bits=sg_bits, g_trans=sg_trans,
            g_bytes=sg_bytes,
            h_state=self._spec_hstate, ch_trans=sh_trans,
            ch_accept=sh_accept,
            post=self._spec_post, K=K, n_lp=n_lp,
            guided=self._spec_gtabs is not None,
            h_spec=self._spec_hspec,
        )
        self.cache = cache
        if self._spec_post == "full":
            # the device chain now owns the occurrence counts; host-side
            # token_counts rows for these requests are stale until re-seeded
            # (sync-path transition below)
            self._needs_counts_reseed = True
        self.timer.record("async_dispatch", time.time() - _t)
        import os as _os

        if not _os.environ.get("GPT_OSS_NO_COPY_ASYNC"):
            try:
                emitted.copy_to_host_async()
            except Exception:
                pass
        snapshot = [(ci, i, r) for ci, (i, r) in enumerate(running)]
        self._track_dispatch(snapshot)
        self._pending.append((snapshot, emitted))
        for i, req in running:
            # optimistic upper bound (actual advance is n_acc+1, host-
            # unknown until flush); emission resets to the exact count.
            # Cap at the request's own maximum — tokens past max_tokens are
            # discarded at emission and their (dropped, bt=-1) KV writes
            # never matter, so blocks are never needed for them
            cap = req.num_prompt_tokens + req.sampling.max_tokens
            self.seq_lens[i] = min(self.seq_lens[i] + 1 + K, max(cap, self.seq_lens[i]))
        while self._pending and len(self._pending[0][0]) == 0:
            outputs.extend(self._flush_oldest())
        burst = max(1, self.config.scheduler.async_flush_burst)
        if len(self._pending) >= self.async_depth + burst:
            if burst == 1:
                outputs.extend(self._flush_oldest())
            else:
                outputs.extend(self._flush_burst(burst))
        return outputs

    def _decode_spec_step(self, running, drafts: Dict[int, list]) -> List[StepOutput]:
        """One widened decode step: feed [last_token, draft...] per drafted
        row, verify on-device — greedy rows by longest argmax prefix, sampled
        rows by rejection sampling against their exact target distribution
        (ops.sampling.spec_verify) — and emit the accepted prefix + the
        residual/bonus token. Non-drafted rows ride along at window position
        0 and emit exactly one token through the normal sampler."""
        # bucketed program width: compact running rows, not max_num_seqs
        n = len(running)
        B = min(self.num_slots, _next_bucket(max(1, n), 1))
        ci_of = {i: ci for ci, (i, _) in enumerate(running)}
        # constant window width: one jitted program regardless of this
        # step's actual draft lengths (pads are dropped writes + masked)
        W = 1 + self.spec_tokens
        tokens = np.zeros((B, W), dtype=np.int32)
        positions = np.full((B, W), -1, dtype=np.int32)
        bt = np.full((B, self.max_blocks), -1, dtype=np.int32)
        d_tok = np.zeros((B, W), dtype=np.int32)
        d_len = np.zeros(B, dtype=np.int32)
        seeds = np.zeros(B, np.int32)
        ctrs = np.zeros(B, np.int32)
        temp = np.zeros(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_k = np.zeros(B, np.int32)
        min_p = np.zeros(B, np.float32)
        for i, req in running:
            ci = ci_of[i]
            p = self.seq_lens[i] - 1
            tokens[ci, 0] = self.last_token[i]
            positions[ci, 0] = p
            bt[ci] = self.block_tables[i]
            d = drafts.get(i, [])
            if d:
                tokens[ci, 1 : 1 + len(d)] = d
                positions[ci, 1 : 1 + len(d)] = p + 1 + np.arange(len(d))
            d_len[ci] = len(d)
            d_tok[ci, : len(d)] = d
            sp = req.sampling
            seeds[ci] = req.seed_resolved
            ctrs[ci] = len(req.output_token_ids)
            temp[ci] = sp.temperature
            top_p[ci] = sp.top_p
            top_k[ci] = sp.top_k
            min_p[ci] = sp.min_p
        cache, both, logits0 = self._decode_spec_fused(
            self.params,
            self.cache,
            jnp.asarray(tokens),
            jnp.asarray(positions),
            jnp.asarray(bt),
            jnp.zeros(B, dtype=jnp.int32),
            jnp.asarray(d_tok),
            jnp.asarray(d_len),
            jnp.asarray(seeds),
            jnp.asarray(ctrs),
            jnp.asarray(temp),
            jnp.asarray(top_p),
            jnp.asarray(top_k),
            jnp.asarray(min_p),
        )
        self.cache = cache
        both_h = np.asarray(both)  # ONE [2, B] transfer: n_acc row 0, final row 1
        n_acc, final = both_h[0], both_h[1]
        # non-drafted rows sample from window position 0 (real sampler: they
        # may be temperature/top-p/logprobs/penalty requests)
        plain = [(i, r) for i, r in running if i not in drafts]
        lp = None
        if plain:
            p_rows = [i for i, _ in plain]
            p_cis = [ci_of[i] for i, _ in plain]
            p_reqs = [r for _, r in plain]
            sampled, lp = self._sample_row(
                logits0[np.asarray(p_cis)], p_reqs, slots=p_rows
            )
            if any(r.sampling.has_penalties for r in p_reqs):
                self.token_counts = self._counts_add(
                    self.token_counts,
                    jnp.asarray(p_rows, jnp.int32),
                    jnp.asarray(sampled, jnp.int32),
                )
        outputs: List[StepOutput] = []
        plain_pos = {i: ri for ri, (i, _) in enumerate(plain)}
        for i, req in running:
            slot = req.slot
            if i in drafts:
                k_acc = int(n_acc[ci_of[i]])
                emitted = list(drafts[i][:k_acc]) + [int(final[ci_of[i]])]
                self.metrics["spec_proposed"] += len(drafts[i])
                self.metrics["spec_accepted"] += k_acc
            else:
                emitted = [int(sampled[plain_pos[i]])]
            for tok in emitted:
                self.metrics["decode_tokens"] += 1
                step_out = self._append_token(
                    req, int(tok), lp if i in plain_pos else None, plain_pos.get(i, 0)
                )
                outputs.append(step_out)
                if step_out.finished:
                    break
                self.seq_lens[slot] += 1
                self.last_token[slot] = tok
        return outputs

    def step(self) -> List[StepOutput]:
        """One engine iteration: admit (prefill) then decode all running."""
        outputs: List[StepOutput] = []
        self.metrics["steps"] += 1
        if self.waiting:
            t0 = time.time()
            admitted = self._admit_some()
            if admitted:
                self.timer.record("prefill", time.time() - t0)
            outputs.extend(admitted)
        t0 = time.time()
        decoded = self._decode_all()
        if decoded:
            self.timer.record("decode", time.time() - t0)
        outputs.extend(decoded)
        self._step_counter += 1
        return outputs

    # -- convenience -------------------------------------------------------

    def generate(
        self, prompts: List[List[int]], sampling: SamplingParams
    ) -> List[List[int]]:
        """Blocking batch generation (the in-process ``vllm.LLM`` analog,
        reference ``smoke_test.py:30-82``)."""
        base = self._step_counter
        ids = [f"gen-{base}-{i}" for i in range(len(prompts))]
        for rid, p in zip(ids, prompts):
            self.add_request(rid, p, sampling)
        pending = set(ids)
        while self.has_work() and pending:
            for out in self.step():
                if out.finished and out.request_id in pending:
                    pending.discard(out.request_id)
        if not any(s is not None for s in self.slots):
            # drain in-flight async steps / burst readbacks of the finished
            # batch so the engine is left idle (has_work() == False); when
            # other requests still run, their tokens stay queued for step()
            self._flush_pending()
        return [self.requests[rid].output_token_ids for rid in ids]
