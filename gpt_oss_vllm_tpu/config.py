"""Typed configuration for the whole framework.

The reference spreads configuration across three uncoordinated mechanisms —
argparse CLIs, environment variables, and pass-through vLLM flags (reference
``gpt_oss_server.py:12-26``, ``launch_vllm.sh:15-35``) — plus hardcoded dims as
module constants (``streaming_unsloth_bnb.py:240-242``). Here everything lives in
one tree of frozen dataclasses: model / quantization / parallelism / cache /
scheduler / serving, with a CLI overlay in ``serving.api_server``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """GPT-OSS architecture hyperparameters.

    Defaults are GPT-OSS-20B as encoded by the reference checkpoint facts
    (SURVEY.md §2.2; reference ``validate_conversion.py:18-24``,
    ``test_router_dtype.py:15-48``) reconciled with the upstream
    ``openai/gpt-oss-20b`` config: 24 layers, 32 experts, top-4 routing,
    hidden 2880, intermediate 2880 ("square MLP" — the Unsloth BnB variant,
    reference ``unsloth_direct_loader.py:92-94``), attention sinks, and an
    alternating-layer sliding window (disabled by the reference on FA2
    hardware, ``patch_3_disable_sinks.py:27-41``; implemented natively here).
    """

    name: str = "gpt-oss-20b"
    vocab_size: int = 201_088
    hidden_size: int = 2880
    num_layers: int = 24
    num_heads: int = 64
    num_kv_heads: int = 8
    head_dim: int = 64
    # MoE
    num_experts: int = 32
    experts_per_token: int = 4
    intermediate_size: int = 2880
    # "swiglu_oai": the upstream GPT-OSS clamped-SwiGLU
    #   glu = gate * sigmoid(alpha * gate); out = (up + 1) * glu, with +-limit clamps.
    # "silu_glu": plain silu(gate) * up — the reference's MoE forward semantics
    #   (reference ``unsloth_to_vllm_converter.py:309-321``).
    activation: str = "swiglu_oai"
    swiglu_alpha: float = 1.702
    swiglu_limit: float = 7.0
    router_bias: bool = True
    expert_bias: bool = True  # Unsloth ckpt carries sibling `.bias` keys
    #                           (reference ``unsloth_bnb_loader.py:196-227``)
    # Attention
    attention_bias: bool = True
    use_sinks: bool = True  # per-head learned sink logits
    sliding_window: int = 128
    # layer i uses sliding window iff i % 2 == 0 ("Only apply sliding window to
    # every other layer", anchor text in reference ``patch_3_disable_sinks.py:17``)
    sliding_window_pattern: int = 2
    max_position_embeddings: int = 131_072
    # RoPE with YaRN/NTK scaling (reference fixture passes NTK alpha/beta,
    # ``test_router_dtype.py:18-27``)
    rope_theta: float = 150_000.0
    rope_scaling_factor: float = 32.0
    rope_ntk_alpha: float = 1.0
    rope_ntk_beta: float = 32.0
    original_context_length: int = 4096
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"  # non-quantized compute dtype (TPU-native; kills the
    #                          reference's FP16/BF16 router crash, STATUS.md:6)
    # fp32 router logits for routing determinism (SURVEY.md §7)
    router_logits_fp32: bool = True

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    def layer_uses_sliding_window(self, layer_idx: int) -> bool:
        if self.sliding_window is None or self.sliding_window <= 0:
            return False
        return layer_idx % self.sliding_window_pattern == 0

    @staticmethod
    def gpt_oss_120b(**overrides) -> "ModelConfig":
        """GPT-OSS-120B: same width as 20B, deeper and wider-MoE (36 layers,
        128 experts; ~117B total / ~5.1B active). The BASELINE.json stretch
        config (v5p-16 multi-host expert parallel); num_experts=128 shards
        evenly over ep in {2,4,8,16}."""
        base = dict(name="gpt-oss-120b", num_layers=36, num_experts=128)
        base.update(overrides)
        return ModelConfig(**base)

    @staticmethod
    def tiny(**overrides) -> "ModelConfig":
        """A structurally-complete tiny config for tests — the
        ``test_router_dtype.py:15-48`` fixture pattern, made real."""
        base = dict(
            name="gpt-oss-tiny",
            vocab_size=512,
            hidden_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=32,
            num_experts=8,
            experts_per_token=2,
            intermediate_size=128,
            sliding_window=16,
            max_position_embeddings=1024,
            original_context_length=256,
        )
        base.update(overrides)
        return ModelConfig(**base)


@dataclass(frozen=True)
class QuantConfig:
    """NF4 weight-only quantization of MoE expert projections.

    Quantization partition (reference ``gpt_oss_moe_architecture.md:12-26``,
    ``validate_conversion.py:87-114``): only the num_layers x num_experts x 3
    expert projection matrices are 4-bit; router, attention, embeddings and
    lm_head stay in full (bf16) precision.
    """

    # "nf4" (the reference's BnB format) | "mxfp4" (GPT-OSS's native OCP FP4
    # checkpoint format, which the reference had to override away —
    # ``patch_4_override_quant.py:26-41``) | "none" (dense bf16)
    method: str = "nf4"
    blocksize: int = 0  # 0 = format default (nf4: 64, mxfp4: 32)
    double_quant: bool = True  # absmax itself 8-bit quantized (nf4 only)
    nested_blocksize: int = 256
    scale_dtype: str = "float32"
    # compute path for the quantized matmuls: "pallas" fused dequant-matmul
    # kernels, or "xla" dequant-then-matmul (correctness reference)
    backend: str = "pallas"
    # per-row symmetric int8 vocab table (tied embedding + lm_head): halves
    # the decode step's largest fixed read (the ~1.16 GB bf16 table) and
    # frees ~0.58 GB HBM, at ~0.2%-of-row-max rounding (quant/vocab8.py).
    # Opt-in: extends the reference's expert-only quantization partition.
    vocab_int8: bool = False

    @property
    def enabled(self) -> bool:
        return self.method != "none"

    @property
    def effective_blocksize(self) -> int:
        if self.blocksize:
            return self.blocksize
        return 32 if self.method == "mxfp4" else 64


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh axes (SURVEY.md §2.4).

    dp — replica axis over batches; ep — experts sharded across chips with
    all-to-all dispatch riding ICI; tp — attention heads / fused projections
    sharded (GSPMD); collectives are emitted by pjit/shard_map, no external
    comm library (the NCCL row of SURVEY.md §2.3).
    """

    dp: int = 1
    ep: int = 1
    tp: int = 1
    # slices connected over DCN (multi-host): the data axis factors as
    # dcn_dp x (dp // dcn_dp) with the DCN factor OUTERMOST, so ep/tp
    # collectives (all-to-all, reduce-scatter) ride ICI within a slice and
    # only gradient/replica traffic crosses hosts (SURVEY.md §2.3 NCCL row)
    dcn_dp: int = 1
    # MoE dispatch under an expert-sharded mesh:
    #   "implicit" — tokens replicated over the expert axes, per-shard gmm +
    #     psum combine (weight bytes stay put; right for decode-sized T);
    #   "a2a"      — explicit capacity-bucketed ``lax.all_to_all`` token
    #     dispatch (ops.moe_ep): activation bytes travel instead of logits
    #     being psum-combined — the memory/bandwidth-scalable form for big
    #     prefill batches and multi-host EP (SURVEY.md §2.4, "core of the
    #     multi-host config").
    moe_dispatch: str = "implicit"
    # a2a per-destination send capacity factor; <= 0 = lossless (factor=ep,
    # bit-exact vs the implicit path), > 0 trades exactness on hot experts
    # for bounded buffers (standard MoE overflow-drop semantics)
    ep_capacity_factor: float = 0.0

    @property
    def world_size(self) -> int:
        return self.dp * self.ep * self.tp


@dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache geometry (replaces the substrate vLLM block manager)."""

    block_size: int = 16  # tokens per KV block
    num_blocks: int = 2048  # total blocks in the pool (per shard)
    max_blocks_per_seq: int = 512
    # "bfloat16" (exact vs the no-cache oracle) or "fp8" (float8_e4m3fn):
    # half the KV memory and half the paged-attention HBM traffic at long
    # context, at ~2-decimal-digit K/V precision — the TPU-native analog of
    # vLLM's --kv-cache-dtype fp8 (scalar scale 1.0; e4m3's +-448 range
    # covers post-RoPE K and V magnitudes without per-token scaling)
    dtype: str = "bfloat16"

    @property
    def jax_dtype(self):
        import jax.numpy as jnp

        return jnp.dtype({"fp8": "float8_e4m3fn"}.get(self.dtype, self.dtype))
    # radix-style prompt-prefix KV reuse via the native C++ block manager
    # (falls back to the plain free-list allocator if the library is absent)
    enable_prefix_caching: bool = True


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching scheduler limits."""

    max_num_seqs: int = 64  # decode batch width
    max_model_len: int = 4096  # vs the reference's memory-starved 128-2048
    #                            (reference ``gpt_oss_server.py:17``)
    prefill_chunk: int = 512  # chunked-prefill token budget per step
    # adaptive admission: the effective chunk budget scales with the
    # WAITING-queue depth up to this cap — measured on chip at c=32,
    # 2048-token chunks pack more admissions per expert-weight sweep
    # (+9% aggregate tok/s, p99 TTFT halved, docs/STATUS.md r3) while a
    # lone newcomer keeps the small chunk (bounded inter-token stalls for
    # running streams). Set equal to prefill_chunk to disable.
    prefill_chunk_max: int = 2048
    max_queue: int = 1024
    # prompt-lookup speculative decoding (engine/spec.py): max draft tokens
    # verified per step (0 = off). Applies to greedy requests without
    # logprobs/penalties; others decode normally in the same batch.
    spec_tokens: int = 0
    spec_min_match: int = 2
    # Overlapped-readback decode: sampling stays on-device and feeds the
    # next step's input directly; the host reads step k's tokens back WHILE
    # later steps compute (vLLM v1's async output processing). Removes the
    # per-step device->host sync from the decode critical path — on this
    # build's tunnel-attached chip that sync alone costs ~two step times.
    # Emissions (stop checks, streaming) lag up to async_depth steps.
    # Per-step fallback to the sync path when a running request needs
    # host-side sampling (logprobs / penalties / logit_bias / min_tokens
    # masking); ignored entirely when spec_tokens > 0.
    async_decode: bool = True
    # in-flight decode steps before the oldest is read back: 1 hides host
    # bookkeeping only; deeper hides readback latency of up to
    # depth * step_time (a tunnel/DCN-attached host wants 4-8; a local
    # PCIe host needs only 1-2). Finished requests waste at most
    # async_depth trailing steps.
    async_depth: int = 2
    # tokens are read back in BURSTS of this many steps, stacked on device
    # into one array first — one device->host round trip per burst instead
    # of per step (measured on the tunnel-attached chip: ~14 ms/step of
    # readback tax at burst 1 even with async copies; a burst of 8 cuts it
    # to ~2-3 ms/step). Emission lag grows to async_depth + burst steps, so
    # the default stays 1 (per-step streaming granularity); throughput
    # serving on a high-latency link opts into 4-8.
    async_flush_burst: int = 1


@dataclass(frozen=True)
class ServingConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    served_model_name: str = "gpt-oss-20b"
    tokenizer: str = "o200k_base"  # tiktoken encoding, or an HF tokenizer path
    log_requests: bool = True


@dataclass(frozen=True)
class EngineConfig:
    """The root config object."""

    model: ModelConfig = field(default_factory=ModelConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    seed: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "EngineConfig":
        d = json.loads(s)
        return EngineConfig(
            model=ModelConfig(**d.get("model", {})),
            quant=QuantConfig(**d.get("quant", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
            cache=CacheConfig(**d.get("cache", {})),
            scheduler=SchedulerConfig(**d.get("scheduler", {})),
            serving=ServingConfig(**d.get("serving", {})),
            seed=d.get("seed", 0),
        )

    @staticmethod
    def tiny(**model_overrides) -> "EngineConfig":
        return EngineConfig(
            model=ModelConfig.tiny(**model_overrides),
            cache=CacheConfig(block_size=8, num_blocks=128, max_blocks_per_seq=32),
            scheduler=SchedulerConfig(max_num_seqs=8, max_model_len=256, prefill_chunk=64),
        )
