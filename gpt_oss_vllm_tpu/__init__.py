"""gpt_oss_vllm_tpu — a TPU-native quantized-inference framework for GPT-OSS MoE models.

A brand-new JAX / XLA / Pallas / pjit engine with the capabilities demonstrated by
the ``toddllm/gpt-oss-vllm`` reference (an RTX-3090 patch overlay on vLLM; see
SURVEY.md): serving GPT-OSS-style sparse-MoE models from Unsloth/BitsAndBytes NF4
double-quantized 4-bit checkpoints, rebuilt TPU-first rather than ported.

Subpackages
-----------
- ``quant``      — NF4 numerics: codebook, blockwise absmax, double quantization.
- ``checkpoint`` — Unsloth-format reader, streaming offline converter, native pytree
                   checkpoint IO (replaces the reference's 15-20 min per-boot
                   CPU-dequant pipeline, reference ``streaming_unsloth_bnb.py``).
- ``models``     — GPT-OSS model family (attention sinks + alternating sliding
                   window implemented natively; the reference disables them,
                   ``patch_3_disable_sinks.py``).
- ``ops``        — Pallas TPU kernels: fused NF4-dequant matmul, grouped-expert
                   MoE matmul, flash attention, paged-attention decode; plus
                   pure-XLA reference paths.
- ``parallel``   — device mesh + GSPMD shardings (data / expert / model axes).
- ``engine``     — paged KV cache, continuous-batching scheduler, inference engine.
- ``serving``    — OpenAI-compatible HTTP API (/v1/models, /v1/completions,
                   /v1/chat/completions with SSE streaming).
- ``training``   — sharded training step (next-token CE + optax) used by the
                   multi-chip dry-run and for fine-tuning parity.
"""

from gpt_oss_vllm_tpu.version import __version__

__all__ = ["__version__"]
