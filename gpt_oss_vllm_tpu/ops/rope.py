"""Rotary position embeddings with YaRN/NTK-by-parts long-context scaling.

GPT-OSS ships RoPE with NTK alpha/beta parameters (visible in the reference's
fixture config, ``test_router_dtype.py:18-27``); the semantics implemented
here are the YaRN scheme (Peng et al. 2023): per-frequency blend between
position interpolation and extrapolation over a ramp [low, high] in dimension
index, plus a log-scaled attention "concentration" factor. Rotation uses the
half-split (NeoX) convention.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from gpt_oss_vllm_tpu.config import ModelConfig


def yarn_rope_tables(cfg: ModelConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given absolute positions.

    positions: int array [...]; returns (cos, sin) each [..., head_dim//2] f32.
    """
    d_half = cfg.head_dim // 2
    # freq_i = theta^(2i/d)
    freq = cfg.rope_theta ** (2.0 * jnp.arange(0, d_half, dtype=jnp.float32) / cfg.head_dim)
    if cfg.rope_scaling_factor > 1.0:
        concentration = 0.1 * math.log(cfg.rope_scaling_factor) + 1.0
        low = (
            d_half
            * math.log(cfg.original_context_length / (cfg.rope_ntk_beta * 2 * math.pi))
            / math.log(cfg.rope_theta)
        )
        high = (
            d_half
            * math.log(cfg.original_context_length / (cfg.rope_ntk_alpha * 2 * math.pi))
            / math.log(cfg.rope_theta)
        )
        interpolation = 1.0 / (cfg.rope_scaling_factor * freq)
        extrapolation = 1.0 / freq
        ramp = jnp.clip(
            (jnp.arange(d_half, dtype=jnp.float32) - low) / max(high - low, 1e-3), 0.0, 1.0
        )
        mask = 1.0 - ramp
        inv_freq = interpolation * (1.0 - mask) + extrapolation * mask
    else:
        concentration = 1.0
        inv_freq = 1.0 / freq
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., d_half]
    return jnp.cos(angles) * concentration, jnp.sin(angles) * concentration


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate head vectors; x [..., n_heads, head_dim], cos/sin [..., head_dim//2].

    Half-split convention: (x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin).
    """
    d_half = x.shape[-1] // 2
    x1, x2 = x[..., :d_half], x[..., d_half:]
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    o1 = x1f * c - x2f * s
    o2 = x2f * c + x1f * s
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
