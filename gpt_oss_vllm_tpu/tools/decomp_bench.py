"""Decode-step component decomposition on the attached chip.

Times the same N-layer decode program with individual per-layer components
replaced by zeros (monkeypatched before jit), all within one process so the
param generation and chip variance are shared. The difference (full -
variant) is that component's per-step cost — the measurement behind the
per-layer cost model in docs/STATUS.md.

Variants:
  full        the production step
  noattn      attention block -> zeros (residual stream untouched)
  attnproj    qkv + rope + kv write + o-proj kept; context read + softmax
              attention skipped (isolates the projections from the KV math)
  nomoe       MoE block -> zeros
  routeronly  router+top-k kept, expert compute skipped

Usage: python -m gpt_oss_vllm_tpu.tools.decomp_bench --layers 4 \
           --variants full,noattn [--quant nf4]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gpt_oss_tpu_jit_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gpt_oss_vllm_tpu.utils.platform import ensure_platform

ensure_platform()

import gpt_oss_vllm_tpu.engine.step as step_mod
from gpt_oss_vllm_tpu.config import CacheConfig, ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.models.params import fuse_qkv, random_params_on_device


def _attn_proj_only(p, cfg, layer_idx, x, positions, cache, block_tables, backend, mesh=None, **kw):
    """qkv+rope+write+o without the context read / attention math."""
    from gpt_oss_vllm_tpu.engine.kv_cache import slot_mapping, write_kv
    from gpt_oss_vllm_tpu.ops.linear import dense_linear
    from gpt_oss_vllm_tpu.ops.rope import apply_rope, yarn_rope_tables

    B, T, H = x.shape
    qkv = dense_linear(x, p.wqkv, p.bqkv)
    q, k, v = jnp.split(qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    safe_pos = jnp.maximum(positions, 0)
    cos, sin = yarn_rope_tables(cfg, safe_pos)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    slots = slot_mapping(block_tables, positions, cache.block_size)
    cache = write_kv(cache, layer_idx, k, v, slots)
    out = q.reshape(B, T, cfg.q_size)
    return dense_linear(out, p.wo, p.bo), cache


def apply_variant(name: str):
    if name.startswith("full"):  # fullN repeats gauge run-to-run variance
        return
    if name == "noattn":
        def fake_attn(p, cfg, li, x, positions, cache, bt, backend, mesh=None, **kw):
            return jnp.zeros_like(x), cache

        step_mod._cached_attention = fake_attn
    elif name == "attnproj":
        step_mod._cached_attention = _attn_proj_only
    elif name == "nomoe":
        def fake_moe(x, rw, rb, *a, **k):
            return jnp.zeros_like(x)

        step_mod.moe_block = fake_moe
    elif name == "routeronly":
        from gpt_oss_vllm_tpu.ops.moe import route_topk

        def router_moe(x, rw, rb, wgu, bgu, wdn, bdn, cfg, **k):
            r = route_topk(x, rw, rb, cfg.experts_per_token)
            # keep a data dependency so the router isn't dead-code-eliminated
            return jnp.zeros_like(x) + r.weights.sum().astype(x.dtype) * 0
        step_mod.moe_block = router_moe
    elif name == "xlarouter":
        # swap the fused router kernel back to the XLA top_k chain
        import gpt_oss_vllm_tpu.ops.router as rt
        from gpt_oss_vllm_tpu.ops.moe import route_topk

        def _fallback(x, w, b, k, interpret=False):
            r = route_topk(x, w, b, k)
            return r.weights, r.indices

        rt.router_topk_pallas = _fallback
    elif name == "cheaplut":
        # replace the 4-bit codebook polynomial with a raw int->f32 cast:
        # (full - cheaplut) isolates the in-kernel dequant VPU chain
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm

        cheap = lambda idx, codebook="nf4": idx.astype(jnp.float32)
        gm._lut = cheap
        ff._lut = cheap
    elif name == "bf16lut":
        # NF4 polynomial evaluated in bf16 instead of f32 (timing probe for
        # the VPU's bf16 rate; numerically ~1% off, NOT a production mode)
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm
        from gpt_oss_vllm_tpu.ops.nf4_matmul import _NF4_POLY_NEG, _NF4_POLY_POS

        def lut_bf16(idx, codebook="nf4"):
            t = (idx & 7).astype(jnp.bfloat16) - jnp.bfloat16(3.5)

            def horner(cs):
                acc = jnp.full(t.shape, cs[0], jnp.bfloat16)
                for c in cs[1:]:
                    acc = acc * t + jnp.bfloat16(c)
                return acc

            return jnp.where(idx >= 8, horner(_NF4_POLY_POS), horner(_NF4_POLY_NEG))

        gm._lut = lut_bf16
        ff._lut = lut_bf16
    elif name in ("fp4sign", "fp4twohalf"):
        # alternative FP4 sign handling (timing probes for the in-kernel
        # fp4-lut slowness): multiply-by-sign vs nf4-style two-half select
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm
        from gpt_oss_vllm_tpu.ops.nf4_matmul import _FP4_MAG_POLY, _horner_eo, _lut_nf4

        neg_coefs = tuple(-c for c in _FP4_MAG_POLY)

        def lut_sign(idx, codebook="mxfp4"):
            if codebook == "nf4":
                return _lut_nf4(idx)
            t = (idx & 7).astype(jnp.float32) - 3.5
            acc = _horner_eo(_FP4_MAG_POLY, t, t * t)
            sign = 1.0 - 2.0 * ((idx >> 3).astype(jnp.float32))
            return acc * sign

        def lut_twohalf(idx, codebook="mxfp4"):
            if codebook == "nf4":
                return _lut_nf4(idx)
            t = (idx & 7).astype(jnp.float32) - 3.5
            u = t * t
            return jnp.where(
                idx >= 8, _horner_eo(neg_coefs, t, u), _horner_eo(_FP4_MAG_POLY, t, u)
            )

        f = lut_sign if name == "fp4sign" else lut_twohalf
        gm._lut = f
        ff._lut = f
    elif name == "nf4poly":
        # the superseded degree-7 two-half Horner NF4 decode (production is
        # now the int select tree, ops.nf4_matmul._lut_nf4) — A/B baseline
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm
        from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut_fp4, _lut_nf4_poly

        def lut_poly(idx, codebook="nf4"):
            if codebook == "mxfp4":
                return _lut_fp4(idx)
            return _lut_nf4_poly(idx)

        gm._lut = lut_poly
        ff._lut = lut_poly
    elif name == "fp4bits":
        # pure-integer bit-assembly E2M1 decode: ~10 int ops, no fma chain.
        # E2M1 maps onto the f32 bit layout: for mag codes >= 2 the value is
        # bitcast((mag + 252) << 22) (exponent rebias +126 lands exactly);
        # codes 0/1 are 0 and 0.5 = (code&1) * 0x3F000000 as raw bits; sign
        # is bit 3 shifted to bit 31. Verified exact vs FP4_CODE incl -0.0.
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm
        from gpt_oss_vllm_tpu.ops.nf4_matmul import _lut_nf4

        def lut_bits(idx, codebook="mxfp4"):
            if codebook == "nf4":
                return _lut_nf4(idx)
            mag = idx & 7
            normal = (mag + 252) << 22
            small = (idx & 1) * 0x3F000000
            bits = jnp.where(mag < 2, small, normal) | ((idx & 8) << 28)
            return jax.lax.bitcast_convert_type(bits, jnp.float32)

        gm._lut = lut_bits
        ff._lut = lut_bits
    elif name == "fp4ilp4":
        # 4-way odd/even split: four degree-1 chains in w = t^4 (max ILP)
        import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
        import gpt_oss_vllm_tpu.ops.moe_gmm as gm
        from gpt_oss_vllm_tpu.ops.nf4_matmul import _FP4_MAG_POLY, _lut_nf4

        a = tuple(reversed(_FP4_MAG_POLY))  # a[k] multiplies t^k

        def lut_ilp4(idx, codebook="mxfp4"):
            if codebook == "nf4":
                return _lut_nf4(idx)
            t = (idx & 7).astype(jnp.float32) - 3.5
            u = t * t
            w = u * u
            A = a[4] * w + a[0]
            B = a[6] * w + a[2]
            C = a[5] * w + a[1]
            D = a[7] * w + a[3]
            acc = (A + u * B) + t * (C + u * D)
            return jnp.where(idx >= 8, -acc, acc)

        gm._lut = lut_ilp4
        ff._lut = lut_ilp4
    else:
        raise SystemExit(f"unknown variant {name}")


def main():
    import bench  # repo-root bench.py: reuses its slope-timing machinery

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--quant", default="nf4", choices=["nf4", "mxfp4"])
    ap.add_argument("--variants", default="full,noattn")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--scale-dtype", default=None,
                    help="override stored scale dtype (e8m0 | bfloat16 | float32)")
    ap.add_argument("--blocksize", type=int, default=0,
                    help="override quant blocksize (0 = format default)")
    ap.add_argument("--prefill", action="store_true", help="time prefill TTFT instead of decode")
    ap.add_argument(
        "--layout", default="glu4", choices=["glu4", "flat"],
        help="expert storage layout: glu4 = fused FFN kernel (serving "
             "default), flat = two-kernel gmm path (A/B baseline)",
    )
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    cfg = dataclasses.replace(
        bench.dataclasses_replace_tied(ModelConfig()), num_layers=args.layers
    )
    sdt = args.scale_dtype or ("e8m0" if args.quant == "mxfp4" else "bfloat16")
    quant = QuantConfig(method=args.quant, scale_dtype=sdt, blocksize=args.blocksize)
    t0 = time.monotonic()
    params = fuse_qkv(random_params_on_device(cfg, quant, seed=0, sync_every_layer=True))
    if args.layout == "glu4":
        from gpt_oss_vllm_tpu.models.params import section_glu_experts

        params = section_glu_experts(params)
    time.sleep(2.0)
    print(f"params ready ({args.layers}L, {args.layout}) in {time.monotonic() - t0:.1f}s", flush=True)
    # size the KV pool for the requested batch (11 blocks/seq at the bench's
    # 128-token prompt + 24 steps)
    cache_cfg = CacheConfig(
        block_size=16, num_blocks=max(160, 12 * args.batch + 16),
        max_blocks_per_seq=16,
    )

    import gpt_oss_vllm_tpu.ops.moe_ffn_fused as ff
    import gpt_oss_vllm_tpu.ops.moe_gmm as gm
    import gpt_oss_vllm_tpu.ops.router as rt

    orig_attn = step_mod._cached_attention
    orig_moe = step_mod.moe_block
    orig_lut = gm._lut
    orig_router = rt.router_topk_pallas
    results = {}
    for v in args.variants.split(","):
        step_mod._cached_attention = orig_attn
        step_mod.moe_block = orig_moe
        gm._lut = orig_lut
        ff._lut = orig_lut
        rt.router_topk_pallas = orig_router
        apply_variant(v)
        if args.prefill:
            lat = bench.time_prefill(cfg, params, cache_cfg, "pallas")
            print(f"variant={v}: prefill {lat * 1e3:.3f} ms", flush=True)
        else:
            tok_s, lat = bench.time_decode(
                cfg, params, cache_cfg, "pallas", args.batch, 24
            )
            print(f"variant={v}: {lat * 1e3:.3f} ms/step ({tok_s:.1f} tok/s)", flush=True)
        results[v] = lat
    if "full" in results:
        for v, lat in results.items():
            if v != "full":
                d = (results["full"] - lat) * 1e3 / args.layers
                print(f"component cost ({v} removed): {d:.4f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
