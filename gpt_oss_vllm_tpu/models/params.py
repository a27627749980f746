"""Model parameter pytrees + loaders.

All weights use the (out, in) row-major convention — checkpoint-native, so
loading never transposes. Expert projections are either :class:`NF4Tensor`
(packed 4-bit, the serving path) or dense bf16 (the training / parity path).
The quantization partition follows the reference contract
(``gpt_oss_moe_architecture.md:12-26``): only expert projections quantize;
router (f32 — fixing the reference's dtype blocker, ``STATUS.md:6``),
attention, embeddings, and lm_head stay full precision.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gpt_oss_vllm_tpu.config import ModelConfig, QuantConfig
from gpt_oss_vllm_tpu.checkpoint.store import TensorStore
from gpt_oss_vllm_tpu.quant.tensor import NF4Tensor, q4_tensor_from_dense

ExpertWeight = Union[NF4Tensor, jax.Array]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "attn_norm", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "sinks",
        "mlp_norm", "router_w", "router_b",
        "w_gate_up", "b_gate_up", "w_down", "b_down",
        "wqkv", "bqkv",
    ],
    meta_fields=[],
)
@dataclass
class LayerParams:
    # q/k/v kept separate (not fused) so tensor-parallel sharding stays
    # head-aligned under GSPMD; for tp=1 serving, fuse_qkv() concatenates
    # them once at load (one fat matmul decodes ~2x faster than three
    # MXU-underfilled skinny ones — measured 0.153 -> ~0.08 ms/layer)
    attn_norm: jax.Array  # [H]
    wq: Optional[jax.Array]  # [Dq, H] (None when fused)
    bq: Optional[jax.Array]  # [Dq]
    wk: Optional[jax.Array]  # [Dkv, H]
    bk: Optional[jax.Array]
    wv: Optional[jax.Array]  # [Dkv, H]
    bv: Optional[jax.Array]
    wo: jax.Array  # [H, Dq]
    bo: Optional[jax.Array]  # [H]
    sinks: Optional[jax.Array]  # [n_heads] f32
    mlp_norm: jax.Array  # [H]
    router_w: jax.Array  # [E, H] f32
    router_b: Optional[jax.Array]  # [E]
    w_gate_up: ExpertWeight  # [E, 2FF, H]
    b_gate_up: Optional[jax.Array]  # [E, 2FF]
    w_down: ExpertWeight  # [E, H, FF]
    b_down: Optional[jax.Array]  # [E, H]
    wqkv: Optional[jax.Array] = None  # [Dq + 2*Dkv, H] fused (tp=1 fast path)
    bqkv: Optional[jax.Array] = None


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embedding", "layers", "final_norm", "lm_head"],
    meta_fields=[],
)
@dataclass
class ModelParams:
    embedding: jax.Array  # [V, H] bf16, or quant.vocab8.Int8Vocab (opt-in)
    layers: List[LayerParams]
    final_norm: jax.Array  # [H]
    lm_head: Optional[jax.Array]  # [V, H]; None => tied to embedding

    def num_params(self) -> int:
        total = 0
        for leaf in jax.tree_util.tree_leaves(self):
            if leaf.dtype == jnp.uint8:
                total += leaf.size * 2  # packed 4-bit
            else:
                total += leaf.size
        return total


def _get(store: TensorStore, name: str, dtype=None):
    if name not in store:
        return None
    arr = np.asarray(store.read(name))
    x = jnp.asarray(arr)
    return x.astype(dtype) if dtype is not None else x


def load_params_from_store(
    store: TensorStore, cfg: ModelConfig, quant: QuantConfig
) -> ModelParams:
    """Materialize the param pytree from a native converted checkpoint.

    With ``quant.method == "nf4"`` the packed bits go straight to the device
    (no dequant); with ``"none"`` experts are dequantized to dense bf16 at
    load (correctness/parity path).
    """
    dt = jnp.dtype(cfg.dtype)
    H, FF = cfg.hidden_size, cfg.intermediate_size

    def load_expert(li: int, proj: str, out_f: int, in_f: int) -> ExpertWeight:
        from gpt_oss_vllm_tpu.quant.tensor import ensure_kernel_padded

        qdata = store.read(f"layers.{li}.moe.{proj}.qdata")
        scales = store.read(f"layers.{li}.moe.{proj}.scales")
        qmeta = store.metadata.get("quant", {})
        scales = jnp.asarray(np.asarray(scales))
        if scales.dtype != jnp.uint8:
            # float scales honor the requested compute dtype; uint8 scales
            # are E8M0 exponent bytes and stay raw (decoded in-kernel)
            scales = scales.astype(jnp.dtype(quant.scale_dtype))
        t = NF4Tensor(
            qdata=jnp.asarray(qdata),
            scales=scales,
            out_features=out_f,
            in_features=in_f,
            blocksize=qmeta.get("blocksize", 64),
            codebook=qmeta.get("codebook", "nf4"),
        )
        if quant.enabled:
            return ensure_kernel_padded(t)
        return t.dequantize(dtype=dt)

    layers = []
    for li in range(cfg.num_layers):
        p = f"layers.{li}"
        layers.append(
            LayerParams(
                attn_norm=_get(store, f"{p}.attn_norm", jnp.float32),
                wq=_get(store, f"{p}.wq", dt),
                bq=_get(store, f"{p}.bq", jnp.float32),
                wk=_get(store, f"{p}.wk", dt),
                bk=_get(store, f"{p}.bk", jnp.float32),
                wv=_get(store, f"{p}.wv", dt),
                bv=_get(store, f"{p}.bv", jnp.float32),
                wo=_get(store, f"{p}.wo", dt),
                bo=_get(store, f"{p}.bo", jnp.float32),
                sinks=_get(store, f"{p}.sinks", jnp.float32),
                mlp_norm=_get(store, f"{p}.mlp_norm", jnp.float32),
                router_w=_get(store, f"{p}.router_w", jnp.float32),
                router_b=_get(store, f"{p}.router_b", jnp.float32),
                w_gate_up=load_expert(li, "gate_up", 2 * FF, H),
                b_gate_up=_reshape_bias(_get(store, f"{p}.moe.gate_up.bias", jnp.float32)),
                w_down=load_expert(li, "down", H, FF),
                b_down=_reshape_bias(_get(store, f"{p}.moe.down.bias", jnp.float32)),
            )
        )
    def vocab_table(name):
        w = _get(store, name, dt)
        if w is None or not quant.vocab_int8:
            return w
        from gpt_oss_vllm_tpu.quant.vocab8 import int8_vocab_from_dense

        # quantize on-device at load; the bf16 source is freed immediately
        return int8_vocab_from_dense(w)

    return ModelParams(
        embedding=vocab_table("embedding"),
        layers=layers,
        final_norm=_get(store, "final_norm", jnp.float32),
        lm_head=vocab_table("lm_head"),
    )


def _reshape_bias(b):
    return b


def random_params_on_device(
    cfg: ModelConfig,
    quant: QuantConfig,
    seed: int = 0,
    scale: float = 0.02,
    sync_every_layer: bool = False,
) -> ModelParams:
    """Random params generated entirely on-device with jax.random.

    Same layout as :func:`random_params` but no host->device transfer — for
    benchmarking the full-size model on a remote/tunnel-attached chip, where
    shipping ~13 GB of host-generated weights would dominate startup.
    """
    dt = jnp.dtype(cfg.dtype)
    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts

    def dense(key, *shape, dtype=dt, s=scale):
        return (jax.random.normal(key, shape, dtype=jnp.float32) * s).astype(dtype)

    def expert(key, out_f, in_f) -> ExpertWeight:
        if not quant.enabled:
            return dense(key, E, out_f, in_f)
        kb, ks = jax.random.split(key)
        # generate directly in the kernel-padded physical shape — creating
        # then jnp.pad-ing would double-allocate every weight; zero the pad
        # scales so pad regions decode to 0. Only the packed dim pads (the
        # grouped kernel handles non-128 out dims natively).
        rows = out_f
        kp = -(-(in_f // 2) // 128) * 128
        bs = quant.effective_blocksize
        nbp = kp * 2 // bs
        nb = in_f // bs
        # uint32 bits + bitcast: peak transient == final size (requesting
        # uint8 bits directly can materialize a 4x 32-bit intermediate —
        # ~1.1 GB per gate_up tensor, the difference between the 24-layer
        # model fitting HBM at creation time or not)
        assert kp % 4 == 0
        words = jax.random.bits(kb, (E, rows, kp // 4), dtype=jnp.uint32)
        bits = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(E, rows, kp)
        block_ok = (jnp.arange(nbp) < nb)[None, :, None]
        row_ok = (jnp.arange(rows) < out_f)[None, None, :]
        if quant.scale_dtype == "e8m0":
            # E8M0 exponent bytes around 2^-6 (plausible absmax/6 for 0.02-
            # scale weights); 0 = pad block (decodes to exact 0 in-kernel)
            expo = jax.random.randint(ks, (E, nbp, rows), 119, 123, jnp.int32)
            scales = jnp.where(block_ok & row_ok, expo, 0).astype(jnp.uint8)
        else:
            sdt = jnp.dtype(quant.scale_dtype)
            scales = jnp.abs(
                jax.random.normal(ks, (E, nbp, rows), dtype=sdt)
            ) * jnp.asarray(scale, sdt) + jnp.asarray(scale * 0.5, sdt)
            scales = jnp.where(block_ok & row_ok, scales, jnp.zeros((), sdt))
        return NF4Tensor(
            qdata=bits,
            scales=scales,
            out_features=out_f,
            in_features=in_f,
            blocksize=bs,
            codebook=quant.method,
        )

    bias = cfg.attention_bias

    def gen_layer(key) -> LayerParams:
        # ONE jitted program for the whole layer: compiled once, reused for
        # every layer. The previous per-op eager form dispatched ~15 distinct
        # small programs, each under the persistent-cache threshold, and cold
        # remote compiles made param generation the dominant bench startup
        # cost (276.8 s at r1; r2's bigger program set blew the driver's
        # 590 s window entirely — VERDICT r2 missing #1).
        ks = list(jax.random.split(key, 16))
        k = iter(ks).__next__
        return LayerParams(
            attn_norm=jnp.ones((H,), jnp.float32),
            wq=dense(k(), cfg.q_size, H),
            bq=dense(k(), cfg.q_size, dtype=jnp.float32) if bias else None,
            wk=dense(k(), cfg.kv_size, H),
            bk=dense(k(), cfg.kv_size, dtype=jnp.float32) if bias else None,
            wv=dense(k(), cfg.kv_size, H),
            bv=dense(k(), cfg.kv_size, dtype=jnp.float32) if bias else None,
            wo=dense(k(), H, cfg.q_size),
            bo=dense(k(), H, dtype=jnp.float32) if bias else None,
            sinks=dense(k(), cfg.num_heads, dtype=jnp.float32, s=1.0)
            if cfg.use_sinks
            else None,
            mlp_norm=jnp.ones((H,), jnp.float32),
            router_w=dense(k(), E, H, dtype=jnp.float32),
            router_b=dense(k(), E, dtype=jnp.float32) if cfg.router_bias else None,
            w_gate_up=expert(k(), 2 * FF, H),
            b_gate_up=dense(k(), E, 2 * FF, dtype=jnp.float32)
            if cfg.expert_bias
            else None,
            w_down=expert(k(), H, FF),
            b_down=dense(k(), E, H, dtype=jnp.float32) if cfg.expert_bias else None,
        )

    import os as _os
    import sys as _sys
    import time as _time

    _verbose = bool(_os.environ.get("GPT_OSS_GEN_PROGRESS"))
    _t0 = _time.monotonic()

    def _prog(msg):
        if _verbose:
            print(f"  [param-gen t+{_time.monotonic() - _t0:.0f}s] {msg}",
                  file=_sys.stderr, flush=True)

    gen = jax.jit(gen_layer)
    lkeys = jax.random.split(jax.random.PRNGKey(seed), cfg.num_layers + 1)
    layers = []
    for li in range(cfg.num_layers):
        layers.append(gen(lkeys[li]))
        if sync_every_layer:
            # drain the creation stream layer by layer (a full-stream sync at
            # the end wedges the tunnel backend, and unsynced creation leaves
            # transients resident when the first step runs)
            np.asarray(layers[-1].wq[:1, :8])
        if li == 0 or (li + 1) % 8 == 0:
            _prog(f"layer {li + 1}/{cfg.num_layers}")
    key = lkeys[cfg.num_layers]
    _prog("layers done; generating vocab table")

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def vocab_table():
        if quant.vocab_int8:
            from gpt_oss_vllm_tpu.quant.vocab8 import random_int8_vocab

            return random_int8_vocab(nxt(), cfg.vocab_size, H, scale=scale)
        return dense(nxt(), cfg.vocab_size, H)

    return ModelParams(
        embedding=vocab_table(),
        layers=layers,
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=None if cfg.tie_word_embeddings else vocab_table(),
    )


def random_params(
    cfg: ModelConfig,
    quant: QuantConfig,
    seed: int = 0,
    scale: float = 0.02,
) -> ModelParams:
    """Random-init params in the exact serving layout (packed NF4 experts when
    quantized). Weight *values* are irrelevant to throughput, so this is what
    the benchmarks use when no converted checkpoint is on disk."""
    rng = np.random.default_rng(seed)
    dt = jnp.dtype(cfg.dtype)
    H, FF, E = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts

    def dense(*shape, dtype=dt, s=scale):
        return jnp.asarray(rng.normal(0, s, size=shape).astype(np.float32), dtype=dtype)

    def expert(out_f, in_f) -> ExpertWeight:
        w = rng.normal(0, scale, size=(E, out_f, in_f)).astype(np.float32)
        if quant.enabled:
            return q4_tensor_from_dense(
                w, blocksize=quant.effective_blocksize, codebook=quant.method,
                scale_dtype="e8m0" if quant.scale_dtype == "e8m0" else jnp.float32,
            )
        return jnp.asarray(w, dtype=dt)

    layers = []
    for li in range(cfg.num_layers):
        bias = cfg.attention_bias
        layers.append(
            LayerParams(
                attn_norm=jnp.ones((H,), jnp.float32),
                wq=dense(cfg.q_size, H),
                bq=dense(cfg.q_size, dtype=jnp.float32) if bias else None,
                wk=dense(cfg.kv_size, H),
                bk=dense(cfg.kv_size, dtype=jnp.float32) if bias else None,
                wv=dense(cfg.kv_size, H),
                bv=dense(cfg.kv_size, dtype=jnp.float32) if bias else None,
                wo=dense(H, cfg.q_size),
                bo=dense(H, dtype=jnp.float32) if cfg.attention_bias else None,
                sinks=dense(cfg.num_heads, dtype=jnp.float32, s=1.0) if cfg.use_sinks else None,
                mlp_norm=jnp.ones((H,), jnp.float32),
                router_w=dense(E, H, dtype=jnp.float32),
                router_b=dense(E, dtype=jnp.float32) if cfg.router_bias else None,
                w_gate_up=expert(2 * FF, H),
                b_gate_up=dense(E, 2 * FF, dtype=jnp.float32) if cfg.expert_bias else None,
                w_down=expert(H, FF),
                b_down=dense(E, H, dtype=jnp.float32) if cfg.expert_bias else None,
            )
        )

    def vocab_table():
        w = dense(cfg.vocab_size, H)
        if quant.vocab_int8:
            from gpt_oss_vllm_tpu.quant.vocab8 import int8_vocab_from_dense

            return int8_vocab_from_dense(w)
        return w

    return ModelParams(
        embedding=vocab_table(),
        layers=layers,
        final_norm=jnp.ones((H,), jnp.float32),
        lm_head=None if cfg.tie_word_embeddings else vocab_table(),
    )


def quantize_params(
    params: ModelParams, cfg: ModelConfig, quant: QuantConfig
) -> ModelParams:
    """Quantize a DENSE-expert param pytree into the serving format (packed
    4-bit experts per ``quant``, optional int8 vocab) — the trained-model
    accuracy path: train dense (training/train_step), quantize with this,
    then measure the PPL delta with tools/eval_ppl. Mirrors the partition
    contract (experts only; router/attention/embeddings stay full precision,
    reference ``gpt_oss_moe_architecture.md:12-26``)."""
    import dataclasses as _dc

    from gpt_oss_vllm_tpu.quant.tensor import q4_tensor_from_dense

    def pack(w) -> ExpertWeight:
        if isinstance(w, NF4Tensor) or not quant.enabled:
            return w
        return q4_tensor_from_dense(
            np.asarray(w, np.float32),
            blocksize=quant.effective_blocksize,
            codebook=quant.method,
            scale_dtype="e8m0" if quant.scale_dtype == "e8m0" else jnp.float32,
        )

    layers = [
        _dc.replace(l, w_gate_up=pack(l.w_gate_up), w_down=pack(l.w_down))
        for l in params.layers
    ]

    def vocab(w):
        if w is None or not quant.vocab_int8:
            return w
        from gpt_oss_vllm_tpu.quant.vocab8 import int8_vocab_from_dense

        return int8_vocab_from_dense(w)

    return _dc.replace(
        params,
        layers=layers,
        embedding=vocab(params.embedding),
        lm_head=vocab(params.lm_head),
    )


def prepare_serving_params(
    cfg: ModelConfig, quant: QuantConfig, seed: int = 0
) -> ModelParams:
    """Full-size random weights in the final single-shard SERVING layout
    (fused qkv + glu4 expert sections), with the repack transient drained
    BEFORE the caller allocates anything else.

    Order matters on the tunnel-attached chip: doing the glu4 repack after
    a serving-sized KV pool is resident OOMs (the repack's alloc/free
    transient needs the headroom the pool just took), while repack-first
    then pool-after is the proven bench.py ordering. The engine's own
    fuse/section passes become no-ops on these params.
    """
    import time as _time

    import numpy as _np

    params = fuse_qkv(
        random_params_on_device(cfg, quant, seed=seed, sync_every_layer=True)
    )
    if quant.enabled and quant.backend == "pallas" and jax.default_backend() == "tpu":
        params = section_glu_experts(params, drain_every=1)
        _np.asarray(jax.tree_util.tree_leaves(params.layers[0].attn_norm)[0][:1])
        _time.sleep(2.0)
    return params


def section_glu_experts(params: ModelParams, drain_every: int = 0) -> ModelParams:
    """Re-store packed gate_up projections (and their biases) in the glu4
    serving layout (quant.tensor.section_glu4) — the storage order that lets
    the whole MoE FFN run as one Pallas kernel at decode (ops.moe_ffn_fused)
    and drops the activation interleave round trip from the batched path.
    One-time at load, bit-lossless, single-shard Pallas engines only (the
    XLA and sharded paths keep checkpoint row order)."""
    import dataclasses as _dc

    from gpt_oss_vllm_tpu.quant.tensor import section_glu4, section_glu4_bias

    # Replace layers IN PLACE so at most one layer's gate_up is duplicated at
    # a time (a rebuilt list keeps every old tensor alive until the caller
    # rebinds — ~+7 GB transient on GPT-OSS-20B, enough to OOM the chip).
    for i, l in enumerate(params.layers):
        if not isinstance(l.w_gate_up, NF4Tensor) or l.w_gate_up.row_layout != "flat":
            continue
        out_f = l.w_gate_up.out_features
        params.layers[i] = _dc.replace(
            l,
            w_gate_up=section_glu4(l.w_gate_up),
            b_gate_up=None
            if l.b_gate_up is None
            else section_glu4_bias(l.b_gate_up, out_f),
        )
        if drain_every and (i + 1) % drain_every == 0:
            # frees are ASYNC on this backend: without a periodic sync point
            # the 24 freed multi-hundred-MB flat tensors pile up behind the
            # repack allocs and the transient peak OOMs once the KV pool is
            # serving-sized (observed: 456-block pool + repack at 24L mxfp4).
            # A value readback is the only real sync on axon (CLAUDE.md), and
            # frees still land a beat AFTER the sync — hence the settle sleep.
            import time as _time

            import numpy as _np

            t = params.layers[i].w_gate_up.qdata
            _np.asarray(t[tuple(0 for _ in t.shape[:-1]) + (slice(0, 1),)])
            _time.sleep(0.25)
    return params


def fuse_qkv(params: ModelParams) -> ModelParams:
    """Concatenate per-layer q/k/v projections into one fused weight (and
    bias) for single-shard serving: one MXU-efficient matmul instead of
    three skinny ones. The split views are dropped (memory stays flat).
    Do NOT fuse when tensor-parallel over heads — the fused row dim mixes
    q-heads and kv-heads so GSPMD cannot shard it head-aligned."""
    import dataclasses as _dc

    layers = []
    for l in params.layers:
        if l.wqkv is not None or l.wq is None:
            layers.append(l)
            continue
        wqkv = jnp.concatenate([l.wq, l.wk, l.wv], axis=0)
        if l.bq is not None:
            bqkv = jnp.concatenate([l.bq, l.bk, l.bv], axis=0)
        else:
            bqkv = None
        layers.append(
            _dc.replace(
                l, wqkv=wqkv, bqkv=bqkv,
                wq=None, bq=None, wk=None, bk=None, wv=None, bv=None,
            )
        )
    return _dc.replace(params, layers=layers)
