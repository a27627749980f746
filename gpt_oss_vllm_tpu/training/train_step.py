"""Sharded training step: next-token CE + optax over the GSPMD mesh.

The reference is inference-only; this module exists so the framework also
covers fine-tuning-style workloads and — operationally — because the
multi-chip dry-run contract (``__graft_entry__.dryrun_multichip``) exercises
the FULL dp x ep x tp sharding layout through both forward and backward.
Training runs on the dense (unquantized) parameterization; NF4 packed
weights are a frozen serving format (QLoRA-style adapter training over
frozen NF4 bases is future work).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.models.gpt_oss import forward
from gpt_oss_vllm_tpu.models.params import ModelParams
from gpt_oss_vllm_tpu.parallel.sharding import _to_sharding, params_pspecs


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "opt_state", "step"],
    meta_fields=[],
)
@dataclass
class TrainState:
    params: ModelParams
    opt_state: optax.OptState
    step: jax.Array


def next_token_loss(params: ModelParams, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    """Mean CE of predicting tokens[:, 1:] from tokens[:, :-1]."""
    logits = forward(params, cfg, tokens[:, :-1], moe_strategy="all")
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_sharded_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    params: ModelParams,
    learning_rate: float = 1e-4,
) -> Tuple[Callable, TrainState, optax.GradientTransformation]:
    """Build (jitted_step, sharded_initial_state).

    Shardings: params per ``parallel.sharding`` (tp/ep), optimizer state
    mirrors params, batch over 'data'. XLA emits the psums/all-reduces.
    """
    tx = optax.adamw(learning_rate)
    p_specs = params_pspecs(params)
    p_shard = _to_sharding(mesh, p_specs)
    params = jax.device_put(params, p_shard)
    opt_state = tx.init(params)

    # adamw state contains mu/nu trees shaped like params: shard those alike
    def match_params(st):
        if isinstance(st, optax.ScaleByAdamState):
            return st._replace(
                mu=jax.device_put(st.mu, p_shard), nu=jax.device_put(st.nu, p_shard)
            )
        return st

    opt_state = jax.tree_util.tree_map(
        match_params, opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    )
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    data_sharding = NamedSharding(mesh, P("data", None))

    @partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, tokens: jax.Array):
        loss, grads = jax.value_and_grad(next_token_loss)(state.params, cfg, tokens)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
            loss,
        )

    def run(state, tokens):
        tokens = jax.device_put(tokens, data_sharding)
        return train_step(state, tokens)

    return run, state, tx
