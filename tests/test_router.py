"""Fused router kernel vs the XLA route_topk oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpt_oss_vllm_tpu.ops.moe import route_topk
from gpt_oss_vllm_tpu.ops.router import router_topk_pallas


@pytest.mark.parametrize("T,E,k", [(1, 32, 4), (5, 32, 4), (16, 8, 2), (1, 128, 4)])
def test_router_kernel_matches_oracle(rng, T, E, k):
    H = 256
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(E, H)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(E,)) * 0.01, jnp.float32)
    for bias in (b, None):
        want = route_topk(x, w, bias, k)
        got_w, got_i = router_topk_pallas(x, w, bias, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want.indices))
        np.testing.assert_allclose(
            np.asarray(got_w), np.asarray(want.weights), rtol=2e-5, atol=2e-5
        )


def test_router_kernel_tie_break_low_index(rng):
    """Equal logits must select the LOWER expert index (lax.top_k order)."""
    E, k = 8, 2
    # router weight rows 2 and 5 identical -> identical logits
    w = rng.normal(size=(E, 64)).astype(np.float32)
    w[5] = w[2]
    x = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32)
    wj = jnp.asarray(w)
    want = route_topk(x, wj, None, k)
    got_w, got_i = router_topk_pallas(x, wj, None, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want.indices))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want.weights), rtol=1e-5)
