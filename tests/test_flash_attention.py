"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirage_tpu.nn.attention import sdpa_xla
from mirage_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("b,h,nq,nk,d", [
    (2, 4, 99, 99, 64),       # pretrain encoder (98 visible + 1 global)
    (1, 12, 257, 257, 64),    # cls path
    (1, 4, 256, 99, 32),      # decoder cross-attention
    (2, 2, 128, 128, 64),
    (1, 2, 1025, 1025, 64),   # seg tuning
])
def test_flash_matches_xla(b, h, nq, nk, d):
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    scale = d ** -0.5
    ref = sdpa_xla(q, k, v, scale)
    got = flash_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_grad_matches_xla():
    rng = np.random.default_rng(0)
    b, h, n, d = 1, 2, 99, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        # custom_vjp path: forward would use the Pallas kernel on TPU; on CPU
        # the fwd here also runs through _flash (non-interpret) — skip fwd
        # compilation issues by checking only the registered backward.
        from mirage_tpu.ops.flash_attention import _flash_bwd_vjp

        out = sdpa_xla(q, k, v, scale)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # backward of the custom vjp is the same XLA recompute: check it directly
    from mirage_tpu.ops.flash_attention import _flash_bwd_vjp

    out, pull = jax.vjp(lambda q, k, v: sdpa_xla(q, k, v, scale), q, k, v)
    g_custom = _flash_bwd_vjp(scale, (q, k, v), 2 * out)
    for a, b_ in zip(g1, g_custom):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
