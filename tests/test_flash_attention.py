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
    """The registered backward (Pallas kernel, interpret mode on CPU) matches
    jax.grad of the XLA reference attention."""
    rng = np.random.default_rng(0)
    b, h, n, d = 1, 2, 99, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    from mirage_tpu.ops.flash_attention import flash_attention_bwd_interpret

    out = sdpa_xla(q, k, v, scale)
    g_custom = flash_attention_bwd_interpret(q, k, v, 2 * out, scale)
    for a, b_ in zip(g1, g_custom):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_flash_backward_matches_xla(rng):
    """Pallas backward kernel (interpret mode) vs jax.vjp of the reference
    attention, including ragged kv_len padding."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.flash_attention import flash_attention_bwd_interpret

    b, h, n, d = 2, 3, 130, 32  # n=130 pads to 256 -> exercises the mask
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d ** -0.5

    def ref_attn(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    want_dq, want_dk, want_dv = vjp(g)
    got_dq, got_dk, got_dv = flash_attention_bwd_interpret(q, k, v, g, scale)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(want_dq),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(want_dk),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv),
                               atol=2e-5, rtol=1e-4)


def test_flash_backward_multi_qblock(rng):
    """dK/dV accumulation across query blocks (nq > block size)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.flash_attention import flash_attention_bwd_interpret

    b, h, n, d = 1, 2, 300, 32  # pads to 384 -> 3 blocks of 128
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d ** -0.5

    def ref_attn(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    want = vjp(g)
    got = flash_attention_bwd_interpret(q, k, v, g, scale)
    for gt, wt in zip(got, want):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(wt),
                                   atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Short-sequence fused kernel (ops/block_attention.py)
# ---------------------------------------------------------------------------

def test_block_attention_matches_xla(rng):
    import jax.numpy as jnp

    from mirage_tpu.ops.block_attention import _attn_xla, block_attention

    for (b, n, h, d) in [(2, 257, 16, 1024), (3, 99, 12, 768), (1, 7, 4, 64)]:
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)).astype(np.float32))
        scale = (d // h) ** -0.5
        got = block_attention(qkv, h, scale, interpret=True)
        want = _attn_xla(qkv, h, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_block_attention_backward_matches_xla(rng):
    """The Pallas backward kernel (interpret mode) equals grad through the
    plain XLA forward."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.block_attention import _attn_xla, _block_attn_bwd

    for (b, n, h, d) in [(2, 33, 4, 64), (2, 99, 12, 768)]:
        scale = (d // h) ** -0.5
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        want = jax.vjp(lambda t: _attn_xla(t, h, scale), qkv)[1](g)[0]
        got = _block_attn_bwd(qkv, g, h, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_attention_apply_dispatch_unchanged_on_cpu(rng):
    """On CPU the block kernel is bypassed and attention_apply keeps its
    reference numerics (impl dispatch parity guard)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.attention import attention_apply, attention_init

    p = attention_init(jax.random.PRNGKey(0), 64, qkv_bias=True)
    x = jnp.asarray(rng.standard_normal((2, 17, 64)).astype(np.float32))
    auto = attention_apply(p, x, 4, impl="auto")
    xla = attention_apply(p, x, 4, impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(xla), atol=1e-6)


def test_xattn_half_block_matches_xla(rng):
    """Fused cross-attention half-block kernel (interpret mode) vs the plain
    XLA decoder path (LN_q/LN_ctx + q/kv proj + SDPA + out proj + residual)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.attention import cross_attention_init
    from mirage_tpu.nn.layers import layer_norm_init
    from mirage_tpu.ops.block_attention import _xattn_half_xla, xattn_half_block

    for (b, nq, nc, h, d) in [(2, 256, 257, 8, 256), (1, 13, 29, 4, 64)]:
        cross = cross_attention_init(jax.random.PRNGKey(1), d, qkv_bias=True)
        qn = layer_norm_init(d)
        cn = layer_norm_init(d)
        qn = {"scale": qn["scale"] + 0.1, "bias": qn["bias"] + 0.05}
        cn = {"scale": cn["scale"] - 0.1, "bias": cn["bias"] - 0.02}
        x = jnp.asarray(rng.standard_normal((b, nq, d)).astype(np.float32))
        ctx = jnp.asarray(rng.standard_normal((b, nc, d)).astype(np.float32))
        got = xattn_half_block(x, qn, cn, cross, ctx, h, interpret=True)
        want = _xattn_half_xla(
            x, ctx, qn["scale"], qn["bias"], cn["scale"], cn["bias"],
            cross["q"]["w"], cross["q"]["b"], cross["kv"]["w"],
            cross["kv"]["b"], cross["proj"]["w"], cross["proj"]["b"],
            h, (d // h) ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


def test_fused_block_matches_xla(rng):
    """Whole-block fused kernel (interpret mode) vs the XLA block path."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.block import block_apply, block_init
    from mirage_tpu.ops.fused_block import fused_block

    for (b, n, h, d) in [(2, 33, 4, 64), (1, 257, 8, 128)]:
        p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
        x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        got = fused_block(x, p, h, interpret=True)
        want = block_apply(p, x, h, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


def test_block_fuse_routing_matches_halves(rng):
    """MIRAGE_BLOCK_FUSE=decoder routes dim<=256 deterministic blocks to the
    whole-block kernel; the output must match the two-half kernel path
    (decoder tail shape: dim 256 / 8 heads / N=257)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn import block as nb
    from mirage_tpu.ops import runtime as rt

    p = nb.block_init(jax.random.PRNGKey(0), 256, qkv_bias=True)
    x = jnp.asarray(rng.standard_normal((2, 257, 256)).astype(np.float32))
    pe = nb.block_init(jax.random.PRNGKey(1), 512, qkv_bias=True)
    xe = jnp.asarray(rng.standard_normal((1, 33, 512)).astype(np.float32))
    with rt.forced("interpret"):
        want = nb.block_apply(p, x, 8)
        want_e = nb.block_apply(pe, xe, 8)
        prev = nb._BLOCK_FUSE
        nb._BLOCK_FUSE = "decoder"
        try:
            got = nb.block_apply(p, x, 8)
            # encoder-width blocks must be untouched by "decoder" mode
            got_e = nb.block_apply(pe, xe, 8)
        finally:
            nb._BLOCK_FUSE = prev
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=0, rtol=0)


def test_mlp_block_backward_kernel_matches_xla(rng):
    """Pallas MLP-half backward (interpret mode): dx + all parameter grads
    vs jax.vjp through the plain XLA half-block."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.fused_mlp import (
        _mlp_block_bwd_pallas, _mlp_block_xla)

    # 3-D elems, aligned-3-D, 2-D, and unaligned-3-D via the zero-dy row-pad
    # path (64*ceil16(33) divisible by 1024)
    for shape in [(4, 32, 48), (2, 16, 64), (96, 48), (64, 33, 32)]:
        d = shape[-1]
        hdim = 4 * d
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(0.1 * rng.standard_normal(hdim).astype(np.float32))
        w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
        b2 = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        _, vjp = jax.vjp(_mlp_block_xla, x, gamma, beta, w1, b1, w2, b2)
        want = vjp(g)
        got = _mlp_block_bwd_pallas(x, g, gamma, beta, w1, b1, w2,
                                    interpret=True)
        names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
        for name, gg, ww in zip(names, got, want[:6] + (want[6],)):
            np.testing.assert_allclose(
                np.asarray(gg).reshape(np.asarray(ww).shape), np.asarray(ww),
                atol=5e-4, rtol=1e-3, err_msg=f"{name} @ {shape}")


def test_mlp_block_stash_kernels_match_xla(rng):
    """Stash-variant fused MLP (interpret mode): the stash forward's primal
    output matches the plain kernel bit-for-bit (same f32 kernel math), and
    the stash-consuming backward (no fc1 recompute, no transcendentals)
    matches jax.vjp through the XLA half-block."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.fused_mlp import (
        _mlp_block_bwd_stash, _mlp_block_fwd, _mlp_block_fwd_stash,
        _mlp_block_xla)

    m, d = 96, 48
    hdim = 4 * d
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(0.1 * rng.standard_normal(hdim).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))

    out_plain = _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, interpret=True)
    out, act, dgelu = _mlp_block_fwd_stash(x, gamma, beta, w1, b1, w2, b2,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_plain))
    assert act.shape == (m, hdim) and dgelu.shape == (m, hdim)

    _, vjp = jax.vjp(_mlp_block_xla, x, gamma, beta, w1, b1, w2, b2)
    want = vjp(g)
    got = _mlp_block_bwd_stash(x, g, act, dgelu, gamma, beta, w1, w2,
                               interpret=True)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, gg, ww in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gg).reshape(np.asarray(ww).shape), np.asarray(ww),
            atol=5e-4, rtol=1e-3, err_msg=name)


def test_mlp_block_stash3d_matches_xla(rng):
    """Unaligned-3-D stash forward (QUARANTINED negative result — the route
    measured net-negative at the pretraining shape and _stash_route refuses
    it; kept as evidence, see fused_mlp._stash_route): the per-element
    stash3d forward's primal matches the plain 3-D kernel bit-for-bit, the
    stashes match their 2-D values, and flattening stashes + cotangents
    through the stash backward matches jax.vjp (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.fused_mlp import (
        _mlp_block_bwd_stash, _mlp_block_fwd, _mlp_block_fwd_stash,
        _mlp_block_fwd_stash3d, _mlp_block_xla)

    b, n, d = 4, 11, 48  # n % 16 != 0: the unaligned class
    hdim = 4 * d
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(0.1 * rng.standard_normal(hdim).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))

    out_plain = _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, interpret=True)
    out, act, dg3 = _mlp_block_fwd_stash3d(x, gamma, beta, w1, b1, w2, b2,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_plain))
    assert act.shape == (b, n, hdim) and dg3.shape == (b, n, hdim)
    # stash values match the 2-D stash forward on the flattened rows
    _, act2, dg2 = _mlp_block_fwd_stash(x.reshape(b * n, d), gamma, beta,
                                        w1, b1, w2, b2, interpret=True)
    np.testing.assert_array_equal(np.asarray(act).reshape(b * n, hdim),
                                  np.asarray(act2))
    np.testing.assert_array_equal(np.asarray(dg3).reshape(b * n, hdim),
                                  np.asarray(dg2))
    # flat-out stash layout writes the same rows with no reshape
    out_f, act_f, dg_f = _mlp_block_fwd_stash3d(
        x, gamma, beta, w1, b1, w2, b2, interpret=True, stash_flat=True)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_plain))
    np.testing.assert_array_equal(np.asarray(act_f), np.asarray(act2))
    np.testing.assert_array_equal(np.asarray(dg_f), np.asarray(dg2))

    _, vjp = jax.vjp(_mlp_block_xla, x, gamma, beta, w1, b1, w2, b2)
    want = vjp(g)
    got = _mlp_block_bwd_stash(
        x.reshape(b * n, d), g.reshape(b * n, d),
        act.reshape(b * n, hdim), dg3.reshape(b * n, hdim),
        gamma, beta, w1, w2, interpret=True)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, gg, ww in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gg).reshape(np.asarray(ww).shape), np.asarray(ww),
            atol=5e-4, rtol=1e-3, err_msg=name)


def test_mlp_block_bwd_defused_matches_xla(rng):
    """De-fused backward (parallel dx kernel + XLA dW contractions,
    interpret mode) vs jax.vjp through the XLA half-block."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.fused_mlp import (_mlp_block_bwd_defused,
                                          _mlp_block_xla)

    m, d = 96, 48
    hdim = 4 * d
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(0.1 * rng.standard_normal(hdim).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))

    _, vjp = jax.vjp(_mlp_block_xla, x, gamma, beta, w1, b1, w2, b2)
    want = vjp(g)
    got = _mlp_block_bwd_defused(x, g, gamma, beta, w1, b1, w2,
                                 interpret=True)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, gg, ww in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gg).reshape(np.asarray(ww).shape), np.asarray(ww),
            atol=5e-4, rtol=1e-3, err_msg=name)


def test_stash_route_decisions():
    """_stash_route must engage exactly the measured-win shapes: 2-D rows
    at d >= 384 (the seg ConvNeXt head) — and refuse every 3-D shape (the
    encoder's unaligned-3-D stash measured net-negative on v5e,
    scripts/bench_mlp_bwd_stash.py) and the d-256 decoder dims."""
    import jax.numpy as jnp

    from mirage_tpu.ops.fused_mlp import _stash_route

    x2d = jnp.zeros((131072, 384), jnp.bfloat16)
    assert _stash_route(x2d, 1536) == "2d"       # seg ConvNeXt head
    xr = jnp.zeros((131071, 384), jnp.bfloat16)
    assert _stash_route(xr, 1536) is None        # ragged rows
    xd2 = jnp.zeros((65536, 256), jnp.bfloat16)
    assert _stash_route(xd2, 1024) is None       # d < 384
    xp = jnp.zeros((256, 99, 768), jnp.bfloat16)
    assert _stash_route(xp, 3072) is None        # pretraining: negative
    xc = jnp.zeros((64, 257, 768), jnp.bfloat16)
    assert _stash_route(xc, 3072) is None        # cls-FT
    xd = jnp.zeros((256, 256, 256), jnp.bfloat16)
    assert _stash_route(xd, 1024) is None        # dim-256 decoder


def test_attn_half_backward_kernel_matches_xla(rng):
    """Pallas attention-half backward (interpret mode): dx + all parameter
    grads vs jax.vjp through the XLA half-block."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.block_attention import (
        _attn_half_bwd_pallas, _attn_half_xla)

    for (b, n, h, d) in [(4, 24, 4, 64), (2, 33, 8, 128)]:
        scale = (d // h) ** -0.5
        x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.1)
        bqkv = jnp.asarray(0.1 * rng.standard_normal(3 * d).astype(np.float32))
        wp = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        bp = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        _, vjp = jax.vjp(lambda *a: _attn_half_xla(*a, h, scale),
                         x, gamma, beta, wqkv, bqkv, wp, bp)
        want = vjp(g)
        names = ["dx", "dgamma", "dbeta", "dwqkv", "dbqkv", "dwproj", "dbproj"]
        # both accumulate strategies (register-batched elems sum vs
        # per-element VMEM "+=") must match the XLA vjp
        for reg_batch in (True, False):
            got = _attn_half_bwd_pallas(x, g, gamma, beta, wqkv, bqkv, wp,
                                        h, scale, interpret=True,
                                        reg_batch=reg_batch)
            for name, gg, ww in zip(names, got, want):
                np.testing.assert_allclose(
                    np.asarray(gg).reshape(np.asarray(ww).shape),
                    np.asarray(ww), atol=5e-4, rtol=1e-3,
                    err_msg=f"{name} @ b={b} n={n} reg_batch={reg_batch}")


def test_attn_half_bwd_defused_matches_xla(rng):
    """De-fused attention-half backward (parallel dx kernel + XLA weight-
    grad contractions, interpret mode) vs jax.vjp through the XLA
    half-block."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.ops.block_attention import (
        _attn_half_bwd_defused, _attn_half_xla)

    for (b, n, h, d) in [(4, 24, 4, 64), (2, 33, 8, 128)]:
        scale = (d // h) ** -0.5
        x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d).astype(np.float32))
        beta = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.1)
        bqkv = jnp.asarray(0.1 * rng.standard_normal(3 * d).astype(np.float32))
        wp = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
        bp = jnp.asarray(0.1 * rng.standard_normal(d).astype(np.float32))
        _, vjp = jax.vjp(lambda *a: _attn_half_xla(*a, h, scale),
                         x, gamma, beta, wqkv, bqkv, wp, bp)
        want = vjp(g)
        got = _attn_half_bwd_defused(x, g, gamma, beta, wqkv, bqkv, wp,
                                     h, scale, interpret=True)
        names = ["dx", "dgamma", "dbeta", "dwqkv", "dbqkv", "dwproj", "dbproj"]
        for name, gg, ww in zip(names, got, want):
            np.testing.assert_allclose(
                np.asarray(gg).reshape(np.asarray(ww).shape), np.asarray(ww),
                atol=5e-4, rtol=1e-3, err_msg=f"{name} @ b={b} n={n}")


def test_fused_kernel_gates_reject_unaligned_head_dim():
    """Non-32-multiple head dims must never reach the Pallas kernels: a
    dh=48 model hung the remote TPU compiler (XLA pipeline wedge around the
    fused-kernel scan). All reference sizes are dh=64 (encoders) / 32
    (decoders)."""
    from mirage_tpu.nn.attention import _use_block_kernel

    assert not _use_block_kernel("auto", 65, 0.0, True, head_dim=48)
    assert not _use_block_kernel("block", 65, 0.0, True, head_dim=40)


def test_kernel_onepass_ln_large_mean(rng):
    """Round-3 kernels compute LN variance as E[x^2] - mean^2 (one data pass).
    Guard the cancellation case: inputs with |mean| >> std must still match
    the two-pass XLA LN through the fused halves."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.block import block_init
    from mirage_tpu.ops.block_attention import _attn_half_fwd
    from mirage_tpu.ops.fused_mlp import mlp_block

    b, n, d, h = 2, 16, 64, 2
    p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
    # per-channel offsets up to 30 with unit noise: mean^2/var ~ 1e3
    offs = jnp.asarray(30.0 * rng.standard_normal(d).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32)) + offs

    got = _attn_half_fwd(x, p["norm1"]["scale"], p["norm1"]["bias"],
                         p["attn"]["qkv"]["w"],
                         p["attn"]["qkv"].get("b", jnp.zeros((3 * d,))),
                         p["attn"]["proj"]["w"], p["attn"]["proj"]["b"],
                         num_heads=h, scale=(d // h) ** -0.5, interpret=True)
    from mirage_tpu.nn.attention import attention_apply
    from mirage_tpu.nn.layers import layer_norm
    want = x + attention_apply(p["attn"], layer_norm(p["norm1"], x), h,
                               impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)

    got_m = mlp_block(x, p["norm2"], p["mlp"], interpret=True)
    from mirage_tpu.nn.layers import mlp_apply
    want_m = x + mlp_apply(p["mlp"], layer_norm(p["norm2"], x))
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-3, rtol=1e-3)


def test_mlp_block_no_residual_matches(rng):
    """residual=False returns MLP(LN(x)) without the skip-add (seg fast
    path's drop-path scaling needs the bare branch)."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.block import block_init
    from mirage_tpu.nn.layers import layer_norm, mlp_apply
    from mirage_tpu.ops.fused_mlp import mlp_block

    d = 64
    p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
    x = jnp.asarray(rng.standard_normal((2, 16, d)).astype(np.float32))
    got = mlp_block(x, p["norm2"], p["mlp"], interpret=True, residual=False)
    want = mlp_apply(p["mlp"], layer_norm(p["norm2"], x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
    # and the residual form still includes x
    got_r = mlp_block(x, p["norm2"], p["mlp"], interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(x + want),
                               atol=3e-5, rtol=1e-4)


def test_mlp_block_nores_vjp_matches(rng):
    """The no-residual custom VJP equals jax.vjp of (block - x): the
    residual's only contribution to the backward is the pass-through
    cotangent, so dx_nores = dx_res - g exactly."""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.block import block_init
    from mirage_tpu.ops.fused_mlp import (_mlp_block_nores_bwd_vjp,
                                          _mlp_block_xla)

    d = 48
    p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
    x = jnp.asarray(rng.standard_normal((3, 7, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((3, 7, d)).astype(np.float32))
    args = (x, p["norm2"]["scale"], p["norm2"]["bias"], p["mlp"]["fc1"]["w"],
            p["mlp"]["fc1"]["b"], p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"])

    def nores_ref(*a):
        return _mlp_block_xla(*a) - a[0]

    _, vjp = jax.vjp(nores_ref, *args)
    want = vjp(g)
    got = _mlp_block_nores_bwd_vjp(args, g)  # CPU backend -> XLA fallback
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w),
                                   atol=1e-5, rtol=1e-4)


def test_bwd_block_picker_tiers():
    """_pick_bwd_block: tier 1 honors the 48 MB perf budget; tier 2 (hidden
    dims whose fixed weight+accumulator term busts the budget, e.g. the
    ViT-L MLP at d=1024/hdim=4096 where 12*d*hdim ≈ 50 MB) degrades to a
    smaller divisor under the Mosaic ceiling instead of failing to compile;
    ragged row counts return None (padded rows would pollute the
    accumulators)."""
    from mirage_tpu.ops.fused_mlp import (_bwd_kernel_viable, _pick_bwd_block,
                                          _stash_viable)

    # ViT-B pretraining pad path: (256*112, 768) -> 256 (the measured pick)
    assert _pick_bwd_block(28672, 768, 3072, 18, 12 * 768 * 3072) == 256
    # seg ConvNeXt head: (131072, 384) -> 1024 (the measured pick)
    assert _pick_bwd_block(131072, 384, 1536, 18, 12 * 384 * 1536) == 1024
    # ViT-L MLP: fixed term ~50 MB > 48 MB budget -> tier-2 block, and the
    # total estimate stays under the ceiling (the old fallback picked 512,
    # whose ~88 MB request exceeds the 64 MB Mosaic limit)
    blk = _pick_bwd_block(28672, 1024, 4096, 18, 12 * 1024 * 4096)
    assert blk is not None and blk < 512
    assert blk * 4096 * 18 + 12 * 1024 * 4096 < 58 * 2 ** 20
    # ragged: no divisor in the candidate lists
    assert _pick_bwd_block(99, 768, 3072, 18, 12 * 768 * 3072) is None

    # viability wrappers: ViT-L-sized 2-D rows are viable post-fix; an
    # absurd hidden dim is not (caller falls back to the XLA backward)
    x = jnp.zeros((28672, 1024), jnp.bfloat16)
    assert _bwd_kernel_viable(x, 1024, 4096)
    x_huge = jnp.zeros((17, 2048), jnp.bfloat16)  # ragged + 16 MB weights
    assert not _bwd_kernel_viable(x_huge, 2048, 8192)
    assert _stash_viable(131072, 384, 1536)
    assert not _stash_viable(131071, 384, 1536)  # ragged -> plain VJP

    # unaligned-3-D routing: fewest accumulate programs wins (measured,
    # scripts/bench_mlp_bwd_flatten.py): pretraining flattens exactly
    # (99 programs vs 112 padded), cls FT pads (68 vs 257)
    from mirage_tpu.ops.fused_mlp import _route_unaligned_bwd
    assert _route_unaligned_bwd(256, 99, 768, 3072) == "flat"
    assert _route_unaligned_bwd(64, 257, 768, 3072) == "pad"
    assert _route_unaligned_bwd(256, 99, 1024, 4096) == "flat"  # ViT-L


def test_mlp_block_nores_grad_free_routes_through_custom_vjp(monkeypatch):
    """grad_free=True on the no-residual form must keep the custom_vjp
    wrapper: a raw pallas forward inside a grad program trips JAX's jvp
    bookkeeping (ad.py nonzeros assert) when a differentiated value feeds
    it — the seg parity-freeze topology (trainable input adapters, encoder-
    output stop-grad) is exactly that shape. (The TPU-only kernels can't
    execute on CPU, so this pins the dispatch, not the execution.)"""
    import jax
    import jax.numpy as jnp

    from mirage_tpu.nn.block import block_init
    from mirage_tpu.ops import fused_mlp

    calls = []
    monkeypatch.setattr(fused_mlp, "_mlp_block_nores",
                        lambda *a: calls.append("custom_vjp") or a[0])
    monkeypatch.setattr(
        fused_mlp, "_mlp_block_fwd",
        lambda *a, **k: calls.append("raw") or a[0])

    d = 48
    p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
    x = jnp.zeros((2, 8, d), jnp.float32)
    fused_mlp.mlp_block(x, p["norm2"], p["mlp"], grad_free=True,
                        residual=False)
    assert calls == ["custom_vjp"]
