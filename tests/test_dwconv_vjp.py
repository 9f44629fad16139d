"""Shift-VJP depthwise conv (nn/conv.py MIRAGE_DWCONV_VJP=shift) — grad
parity vs XLA autodiff.

The custom VJP replaces XLA's batch_group_count=C dW lowering with kh·kw
shifted multiply-reduces (14.7× on the TPU micro, scripts/bench_dwconv.py);
the forward is the identical lax conv, so only the backward needs pinning.
Covers the production call site (adapters/seg_heads.py:86 — 7×7, pad 3,
stride 1, NHWC) plus an asymmetric-shape case, in f32 at 1e-5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mirage_tpu.nn.conv as conv_mod
from mirage_tpu.nn.conv import conv2d_nhwc


def _grads(p, x, cotan):
    def f(p, x):
        y = conv2d_nhwc(p, x, padding=3, groups=x.shape[-1])
        return jnp.sum(y * cotan)

    return jax.grad(f, argnums=(0, 1))(p, x)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 9, 13, 8)])
def test_shift_vjp_matches_autodiff(monkeypatch, shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    p = {"w": jnp.asarray(rng.standard_normal((c, 1, 7, 7)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((c,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    cotan = jnp.asarray(rng.standard_normal((*shape[:-1], c)), jnp.float32)

    monkeypatch.setattr(conv_mod, "_DWCONV_VJP", "xla")
    (dp_a, dx_a) = _grads(p, x, cotan)
    monkeypatch.setattr(conv_mod, "_DWCONV_VJP", "shift")
    (dp_s, dx_s) = _grads(p, x, cotan)

    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_s["w"]), np.asarray(dp_a["w"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_s["b"]), np.asarray(dp_a["b"]),
                               rtol=1e-5, atol=1e-5)


def test_shift_route_forward_identical(monkeypatch):
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.standard_normal((8, 1, 7, 7)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal((8,)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    monkeypatch.setattr(conv_mod, "_DWCONV_VJP", "xla")
    y_a = conv2d_nhwc(p, x, padding=3, groups=8)
    monkeypatch.setattr(conv_mod, "_DWCONV_VJP", "shift")
    y_s = conv2d_nhwc(p, x, padding=3, groups=8)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_s))


def test_shift_route_guard(monkeypatch):
    """Non-depthwise / strided / NCHW convs must NOT take the custom VJP."""
    from mirage_tpu.nn.conv import conv2d

    monkeypatch.setattr(conv_mod, "_DWCONV_VJP", "shift")
    rng = np.random.default_rng(2)
    # plain dense conv, NCHW — guard must fall through to lax (and stay
    # differentiable end-to-end)
    p = {"w": jnp.asarray(rng.standard_normal((4, 8, 3, 3)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 10)), jnp.float32)
    g = jax.grad(lambda p, x: jnp.sum(conv2d(p, x, padding=1) ** 2),
                 argnums=0)(p, x)
    assert np.isfinite(np.asarray(g["w"])).all()
    # strided depthwise NHWC — also falls through
    pd = {"w": jnp.asarray(rng.standard_normal((8, 1, 7, 7)), jnp.float32)}
    xl = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    y = conv2d(pd, xl, stride=2, padding=3, groups=8, channels_last=True)
    assert y.shape == (2, 8, 8, 8)
