"""Int8 quantized MLP half-block (ops/quant.py — a documented NEGATIVE
result on v5e, no dispatch engages it): interpret-mode kernel vs the XLA
reference math, and approximation error vs the unquantized block. Pins the
math so the module can be wired back up if a future toolchain exposes the
int8 MXU rate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mirage_tpu.nn.block import block_init
from mirage_tpu.nn.layers import layer_norm, mlp_apply
from mirage_tpu.ops.quant import (mlp_block_q, mlp_block_q_xla,
                                  quantize_mlp_params, quantize_weight)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8
    back = wq.astype(jnp.float32) * s[None, :]
    # per-channel symmetric int8: max error = half a quantization step
    err = np.abs(np.asarray(back - w))
    step = np.asarray(s)[None, :]
    assert (err <= 0.5 * step + 1e-7).all()
    # stacked (L, in, out) layout quantizes per (layer, channel)
    ws = jnp.stack([w, 10.0 * w])
    wqs, ss = quantize_weight(ws)
    np.testing.assert_allclose(np.asarray(ss[1]), 10.0 * np.asarray(ss[0]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(wqs[0]), np.asarray(wq))


@pytest.mark.parametrize("shape", [(12, 64), (2, 7, 64), (2, 16, 64)])
def test_quant_kernel_matches_xla_math(rng, shape):
    d = shape[-1]
    p = block_init(jax.random.PRNGKey(0), d, qkv_bias=True)
    q = quantize_mlp_params(p["mlp"])
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = mlp_block_q(x, p["norm2"], q, interpret=True)
    want = mlp_block_q_xla(x, p["norm2"], q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_quant_output_close_to_bf16_block(rng):
    """The int8 path approximates the real block: per-row int8 activations x
    per-channel int8 weights keep the MLP branch within ~2% relative error —
    the serving-accuracy contract the wrapper's quantize='int8' documents."""
    d = 128
    p = block_init(jax.random.PRNGKey(1), d, qkv_bias=True)
    q = quantize_mlp_params(p["mlp"])
    x = jnp.asarray(rng.standard_normal((33, d)).astype(np.float32))
    got = mlp_block_q_xla(x, p["norm2"], q)
    want = x + mlp_apply(p["mlp"], layer_norm(p["norm2"], x))
    branch = np.asarray(want - x)
    err = np.abs(np.asarray(got - want))
    rel = np.linalg.norm(err) / np.linalg.norm(branch)
    assert rel < 0.02, rel
