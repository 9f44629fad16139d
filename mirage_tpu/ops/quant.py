"""Int8 quantized MLP half-block — KEPT AS A DOCUMENTED NEGATIVE RESULT.

The v5e datasheet advertises 394 TOPS int8 vs 197 TFLOP/s bf16, so a
weight+activation int8 path for the encoder's MLP matmuls looked like a
~1.4x serving win. Measured on the chip (round 3, scripts/bench_int8.py),
neither lowering reaches the int8 MXU mode through this toolchain:

  - XLA `dot_general(s8, s8, preferred_element_type=s32)` runs at exactly
    the bf16 rate (138.3 TOP/s vs 138.6 TF/s on a 16384x8192x8192 control;
    0.93-1.00x across the flagship MLP/qkv shapes) — no win, and the
    quantize/dequantize VPU passes plus the lost bf16 kernel fusion make
    an end-to-end int8 path strictly slower.
  - A Mosaic (Pallas) s8xs8->s32 dot compiles and is bit-exact but runs at
    2.3 TOP/s (~26x SLOWER than the bf16 MXU path) — scalar/VPU emulation,
    not the MXU int8 mode.

Accordingly there is NO quantize= dispatch anywhere (nn/block.py and the
wrapper stay bf16-only). The module is kept because the math is correct
and unit-tested (tests/test_quant.py) — if a future XLA/libtpu exposes the
int8 MXU rate, re-run scripts/bench_int8.py and wire this back up
(per-channel weight scales at load; per-token activation scales in-kernel;
the int32 accumulator dequantizes exactly as acc * rs[i] * s[n] + b).

Reference behavior approximated: mirage/utils.py:251-262 (the MLP half of
Block.forward); quantization error ~1-2% relative on the MLP branch.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mirage_tpu.ops.fused_mlp import _HAVE_PLTPU, _LOG2E, _SQRT2, _erf

if _HAVE_PLTPU:  # pragma: no cover - TPU builds only
    from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w):
    """Symmetric per-output-channel int8: w (..., in, out) -> (wq int8,
    scale f32 (..., out)). Stacked (L, in, out) encoder weights quantize
    per (layer, channel) — the abs-max runs over the contraction axis."""
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=-2) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    wq = jnp.clip(jnp.round(w32 / s[..., None, :]), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_mlp_params(mlp):
    """{'fc1': {'w','b'}, 'fc2': {'w','b'}} -> quantized tree (weights int8 +
    f32 scales; biases f32). Detected by block_apply via the 'wq' key."""
    w1q, s1 = quantize_weight(mlp["fc1"]["w"])
    w2q, s2 = quantize_weight(mlp["fc2"]["w"])
    return {
        "fc1": {"wq": w1q, "s": s1,
                "b": jnp.asarray(mlp["fc1"]["b"], jnp.float32)},
        "fc2": {"wq": w2q, "s": s2,
                "b": jnp.asarray(mlp["fc2"]["b"], jnp.float32)},
    }


def _quant_rows(y32):
    """Dynamic symmetric per-row int8: (yq, row_scale (rows, 1) f32)."""
    rs = jnp.max(jnp.abs(y32), axis=-1, keepdims=True) / 127.0
    rs = jnp.where(rs == 0.0, 1.0, rs)
    yq = jnp.clip(jnp.round(y32 / rs), -127, 127).astype(jnp.int8)
    return yq, rs


def _mlp_q_math(x, gamma, beta, w1q, s1, b1, w2q, s2, b2):
    """Shared kernel/XLA math on one (M, D) row block (f32 internals)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    yq, rs = _quant_rows(y)
    h = jax.lax.dot_general(yq, w1q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * rs * s1.astype(jnp.float32) \
        + b1.astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h / _SQRT2))
    aq, as_ = _quant_rows(h)
    o = jax.lax.dot_general(aq, w2q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * as_ * s2.astype(jnp.float32) \
        + b2.astype(jnp.float32)
    return x + o.astype(x.dtype)


def _mlp_q_kernel(x_ref, g_ref, be_ref, w1q_ref, s1_ref, b1_ref, w2q_ref,
                  s2_ref, b2_ref, o_ref):
    x = x_ref[...]
    if x.ndim == 3:
        x = x[0]
    out = _mlp_q_math(x, g_ref[...], be_ref[...], w1q_ref[...], s1_ref[...],
                      b1_ref[...], w2q_ref[...], s2_ref[...], b2_ref[...])
    o_ref[...] = out if o_ref.shape == out.shape else out[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_block_q_fwd(x, gamma, beta, w1q, s1, b1, w2q, s2, b2,
                     interpret: bool = False):
    d = x.shape[-1]
    hdim = w1q.shape[-1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim), (1, hdim),
                             (hdim, d), (1, d), (1, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1q, s1.reshape(1, hdim),
            b1.reshape(1, hdim), w2q, s2.reshape(1, d), b2.reshape(1, d))
    if x.ndim == 3 and x.shape[1] % 16 == 0:
        # tile-aligned token counts: free bitcast flatten to the row-blocked
        # 2-D grid (same reasoning as fused_mlp._mlp_block_fwd)
        b, n, _ = x.shape
        return _mlp_block_q_fwd(x.reshape(b * n, d), gamma, beta, w1q, s1,
                                b1, w2q, s2, b2,
                                interpret=interpret).reshape(b, n, d)
    if x.ndim == 3:
        b, n, _ = x.shape
        return pl.pallas_call(
            _mlp_q_kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] + w_specs,
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            interpret=interpret,
            **kwargs,
        )(x, *flat)
    m = x.shape[0]
    blk = min(512, m)
    for cand in (4096, 2048, 1024):
        if m % cand == 0 and cand * hdim * 10 < 40 * 2 ** 20:
            blk = cand
            break
    return pl.pallas_call(
        _mlp_q_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(pl.cdiv(m, blk),),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(x, *flat)


def mlp_block_q(x, norm2, qmlp, interpret: bool = False):
    """Fused x + MLP_int8(LN(x)). qmlp from quantize_mlp_params. Forward
    only (serving); do not differentiate through it."""
    return _mlp_block_q_fwd(
        x, norm2["scale"], norm2["bias"], qmlp["fc1"]["wq"], qmlp["fc1"]["s"],
        qmlp["fc1"]["b"], qmlp["fc2"]["wq"], qmlp["fc2"]["s"],
        qmlp["fc2"]["b"], interpret=interpret)


def mlp_block_q_xla(x, norm2, qmlp):
    """Same math, plain XLA (CPU fallback / exactness reference for the
    interpret-mode kernel test)."""
    orig_shape = x.shape
    if x.ndim == 3:
        x = x.reshape(-1, x.shape[-1])
    out = _mlp_q_math(x, norm2["scale"], norm2["bias"], qmlp["fc1"]["wq"],
                      qmlp["fc1"]["s"], qmlp["fc1"]["b"], qmlp["fc2"]["wq"],
                      qmlp["fc2"]["s"], qmlp["fc2"]["b"])
    return out.reshape(orig_shape)
