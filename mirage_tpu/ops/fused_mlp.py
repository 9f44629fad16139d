"""Pallas TPU fused pre-LN MLP half-block: out = x + fc2(gelu(fc1(LN(x)))).

The encoder hot loop's dominant fusion in round 2's trace was the XLA
proj/MLP group running at ~69% MFU — HBM-bound on the (B*N, 4D)
intermediates (the fc1 output alone is 100 MB at the flagship shape, read
and written around the gelu). This kernel keeps the whole second half of a
transformer block (mirage/utils.py:251-262: norm2 -> fc1 -> exact-erf GELU
-> fc2 -> residual add) in VMEM:

  - grid over row-blocks of the flattened (B*N, D) token stream; the fc1/fc2
    weights use constant index maps, so Mosaic keeps them VMEM-resident
    across the whole grid (one HBM read of 16.8 MB total at D=1024).
  - HBM traffic per layer drops from ~300 MB (x + intermediates + out) to
    ~67 MB (x read + out write + weights once).
  - LayerNorm (f32, eps 1e-6) and GELU (f32, exact erf — parity-critical,
    nn/layers.py:19-22) run on the in-VMEM blocks; matmuls accumulate f32 on
    the MXU.

Backward: custom_vjp recomputes through the plain XLA ops (inference is the
primary user; training keeps full fidelity via the recompute).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

_SQRT2 = 1.4142135623730951


def _erf(x):
    """f32 erf for the kernel (Pallas TPU has no erf lowering).
    Abramowitz & Stegun 7.1.26: max abs error 1.5e-7 — far below bf16
    activation precision (~3e-3 relative); the f32/CPU parity paths use the
    XLA erf, not this kernel."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    if x.ndim == 3:  # (1, N, D) batch-element block of a 3-D operand
        x = x[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h / _SQRT2))  # erf GELU (see _erf)
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    out = x + o.astype(x.dtype)
    o_ref[...] = out if o_ref.shape == out.shape else out[None]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, block_rows: int = 512,
                   interpret: bool = False):
    d = x.shape[-1]
    hdim = w1.shape[-1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        # weights (16.8 MB bf16 at D=1024) stay VMEM-resident across the
        # grid; the default 16 MB scoped-vmem limit is just short of
        # weights + double-buffered row blocks (v5e has 128 MB VMEM)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    # constant index maps: Mosaic keeps these blocks VMEM-resident across
    # the grid
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                             (hdim, d), (1, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hdim),
            w2, b2.reshape(1, d))
    if x.ndim == 3 and x.shape[1] % 16 == 0:
        # Tile-aligned token counts (e.g. the 256-query decoders): the
        # flatten is a free bitcast in the (8,128)/(16,128) tiled layout, so
        # the row-blocked 2-D grid (bigger programs, less per-program
        # overhead) beats one-program-per-batch-element.
        b, n, _ = x.shape
        return _mlp_block_fwd(x.reshape(b * n, d), gamma, beta, w1, b1, w2,
                              b2, block_rows=block_rows,
                              interpret=interpret).reshape(b, n, d)
    if x.ndim == 3:
        # keep the unaligned operand 3-D: a flatten outside the kernel forces
        # XLA to copy VMEM-resident loop activations to HBM and back around
        # the custom call (measured 3.2 ms/step at the flagship 257-token
        # shape, whose rows are not tile-aligned)
        b, n, _ = x.shape
        out = pl.pallas_call(
            _mlp_kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] + w_specs,
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
            interpret=interpret,
            **kwargs,
        )(x, *flat)
        return out
    m = x.shape[0]
    blk = min(block_rows, m)
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(pl.cdiv(m, blk),),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(x, *flat)
    return out


def _mlp_block_xla(x, gamma, beta, w1, b1, w2, b2):
    """Reference path (identical ops via nn.layers) for backward recompute
    and CPU fallback."""
    from mirage_tpu.nn.layers import layer_norm, mlp_apply

    h = layer_norm({"scale": gamma, "bias": beta}, x)
    h = mlp_apply({"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}, h)
    return x + h


@jax.custom_vjp
def _mlp_block(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2)


def _mlp_block_fwd_vjp(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2), \
        (x, gamma, beta, w1, b1, w2, b2)


def _mlp_block_bwd_vjp(res, g):
    _, vjp = jax.vjp(_mlp_block_xla, *res)
    return vjp(g)


_mlp_block.defvjp(_mlp_block_fwd_vjp, _mlp_block_bwd_vjp)


def mlp_block(x, norm2, mlp, interpret: bool = False):
    """Fused x + MLP(LN(x)) over pytree params ({'scale','bias'},
    {'fc1','fc2'}). Differentiable (backward recomputes via XLA)."""
    args = (x, norm2["scale"], norm2["bias"], mlp["fc1"]["w"], mlp["fc1"]["b"],
            mlp["fc2"]["w"], mlp["fc2"]["b"])
    if interpret:
        return _mlp_block_fwd(*args, interpret=True)
    return _mlp_block(*args)
