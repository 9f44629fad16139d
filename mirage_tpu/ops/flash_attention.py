"""Pallas TPU fused attention for MIRAGE-scale sequences.

Replaces the reference's F.scaled_dot_product_attention (mirage/utils.py:181,
:216) — the dominant op of the encoder/decoder hot loop.

Design notes (TPU v5e):
  - MIRAGE sequence lengths are small (99..1025 tokens, head_dim 32/64): the
    full K/V for one (batch, head) is <1 MB and fits comfortably in VMEM, so
    the kernel processes a block of queries against ALL keys in a single pass
    (plain max-subtracted softmax) — no online-softmax rescaling loop, no HBM
    round-trip for the scores matrix, minimal bookkeeping.
  - Grid: (B*H, ceil(Nq/block_q)); scores/softmax in f32 on the MXU/VPU.
  - Sequence lengths are padded to the 128-lane tile; key padding is masked
    with a large negative before softmax, query padding is sliced off.
  - Backward: a dedicated Pallas flash backward (custom_vjp saves only the
    per-row logsumexp; dQ/dK/dV are computed in one kernel that recomputes
    probs blockwise in VMEM — no HBM round-trip for the (N,N) matrices).
    Measured on v5e seg tuning (N=1025): removed the XLA-recompute probs
    round-trips, 198->171 ms/step (BASELINE.md).
"""

import functools

import jax

_LOG2E = 1.4426950408889634  # exp via native exp2
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from mirage_tpu.ops import runtime as _rt

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m) * _LOG2E)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_q_for(nq_pad: int) -> int:
    # Prefer one program per (b, h) for short sequences: per-program overhead
    # dominates the tiny matmuls (measured at N=257 on v5e).
    if nq_pad <= 512:
        return nq_pad
    for cand in (512, 384, 256, 128):
        if nq_pad % cand == 0:
            return cand
    return 128


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _flash_fwd(q, k, v, sm_scale: float, interpret: bool = False):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_pad = pl.cdiv(nq, 128) * 128
    nk_pad = pl.cdiv(nk, 128) * 128
    block_q = _block_q_for(nq_pad)

    qr = _pad_to(q.reshape(b * h, nq, d), nq_pad, axis=1)
    kr = _pad_to(k.reshape(b * h, nk, d), nk_pad, axis=1)
    vr = _pad_to(v.reshape(b * h, nk, d), nk_pad, axis=1)

    grid = (b * h, nq_pad // block_q)
    kernel = functools.partial(_attn_kernel, kv_len=nk, scale=sm_scale)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
        **kwargs,
    )(qr, kr, vr)
    return out[:, :nq].reshape(b, h, nq, d)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     kv_len: int, scale: float):
    """Backward for one query block against the full K/V of one (b, h).

    Recomputes P in VMEM (never materializing the scores in HBM), then:
      dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(P ∘ dP)) · scale
      dQ_blk = dS K;  dK += dSᵀ Q_blk;  dV += Pᵀ dO_blk
    dK/dV revisit the same output block across query blocks (the grid's
    second dim is 'arbitrary' = sequential), accumulating in f32.
    """
    j = pl.program_id(1)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * _LOG2E)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (bq, nk) f32

    # dO/V stay in their input dtype: bf16 values are exact in f32, and the
    # MXU accumulates in f32 regardless — identical numerics to an upcast
    # dot, but Mosaic emits one bf16 matmul pass instead of a multi-pass
    # f32 one (the f32 dP dot was ~25% of this kernel by floor arithmetic)
    dp = jax.lax.dot_general(
        do_ref[0], v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bq, nk) f32
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # (bq, nk) f32

    dq = jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_blk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nk, d)
    dv_blk = jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (nk, d)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] += dk_blk.astype(dk_ref.dtype)
        dv_ref[0] += dv_blk.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def _flash_bwd(q, k, v, do, sm_scale: float, interpret: bool = False):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_pad = pl.cdiv(nq, 128) * 128
    nk_pad = pl.cdiv(nk, 128) * 128
    block_q = _block_q_for(nq_pad)

    qr = _pad_to(q.reshape(b * h, nq, d), nq_pad, axis=1)
    kr = _pad_to(k.reshape(b * h, nk, d), nk_pad, axis=1)
    vr = _pad_to(v.reshape(b * h, nk, d), nk_pad, axis=1)
    dor = _pad_to(do.reshape(b * h, nq, d), nq_pad, axis=1)

    grid = (b * h, nq_pad // block_q)
    kernel = functools.partial(_attn_bwd_kernel, kv_len=nk, scale=sm_scale)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nk_pad, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
        **kwargs,
    )(qr, kr, vr, dor)
    dq = dq[:, :nq].reshape(b, h, nq, d)
    dk = dk[:, :nk].reshape(b, h, nk, d).astype(k.dtype)
    dv = dv[:, :nk].reshape(b, h, nk, d).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, sm_scale):
    return _flash_fwd(q, k, v, sm_scale, interpret=_rt.interpret())


def _flash_fwd_vjp(q, k, v, sm_scale):
    return _flash_fwd(q, k, v, sm_scale, interpret=_rt.interpret()), (q, k, v)


def _flash_bwd_vjp(sm_scale, res, g):
    q, k, v = res
    return _flash_bwd(q, k, v, g, sm_scale, interpret=_rt.interpret())


_flash.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention(q, k, v, sm_scale: float, interpret: bool = False):
    """Fused attention over (B, H, N, Dh), differentiable end-to-end in
    Pallas (fwd kernel + flash backward kernel; scores never touch HBM).
    `interpret=True` runs the kernels in the Pallas interpreter (CPU
    testing)."""
    if interpret:
        return _flash_fwd(q, k, v, sm_scale, interpret=True)
    return _flash(q, k, v, sm_scale)


def flash_attention_bwd_interpret(q, k, v, do, sm_scale: float):
    """Interpreter-mode backward (CPU tests)."""
    return _flash_bwd(q, k, v, do, sm_scale, interpret=True)
