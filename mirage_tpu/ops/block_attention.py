"""Pallas TPU fused attention for SHORT sequences (N <= ~512).

Covers the two headline MIRAGE workloads the flash kernel in
ops/flash_attention.py does not: MIRAGE-Large inference (257 tokens) and
pretraining (99 visible tokens). Replaces the reference's
F.scaled_dot_product_attention (mirage/utils.py:181) on these shapes.

Why a separate kernel: at N=257 the flash kernel's (B*H,)-sized grid loses to
plain XLA — per-program overhead dominates matmuls this small, and the HBM
pad-to-128 copies cost more than the attention itself (measured on v5e,
BASELINE.md round 1). This kernel instead:

  - takes the RAW fused-qkv projection output (B, N, 3*D) — the natural
    layout coming off the MXU — and emits (B, N, D), the natural input of
    the out-projection. The (B,N,3,H,Dh)->(3,B,H,N,Dh) transpose and the
    head-merge transpose of the generic path never materialize in HBM.
  - runs ONE grid program per batch element (48 programs at the bench batch,
    not 48*16) and loops the heads inside, so per-program overhead amortizes
    over all heads while Mosaic pipelines the next element's DMA.
  - keeps the whole (N, N) score matrix per head in VMEM: plain
    max-subtracted softmax, f32, no online-softmax bookkeeping, and no HBM
    round-trip for probabilities (the XLA path materializes them).
  - uses no padding at the HBM level: blocks span the full (unaligned)
    N and 3D dims and Mosaic masks the ragged tiles.

VMEM per program at the flagship shape (N=257, D=1024): qkv 1.6 MB + out
0.5 MB + scores 0.3 MB, double-buffered — comfortably inside the ~16 MB
budget.

Backward: a matching Pallas kernel in the same packed layout (saves only the
qkv; P is recomputed blockwise in VMEM, dQKV written back as one (B, N, 3D)
tensor — the natural cotangent of the fused qkv projection). An earlier
XLA-recompute backward regressed remat'd pretraining 632->583 img/s (remat
re-runs the forward, so the recompute tripled the attention work).
"""

import functools

# exp via the native exp2 (jnp.exp lowers to a slower path on this target;
# measured ~0.03 ms/layer on the flagship attention half, scripts/bench_vpu.py)
_LOG2E = 1.4426950408889634

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from mirage_tpu.ops import runtime as _rt
from mirage_tpu.ops.fused_mlp import _pad8


def _block_attn_kernel(qkv_ref, o_ref, s_scratch, *, num_heads: int,
                       dim: int, scale: float, elems: int = 1):
    dh = dim // num_heads
    # 3 phases: all score matmuls, ONE softmax over every head, all PV
    # matmuls (batching the VPU work measured ~10% faster than per-head
    # MXU<->VPU interleaving)
    for ei in range(elems):
        x = qkv_ref[ei]  # (N, 3D) in compute dtype
        for h in range(num_heads):
            q = x[:, h * dh:(h + 1) * dh]
            k = x[:, dim + h * dh:dim + (h + 1) * dh]
            s_scratch[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * _LOG2E)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
        for h in range(num_heads):
            v = x[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            o = jax.lax.dot_general(
                s_scratch[h].astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # normalize the (N, Dh) output, not the (N, N) probs: Dh/N times
            # less VPU work for the same math
            o_ref[ei, :, h * dh:(h + 1) * dh] = (o / l[h]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _block_attn_fwd(qkv, num_heads: int, scale: float, interpret: bool = False):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    elems = _pick_elems(b, dim)
    kernel = functools.partial(_block_attn_kernel, num_heads=num_heads,
                               dim=dim, scale=scale, elems=elems)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        grid=(b // elems,),
        in_specs=[pl.BlockSpec((elems, n, three_d), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((elems, n, dim), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((num_heads, n, n), jnp.float32)]
        if _HAVE_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(qkv)


def _block_attn_bwd_kernel(qkv_ref, do_ref, dqkv_ref, s_scratch, dp_scratch,
                           *, num_heads: int, dim: int, scale: float,
                           elems: int = 1):
    """dQKV in the same packed (N, 3D) layout.
    Standard attention backward with P recomputed in VMEM:
      dP = dO Vᵀ; dS = P ∘ (dP − rowsum(P ∘ dP)) · scale
      dQ = dS K; dK = dSᵀ Q; dV = Pᵀ dO
    Phase-batched like the forward (all score matmuls, ONE softmax + ONE
    delta/dS pass over every head, then all dq/dk/dv matmuls): the per-head
    (N, N) VPU work serialized MXU<->VPU 2*H times per program before —
    visible as the 9x-above-floor decoder backwards in the round-3 trace.
    """
    dh = dim // num_heads
    for ei in range(elems):
        x = qkv_ref[ei]
        do = do_ref[ei]
        for h in range(num_heads):
            q = x[:, h * dh:(h + 1) * dh]
            k = x[:, dim + h * dh:dim + (h + 1) * dh]
            s_scratch[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[...]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * _LOG2E)
        s_scratch[...] = e / jnp.sum(e, axis=-1, keepdims=True)  # P
        for h in range(num_heads):
            v = x[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            do_h = do[:, h * dh:(h + 1) * dh]
            dp_scratch[h] = jax.lax.dot_general(
                do_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        p_all = s_scratch[...]
        dp_all = dp_scratch[...]
        delta = jnp.sum(p_all * dp_all, axis=-1, keepdims=True)
        dp_scratch[...] = p_all * (dp_all - delta) * scale  # dS, f32
        for h in range(num_heads):
            q = x[:, h * dh:(h + 1) * dh]
            k = x[:, dim + h * dh:dim + (h + 1) * dh]
            do_h = do[:, h * dh:(h + 1) * dh]
            ds = dp_scratch[h].astype(x.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(
                s_scratch[h].astype(do_h.dtype), do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[ei, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[ei, :, dim + h * dh:dim + (h + 1) * dh] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[ei, :, 2 * dim + h * dh:2 * dim + (h + 1) * dh] = \
                dv.astype(dqkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _block_attn_bwd(qkv, do, num_heads: int, scale: float,
                    interpret: bool = False):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    elems = _pick_elems(b, dim)
    kernel = functools.partial(_block_attn_bwd_kernel, num_heads=num_heads,
                               dim=dim, scale=scale, elems=elems)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        # the two (H, N, N) f32 phase scratches push past the default 16 MB
        # scoped budget at the cls-FT shape (H=12, N=257)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, three_d), qkv.dtype),
        grid=(b // elems,),
        in_specs=[
            pl.BlockSpec((elems, n, three_d), lambda i: (i, 0, 0)),
            pl.BlockSpec((elems, n, dim), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((elems, n, three_d), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((num_heads, n, n), jnp.float32),
                        pltpu.VMEM((num_heads, n, n), jnp.float32)]
        if _HAVE_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(qkv, do)


def _attn_xla(qkv, num_heads: int, scale: float):
    """Reference path on the same (B, N, 3D) layout (used for the backward
    recompute and as the CPU fallback)."""
    b, n, three_d = qkv.shape
    dim = three_d // 3
    dh = dim // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, dh)
    q = qkv5[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv5[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _block_attn(qkv, num_heads, scale):
    return _block_attn_fwd(qkv, num_heads, scale, interpret=_rt.interpret())


def _block_attn_fwd_vjp(qkv, num_heads, scale):
    return _block_attn_fwd(qkv, num_heads, scale,
                           interpret=_rt.interpret()), (qkv,)


def _block_attn_bwd_vjp(num_heads, scale, res, g):
    (qkv,) = res
    # The decoder-dim (256/dh=32) Pallas backward runs ~9x above its MXU
    # floor (per-head (N, 32) matmuls are latency-bound; round-3 pretrain
    # trace: 6 x 1.95 ms/step) — but the XLA-recompute alternative measured
    # WORSE at the pretraining batch (pretrain 944 -> ~880 img/s): XLA
    # materializes the (B, H, N, N) probabilities twice (fwd recompute +
    # bwd), ~1.6 GB of HBM traffic per decoder block at B=256. Kept Pallas.
    return (_block_attn_bwd(qkv, g, num_heads, scale,
                            interpret=_rt.interpret()),)


_block_attn.defvjp(_block_attn_fwd_vjp, _block_attn_bwd_vjp)


# ---------------------------------------------------------------------------
# Whole first half of a transformer block (inference):
#   out = x + proj(attention(qkv(LN1(x))))
# One grid program per batch element; Wqkv/Wproj VMEM-resident across the
# grid. Removes the remaining HBM round-trips of the attention half: the LN
# output, the (B, N, 3D) qkv tensor, and the pre-proj attention output never
# leave VMEM.
# ---------------------------------------------------------------------------

def _attn_half_kernel(x_ref, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
                      bp_ref, o_ref, attn_scratch, s_scratch, *,
                      num_heads: int, dim: int, scale: float, elems: int = 1):
    dh = dim // num_heads
    for ei in range(elems):  # small-dim shapes amortize per-program overhead
        x = x_ref[ei]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        # one-pass moments (E[x^2] - mean^2): one fewer sweep over (N, D);
        # f32 accumulation keeps the cancellation error ~eps*(1 + mean^2/var)
        var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)  # cancellation can go negative
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
        y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
        y = y.astype(x.dtype)
        qkv = jax.lax.dot_general(
            y, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
        # 3 phases (measured 10% faster than interleaving per head: batches
        # the VPU softmax into one big op instead of H MXU<->VPU ping-pongs)
        for h in range(num_heads):  # phase 1: all score matmuls
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
            s_scratch[h] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[...]  # phase 2: one softmax over all heads (unnormalized)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * _LOG2E)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
        for h in range(num_heads):  # phase 3: all PV matmuls, normalized
            v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
            o = jax.lax.dot_general(
                s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
        out = jax.lax.dot_general(
            attn_scratch[...], wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bp_ref[...].astype(jnp.float32)
        o_ref[ei] = x + out.astype(x.dtype)


def _pick_elems(b: int, d: int) -> int:
    """Batch elements per grid program. Small-dim decoder shapes (D<=512)
    are per-program-overhead-bound, so loop several elements per program;
    the large encoder shapes stay at 1 (compute-bound already)."""
    if d > 512:
        return 1
    for e in (4, 2):
        if b % e == 0:
            return e
    return 1


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _attn_half_fwd(x, gamma, beta, wqkv, bqkv, wproj, bproj, num_heads: int,
                   scale: float, interpret: bool = False):
    b, n, d = x.shape
    # (4 elements per program at short sequences measured FLAT on the
    # pretraining fwd — the ~40% per-program overhead implied by the 60% MFU
    # at N=99 is apparently DMA-pipelined, not serialized)
    elems = _pick_elems(b, d)
    kernel = functools.partial(_attn_half_kernel, num_heads=num_heads,
                               dim=d, scale=scale, elems=elems)
    kwargs = {}
    if not _HAVE_PLTPU:  # pragma: no cover — gated to TPU/interpret paths
        raise RuntimeError("attn_half_block requires pallas TPU support")
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    scratch = [pltpu.VMEM((n, d), x.dtype),
               pltpu.VMEM((num_heads, n, n), jnp.float32)]
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        grid=(b // elems,),
        in_specs=[
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(x, gamma.reshape(1, d), beta.reshape(1, d), wqkv, bqkv.reshape(1, 3 * d),
      wproj, bproj.reshape(1, d))


# ---------------------------------------------------------------------------
# Pallas backward for the attention half-block: dx + all parameter grads.
# Recomputes LN -> qkv -> attention blockwise in VMEM (nothing saved but the
# inputs, so it composes with remat at zero extra cost) and accumulates f32
# dWqkv/dWproj/dLN across a sequential grid — same reduction pattern as
# ops/fused_mlp.py. Replaces the XLA backward group that ran behind
# (B,N,3D) layout copies in the pretraining trace.
# ---------------------------------------------------------------------------

def _attn_half_bwd_rows(x, dy, g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
                        s_scratch, dp_scratch, attn_scratch, *, num_heads,
                        dim, scale, defused: bool = False):
    """Backward math for one (N, D) element. Returns
    (dx, dgamma, dbeta, dwqkv, dbqkv, dwproj, dbproj); param grads f32.
    defused=True skips the in-kernel dW/db matmuls and instead returns
    (dx, dgamma, dbeta, y, dqkv_cotangent, attn_out) so the caller can
    materialize the intermediates and leave the weight-grad contractions
    to XLA (see _attn_half_bwd_defused)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)  # cancellation can go negative
    inv = jax.lax.rsqrt(var + 1e-6)
    yhat = (x32 - mean) * inv
    g32 = g_ref[...].astype(jnp.float32)
    y = (yhat * g32 + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    wqkv_c = wqkv_ref[...].astype(x.dtype)
    wp_c = wp_ref[...].astype(x.dtype)
    qkv = jax.lax.dot_general(y, wqkv_c, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    dh = dim // num_heads
    # forward attention recompute (3-phase; e kept in s_scratch, l as value)
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        s_scratch[h] = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    s = s_scratch[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * _LOG2E)
    l = jnp.sum(e, axis=-1, keepdims=True)
    s_scratch[...] = e / l  # normalized probabilities P
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        o = jax.lax.dot_general(
            s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn_scratch[:, h * dh:(h + 1) * dh] = o.astype(x.dtype)
    attn_out = attn_scratch[...]
    # projection backward
    dy32 = dy.astype(jnp.float32)
    if not defused:
        dbproj = jnp.sum(dy32, axis=0, keepdims=True)
        dwproj = jax.lax.dot_general(attn_out, dy, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dattn = jax.lax.dot_general(dy, wp_c, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(x.dtype)
    # attention backward, phase-batched like the forward: all dP matmuls,
    # ONE delta/ds elementwise pass over every head (the per-head (N, N) VPU
    # work between matmuls serialized MXU<->VPU 12x per layer), all dq/dk/dv
    for h in range(num_heads):
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        do_h = dattn[:, h * dh:(h + 1) * dh]
        dp_scratch[h] = jax.lax.dot_general(
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    p_all = s_scratch[...]
    dp_all = dp_scratch[...]
    delta = jnp.sum(p_all * dp_all, axis=-1, keepdims=True)
    dp_scratch[...] = p_all * (dp_all - delta) * scale  # dS, f32
    dqkv_cols = []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        ds = dp_scratch[h].astype(x.dtype)
        do_h = dattn[:, h * dh:(h + 1) * dh]
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(s_scratch[h].astype(do_h.dtype), do_h,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqkv_cols.append((dq, dk, dv))
    dqkv = jnp.concatenate(
        [c[0] for c in dqkv_cols] + [c[1] for c in dqkv_cols]
        + [c[2] for c in dqkv_cols], axis=-1)
    dqkv_c = dqkv.astype(x.dtype)
    # dbqkv summed from the f32 dqkv (pre-bf16-cast) in BOTH modes so the
    # defused impl's bias grads match the accumulating impl's numerics
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    if not defused:
        dwqkv = jax.lax.dot_general(y, dqkv_c, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dyln = jax.lax.dot_general(dqkv_c, wqkv_c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dyln * yhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dyln, axis=0, keepdims=True)
    dyhat = dyln * g32
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx = dy32 + inv * (dyhat - m1 - yhat * m2)
    if defused:
        return dx, dgamma, dbeta, dbqkv, y, dqkv_c, attn_out
    return dx, dgamma, dbeta, dwqkv, dbqkv, dwproj, dbproj


def _attn_half_bwd_kernel(x_ref, dy_ref, g_ref, be_ref, wqkv_ref, bqkv_ref,
                          wp_ref, dx_ref, dg_ref, dbe_ref, dwqkv_ref,
                          dbqkv_ref, dwp_ref, dbp_ref, attn_scratch,
                          s_scratch, dp_scratch, *, num_heads, dim, scale,
                          elems, reg_batch: bool = False):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    # reg_batch: sum the elems' parameter grads in REGISTERS and update the
    # VMEM accumulators ONCE per program — the per-element "+=" chain
    # serialized elems x 6 read-modify-writes (the dwqkv accumulator alone
    # is 7 MB f32 at d=768) against the element backwards
    acc = None
    for ei in range(elems):
        dx, *grads = _attn_half_bwd_rows(
            x_ref[ei], dy_ref[ei], g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
            s_scratch, dp_scratch, attn_scratch, num_heads=num_heads, dim=dim,
            scale=scale)
        dx_ref[ei] = dx.astype(dx_ref.dtype)
        if reg_batch:
            acc = grads if acc is None else [a + g for a, g in zip(acc, grads)]
        else:
            dg_ref[...] += grads[0]
            dbe_ref[...] += grads[1]
            dwqkv_ref[...] += grads[2]
            dbqkv_ref[...] += grads[3]
            dwp_ref[...] += grads[4]
            dbp_ref[...] += grads[5]
    if reg_batch:
        dg_ref[...] += acc[0]
        dbe_ref[...] += acc[1]
        dwqkv_ref[...] += acc[2]
        dbqkv_ref[...] += acc[3]
        dwp_ref[...] += acc[4]
        dbp_ref[...] += acc[5]


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret",
                                             "reg_batch"))
def _attn_half_bwd_pallas(x, dy, gamma, beta, wqkv, bqkv, wproj,
                          num_heads: int, scale: float,
                          interpret: bool = False, reg_batch: bool = False):
    b, n, d = x.shape
    elems = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
    kernel = functools.partial(_attn_half_bwd_kernel, num_heads=num_heads,
                               dim=d, scale=scale, elems=elems,
                               reg_batch=reg_batch)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential accumulation
            vmem_limit_bytes=64 * 1024 * 1024)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    grad_shapes = [
        jax.ShapeDtypeStruct((1, d), jnp.float32),       # dgamma
        jax.ShapeDtypeStruct((1, d), jnp.float32),       # dbeta
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),   # dwqkv
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),   # dbqkv
        jax.ShapeDtypeStruct((d, d), jnp.float32),       # dwproj
        jax.ShapeDtypeStruct((1, d), jnp.float32),       # dbproj
    ]
    grad_specs = [pl.BlockSpec(s.shape, lambda i: (0, 0)) for s in grad_shapes]
    dx, *grads = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype)] + grad_shapes,
        grid=(b // elems,),
        in_specs=[
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)),
        ],
        out_specs=[pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0))]
        + grad_specs,
        scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                        pltpu.VMEM((num_heads, n, n), jnp.float32),
                        pltpu.VMEM((num_heads, n, n), jnp.float32)]
        if _HAVE_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(x, dy, gamma.reshape(1, d), beta.reshape(1, d),
      wqkv.astype(x.dtype), bqkv.reshape(1, 3 * d), wproj.astype(x.dtype))
    return (dx, *grads)


def _attn_half_bwd_dx_kernel(x_ref, dy_ref, g_ref, be_ref, wqkv_ref,
                             bqkv_ref, wp_ref, dx_ref, y_ref, dqkv_ref,
                             attn_ref, dgp_ref, dbp_ref, dbqkvp_ref,
                             attn_scratch, s_scratch, dp_scratch, *,
                             num_heads, dim, scale, elems):
    dg_acc = dbe_acc = dbq_acc = None
    for ei in range(elems):
        dx, dg, dbe, dbq, y, dqkv_c, attn_out = _attn_half_bwd_rows(
            x_ref[ei], dy_ref[ei], g_ref, be_ref, wqkv_ref, bqkv_ref, wp_ref,
            s_scratch, dp_scratch, attn_scratch, num_heads=num_heads, dim=dim,
            scale=scale, defused=True)
        dx_ref[ei] = dx.astype(dx_ref.dtype)
        y_ref[ei] = y
        dqkv_ref[ei] = dqkv_c
        attn_ref[ei] = attn_out
        dg_acc = dg if dg_acc is None else dg_acc + dg
        dbe_acc = dbe if dbe_acc is None else dbe_acc + dbe
        dbq_acc = dbq if dbq_acc is None else dbq_acc + dbq
    dgp_ref[...] = _pad8(dg_acc)
    dbp_ref[...] = _pad8(dbe_acc)
    dbqkvp_ref[...] = _pad8(dbq_acc)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _attn_half_bwd_defused(x, dy, gamma, beta, wqkv, bqkv, wproj,
                           num_heads: int, scale: float,
                           interpret: bool = False):
    """De-fused attention-half backward: the kernel computes dx on a
    PARALLEL grid (no accumulators, no sequential semantics) and
    materializes the LN output y, the qkv cotangent, and the pre-proj
    attention output; the weight-grad contractions run in XLA over the full
    (B, N) row set:
      dWqkv = y^T dqkv   dWproj = attn^T dy   (multi-dim contractions —
      XLA collapses (B, N) itself, no user-visible relayout of the
      unaligned token axis)
    Same de-fusion rationale as fused_mlp._mlp_block_bwd_defused."""
    b, n, d = x.shape
    elems = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
    grid = b // elems
    kernel = functools.partial(_attn_half_bwd_dx_kernel, num_heads=num_heads,
                               dim=d, scale=scale, elems=elems)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    dx, y, dqkv, attn, dgp, dbp, dbqkvp = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((b, n, 3 * d), x.dtype),
                   jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, 3 * d), jnp.float32)],
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)), wspec((1, 3 * d)),
            wspec((d, d)),
        ],
        out_specs=[pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
                   pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
                   pl.BlockSpec((elems, n, 3 * d), lambda i: (i, 0, 0)),
                   pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
                   pl.BlockSpec((8, d), lambda i: (i, 0)),
                   pl.BlockSpec((8, d), lambda i: (i, 0)),
                   pl.BlockSpec((8, 3 * d), lambda i: (i, 0))],
        scratch_shapes=[pltpu.VMEM((n, d), x.dtype),
                        pltpu.VMEM((num_heads, n, n), jnp.float32),
                        pltpu.VMEM((num_heads, n, n), jnp.float32)]
        if _HAVE_PLTPU else [],
        interpret=interpret,
        **kwargs,
    )(x, dy, gamma.reshape(1, d), beta.reshape(1, d),
      wqkv.astype(x.dtype), bqkv.reshape(1, 3 * d), wproj.astype(x.dtype))
    contract = (((0, 1), (0, 1)), ((), ()))
    dwqkv = jax.lax.dot_general(y, dqkv, contract,
                                preferred_element_type=jnp.float32)
    # dbqkv from the per-program f32 partials (pre-bf16-cast dqkv sums) to
    # match the accumulating impl's numerics; dbproj sums the bf16 INPUT dy
    # either way, so both impls match there by construction
    dbqkv = jnp.sum(dbqkvp, axis=0, keepdims=True)
    dwp = jax.lax.dot_general(attn, dy.astype(attn.dtype), contract,
                              preferred_element_type=jnp.float32)
    dbp_out = jnp.sum(dy.astype(jnp.float32), axis=(0, 1)).reshape(1, d)
    dgamma = jnp.sum(dgp, axis=0, keepdims=True)
    dbeta = jnp.sum(dbp, axis=0, keepdims=True)
    return dx, dgamma, dbeta, dwqkv, dbqkv, dwp, dbp_out


def _attn_half_xla(x, gamma, beta, wqkv, bqkv, wproj, bproj, num_heads, scale):
    from mirage_tpu.nn.layers import layer_norm

    y = layer_norm({"scale": gamma, "bias": beta}, x)
    qkv = y @ wqkv.astype(y.dtype) + bqkv.astype(y.dtype)
    o = _attn_xla(qkv, num_heads, scale)
    return x + (o @ wproj.astype(o.dtype) + bproj.astype(o.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _attn_half(x, gamma, beta, wqkv, bqkv, wproj, bproj, num_heads, scale):
    return _attn_half_fwd(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                          num_heads, scale, interpret=_rt.interpret())


def _attn_half_fwd_vjp(x, gamma, beta, wqkv, bqkv, wproj, bproj, num_heads,
                       scale):
    res = (x, gamma, beta, wqkv, bqkv, wproj, bproj)
    return _attn_half_fwd(*res, num_heads, scale,
                          interpret=_rt.interpret()), res


# Backward impl switch (scripts/bench_attn_bwd_regbatch.py): which backward
# the custom VJP routes to — "accumulate" (sequential grid, in-kernel dW),
# "reg_batch" (same, register-batched accumulator updates), or "defused"
# (parallel dx kernel + XLA weight-grad contractions). Default flipped to
# "defused" from the r4 chip A/B: 3.902 vs 4.098 ms/layer at the
# pretraining shape (reg_batch 3.997 — middle, not adopted); end-to-end
# pretraining 1213.8 -> 1222.5 img/s. Env override (read once at import):
# MIRAGE_ATTN_BWD=accumulate python ...
from mirage_tpu.utils.envflags import env_choice as _env_choice  # noqa: E402

_ATTN_BWD_IMPL = _env_choice("MIRAGE_ATTN_BWD", "defused",
                             ("accumulate", "reg_batch", "defused"))


def _attn_half_bwd_vjp(num_heads, scale, res, g):
    x, gamma, beta, wqkv, bqkv, wproj, bproj = res
    on_tpu = _rt.kernels_enabled()
    if on_tpu and _HAVE_PLTPU:
        if _ATTN_BWD_IMPL == "defused":
            dx, dg, dbe, dwqkv, dbqkv, dwp, dbp = _attn_half_bwd_defused(
                x, g, gamma, beta, wqkv, bqkv, wproj, num_heads, scale,
                interpret=_rt.interpret())
        else:
            dx, dg, dbe, dwqkv, dbqkv, dwp, dbp = _attn_half_bwd_pallas(
                x, g, gamma, beta, wqkv, bqkv, wproj, num_heads, scale,
                interpret=_rt.interpret(),
                reg_batch=_ATTN_BWD_IMPL == "reg_batch")
        # optimization barrier: see ops/fused_mlp.py — keeps the f32 dW
        # outputs out of the caller's scoped-vmem-charged update fusion
        dx, dg, dbe, dwqkv, dbqkv, dwp, dbp = jax.lax.optimization_barrier(
            (dx, dg, dbe, dwqkv, dbqkv, dwp, dbp))
        return (dx.astype(x.dtype),
                dg.reshape(gamma.shape).astype(gamma.dtype),
                dbe.reshape(beta.shape).astype(beta.dtype),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwp.astype(wproj.dtype),
                dbp.reshape(bproj.shape).astype(bproj.dtype))
    _, vjp = jax.vjp(
        lambda *a: _attn_half_xla(*a, num_heads, scale), *res)
    return vjp(g)


_attn_half.defvjp(_attn_half_fwd_vjp, _attn_half_bwd_vjp)


def attn_half_block(x, norm1, attn, num_heads: int, interpret: bool = False,
                    grad_free: bool = False):
    """Fused x + proj(SDPA(qkv(LN(x)))) over pytree params
    ({'scale','bias'}, {'qkv','proj'}); mirage/utils.py:251-257 semantics.
    Differentiable: Pallas backward kernel on TPU (dx + f32 parameter
    grads), XLA recompute elsewhere."""
    d = x.shape[-1]
    scale = (d // num_heads) ** -0.5
    bqkv = attn["qkv"].get("b")
    if bqkv is None:
        bqkv = jnp.zeros((3 * d,), x.dtype)
    args = (x, norm1["scale"], norm1["bias"], attn["qkv"]["w"], bqkv,
            attn["proj"]["w"], attn["proj"]["b"])
    if interpret:
        return _attn_half_fwd(*args, num_heads, scale, interpret=True)
    # grad_free is accepted but ignored: a raw pallas fwd (no custom_vjp)
    # inside a grad program trips JAX's jvp bookkeeping (ad.py nonzeros
    # assert), and the custom_vjp wrapper costs nothing when the caller
    # stop-gradients the output. (The tiny-shape compile hang this flag
    # originally chased was the unaligned-head-dim issue, fixed by the
    # dh % 32 gates in nn/block.py + nn/attention.py.)
    del grad_free
    return _attn_half(*args, num_heads, scale)


# ---------------------------------------------------------------------------
# Fused cross-attention half-block (decoder xattn, output_adapters.py:277-281):
#   out = x + proj(SDPA(q(LN_q(x)), kv(LN_ctx(context))))
# One grid program per batch element, all heads in VMEM. Covers the
# SpatialOutputAdapter decoders (Nq=256 queries, Nc=257 visible context,
# D=256, 8 heads) where the XLA path burns ~1.8 ms/step on softmax/PV
# fusions at ~25% MFU (round-2 trace).
# ---------------------------------------------------------------------------

def _xattn_half_kernel(x_ref, ctx_ref, gq_ref, bq_ref, gc_ref, bc_ref,
                       wq_ref, bwq_ref, wkv_ref, bwkv_ref, wp_ref, bp_ref,
                       o_ref, attn_scratch, s_scratch, *, num_heads: int,
                       dim: int, scale: float, elems: int = 1):
    def ln(t, g_ref, b_ref):
        t32 = t.astype(jnp.float32)
        mean = jnp.mean(t32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(t32), axis=-1, keepdims=True)
            - jnp.square(mean), 0.0)
        y = (t32 - mean) * jax.lax.rsqrt(var + 1e-6)
        return (y * g_ref[...].astype(jnp.float32)
                + b_ref[...].astype(jnp.float32)).astype(t.dtype)

    dh = dim // num_heads
    for ei in range(elems):
        x = x_ref[ei]
        ctx = ctx_ref[ei]
        q = jax.lax.dot_general(
            ln(x, gq_ref, bq_ref), wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        q = (q + bwq_ref[...].astype(jnp.float32)).astype(x.dtype)
        kv = jax.lax.dot_general(
            ln(ctx, gc_ref, bc_ref), wkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        kv = (kv + bwkv_ref[...].astype(jnp.float32)).astype(x.dtype)
        for h in range(num_heads):  # phase 1: all score matmuls
            s_scratch[h] = jax.lax.dot_general(
                q[:, h * dh:(h + 1) * dh], kv[:, h * dh:(h + 1) * dh],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        s = s_scratch[...]  # phase 2: one softmax over all heads
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * _LOG2E)
        l = jnp.sum(e, axis=-1, keepdims=True)
        s_scratch[...] = e
        for h in range(num_heads):  # phase 3: all PV matmuls
            v = kv[:, dim + h * dh:dim + (h + 1) * dh]
            o = jax.lax.dot_general(
                s_scratch[h].astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn_scratch[:, h * dh:(h + 1) * dh] = (o / l[h]).astype(x.dtype)
        out = jax.lax.dot_general(
            attn_scratch[...], wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + bp_ref[...].astype(jnp.float32)
        o_ref[ei] = x + out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def _xattn_half_fwd(x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv, wproj, bproj,
                    num_heads: int, scale: float, interpret: bool = False):
    b, nq, d = x.shape
    nc = ctx.shape[1]
    elems = _pick_elems(b, d)
    kernel = functools.partial(_xattn_half_kernel, num_heads=num_heads,
                               dim=d, scale=scale, elems=elems)
    kwargs = {}
    if not _HAVE_PLTPU:  # pragma: no cover — gated to TPU/interpret paths
        raise RuntimeError("xattn_half_block requires pallas TPU support")
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nq, d), x.dtype),
        grid=(b // elems,),
        in_specs=[
            pl.BlockSpec((elems, nq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((elems, nc, d), lambda i: (i, 0, 0)),
            wspec((1, d)), wspec((1, d)), wspec((1, d)), wspec((1, d)),
            wspec((d, d)), wspec((1, d)),
            wspec((d, 2 * d)), wspec((1, 2 * d)),
            wspec((d, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec((elems, nq, d), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((nq, d), x.dtype),
                        pltpu.VMEM((num_heads, nq, nc), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(x, ctx, gq.reshape(1, d), bq.reshape(1, d), gc.reshape(1, d),
      bc.reshape(1, d), wq, bwq.reshape(1, d), wkv, bwkv.reshape(1, 2 * d),
      wproj, bproj.reshape(1, d))


def _xattn_half_xla(x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv, wproj, bproj,
                    num_heads, scale):
    from mirage_tpu.nn.attention import cross_attention_apply
    from mirage_tpu.nn.layers import layer_norm

    p = {"q": {"w": wq, "b": bwq}, "kv": {"w": wkv, "b": bwkv},
         "proj": {"w": wproj, "b": bproj}}
    out = cross_attention_apply(
        p, layer_norm({"scale": gq, "bias": bq}, x),
        layer_norm({"scale": gc, "bias": bc}, ctx), num_heads, impl="xla")
    return x + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def _xattn_half(x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv, wproj, bproj,
                num_heads, scale):
    return _xattn_half_fwd(x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv,
                           wproj, bproj, num_heads, scale,
                           interpret=_rt.interpret())


def _xattn_half_fwd_vjp(x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv, wproj,
                        bproj, num_heads, scale):
    res = (x, ctx, gq, bq, gc, bc, wq, bwq, wkv, bwkv, wproj, bproj)
    return _xattn_half_fwd(*res, num_heads, scale,
                           interpret=_rt.interpret()), res


def _xattn_half_bwd_vjp(num_heads, scale, res, g):
    _, vjp = jax.vjp(lambda *a: _xattn_half_xla(*a, num_heads, scale), *res)
    return vjp(g)


_xattn_half.defvjp(_xattn_half_fwd_vjp, _xattn_half_bwd_vjp)


def xattn_half_block(x, query_norm, context_norm, cross, context,
                     num_heads: int, interpret: bool = False):
    """Fused x + proj(SDPA(q(LN(x)), kv(LN(context)))) over pytree params
    ({'scale','bias'} x2, {'q','kv','proj'}); output_adapters.py:277-281
    semantics. Inference path (backward recomputes via XLA)."""
    d = x.shape[-1]
    scale = (d // num_heads) ** -0.5
    bwq = cross["q"].get("b")
    if bwq is None:
        bwq = jnp.zeros((d,), x.dtype)
    bwkv = cross["kv"].get("b")
    if bwkv is None:
        bwkv = jnp.zeros((2 * d,), x.dtype)
    args = (x, context, query_norm["scale"], query_norm["bias"],
            context_norm["scale"], context_norm["bias"],
            cross["q"]["w"], bwq, cross["kv"]["w"], bwkv,
            cross["proj"]["w"], cross["proj"]["b"])
    if interpret:
        return _xattn_half_fwd(*args, num_heads, scale, interpret=True)
    return _xattn_half(*args, num_heads, scale)


def block_attention(qkv, num_heads: int, scale: float, interpret: bool = False):
    """Fused multi-head self-attention over a packed qkv tensor.

    qkv: (B, N, 3*D) — the fused qkv projection output, column order
    (q|k|v) x heads x head_dim (torch reshape (B,N,3,H,Dh) semantics,
    mirage/utils.py:176-179). Returns (B, N, D) merged-head outputs.
    Differentiable (backward recomputes via XLA). `interpret=True` runs the
    Pallas interpreter (CPU tests).
    """
    if interpret:
        return _block_attn_fwd(qkv, num_heads, scale, interpret=True)
    return _block_attn(qkv, num_heads, scale)
