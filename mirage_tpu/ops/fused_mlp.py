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

Backward: a matching Pallas kernel on TPU (recomputes LN/fc1/GELU blockwise
in VMEM, emits dx + f32 parameter grads accumulated across a sequential
grid); XLA-recompute custom_vjp elsewhere (CPU tests).
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

from mirage_tpu.ops import runtime as _rt

_SQRT2 = 1.4142135623730951
_LOG2E = 1.4426950408889634


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
    return s * (1.0 - poly * jnp.exp2(-(ax * ax) * _LOG2E))


def _mlp_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, residual: bool = True):
    x = x_ref[...]
    if x.ndim == 3:  # (1, N, D) batch-element block of a 3-D operand
        x = x[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    # one-pass moments; see block_attention.py note
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)  # cancellation can go negative
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    # weights cast to the compute dtype in VMEM: training passes f32 master
    # params, and an f32 x bf16 dot would promote to a (8x slower) f32 matmul
    h = jax.lax.dot_general(y, w1_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h / _SQRT2))  # erf GELU (see _erf)
    h = h.astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    # residual=False leaves the skip-add to the caller (drop-path needs to
    # scale the branch BEFORE the add; the seg fast path uses this)
    out = x + o.astype(x.dtype) if residual else o.astype(x.dtype)
    o_ref[...] = out if o_ref.shape == out.shape else out[None]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret",
                                             "residual"))
def _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, block_rows: int = 512,
                   interpret: bool = False, residual: bool = True):
    d = x.shape[-1]
    hdim = w1.shape[-1]
    kern = functools.partial(_mlp_kernel, residual=residual)
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
                              b2, block_rows=block_rows, interpret=interpret,
                              residual=residual).reshape(b, n, d)
    if x.ndim == 3:
        # keep the unaligned operand 3-D: a flatten outside the kernel forces
        # XLA to copy VMEM-resident loop activations to HBM and back around
        # the custom call (measured 3.2 ms/step at the flagship 257-token
        # shape; a round-3 pad-to-aligned variant of THIS forward path
        # measured 1020.5 -> 995.6 img/s on pretraining for the same reason
        # — unlike the backward, where the pad-to-aligned 2-D path wins,
        # see _mlp_block_bwd_pallas)
        b, n, _ = x.shape
        out = pl.pallas_call(
            kern,
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
    # fewer/bigger programs when VMEM allows (~3 f32 hidden passes live):
    # the fwd grid is parallel, but per-program overhead still amortizes
    for cand in (4096, 2048, 1024):
        if m % cand == 0 and cand > blk and cand * hdim * 12 < 40 * 2 ** 20:
            blk = cand
            break
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(pl.cdiv(m, blk),),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0)),
        interpret=interpret,
        **kwargs,
    )(x, *flat)
    return out


# ---------------------------------------------------------------------------
# Pallas backward: dx + all parameter grads in one kernel.
#
# The XLA backward of this half-block (under the pretraining remat) ran at
# ~3x its matmul floor: the recomputed (M, 4D) fc1/GELU intermediates round-
# trip HBM twice and the LN-stat reductions fuse badly (round-2 trace:
# ~67 ms/step of a 289 ms ViT-B step). This kernel recomputes LN -> fc1 ->
# GELU blockwise in VMEM and emits dx plus f32 dgamma/dbeta/dW1/db1/dW2/db2
# accumulated across a sequential grid (constant-index-map outputs,
# initialized at program 0 — the standard Pallas reduction pattern).
# ---------------------------------------------------------------------------

# Backward impl switch (scripts/bench_mlp_bwd_defused.py): "accumulate"
# keeps the sequential in-kernel dW reduction; "defused" routes the 2-D
# terminal to _mlp_block_bwd_defused (parallel dx kernel + XLA dW
# contractions). Default flipped to "defused" from the r4 chip A/B:
# micro +0.063 ms/layer at the pretrain-flat shape, end-to-end pretraining
# 1222.5 -> 1227.1 img/s stacked on the token-loss + attn-defused flips
# (/tmp-logged 2026-08-18 sweep, BASELINE.md round-4 delta). Env override
# (read once at import): MIRAGE_MLP_BWD=accumulate python ...
from mirage_tpu.utils.envflags import env_choice as _env_choice  # noqa: E402

_MLP_BWD_IMPL = _env_choice("MIRAGE_MLP_BWD", "defused",
                            ("accumulate", "defused"))


def _mlp_bwd_rows(x, dy, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                  defused: bool = False):
    """Backward math for one (M, D) row block. Returns
    (dx, dgamma, dbeta, dw1, db1, dw2, db2) — grads in f32.
    defused=True skips the in-kernel dW matmuls and instead returns
    (dx, dgamma, dbeta, db1, y, act, dh_c) so the caller can materialize
    the intermediates and leave the dW contractions to XLA (db1 stays here
    because it must be summed from the f32 dh, pre-bf16-cast, to match the
    accumulating impl's numerics — see _mlp_block_bwd_defused)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    # one-pass moments; see block_attention.py note
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)  # cancellation can go negative
    inv = jax.lax.rsqrt(var + 1e-6)
    yhat = (x32 - mean) * inv
    g32 = g_ref[...].astype(jnp.float32)
    y = (yhat * g32 + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    w1c = w1_ref[...].astype(x.dtype)
    w2c = w2_ref[...].astype(x.dtype)
    h = jax.lax.dot_general(y, w1c, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    e = _erf(h / _SQRT2)
    act = (0.5 * h * (1.0 + e)).astype(x.dtype)
    dy32 = dy.astype(jnp.float32)
    if not defused:
        db2 = jnp.sum(dy32, axis=0, keepdims=True)
        dw2 = jax.lax.dot_general(act, dy, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dact = jax.lax.dot_general(dy, w2c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # d/dh [0.5 h (1+erf(h/sqrt2))] = 0.5 (1+erf) + h * N(h; 0,1)
    dgelu = 0.5 * (1.0 + e) + h * jnp.exp2(-0.5 * _LOG2E * h * h) * 0.3989422804014327
    dh = dact * dgelu
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dh_c = dh.astype(x.dtype)
    if not defused:
        dw1 = jax.lax.dot_general(y, dh_c, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dyln = jax.lax.dot_general(dh_c, w1c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dgamma = jnp.sum(dyln * yhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dyln, axis=0, keepdims=True)
    dyhat = dyln * g32
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx = dy32 + inv * (dyhat - m1 - yhat * m2)
    if defused:
        return dx, dgamma, dbeta, db1, y, act, dh_c
    return dx, dgamma, dbeta, dw1, db1, dw2, db2


def _mlp_bwd_kernel(x_ref, dy_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    if x_ref.ndim == 3:
        elems = x_ref.shape[0]
        for ei in range(elems):
            dx, dg, dbe, dw1, db1, dw2, db2 = _mlp_bwd_rows(
                x_ref[ei], dy_ref[ei], g_ref, be_ref, w1_ref, b1_ref, w2_ref)
            dx_ref[ei] = dx.astype(dx_ref.dtype)
            dg_ref[...] += dg
            dbe_ref[...] += dbe
            dw1_ref[...] += dw1
            db1_ref[...] += db1
            dw2_ref[...] += dw2
            db2_ref[...] += db2
    else:
        dx, dg, dbe, dw1, db1, dw2, db2 = _mlp_bwd_rows(
            x_ref[...], dy_ref[...], g_ref, be_ref, w1_ref, b1_ref, w2_ref)
        dx_ref[...] = dx.astype(dx_ref.dtype)
        dg_ref[...] += dg
        dbe_ref[...] += dbe
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2


# De-fused backward per-(row x hdim-unit) VMEM coefficient. Measured on
# chip (r4): at (65536, 256)x1024 with blk=2048 the real scoped-vmem usage
# was 132 MB ≈ 63 B/row-unit (f32 intermediates spill + double-buffered
# bf16 dh/act/y output windows), vs the 16 the accumulating kernel uses —
# the defused kernel materializes 2 extra hdim-wide outputs and keeps more
# f32 temporaries live. 40 lands decoder-shape blocks at 1024 (~66 MB real,
# under the 128 MB chip VMEM) without shrinking the measured-good
# pretrain-flat (256) / pretrain-large (128) blocks.
_DEFUSED_ROW_UNIT = 40


def _pick_bwd_block(m, d, hdim, live_bytes_per_row_unit, fixed_bytes,
                    budget=48 * 2 ** 20, ceiling=58 * 2 ** 20):
    """Largest row block for a sequential accumulating backward grid.

    Three tiers: (1) largest divisor of m whose VMEM estimate fits the perf
    budget (48 MB of the 64 MB Mosaic limit — headroom for double
    buffering; a 56 MB budget regressed pretraining 1091 -> 1040 img/s);
    (2) if the fixed term (weights + f32 dW accumulators) alone exceeds the
    budget — e.g. d=1024/hdim=4096, the ViT-L MLP, where 12*d*hdim ≈ 50 MB
    — the largest divisor that still fits under a hard ceiling near the
    Mosaic limit, so the kernel degrades to smaller blocks instead of
    failing to compile; (3) None for ragged m (no divisor at all): padded
    rows would pollute the accumulators, so callers run a single block or
    fall back to the non-stash path."""
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % cand == 0 and cand * hdim * live_bytes_per_row_unit + fixed_bytes < budget:
            return cand
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if m % cand == 0 and cand * hdim * live_bytes_per_row_unit + fixed_bytes < ceiling:
            return cand
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_block_bwd_pallas(x, dy, gamma, beta, w1, b1, w2, interpret=False):
    """Returns (dx, dgamma, dbeta, dw1, db1, dw2, db2); parameter grads f32."""
    d = x.shape[-1]
    hdim = w1.shape[-1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        # sequential grid: the parameter-grad outputs are accumulated across
        # programs (constant index maps), so iterations must not be reordered
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim), (hdim, d))]
    # weights enter the kernel in the compute dtype (they only feed matmuls
    # here): keeps the VMEM-resident footprint at bf16, not f32-master, size
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1.astype(x.dtype),
            b1.reshape(1, hdim), w2.astype(x.dtype))
    grad_shapes = [
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # dgamma
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # dbeta
        jax.ShapeDtypeStruct((d, hdim), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((1, hdim), jnp.float32),   # db1
        jax.ShapeDtypeStruct((hdim, d), jnp.float32),   # dw2
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # db2
    ]
    grad_specs = [pl.BlockSpec(s.shape, lambda i: (0,) * len(s.shape))
                  for s in grad_shapes]
    if x.ndim == 3 and x.shape[1] % 16 == 0:
        b, n, _ = x.shape
        out = _mlp_block_bwd_pallas(x.reshape(b * n, d), dy.reshape(b * n, d),
                                    gamma, beta, w1, b1, w2,
                                    interpret=interpret)
        return (out[0].reshape(b, n, d),) + out[1:]
    if x.ndim == 3:
        # Unaligned token counts (pretraining's N=99, cls FT's N=257): two
        # 2-D routings, both one relayout copy in and one out:
        #   - exact FLATTEN: reshape (B,N,D)->(B*N,D); no wasted rows, but
        #     B*N may only admit a small block.
        #   - PAD to a bitcast-flattenable multiple of 16 with ZERO
        #     cotangent rows (exactly grad-neutral for the row-independent
        #     MLP: dh = dact*dgelu with dact = 0; all dW/db contractions
        #     see zero cotangents; padded dx rows are sliced away) — bigger
        #     blocks at the cost of ~(pad/N) extra matmul rows.
        # Route by fewest grid programs (the sequential accumulate programs
        # were ~1.5 ms/layer of VPU at the pretraining shape); ties go to
        # flatten (less matmul work). Measured: pretraining (256,99,768)
        # flat 99 programs 5.10 ms vs pad 112 programs 5.31 ms/layer
        # (scripts/bench_mlp_bwd_flatten.py); cls FT (64,257,768) pads to
        # 68 programs vs 257 flat — pad wins there.
        b, n, _ = x.shape
        n_pad = -(-n // 16) * 16
        if _MLP_BWD_IMPL == "defused":
            # Fewest programs wins on the defused PARALLEL grid too (r4 chip
            # A/B): cls-FT flat is 257 tiny programs at 3.354 ms vs pad's 68
            # at 3.313; pretraining flat 99 < pad 112 keeps flat. Per-program
            # fixed cost dominates once blocks shrink, parallel grid or not.
            route = _route_unaligned_bwd(b, n, d, hdim,
                                         _DEFUSED_ROW_UNIT, 4)
        else:
            route = _route_unaligned_bwd(b, n, d, hdim)
        if route == "flat":
            out = _mlp_block_bwd_pallas(x.reshape(b * n, d),
                                        dy.reshape(b * n, d),
                                        gamma, beta, w1, b1, w2,
                                        interpret=interpret)
            return (out[0].reshape(b, n, d),) + out[1:]
        if route == "pad":
            xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
            dyp = jnp.pad(dy, ((0, 0), (0, n_pad - n), (0, 0)))
            out = _mlp_block_bwd_pallas(xp.reshape(b * n_pad, d),
                                        dyp.reshape(b * n_pad, d),
                                        gamma, beta, w1, b1, w2,
                                        interpret=interpret)
            return (out[0].reshape(b, n_pad, d)[:, :n],) + out[1:]
    if x.ndim == 3:
        b, n, _ = x.shape
        elems = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
        dx, *grads = pl.pallas_call(
            _mlp_bwd_kernel,
            out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype)] + grad_shapes,
            grid=(b // elems,),
            in_specs=[pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0)),
                      pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0))] + w_specs,
            out_specs=[pl.BlockSpec((elems, n, d), lambda i: (i, 0, 0))]
            + grad_specs,
            interpret=interpret,
            **kwargs,
        )(x, dy, *flat)
        return (dx, *grads)
    m = x.shape[0]
    if _MLP_BWD_IMPL == "defused":
        # chip-A/B switch — parallel dx kernel + XLA dW contractions. The
        # flat/pad 3-D routings land here after their reshape; only the
        # per-element 3-D fallback (neither routing admits a block) stays
        # on the accumulating kernel
        return _mlp_block_bwd_defused(x, dy, gamma, beta, w1, b1, w2,
                                      interpret=interpret)
    # Bigger blocks = fewer sequential grid iterations (the accumulation
    # grid can't be parallelized) and fewer accumulator update rounds. The
    # seg ConvNeXt head's (131072, 384) backward ran at 5x its matmul floor
    # with blk=512 (round-3 trace: 5.05 ms/block). Cap by a VMEM estimate:
    # ~4.5 f32 hidden-size passes live at once, + weights + f32 accumulators.
    # fixed VMEM: bf16 w1+w2 (4*d*hdim B) + f32 dw1+dw2 accumulators
    # (8*d*hdim B); ~4.5 f32 hidden-size passes live per block
    # (see _pick_bwd_block for the budget/ceiling tiers).
    blk = _pick_bwd_block(m, d, hdim, 18, 12 * d * hdim)
    if blk is None:  # ragged row count: padded rows would pollute the
        blk = m      # accumulators, so run it as a single block
    dx, *grads = pl.pallas_call(
        _mlp_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((m, d), x.dtype)] + grad_shapes,
        grid=(m // blk,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + grad_specs,
        interpret=interpret,
        **kwargs,
    )(x, dy, *flat)
    return (dx, *grads)


# ---------------------------------------------------------------------------
# De-fused backward: the kernel computes ONLY dx (+ the dh/y/act
# intermediates and per-program dgamma/dbeta partial sums) on a PARALLEL
# grid, and the dW matmuls run in XLA as single (m)-deep contractions:
#   dW1 = y^T dh   dW2 = act^T dy   db1 = sum(dh)   db2 = sum(dy)
# Rationale (the round-3 floor statement's "de-fuse dW reductions"): the
# accumulating backward's sequential grid serializes 99+ programs of
# accumulator read-modify-writes, while XLA runs a 25k-row dW contraction
# at ~90% MFU; the extra HBM round-trip of dh/y/act rides the parallel
# grid's pipelined DMA.
# ---------------------------------------------------------------------------


def _pad8(row):
    """(1, k) f32 partial -> (8, k) slot (row 0 = value, rows 1-7 = 0).
    Mosaic requires output blocks' second-to-last dim divisible by 8; the
    zero rows vanish in the axis-0 reducing sum outside the kernel."""
    return jnp.concatenate(
        [row, jnp.zeros((7, row.shape[-1]), row.dtype)], axis=0)


def _mlp_bwd_dx_kernel(x_ref, dy_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                       dx_ref, dh_ref, y_ref, act_ref, dgp_ref, dbp_ref,
                       db1p_ref):
    dx, dgamma, dbeta, db1, y, act, dh_c = _mlp_bwd_rows(
        x_ref[...], dy_ref[...], g_ref, be_ref, w1_ref, b1_ref, w2_ref,
        defused=True)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dh_ref[...] = dh_c
    y_ref[...] = y
    act_ref[...] = act
    dgp_ref[...] = _pad8(dgamma)
    dbp_ref[...] = _pad8(dbeta)
    db1p_ref[...] = _pad8(db1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_block_bwd_defused(x, dy, gamma, beta, w1, b1, w2, interpret=False):
    """De-fused backward (2-D rows). Returns the same tuple as
    _mlp_block_bwd_pallas; dW/db come from XLA contractions over the
    kernel-materialized intermediates."""
    m, d = x.shape
    hdim = w1.shape[-1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # no accumulators -> parallel
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim), (hdim, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1.astype(x.dtype),
            b1.reshape(1, hdim), w2.astype(x.dtype))
    # ~3 f32 hidden passes + bf16 dh/act outputs live; weights are bf16 only
    blk = _pick_bwd_block(m, d, hdim, _DEFUSED_ROW_UNIT, 4 * d * hdim)
    if blk is None:
        blk = m
    grid = m // blk
    dx, dh, y, act, dgp, dbp, db1p = pl.pallas_call(
        _mlp_bwd_dx_kernel,
        out_shape=[jax.ShapeDtypeStruct((m, d), x.dtype),
                   jax.ShapeDtypeStruct((m, hdim), x.dtype),
                   jax.ShapeDtypeStruct((m, d), x.dtype),
                   jax.ShapeDtypeStruct((m, hdim), x.dtype),
                   jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid * 8, hdim), jnp.float32)],
        grid=(grid,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                   pl.BlockSpec((blk, hdim), lambda i: (i, 0)),
                   pl.BlockSpec((blk, d), lambda i: (i, 0)),
                   pl.BlockSpec((blk, hdim), lambda i: (i, 0)),
                   pl.BlockSpec((8, d), lambda i: (i, 0)),
                   pl.BlockSpec((8, d), lambda i: (i, 0)),
                   pl.BlockSpec((8, hdim), lambda i: (i, 0))],
        interpret=interpret,
        **kwargs,
    )(x, dy, *flat)
    dw1 = jax.lax.dot_general(y, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(act, dy.astype(act.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # db1 from the per-program f32 partials (summing the bf16 dh instead
    # measured ~1e-2 relative drift vs the accumulating impl); db2 sums the
    # bf16 INPUT dy either way, so both impls match there by construction
    db1 = jnp.sum(db1p, axis=0, keepdims=True)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dgamma = jnp.sum(dgp, axis=0, keepdims=True)
    dbeta = jnp.sum(dbp, axis=0, keepdims=True)
    return dx, dgamma, dbeta, dw1, db1, dw2, db2


# ---------------------------------------------------------------------------
# Stash variant: forward emits the post-GELU activation and the GELU
# derivative so the backward needs NO fc1 recompute and NO transcendentals.
#
# Economics (v5e): the stash pays 4 B/hidden-element of HBM round-trip
# (2 bf16 arrays written in fwd, read in bwd ≈ 4.9 ps/elem at 819 GB/s) to
# delete 4·d FLOP/elem of fc1 recompute (≈ 2·d/197e12 s) plus the erf+exp
# VPU passes from the backward kernel. That trades profitably for
# d ≳ 350; it LOSES for the dim-256 decoders (traffic > saved compute) and
# for any call under remat (the rematerialized forward would then run the
# full fwd again INCLUDING the stash writes, where today XLA DCEs the fwd
# because the bwd kernel self-recomputes). Hence opt-in via
# mlp_block(stash=True) — today only the seg ConvNeXt head (d=384, no
# remat, 131k rows) takes it.
#
# Measured NEGATIVES (don't redo, v5e round 3):
#   - single-h stash (stash only the pre-GELU h, re-derive act/gelu' in the
#     bwd with one erf+exp pass): seg fast path 101.1 -> 95.9 img/s. The
#     halved stash DMA is grid-pipelined (~free) while the added VPU
#     transcendentals serialize against the MXU — two stashes + zero
#     transcendentals is the right trade on this hardware.
#   - enabling stash for the dim-256 pretraining decoder MLPs (aligned-3-D
#     reshape to 2-D rows): 1083-1091 -> 1080.5 img/s (flat-to-negative),
#     as the economics above predict at d=256.
# ---------------------------------------------------------------------------

_INV_SQRT_2PI = 0.3989422804014327


def _mlp_fwd_stash_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, o_ref, act_ref, dg_ref, *,
                          residual: bool = True):
    x = x_ref[...]
    if x.ndim == 3:  # (1, N, D) batch-element block of a 3-D operand
        x = x[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    h = jax.lax.dot_general(y, w1_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    e = _erf(h / _SQRT2)
    act = (0.5 * h * (1.0 + e)).astype(x.dtype)
    act_ref[...] = act if act_ref.ndim == act.ndim else act[None]
    # gelu'(h) = 0.5(1+erf(h/sqrt2)) + h*phi(h); computed here (one extra exp
    # pass) so the backward runs transcendental-free
    dg = (0.5 * (1.0 + e)
          + h * jnp.exp2(-0.5 * _LOG2E * h * h) * _INV_SQRT_2PI
          ).astype(dg_ref.dtype)
    dg_ref[...] = dg if dg_ref.ndim == dg.ndim else dg[None]
    o = jax.lax.dot_general(act, w2_ref[...].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    out = x + o.astype(x.dtype) if residual else o.astype(x.dtype)
    o_ref[...] = out if o_ref.ndim == out.ndim else out[None]


@functools.partial(jax.jit, static_argnames=("interpret", "residual"))
def _mlp_block_fwd_stash(x, gamma, beta, w1, b1, w2, b2, interpret=False,
                         residual=True):
    """2-D rows only. Returns (out, act, dgelu); out is bit-identical to
    _mlp_block_fwd (same f32 kernel math, same bf16 act fed to fc2)."""
    m, d = x.shape
    hdim = w1.shape[-1]
    kern = functools.partial(_mlp_fwd_stash_kernel, residual=residual)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                             (hdim, d), (1, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hdim),
            w2, b2.reshape(1, d))
    # ~4 f32 hidden passes + 2 bf16 stash outputs live per block; the grid
    # is cdiv so a non-dividing blk is fine (clipped final block), and the
    # min(512, m) floor keeps a ragged m from becoming one giant program
    blk = min(512, m)
    while blk > 8 and blk * hdim * 16 + 4 * d * hdim >= 58 * 2 ** 20:
        blk //= 2  # stay under the Mosaic limit at very large hidden dims
    for cand in (2048, 1024):
        if m % cand == 0 and cand * hdim * 16 + 4 * d * hdim < 40 * 2 ** 20:
            blk = cand
            break
    out, act, dg = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((m, d), x.dtype),
                   jax.ShapeDtypeStruct((m, hdim), x.dtype),
                   jax.ShapeDtypeStruct((m, hdim), x.dtype)],
        grid=(pl.cdiv(m, blk),),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + w_specs,
        out_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                   pl.BlockSpec((blk, hdim), lambda i: (i, 0)),
                   pl.BlockSpec((blk, hdim), lambda i: (i, 0))],
        interpret=interpret,
        **kwargs,
    )(x, *flat)
    return out, act, dg


@functools.partial(jax.jit, static_argnames=("interpret", "residual",
                                             "stash_flat"))
def _mlp_block_fwd_stash3d(x, gamma, beta, w1, b1, w2, b2, interpret=False,
                           residual=True, stash_flat=False):
    """Stash forward for UNALIGNED 3-D (B, N, D) operands (pretraining's
    N=99). QUARANTINED negative result — _stash_route refuses 3-D shapes
    (net loss on v5e, see its note); kept with test coverage as evidence.
    Per-batch-element grid like _mlp_block_fwd's 3-D path (keeping
    the operand 3-D avoids the measured HBM round-trip of a pre-kernel
    flatten), while the act/gelu' stashes are written either

      - stash_flat=False: as (B, N, H) arrays (always compiles; the 2-D
        stash backward then pays one relayout copy per stash), or
      - stash_flat=True: directly into (B*N, H) arrays via an (N, H) block
        with row offset i*N — rows land exactly where the backward's
        flattened grid reads them, no relayout. Interpret-mode only:
        Mosaic REJECTS the misaligned block rows on real TPU ("last two
        dimensions of your block shape [must be] divisible by 8 and 128").

    Out is bit-identical to _mlp_block_fwd (same kernel math)."""
    b, n, d = x.shape
    hdim = w1.shape[-1]
    kern = functools.partial(_mlp_fwd_stash_kernel, residual=residual)
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (1, hdim),
                             (hdim, d), (1, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, hdim),
            w2, b2.reshape(1, d))
    if stash_flat:
        stash_shape = jax.ShapeDtypeStruct((b * n, hdim), x.dtype)
        stash_spec = pl.BlockSpec((n, hdim), lambda i: (i, 0))
    else:
        stash_shape = jax.ShapeDtypeStruct((b, n, hdim), x.dtype)
        stash_spec = pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0))
    out, act, dg = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   stash_shape, stash_shape],
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))] + w_specs,
        out_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0)),
                   stash_spec, stash_spec],
        interpret=interpret,
        **kwargs,
    )(x, *flat)
    return out, act, dg


def _mlp_bwd_stash_kernel(x_ref, dy_ref, act_ref, dgelu_ref, g_ref, be_ref,
                          w1_ref, w2_ref, dx_ref, dgm_ref, dbe_ref, dw1_ref,
                          db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgm_ref[...] = jnp.zeros_like(dgm_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-6)
    yhat = (x32 - mean) * inv
    g32 = g_ref[...].astype(jnp.float32)
    y = (yhat * g32 + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    w1c = w1_ref[...]
    w2c = w2_ref[...]
    dy = dy_ref[...]
    dy32 = dy.astype(jnp.float32)
    db2_ref[...] += jnp.sum(dy32, axis=0, keepdims=True)
    act = act_ref[...]
    dw2_ref[...] += jax.lax.dot_general(act, dy, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dact = jax.lax.dot_general(dy, w2c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dh = dact * dgelu_ref[...].astype(jnp.float32)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dh_c = dh.astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(y, dh_c, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dyln = jax.lax.dot_general(dh_c, w1c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dgm_ref[...] += jnp.sum(dyln * yhat, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dyln, axis=0, keepdims=True)
    dyhat = dyln * g32
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dx = dy32 + inv * (dyhat - m1 - yhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_block_bwd_stash(x, dy, act, dgelu, gamma, beta, w1, w2,
                         interpret=False):
    """Stash-consuming backward (2-D rows): 4 matmuls, no transcendentals.
    Returns (dx, dgamma, dbeta, dw1, db1, dw2, db2); parameter grads f32."""
    m, d = x.shape
    hdim = w1.shape[-1]
    kwargs = {}
    if _HAVE_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024)
    w_specs = [pl.BlockSpec(shape, lambda i: (0, 0))
               for shape in ((1, d), (1, d), (d, hdim), (hdim, d))]
    flat = (gamma.reshape(1, d), beta.reshape(1, d), w1.astype(x.dtype),
            w2.astype(x.dtype))
    grad_shapes = [
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # dgamma
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # dbeta
        jax.ShapeDtypeStruct((d, hdim), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((1, hdim), jnp.float32),   # db1
        jax.ShapeDtypeStruct((hdim, d), jnp.float32),   # dw2
        jax.ShapeDtypeStruct((1, d), jnp.float32),      # db2
    ]
    grad_specs = [pl.BlockSpec(s.shape, lambda i: (0,) * len(s.shape))
                  for s in grad_shapes]
    # live per block: act+dgelu bf16 (4 B/elem) + dact/dh f32 (8) + dh_c (2);
    # callers gate on _stash_viable, so blk is never None here in practice
    blk = _pick_bwd_block(m, d, hdim, 14, 12 * d * hdim)
    if blk is None:
        blk = m
    dx, *grads = pl.pallas_call(
        _mlp_bwd_stash_kernel,
        out_shape=[jax.ShapeDtypeStruct((m, d), x.dtype)] + grad_shapes,
        grid=(m // blk,),
        in_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((blk, d), lambda i: (i, 0)),
                  pl.BlockSpec((blk, hdim), lambda i: (i, 0)),
                  pl.BlockSpec((blk, hdim), lambda i: (i, 0))] + w_specs,
        out_specs=[pl.BlockSpec((blk, d), lambda i: (i, 0))] + grad_specs,
        interpret=interpret,
        **kwargs,
    )(x, dy, act, dgelu, *flat)
    return (dx, *grads)


def _stash_viable(m, d, hdim):
    """The stash backward's accumulating grid needs a divisor block within
    VMEM (grid = m // blk); without one (ragged m, or hidden dims whose
    fixed weight+accumulator footprint busts the ceiling) the stash path
    must not engage — the plain custom VJP handles those shapes."""
    return _pick_bwd_block(m, d, hdim, 14, 12 * d * hdim) is not None


def _stash_route(x, hdim):
    """Which stash forward to run (None = don't stash, use the recompute
    backward). Today only 2-D rows at d >= 384 engage (the seg ConvNeXt
    head's measured win; the dim-256 decoder MLPs measured flat-to-negative
    via an aligned-3-D reshape, see the section note).

    Measured NEGATIVE (don't redo, v5e round 3, scripts/bench_mlp_bwd_stash
    .py at the pretraining (256,99,768)x3072 shape): the UNALIGNED-3-D stash
    route under the encoder's selective remat. The remat mechanics DO work —
    checkpoint_name'd residuals inside a custom_vjp fwd register with
    save_only_these_names, so the stashes are saved and the bwd-scan
    recompute is DCE'd — and the stash backward kernel is 0.94 ms/layer
    faster (4.15 vs 5.09 recompute). But the per-element stash3d forward
    pays +1.2 ms/layer (2.80 -> 4.01) writing the two (99, H) stashes: the
    unaligned rows break the seg head's free grid-pipelined DMA (~3x the
    819 GB/s floor), Pallas rejects direct-to-flat (N,H) output blocks
    (99 % 8 != 0), and an out-of-jit (B,99,H)->(B*99,H) relayout is 45.7 ms.
    End-to-end: 6.85 vs 6.68 ms/layer — net LOSS. _mlp_block_fwd_stash3d
    stays as tested evidence (test_mlp_block_stash3d_matches_xla)."""
    d = x.shape[-1]
    if d < 384 or x.ndim != 2:
        return None
    return "2d" if _stash_viable(x.shape[0], d, hdim) else None


@jax.custom_vjp
def _mlp_block_stash(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2,
                          interpret=_rt.interpret())


def _mlp_block_stash_fwd_vjp(x, gamma, beta, w1, b1, w2, b2):
    from jax.ad_checkpoint import checkpoint_name

    # the stash kernels are gated to COMPILED TPU paths only: in interpret
    # mode they'd silently launch real Mosaic kernels on a TPU host,
    # breaking the MIRAGE_PALLAS=interpret contract — route None falls back
    # to the recompute backward, which interpret-mode does cover
    route = (_stash_route(x, w1.shape[-1])
             if (_rt.kernels_enabled() and not _rt.interpret()
                 and jax.default_backend() == "tpu" and _HAVE_PLTPU)
             else None)
    if route != "2d":
        return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2,
                              interpret=_rt.interpret()), \
            (x, gamma, beta, w1, b1, w2, b2, None, None)
    out, act, dg = _mlp_block_fwd_stash(x, gamma, beta, w1, b1, w2, b2)
    # named so a selective-remat policy CAN save the stashes: names inside
    # a custom_vjp fwd register with save_only_these_names (verified; with
    # x + act + gelu' saved, the MLP-half forward recompute in a remat bwd
    # is dead and XLA DCEs it). No remat caller engages today — the
    # encoder's unaligned-3-D shapes measured net-negative (_stash_route
    # note) — but the mechanism is load-bearing for any future 2-D-rows
    # caller under remat.
    act = checkpoint_name(act, "mlp_act_stash")
    dg = checkpoint_name(dg, "mlp_dgelu_stash")
    return out, (x, gamma, beta, w1, b1, w2, b2, act, dg)


def _mlp_block_stash_bwd_vjp(res, g):
    x, gamma, beta, w1, b1, w2, b2, act, dgelu = res
    if act is None:
        return _mlp_block_bwd_vjp((x, gamma, beta, w1, b1, w2, b2), g)
    dx, dgm, dbe, dw1, db1, dw2, db2 = _mlp_block_bwd_stash(
        x, g, act, dgelu, gamma, beta, w1, w2)
    dx, dgm, dbe, dw1, db1, dw2, db2 = jax.lax.optimization_barrier(
        (dx, dgm, dbe, dw1, db1, dw2, db2))
    return (dx.astype(x.dtype),
            dgm.reshape(gamma.shape).astype(gamma.dtype),
            dbe.reshape(beta.shape).astype(beta.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype))


_mlp_block_stash.defvjp(_mlp_block_stash_fwd_vjp, _mlp_block_stash_bwd_vjp)


def _mlp_block_xla(x, gamma, beta, w1, b1, w2, b2):
    """Reference path (identical ops via nn.layers) for backward recompute
    and CPU fallback."""
    from mirage_tpu.nn.layers import layer_norm, mlp_apply

    h = layer_norm({"scale": gamma, "bias": beta}, x)
    h = mlp_apply({"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}, h)
    return x + h


@jax.custom_vjp
def _mlp_block(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2,
                          interpret=_rt.interpret())


def _mlp_block_fwd_vjp(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2,
                          interpret=_rt.interpret()), \
        (x, gamma, beta, w1, b1, w2, b2)


def _route_unaligned_bwd(b, n, d, hdim, row_unit=18, fixed_mult=12):
    """'flat' | 'pad' | None for an unaligned-(B, N, D) backward: fewest
    grid programs wins, ties to flatten (no wasted rows). None = neither
    2-D routing admits a block (per-element path runs). row_unit/fixed_mult
    select the picker coefficients: (18, 12) for the accumulating kernel,
    (_DEFUSED_ROW_UNIT, 4) for the de-fused one (no f32 dW accumulators)."""
    n_pad = -(-n // 16) * 16
    blk_flat = _pick_bwd_block(b * n, d, hdim, row_unit, fixed_mult * d * hdim)
    blk_pad = (_pick_bwd_block(b * n_pad, d, hdim, row_unit,
                               fixed_mult * d * hdim)
               if (b * n_pad) % 1024 == 0 else None)
    progs_flat = (b * n) // blk_flat if blk_flat else None
    progs_pad = (b * n_pad) // blk_pad if blk_pad else None
    if progs_flat is not None and (progs_pad is None
                                   or progs_flat <= progs_pad):
        return "flat"
    return "pad" if progs_pad is not None else None


def _bwd_kernel_viable(x, d, hdim):
    """Mirror _mlp_block_bwd_pallas's routing to predict whether the active
    backward impl's 2-D grid would land on a VMEM-safe block; the
    per-element 3-D path (small n, elems<=4) is always the accumulating
    kernel, so its estimate keeps the accumulate coefficients."""
    if _MLP_BWD_IMPL == "defused":
        row_unit, fixed_mult = _DEFUSED_ROW_UNIT, 4
    else:
        row_unit, fixed_mult = 18, 12
    if x.ndim == 3:
        b, n, _ = x.shape
        if n % 16 == 0:
            m = b * n
        else:
            # unaligned 3-D: the flatten/pad routings self-gate on the
            # two-tier picker (ceiling-safe); when neither admits a block
            # the per-element path runs — estimate ITS footprint too
            # ((elems, n) rows live at once + the fixed f32 accumulators
            # and weights), so a future shape where all three bust VMEM
            # falls back to XLA instead of failing Mosaic compile
            if _route_unaligned_bwd(b, n, d, hdim, row_unit,
                                    fixed_mult) is not None:
                return True
            elems = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)
            return (elems * n * hdim * 18 + 12 * d * hdim) < 58 * 2 ** 20
    else:
        m = x.shape[0]
    blk = _pick_bwd_block(m, d, hdim, row_unit, fixed_mult * d * hdim)
    if blk is None:
        blk = m  # single-block fallback — viable only if it fits the ceiling
    return blk * hdim * row_unit + fixed_mult * d * hdim < 58 * 2 ** 20


def _mlp_block_bwd_vjp(res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    on_tpu = _rt.kernels_enabled()
    if on_tpu and _HAVE_PLTPU and _bwd_kernel_viable(
            x, x.shape[-1], w1.shape[-1]):
        dx, dg, dbe, dw1, db1, dw2, db2 = _mlp_block_bwd_pallas(
            x, g, gamma, beta, w1, b1, w2, interpret=_rt.interpret())
        # keep XLA from fusing the f32 dW outputs into the caller's
        # gradient-stack update-slice: that fusion charges them to the 16 MB
        # scoped-vmem budget and fails to compile at ViT sizes
        dx, dg, dbe, dw1, db1, dw2, db2 = jax.lax.optimization_barrier(
            (dx, dg, dbe, dw1, db1, dw2, db2))
        return (dx.astype(x.dtype),
                dg.reshape(gamma.shape).astype(gamma.dtype),
                dbe.reshape(beta.shape).astype(beta.dtype),
                dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
                dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype))
    _, vjp = jax.vjp(_mlp_block_xla, *res)
    return vjp(g)


_mlp_block.defvjp(_mlp_block_fwd_vjp, _mlp_block_bwd_vjp)


@jax.custom_vjp
def _mlp_block_nores(x, gamma, beta, w1, b1, w2, b2):
    return _mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, residual=False,
                          interpret=_rt.interpret())


def _mlp_block_nores_fwd_vjp(x, gamma, beta, w1, b1, w2, b2):
    return (_mlp_block_fwd(x, gamma, beta, w1, b1, w2, b2, residual=False,
                           interpret=_rt.interpret()),
            (x, gamma, beta, w1, b1, w2, b2))


def _mlp_block_nores_bwd_vjp(res, g):
    # identical backward math to the residual form except the skip-add's
    # pass-through cotangent: dx_nores = dx_res - g (exact — the residual
    # contributes g additively and nothing else)
    out = _mlp_block_bwd_vjp(res, g)
    return (out[0] - g.astype(out[0].dtype),) + out[1:]


_mlp_block_nores.defvjp(_mlp_block_nores_fwd_vjp, _mlp_block_nores_bwd_vjp)


def mlp_block(x, norm2, mlp, interpret: bool = False, grad_free: bool = False,
              residual: bool = True, stash: bool = False):
    """Fused x + MLP(LN(x)) over pytree params ({'scale','bias'},
    {'fc1','fc2'}). Differentiable (backward recomputes via XLA).

    residual=False returns MLP(LN(x)) WITHOUT the skip-add, for callers
    that must scale the branch before the skip (stochastic depth). It is
    differentiable: the no-residual backward is the residual backward minus
    the skip's pass-through cotangent (dx_nores = dx_res - g, exact).

    stash=True (residual form only) uses the stash-variant custom VJP: the
    forward writes the post-GELU activation + GELU derivative to HBM so the
    backward runs 4 matmuls with no fc1 recompute and no transcendentals.
    _stash_route gates which shapes engage (2-D rows at d >= 384 — the seg
    ConvNeXt head; the encoder's unaligned-3-D shapes measured net-negative,
    see its note) — other shapes silently take the recompute backward.
    Inference never runs the stash forward (the custom_vjp primal is the
    plain fused forward)."""
    args = (x, norm2["scale"], norm2["bias"], mlp["fc1"]["w"], mlp["fc1"]["b"],
            mlp["fc2"]["w"], mlp["fc2"]["b"])
    if not residual:
        if interpret:
            return _mlp_block_fwd(*args, interpret=True, residual=False)
        # grad_free is accepted but ignored: a raw pallas fwd (no
        # custom_vjp) inside a grad program trips JAX's jvp bookkeeping
        # (ad.py nonzeros assert — see attn_half_block's note), and the
        # custom_vjp wrapper costs nothing when the caller stop-gradients
        # the output.
        return _mlp_block_nores(*args)
    if interpret:
        return _mlp_block_fwd(*args, interpret=True)
    del grad_free  # accepted but ignored — see attn_half_block
    if stash:
        return _mlp_block_stash(*args)
    return _mlp_block(*args)
