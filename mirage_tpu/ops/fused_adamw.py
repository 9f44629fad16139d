"""One-pass fused AdamW update kernel.

Reference workload: run_pretraining.py:648-767 — optimizer.step() each
train iteration over the ~111 M-param pretraining pytree (torch's AdamW is
its own fused CUDA path; here the equivalent is a Pallas elementwise
kernel).

Why a kernel at all: the optimizer is pure HBM-bandwidth. One AdamW update
must read g, m, n, p and write m, n, p — 28 B/param f32 ≈ 3.1 GB ≈ 3.8 ms
at v5e HBM rate for the pretraining pytree. The tree_map formulation in
train/optim.py leaves XLA free to materialize the `updates` intermediate
and split the mu/nu/apply passes (the round-4 trace shows ~6-8 ms —
~52 B/param). This kernel does the whole update in one pass per leaf:

    gs   = g * gscale              (clip fold — avoids a scaled-grads copy)
    m'   = b1*m + (1-b1)*gs
    n'   = b2*n + (1-b2)*gs^2
    p'   = p - lr_eff*((m'/c1)/(sqrt(n'/c2)+eps) + wd_eff*p)
    keep<=0 (skip_grad explosion): all three outputs pass through unchanged.

Traced scalars (gscale, lr_eff, wd_eff, c1, c2, keep) ride in one (1, 8)
f32 SMEM operand so count/lr/wd schedules never retrace.

Routing (``leaf_update_viable`` + ``fused_adamw_leaf``) engages per leaf
from GroupedOptimizer.update for AdamW only, when the leaf is f32,
large enough to amortize a custom call, its lr_scale is a python scalar
(layer-decay vector leaves stay XLA), and its flattened size is
lane-aligned. Everything else keeps the tree_map path bit-for-bit.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.ops import runtime as _rt
from mirage_tpu.utils.envflags import env_choice

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

# chip A/B override (read once at import). Default OFF: the isolated
# micro-bench won (22.4 -> 11.7 ms on the ViT-B pretraining pytree,
# scripts/bench_opt.py, r4 chip) but the END-TO-END interleaved A/B LOST
# -6.25 ms/step (-2.93%, on 214.4 vs off 208.2 ms median, ViT-B pretrain
# B=256, scripts/bench_opt_ab.py, r5 chip 2026-08-19): inside the full
# donated train step XLA already fuses the optimizer with the dW
# producers at ~6-8 ms total, and the per-leaf custom calls break those
# fusions. Kept (tested, numerics-equal) for shard-shaped ZeRO moment
# leaves and future pytrees where XLA's fusion loses.
_ENABLED = env_choice("MIRAGE_OPT_KERNEL", "off", ("on", "off")) == "on"
_LAST_ROUTED = 0

# minimum leaf size to pay a custom call for (the pretraining pytree's
# mass is in ~20 stacked encoder/decoder leaves of 4-28 M elements; biases
# and LN scales are noise)
_MIN_ELEMS = 1 << 17

_LANES = 128
_BLOCK_ROWS = 256  # (256, 512) f32 x 7 buffers = 3.5 MB blocks
_BLOCK_COLS = 512


def set_enabled(v: bool) -> None:
    global _ENABLED
    _ENABLED = v


def enabled() -> bool:
    return _ENABLED


def last_routed_count() -> int:
    return _LAST_ROUTED


def reset_routed_count() -> None:
    global _LAST_ROUTED
    _LAST_ROUTED = 0


def _flat2d(size: int) -> Tuple[int, int]:
    """Pick a (rows, cols) view of a flat leaf: cols = widest 128-multiple
    divisor of size that is <= _BLOCK_COLS."""
    for cols in (_BLOCK_COLS, 256, _LANES):
        if size % cols == 0:
            return size // cols, cols
    return 0, 0


def leaf_update_viable(leaf, lr_scale) -> bool:
    """Route this leaf's AdamW update through the kernel?"""
    if not (_ENABLED and _rt.kernels_enabled() and _HAVE_PLTPU):
        return False
    if not isinstance(lr_scale, (int, float)):
        return False  # per-layer lr vectors stay on the XLA path
    if leaf.dtype != jnp.float32:
        return False
    size = int(np.prod(leaf.shape))
    if size < _MIN_ELEMS:
        return False
    return _flat2d(size)[0] > 0


def _adamw_kernel(sc_ref, g_ref, m_ref, n_ref, p_ref,
                  mo_ref, no_ref, po_ref, *, b1, b2, eps):
    gscale = sc_ref[0, 0]
    lr = sc_ref[0, 1]
    wd = sc_ref[0, 2]
    c1 = sc_ref[0, 3]
    c2 = sc_ref[0, 4]
    keep = sc_ref[0, 5]
    g = g_ref[...] * gscale
    m_old = m_ref[...]
    n_old = n_ref[...]
    p = p_ref[...]
    m = b1 * m_old + (1.0 - b1) * g
    n = b2 * n_old + (1.0 - b2) * (g * g)
    step = (m / c1) / (jnp.sqrt(n / c2) + eps) + wd * p
    pnew = p - lr * step
    usek = keep > 0.0
    mo_ref[...] = jnp.where(usek, m, m_old)
    no_ref[...] = jnp.where(usek, n, n_old)
    po_ref[...] = jnp.where(usek, pnew, p)


def fused_adamw_leaf(g, m, n, p, *, gscale, lr_eff, wd_eff, c1, c2, keep,
                     b1: float, b2: float, eps: float):
    """One-pass AdamW for one leaf. All of gscale/lr_eff/wd_eff/c1/c2/keep
    are traced f32 scalars; b1/b2/eps are static. Returns (m', n', p')
    shaped like the inputs."""
    global _LAST_ROUTED
    shape = p.shape
    size = int(np.prod(shape))
    rows, cols = _flat2d(size)
    assert rows > 0, shape
    view = lambda x: x.reshape(rows, cols)
    sc = jnp.stack([gscale, lr_eff, wd_eff, c1, c2, keep,
                    jnp.float32(0), jnp.float32(0)]).astype(jnp.float32)
    sc = sc.reshape(1, 8)

    blk_r = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, blk_r),)
    bspec = pl.BlockSpec((blk_r, cols), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  bspec, bspec, bspec, bspec],
        out_specs=(bspec, bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((rows, cols), jnp.float32),) * 3,
        # m/n/p inputs alias the m'/n'/p' outputs: the update is genuinely
        # in-place when the caller donates the train state (otherwise XLA
        # inserts the copy), instead of 7 live leaf-sized buffers (ADVICE r4)
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=_rt.interpret(),
    )(sc, view(g.astype(jnp.float32)), view(m), view(n), view(p))
    _LAST_ROUTED += 1
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape))
