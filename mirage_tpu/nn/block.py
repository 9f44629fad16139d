"""Transformer blocks: pre-LN encoder Block and DecoderBlock.

Parity: mirage/utils.py:226-310. Residual structure:
  x = x + DropPath(Attn(LN(x))); x = x + DropPath(MLP(LN(x)))
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from mirage_tpu.nn.attention import (
    _on_tpu,
    _use_block_kernel,
    attention_apply,
    attention_init,
    cross_attention_apply,
    cross_attention_init,
)
from mirage_tpu.utils.envflags import env_choice

# Whole-block single-kernel routing (ops/fused_block.py) for deterministic
# forwards. "off" is the measured default: on the ENCODER the merged kernel
# lost (866->821 img/s — the inter-half HBM round-trip is hidden by grid
# pipelining and the merged body schedules worse, fused_block.py header).
# "decoder" routes only dim<=256 blocks — the flagship's decoder tail is
# ~18 latency-bound sub-2ms calls (BASELINE.md r5 inference trace) where
# halving the call count is the one untried lever; "all" exists to re-run
# the encoder A/B. Read at trace time (scripts toggle the module global).
_BLOCK_FUSE = env_choice("MIRAGE_BLOCK_FUSE", "off", ("off", "decoder", "all"))
from mirage_tpu.nn.layers import (drop_path, gelu, layer_norm,
                                  layer_norm_init, linear, mlp_apply,
                                  mlp_init)


def block_init(key, dim, mlp_ratio=4.0, qkv_bias=False, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": layer_norm_init(dim, dtype),
        "attn": attention_init(k1, dim, qkv_bias=qkv_bias, dtype=dtype),
        "norm2": layer_norm_init(dim, dtype),
        "mlp": mlp_init(k2, dim, int(dim * mlp_ratio), dtype=dtype),
    }


def block_apply(p, x, num_heads, *, impl="auto", drop=0.0, attn_drop=0.0,
                drop_path_rate=0.0, deterministic=True, rng: Optional[jax.Array] = None,
                grad_free=False, tp=None):
    if tp is not None:
        return _tp_block_apply(
            p, x, num_heads, tp, impl=impl, drop=drop, attn_drop=attn_drop,
            drop_path_rate=drop_path_rate, deterministic=deterministic,
            rng=rng, grad_free=grad_free)
    r = [None] * 4
    if rng is not None:
        r = list(jax.random.split(rng, 4))
    # Fused path covers inference AND training: both half-block kernels have
    # real Pallas backwards (dx + f32 parameter grads, remat-friendly), so
    # the only training requirement is that dropout/attention-dropout/
    # drop-path are statically zero — true for every reference pretraining
    # and cls config. A traced (non-float) drop_path_rate keeps the generic
    # path (seg tuning's 0.1 stochastic depth). In TRAINING the attention
    # half fuses only at short sequences: measured +7% at N=99 (pretraining)
    # but -5% at N=257 (cls full-FT, where the XLA qkv/proj matmuls at
    # B*N=16k rows beat the per-element kernel RECOMPUTE in the backward) —
    # the MLP half fuses at any N either way. grad_free (frozen-encoder
    # probe) has no backward, so it takes the fused half at any N like
    # inference does.
    static_identity_regularizers = (
        drop == 0.0 and attn_drop == 0.0
        and isinstance(drop_path_rate, (int, float)) and drop_path_rate == 0.0)
    # head_dim must be a multiple of 32: a dh=48 model (tiny dev preset
    # before the fix) made the remote XLA pipeline hang whenever the fused
    # kernels' scan had a consumer — dh=32 (decoders) and 64 (all reference
    # encoder sizes) compile fine.
    fused_inference = ((deterministic
                        or (static_identity_regularizers
                            and (x.shape[1] <= 128 or grad_free)))
                       and impl in ("auto", "block")
                       and x.shape[1] <= 512
                       and (x.shape[-1] // num_heads) % 32 == 0 and _on_tpu())
    if fused_inference:
        # each half-block is one Pallas kernel (ops/block_attention.py
        # attn_half_block + ops/fused_mlp.py mlp_block): LN outputs, the
        # (B,N,3D) qkv tensor, the pre-proj attention output and the
        # (B,N,4D) MLP intermediates all stay in VMEM. Inference path only —
        # dropout / drop-path are identities under deterministic.
        # (Merging both halves into ONE kernel — ops/fused_block.py — was
        # measured SLOWER at the flagship shape: 866 -> 821 img/s; the
        # intermediate HBM round-trip is fully hidden by Mosaic's grid
        # pipelining, and the merged body schedules worse.)
        if (deterministic and _BLOCK_FUSE != "off"
                and (_BLOCK_FUSE == "all" or x.shape[-1] <= 256)):
            # One kernel for the whole block. Deterministic forwards only:
            # fused_block's backward is an XLA recompute (worse than the
            # halves' Pallas backwards), so training paths keep the halves.
            from mirage_tpu.ops import runtime as _rt
            from mirage_tpu.ops.fused_block import fused_block

            return fused_block(x, p, num_heads, interpret=_rt.interpret())
        from mirage_tpu.ops.block_attention import attn_half_block
        from mirage_tpu.ops.fused_mlp import mlp_block

        x = attn_half_block(x, p["norm1"], p["attn"], num_heads,
                            grad_free=grad_free)
        # named so the remat policy (encoder_apply) can SAVE the inter-half
        # activation: both halves' Pallas backwards recompute their own
        # internals from their inputs, so with h saved the attn-half forward
        # recompute in the bwd scan is dead and XLA DCEs it (13 ms/step of
        # the round-3 pretraining trace; 39 MB/layer bf16 to keep)
        x = checkpoint_name(x, "attn_half_out")
        # NO stash=True here: the encoder's unaligned-3-D stash route
        # measured net-negative on v5e (fused_mlp._stash_route note — the
        # stash bwd kernel wins 0.94 ms/layer but the per-element stash
        # writes cost 1.2); the recompute backward stays.
        return mlp_block(x, p["norm2"], p["mlp"], grad_free=grad_free)
    h = layer_norm(p["norm1"], x)
    h = attention_apply(p["attn"], h, num_heads, impl=impl, attn_drop=attn_drop,
                        proj_drop=drop, deterministic=deterministic, rng=r[0])
    x = x + drop_path(h, drop_path_rate, deterministic=deterministic, rng=r[1])
    if ((deterministic or (drop == 0.0
                           and isinstance(drop_path_rate, (int, float))
                           and drop_path_rate == 0.0))
            and impl in ("auto", "block")
            and (x.shape[-1] // num_heads) % 32 == 0 and _on_tpu()):
        from mirage_tpu.ops.fused_mlp import mlp_block

        return mlp_block(x, p["norm2"], p["mlp"], grad_free=grad_free)
    if (drop == 0.0 and impl in ("auto", "block")
            and (grad_free or x.shape[1] <= 512)
            and (x.shape[-1] // num_heads) % 32 == 0 and _on_tpu()):
        # training with stochastic depth (seg tuning's drop_path 0.1, which
        # is a traced per-layer rate): the fused MLP runs WITHOUT its
        # residual so the drop-path scaling applies to the bare branch
        # before the skip-add; a no-residual custom VJP keeps it
        # differentiable. The differentiable form gates at N<=512: the
        # backward kernel's (N, 4D) f32 recompute intermediates exceed the
        # 64 MB VMEM budget at the seg shape (N=1025 OOM'd at 87 MB) — the
        # grad-free fast path runs the forward-only kernel, which fits at
        # any N (this is the 93.8 -> 97.1 img/s seg fast-path win).
        from mirage_tpu.ops.fused_mlp import mlp_block

        h = mlp_block(x, p["norm2"], p["mlp"], grad_free=grad_free,
                      residual=False)
        return x + drop_path(h, drop_path_rate, deterministic=deterministic,
                             rng=r[3])
    h = layer_norm(p["norm2"], x)
    h = mlp_apply(p["mlp"], h, dropout_rate=drop, deterministic=deterministic, rng=r[2])
    x = x + drop_path(h, drop_path_rate, deterministic=deterministic, rng=r[3])
    return x


def _tp_block_apply(p, x, num_heads, tp, *, impl, drop, attn_drop,
                    drop_path_rate, deterministic, rng, grad_free):
    """Tensor-parallel encoder block (must run inside a shard_map over the
    tp axis; parallel/tp.py module docstring has the full design).

    The block's two branches are computed shard-locally from the device's
    param shards — attention head-parallel (local qkv columns are a
    standard-layout [3, H/t, dh] weight after tp_relayout, so the fused
    block_attention kernel runs unchanged on H/t heads; ops kernels derive
    dims from the qkv width), MLP hidden-parallel (the no-residual fused
    MLP kernel is hidden-dim generic) — and completed by one psum each.
    proj/fc2 biases are replicated params added AFTER the psum (a zero
    stands in inside the branch), so their grads keep plain replicated
    semantics. Dropout/attn-dropout must be statically zero (a mask drawn
    per shard over partial sums has no single-device equivalent; every
    reference pretraining/cls config uses 0.0) — drop-path is fine: it
    scales the COMPLETED branch with the shard-shared rng."""
    from mirage_tpu.parallel.tp import ident_f, psum_g

    assert drop == 0.0 and attn_drop == 0.0, \
        "tensor-parallel blocks require drop == attn_drop == 0.0"
    axis, t = tp
    heads_local = num_heads // t
    assert heads_local * t == num_heads
    r = [None] * 2
    if rng is not None:
        r = list(jax.random.split(rng, 2))
    b, n, c = x.shape

    # ---- attention half: head-parallel ----
    h = layer_norm(p["norm1"], ident_f(x, axis))
    qkv_flat = linear(p["attn"]["qkv"], h)           # (B, N, 3*D/t)
    dim_local = qkv_flat.shape[-1] // 3
    dh = dim_local // heads_local
    scale = dh ** -0.5
    if _use_block_kernel(impl, n, attn_drop, deterministic, dh):
        from mirage_tpu.ops.block_attention import block_attention

        out = block_attention(qkv_flat, heads_local, scale)
    else:
        from mirage_tpu.nn.attention import _merge_heads, sdpa

        qkv = qkv_flat.reshape(b, n, 3, heads_local, dh).transpose(2, 0, 3, 1, 4)
        out = _merge_heads(sdpa(qkv[0], qkv[1], qkv[2], scale, impl=impl,
                                deterministic=deterministic))
    part = out @ p["attn"]["proj"]["w"].astype(out.dtype)
    attn_out = psum_g(part, axis) + p["attn"]["proj"]["b"].astype(part.dtype)
    x = x + drop_path(attn_out, drop_path_rate, deterministic=deterministic,
                      rng=r[0])
    x = checkpoint_name(x, "attn_half_out")

    # ---- MLP half: hidden-parallel ----
    xf = ident_f(x, axis)
    # dh % 32 mirrors every other fused-kernel gate in this file: a dh=48
    # model hangs the remote XLA compile when a fused kernel's scan has a
    # consumer, so non-32-multiple head dims must fall back to XLA here too
    if (impl in ("auto", "block") and (grad_free or n <= 512)
            and dh % 32 == 0 and _on_tpu()):
        from mirage_tpu.ops.fused_mlp import mlp_block

        fc2_w = p["mlp"]["fc2"]["w"]
        zero_b = jnp.zeros_like(p["mlp"]["fc2"]["b"])
        part = mlp_block(xf, p["norm2"],
                         {"fc1": p["mlp"]["fc1"],
                          "fc2": {"w": fc2_w, "b": zero_b}},
                         grad_free=grad_free, residual=False)
    else:
        h = layer_norm(p["norm2"], xf)
        h = gelu(linear(p["mlp"]["fc1"], h))
        part = h @ p["mlp"]["fc2"]["w"].astype(h.dtype)
    mlp_out = psum_g(part, axis) + p["mlp"]["fc2"]["b"].astype(part.dtype)
    return x + drop_path(mlp_out, drop_path_rate, deterministic=deterministic,
                         rng=r[1])


def decoder_block_init(key, dim, mlp_ratio=4.0, qkv_bias=False, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": layer_norm_init(dim, dtype),
        "self_attn": attention_init(k1, dim, qkv_bias=qkv_bias, dtype=dtype),
        "cross_attn": cross_attention_init(k2, dim, qkv_bias=qkv_bias, dtype=dtype),
        "query_norm": layer_norm_init(dim, dtype),
        "context_norm": layer_norm_init(dim, dtype),
        "norm2": layer_norm_init(dim, dtype),
        "mlp": mlp_init(k3, dim, int(dim * mlp_ratio), dtype=dtype),
    }


def decoder_block_apply(p, x, context, num_heads, *, impl="auto", drop=0.0,
                        attn_drop=0.0, drop_path_rate=0.0, deterministic=True,
                        rng: Optional[jax.Array] = None):
    r = [None] * 6
    if rng is not None:
        r = list(jax.random.split(rng, 6))
    h = attention_apply(p["self_attn"], layer_norm(p["norm1"], x), num_heads,
                        impl=impl, attn_drop=attn_drop, proj_drop=drop,
                        deterministic=deterministic, rng=r[0])
    x = x + drop_path(h, drop_path_rate, deterministic=deterministic, rng=r[1])
    h = cross_attention_apply(p["cross_attn"], layer_norm(p["query_norm"], x),
                              layer_norm(p["context_norm"], context), num_heads,
                              impl=impl, attn_drop=attn_drop, proj_drop=drop,
                              deterministic=deterministic, rng=r[2])
    x = x + drop_path(h, drop_path_rate, deterministic=deterministic, rng=r[3])
    h = mlp_apply(p["mlp"], layer_norm(p["norm2"], x), dropout_rate=drop,
                  deterministic=deterministic, rng=r[4])
    x = x + drop_path(h, drop_path_rate, deterministic=deterministic, rng=r[5])
    return x
