"""ViT encoder as a lax.scan over stacked per-layer parameters.

TPU-native design: stacking all L transformer blocks into one pytree with a
leading layer axis gives (a) O(1) HLO size and fast compiles, (b) a natural
`jax.checkpoint` boundary per layer for rematerialization, and (c) trivially
shardable parameters (the layer axis is never sharded; dim axes map to the
tensor/fsdp mesh axes). The reference runs an nn.Sequential python loop
(mirage/model.py:81-93, :408-409).
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.nn.block import block_apply, block_init


def encoder_init(key, depth, dim, mlp_ratio=4.0, qkv_bias=True, dtype=jnp.float32):
    """Stacked params: every leaf has leading dim `depth`."""
    keys = jax.random.split(key, depth)
    blocks = [block_init(k, dim, mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, dtype=dtype)
              for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def drop_path_rates(drop_path_rate: float, depth: int):
    """Stochastic-depth linspace decay (model.py:80)."""
    return jnp.linspace(0.0, drop_path_rate, depth)


def layer_params(params, i):
    return jax.tree_util.tree_map(lambda p: p[i], params)


def encoder_apply(
    params,
    x,
    num_heads: int,
    *,
    depth: int,
    impl: str = "auto",
    drop: float = 0.0,
    attn_drop: float = 0.0,
    drop_path_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    return_layers: Optional[Sequence[int]] = None,
    remat: bool = False,
    grad_free: bool = False,
    tp=None,
):
    """Run the block stack. If `return_layers` is given, returns
    (final_tokens, {layer_idx: tokens}) using an unrolled loop (needed by the
    DPT head's feature hooks); otherwise a single fused scan. (An unrolled
    deterministic-inference path was measured SLOWER than the scan on v5e —
    the scan's dynamic weight-slice copies feeding the Pallas custom calls
    overlap with compute, and the while-loop keeps activations VMEM-resident.)
    """
    if return_layers is not None:
        outs = {}
        # host-side numpy, NOT jnp: under jit a jnp.linspace is a tracer and
        # float(dpr[i]) would raise ConcretizationTypeError — this unrolled
        # branch wants static per-layer rates
        dpr = np.linspace(0.0, drop_path_rate, depth)
        for i in range(depth):
            r = jax.random.fold_in(rng, i) if rng is not None else None
            x = block_apply(layer_params(params, i), x, num_heads, impl=impl,
                            drop=drop, attn_drop=attn_drop,
                            drop_path_rate=float(dpr[i]),
                            deterministic=deterministic, rng=r,
                            grad_free=grad_free, tp=tp)
            if i in return_layers:
                outs[i] = x
        return x, outs

    # drop_path_rate == 0.0 (every reference pretraining/cls-FT config):
    # don't thread traced per-layer rates through the scan — a STATIC 0.0
    # lets block_apply pick the fused-MLP kernel path in training.
    thread_rates = drop_path_rate != 0.0
    dpr = drop_path_rates(drop_path_rate, depth) if thread_rates else None

    def body(carry, xs):
        xs = list(xs)
        p = xs.pop(0)
        rate = xs.pop(0) if thread_rates else 0.0
        key = xs.pop(0) if not deterministic else None
        fn = partial(block_apply, num_heads=num_heads, impl=impl, drop=drop,
                     attn_drop=attn_drop, deterministic=deterministic,
                     grad_free=grad_free, tp=tp)
        if remat:
            # Selective remat: SAVE the inter-half activation (named in
            # block_apply's fused path) — the half-block Pallas backwards
            # recompute their own internals from their inputs, so full-block
            # remat double-paid the attention-half forward (13 ms/step at
            # the pretrain config) for 39 MB/layer of bf16 savings we don't
            # need. On the non-fused path nothing carries the name and this
            # degrades to plain per-layer remat. (The MLP act/gelu' stash
            # names exist too — fused_mlp names them so a remat policy CAN
            # save them — but the encoder shapes measured net-negative for
            # the stash route, so they are not listed here.)
            fn = jax.checkpoint(
                lambda p_, c_, rate_, key_: block_apply(
                    p_, c_, num_heads, impl=impl, drop=drop, attn_drop=attn_drop,
                    drop_path_rate=rate_, deterministic=deterministic, rng=key_,
                    grad_free=grad_free, tp=tp),
                static_argnums=(2,) if not thread_rates else (),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_half_out"))
            y = fn(p, carry, rate, key)
        else:
            y = fn(p, carry, drop_path_rate=rate, rng=key)
        return y, None

    xs = [params]
    if thread_rates:
        xs.append(dpr)
    if not deterministic:
        xs.append(jax.random.split(rng, depth))
    x, _ = jax.lax.scan(body, x, tuple(xs))
    return x, None
