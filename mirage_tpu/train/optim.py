"""Optimizer with parameter-group semantics over pytrees.

Capability parity: mutils/optim_factory.py — AdamW/Adam/SGD with
  - no-weight-decay groups (1-D params, biases, model skip list:
    pos_emb/class_emb/global_tokens/mask_token/task_embeddings),
  - layer-wise LR decay (input adapters -> layer 0, encoder block i -> i+1,
    heads -> depth+1; scale decay^(depth+1-layer_id)),
  - frozen-encoder fine-tuning (seg default, optim_factory.py:184-190),
  - decoder_decay group,
and mutils/native_scaler.py grad-norm clip / skip-on-explosion semantics
(pure-JAX: bf16 training needs no loss scaling).

TPU-native twist: encoder params are STACKED (leading layer axis, from the
lax.scan design), so layer-wise LR scales are per-leaf *vectors* broadcast
along the layer axis instead of per-group python partitions. LR and WD are
traced scalars fed per step from host-side schedule arrays.
"""

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.ops import fused_adamw as _fa


NO_DECAY_LEAF_NAMES = {"b", "bias", "scale"}
# reference no_weight_decay sets (model.py:126-143, adapters)
NO_DECAY_PATH_NAMES = {"pos_emb", "class_emb", "global_tokens", "mask_token",
                       "task_embeddings", "cls_emb"}
# non-learnable buffers (torch buffers are excluded from the optimizer):
# BatchNorm running statistics
BUFFER_LEAF_NAMES = {"mean", "var"}
# non-learnable buffers (requires_grad=False in the reference): fixed sincos
# posembs are frozen unless learnable_pos_emb
FROZEN_PATH_NAMES_DEFAULT = ()


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


@dataclasses.dataclass
class OptimizerConfig:
    opt: str = "adamw"
    betas: Tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    weight_decay: float = 0.05
    momentum: float = 0.9
    layer_decay: Optional[float] = None  # e.g. 0.75 for seg tuning
    num_layers: int = 12
    freeze_encoder: bool = False
    frozen_paths: Tuple[str, ...] = ()   # extra frozen subtrees by name
    learnable_pos_emb: bool = False      # train pos_emb (ref --learnable_pos_emb)
    decoder_decay: Optional[float] = None
    clip_grad: Optional[float] = None
    skip_grad: Optional[float] = None    # skip update if grad norm >= this


def _leaf_meta(cfg: OptimizerConfig, names: Tuple[str, ...], leaf) -> Dict[str, Any]:
    """Compute (use_decay, decay_value, lr_scale, trainable) for one leaf."""
    last = names[-1]
    no_decay = last in NO_DECAY_LEAF_NAMES or any(
        n in NO_DECAY_PATH_NAMES for n in names)
    wd = 0.0 if no_decay else cfg.weight_decay
    if cfg.decoder_decay is not None and not no_decay and "output_adapters" in names:
        wd = cfg.decoder_decay

    trainable = True
    if last in BUFFER_LEAF_NAMES:
        # BatchNorm running stats: frozen buffers, never decayed. (Their
        # train-mode EMA update is intentionally not threaded through the
        # train step: every reference seg config runs use_bn=False.)
        trainable = False
        wd = 0.0
    if "pos_emb" in names and not cfg.learnable_pos_emb:
        # fixed sincos posembs: excluded from the optimizer in the reference
        # (requires_grad=False) unless --learnable_pos_emb
        # (run_seg_tuning.py:100-104, input_adapters.py:64-69).
        trainable = False
    if cfg.freeze_encoder and names[0] == "encoder":
        trainable = False
    if any(n in cfg.frozen_paths for n in names):
        trainable = False

    # layer-wise lr scale
    lr_scale: Any = 1.0
    if cfg.layer_decay is not None:
        L = cfg.num_layers
        if names[0] == "input_adapters" or names[0] == "global_tokens":
            lr_scale = cfg.layer_decay ** (L + 1)
        elif names[0] == "encoder":
            # stacked leaf: per-layer vector decay^(L - i), broadcast over
            # the leading layer axis
            scales = cfg.layer_decay ** (L - np.arange(L))
            lr_scale = jnp.asarray(scales, jnp.float32).reshape(
                (L,) + (1,) * (leaf.ndim - 1))
        else:
            lr_scale = 1.0
    return {"wd": wd, "lr_scale": lr_scale, "trainable": trainable}


_FROZEN = object()  # frozen-leaf update sentinel (identity in apply_update)


class _UpdateTriple(tuple):
    """Marker for one leaf's (mu', nu', p') result. A distinct type (left
    unregistered with tree_util, so it is a leaf) rather than a bare tuple:
    `pick` below must never mistake a tuple *container* inside a params
    pytree for an update triple (ADVICE r4)."""
    __slots__ = ()


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


class GroupedOptimizer:
    """AdamW / Adam / SGD with per-leaf group metadata. Update signature takes
    traced lr (and optional wd override) scalars each step."""

    def __init__(self, cfg: OptimizerConfig):
        self.cfg = cfg

    def meta(self, params):
        return {
            "wd": jax.tree_util.tree_map_with_path(
                lambda p, l: _leaf_meta(self.cfg, _path_names(p), l)["wd"], params),
            "lr_scale": jax.tree_util.tree_map_with_path(
                lambda p, l: _leaf_meta(self.cfg, _path_names(p), l)["lr_scale"], params),
            "trainable": jax.tree_util.tree_map_with_path(
                lambda p, l: _leaf_meta(self.cfg, _path_names(p), l)["trainable"], params),
        }

    def init(self, params):
        # Frozen leaves get a scalar placeholder instead of moment buffers:
        # the reference never hands frozen params to the optimizer at all
        # (optim_factory.py:184-190), and full-size zero moments both waste
        # HBM (688 MB for a frozen ViT-B encoder) and made `update` run
        # moment-decay arithmetic on params whose update is zeroed anyway
        # (~3 ms/step of dead work in the cls-probe trace).
        trainable = self.meta(params)["trainable"]
        zeros = lambda p, t: jnp.zeros_like(p) if t else jnp.zeros((), p.dtype)
        state = {"count": jnp.zeros((), jnp.int32)}
        if self.cfg.opt in ("adamw", "adam"):
            state["mu"] = jax.tree_util.tree_map(zeros, params, trainable)
            state["nu"] = jax.tree_util.tree_map(zeros, params, trainable)
        elif self.cfg.opt in ("sgd", "momentum", "nesterov"):
            state["mu"] = jax.tree_util.tree_map(zeros, params, trainable)
        else:
            raise ValueError(f"Unknown optimizer {self.cfg.opt}")
        return state

    def update(self, grads, state, params, lr, wd_scale=1.0,
               allow_kernel: bool = True, gnorm=None):
        """Returns (new_params, new_state, grad_norm).

        Implements native_scaler semantics: clip_grad rescales gradients to
        the clip norm; skip_grad zeroes the update (but still advances
        count, matching the reference's scaler.update()) when the norm
        explodes.

        allow_kernel: big aligned AdamW leaves route through the one-pass
        fused Pallas kernel (ops/fused_adamw.py). MUST be False inside a
        GSPMD-sharded jit (fsdp/tensor meshes) — a pallas_call with
        GSPMD-sharded operands is a hard Mosaic error; the shard_map dp
        step sees per-device arrays and is fine (train/steps.py routes
        this).

        gnorm: precomputed GLOBAL grad norm. The shard_map FSDP step passes
        it because its local grads tree mixes shard-shaped and replicated
        leaves (a local global_norm would double-count nothing but miss the
        other shards); everyone else leaves it None.
        """
        cfg = self.cfg
        meta = self.meta(params)
        if gnorm is None:
            gnorm = global_norm(grads)

        # skip_grad: reference scaler returns BEFORE optimizer.step() on a
        # norm explosion (native_scaler.py:24-29) — params, moments, AND the
        # Adam step count must all stay untouched.
        if cfg.skip_grad is not None:
            keep = (jnp.isfinite(gnorm) & (gnorm < cfg.skip_grad)).astype(jnp.float32)
        else:
            keep = jnp.float32(1.0)

        gscale = None
        if cfg.clip_grad is not None:
            gscale = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))

        count = state["count"] + keep.astype(jnp.int32)
        new_state = {"count": count}

        def blend(old, new):
            # select, not arithmetic mix: `new` may be inf/NaN on skipped steps
            return jnp.where(keep > 0, new, old)

        # Frozen leaves are pure identities: scalar-placeholder moments (see
        # init) pass through untouched and params are returned as-is — no
        # moment decay or update arithmetic on frozen subtrees.
        trainable = meta["trainable"]
        if cfg.opt in ("adamw", "adam"):
            b1, b2 = cfg.betas
            c1 = 1 - b1 ** jnp.maximum(count.astype(jnp.float32), 1.0)
            c2 = 1 - b2 ** jnp.maximum(count.astype(jnp.float32), 1.0)

            def leaf(g, m, n, p, wd, scale, t):
                """One leaf's full update -> (mu', nu', p'). Same math as
                the pre-r4 tree_map formulation (bit-for-bit on the XLA
                route); the kernel route does it in one HBM pass."""
                if not t:
                    return _UpdateTriple((m, n, p))
                if (cfg.opt == "adamw" and allow_kernel
                        and _fa.leaf_update_viable(p, scale)):
                    return _UpdateTriple(_fa.fused_adamw_leaf(
                        g, m, n, p,
                        gscale=(jnp.float32(1.0) if gscale is None
                                else gscale),
                        lr_eff=jnp.float32(lr * scale),
                        wd_eff=jnp.float32(wd * wd_scale),
                        c1=c1, c2=c2, keep=keep,
                        b1=b1, b2=b2, eps=cfg.eps))
                gg = g if gscale is None else g * gscale
                if cfg.opt == "adam":
                    # torch Adam applies weight decay as L2 on the gradient
                    gg = gg + (wd * wd_scale) * p
                m2 = blend(m, b1 * m + (1 - b1) * gg)
                n2 = blend(n, b2 * n + (1 - b2) * jnp.square(gg))
                step = (m2 / c1) / (jnp.sqrt(n2 / c2) + cfg.eps)
                if cfg.opt == "adamw":
                    step = step + (wd * wd_scale) * p
                u = -lr * scale * step
                return _UpdateTriple(
                    (m2, n2, p + jnp.where(keep > 0, u, jnp.zeros_like(u))))

            out = jax.tree_util.tree_map(
                leaf, grads, state["mu"], state["nu"], params, meta["wd"],
                meta["lr_scale"], trainable)
            _is3 = lambda x: isinstance(x, _UpdateTriple)
            pick = lambda k: jax.tree_util.tree_map(
                lambda o: o[k], out, is_leaf=_is3)
            new_state["mu"], new_state["nu"] = pick(0), pick(1)
            return pick(2), new_state, gnorm
        else:  # sgd family (torch semantics: d = g + wd*p; buf = mom*buf + d)
            if gscale is not None:
                grads = jax.tree_util.tree_map(lambda g: g * gscale, grads)
            nesterov = cfg.opt in ("sgd", "nesterov")  # 'sgd' == nesterov in ref
            momentum = cfg.momentum
            d = jax.tree_util.tree_map(
                lambda g, p, wd, t: g + (wd * wd_scale) * p if t else g,
                grads, params, meta["wd"], trainable)
            mu = jax.tree_util.tree_map(
                lambda m, dd, t: blend(m, momentum * m + dd) if t else m,
                state["mu"], d, trainable)
            new_state["mu"] = mu

            def upd(m, dd, scale, t):
                if not t:
                    return _FROZEN
                v = dd + momentum * m if nesterov else m
                return -lr * scale * v

            updates = jax.tree_util.tree_map(upd, mu, d, meta["lr_scale"],
                                             trainable)

        def apply_update(p, u):
            if u is _FROZEN:
                return p
            return p + jnp.where(keep > 0, u, jnp.zeros_like(u))

        new_params = jax.tree_util.tree_map(apply_update, params, updates)
        return new_params, new_state, gnorm

    def stop_frozen(self, params):
        """Wrap frozen leaves in stop_gradient so autodiff never computes
        their weight gradients (the reference excludes frozen params from the
        optimizer, so torch builds no grad graph for them either). Activation
        gradients still flow THROUGH frozen layers — only dW is eliminated."""
        trainable = self.meta(params)["trainable"]
        return jax.tree_util.tree_map(
            lambda p, t: p if t else jax.lax.stop_gradient(p), params, trainable)

    def count_trainable(self, params):
        meta = self.meta(params)["trainable"]
        total = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
        train = sum(
            int(np.prod(l.shape))
            for l, t in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(meta))
            if t)
        return train, total


def create_optimizer(cfg: OptimizerConfig) -> GroupedOptimizer:
    return GroupedOptimizer(cfg)
