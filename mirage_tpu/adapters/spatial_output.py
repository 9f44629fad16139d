"""SpatialOutputAdapter: MultiMAE-style cross-attention reconstruction decoder.

Parity: mirage/output_adapters.py:22-296. Pipeline:
  project encoder tokens to decoder dim -> re-insert mask tokens via
  ids_restore unshuffle -> add per-task learned embeddings + sin-cos posemb ->
  task-sliced queries -> cross-attention + MLP -> optional self-attn
  transformer -> linear to C*P*P -> unpatchify to image.

All index ops are fixed-shape so the decoder stays fully jit-compatible (the
number of visible tokens is static, config-driven), and token-axis
gathers/scatters are ONE-HOT MATMULS (masking.onehot_gather_rows /
onehot_scatter_rows — take_along_axis over a token axis degenerates to
scalar loads on TPU, CLAUDE.md perf rule). When modality presence is
compile-time known (`absent_tasks`), the unshuffle reduces further to
static concat/slice — no index math at all.
"""

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mirage_tpu.masking.masking import onehot_gather_rows, onehot_scatter_rows
from mirage_tpu.nn import init as vinit
from mirage_tpu.nn.attention import _on_tpu, cross_attention_apply, cross_attention_init
from mirage_tpu.nn.block import block_apply, block_init
from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear, mlp_apply, mlp_init
from mirage_tpu.nn.posemb import build_2d_sincos_posemb
from mirage_tpu.nn.resize import resize2d
from mirage_tpu.ops.patch_embed import unpatchify
from mirage_tpu.adapters.input_adapters import pair


@dataclasses.dataclass(frozen=True)
class SpatialOutputAdapter:
    num_channels: int
    stride_level: int = 1
    patch_size_full: Union[int, Tuple[int, int]] = 16
    dim_tokens: int = 256
    depth: int = 0
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    mlp_ratio: int = 4
    num_heads: int = 8
    qkv_bias: bool = True
    use_task_queries: bool = True
    task: Optional[str] = None
    context_tasks: Optional[tuple] = None
    use_xattn: bool = True

    @property
    def patch_hw(self):
        ph, pw = pair(self.patch_size_full)
        return max(1, ph // self.stride_level), max(1, pw // self.stride_level)

    @property
    def posemb_grid(self):
        h, w = pair(self.image_size)
        ph, pw = self.patch_hw
        return h // (self.stride_level * ph), w // (self.stride_level * pw)

    def init_params(self, key, dim_tokens_enc: int, dtype=jnp.float32):
        ph, pw = self.patch_hw
        hp, wp = self.posemb_grid
        keys = jax.random.split(key, 8 + self.depth)
        p = {}
        if self.context_tasks is not None:
            p["task_embeddings"] = {
                t: vinit.trunc_normal(jax.random.fold_in(keys[0], i), (1, 1, self.dim_tokens),
                                      std=0.02, dtype=dtype)
                for i, t in enumerate(self.context_tasks)
            }
        p["mask_token"] = jnp.zeros((1, 1, self.dim_tokens), dtype)
        if self.learnable_pos_emb:
            p["pos_emb"] = vinit.trunc_normal(keys[1], (1, self.dim_tokens, hp, wp),
                                              std=0.02, dtype=dtype)
        else:
            p["pos_emb"] = build_2d_sincos_posemb(hp, wp, self.dim_tokens).astype(dtype)
        if self.use_xattn:
            p["decoder"] = cross_attention_init(keys[2], self.dim_tokens,
                                                qkv_bias=self.qkv_bias, dtype=dtype)
            p["context_norm"] = layer_norm_init(self.dim_tokens, dtype)
            p["query_norm"] = layer_norm_init(self.dim_tokens, dtype)
            p["out_norm"] = layer_norm_init(self.dim_tokens, dtype)
            p["mlp"] = mlp_init(keys[3], self.dim_tokens, self.dim_tokens * self.mlp_ratio,
                                dtype=dtype)
        if self.depth > 0:
            p["decoder_transformer"] = [
                block_init(keys[4 + i], self.dim_tokens, mlp_ratio=self.mlp_ratio,
                           qkv_bias=self.qkv_bias, dtype=dtype)
                for i in range(self.depth)
            ]
        dim_patch = self.num_channels * ph * pw
        kp = keys[4 + self.depth]
        p["out_proj"] = {
            "w": vinit.xavier_uniform(kp, (self.dim_tokens, dim_patch), dtype=dtype),
            "b": jnp.zeros((dim_patch,), dtype),
        }
        p["proj_context"] = {
            "w": vinit.xavier_uniform(keys[5 + self.depth], (dim_tokens_enc, self.dim_tokens),
                                      dtype=dtype),
            "b": jnp.zeros((self.dim_tokens,), dtype),
        }
        return p

    # -- forward helpers ----------------------------------------------------

    def _posemb_tokens(self, pos_emb, size):
        pos = resize2d(pos_emb, size, mode="bilinear", align_corners=False)
        d = pos.shape[1]
        return pos.reshape(1, d, size[0] * size[1]).transpose(0, 2, 1)

    def _context_embeddings(self, params, input_info, bs, size, dtype):
        """Per-task embeddings + posemb over the FULL token sequence
        (output_adapters.py:164-186)."""
        chunks = []
        task_embs = params.get("task_embeddings", {})
        pos = self._posemb_tokens(params["pos_emb"], size).astype(dtype)
        for task, info in input_info["tasks"].items():
            n = info["num_tokens"]
            if task in task_embs:
                emb = jnp.broadcast_to(task_embs[task].astype(dtype), (bs, n, self.dim_tokens))
            else:
                emb = jnp.zeros((bs, n, self.dim_tokens), dtype)
            if info["has_posemb"]:
                assert n == pos.shape[1], (
                    f"# tokens ({n}) != # pos embeddings ({pos.shape[1]})")
                emb = emb + pos
            chunks.append(emb)
        return jnp.concatenate(chunks, axis=1)

    def _prepare(self, params, encoder_tokens, input_info, ids_keep,
                 ids_restore, absent_tasks=()):
        """Context projection + mask-token unshuffle + embeddings + query /
        visible-context selection — everything before the transformer tail.
        Returns (queries, context_vis, (nh, nw))."""
        b = encoder_tokens.shape[0]
        h, w = input_info["tasks"][self.task]["image_size"]
        ph, pw = self.patch_hw
        nh = h // (self.stride_level * ph)
        nw = w // (self.stride_level * pw)

        context = linear(params["proj_context"], encoder_tokens)
        dtype = context.dtype
        num_global = input_info.get("num_global_tokens", 0)
        if num_global:
            context_no_global = context[:, :-num_global]
        else:
            context_no_global = context

        # Re-insert mask tokens and unshuffle to original order
        if ids_restore is None:
            chunks, off = [], 0
            for task, info in input_info["tasks"].items():
                n = info["num_tokens"]
                if task in absent_tasks:
                    chunks.append(jnp.broadcast_to(
                        params["mask_token"].astype(dtype),
                        (b, n, self.dim_tokens)))
                else:
                    chunks.append(context_no_global[:, off:off + n])
                    off += n
            context_with_mask = jnp.concatenate(chunks, axis=1)
        else:
            # One-hot scatter instead of the reference's concat + ids_restore
            # gather (output_adapters.py:202-206): row j of the visible
            # context belongs at original position ids_keep[b, j]; a TPU row
            # gather over the token axis degenerates to scalar loads
            # (masking.onehot_scatter_rows docstring).
            n_total = input_info["num_task_tokens"]
            context_with_mask = onehot_scatter_rows(
                context_no_global, ids_keep, n_total,
                params["mask_token"].astype(dtype)[0])

        context_with_mask = context_with_mask + self._context_embeddings(
            params, input_info, b, (nh, nw), dtype)

        # Queries: task slice of the full sequence, or mask+posemb queries
        if self.use_task_queries and self.task in input_info["tasks"]:
            s = input_info["tasks"][self.task]["start_idx"]
            e = input_info["tasks"][self.task]["end_idx"]
            queries = context_with_mask[:, s:e]
        else:
            queries = jnp.broadcast_to(params["mask_token"].astype(dtype),
                                       (b, nh * nw, self.dim_tokens))
            queries = queries + self._posemb_tokens(params["pos_emb"], (nh, nw)).astype(dtype)
            task_embs = params.get("task_embeddings", {})
            if self.task is not None and self.task in task_embs:
                queries = queries + task_embs[self.task].astype(dtype)

        # Keep only the visible context tokens (+ global) for cross-attention
        if ids_keep is None:
            context_vis = jnp.concatenate(
                [context_with_mask[:, info["start_idx"]:info["end_idx"]]
                 for task, info in input_info["tasks"].items()
                 if task not in absent_tasks], axis=1)
        else:
            context_vis = onehot_gather_rows(context_with_mask, ids_keep)
        if num_global:
            context_vis = jnp.concatenate([context_vis, context[:, -num_global:]], axis=1)
        return queries, context_vis, (nh, nw)

    def _tail(self, params, queries, context_vis, *, deterministic=True,
              rng=None, impl="auto"):
        """Cross-attention + MLP + self-attention transformer over prepared
        (queries, context_vis). Kept separate so identically-configured
        decoders can be vmapped over a task axis (batched_spatial_decode)."""
        if self.use_xattn:
            fused = (deterministic and impl in ("auto", "block")
                     and queries.shape[1] <= 512 and context_vis.shape[1] <= 512
                     and (self.dim_tokens // self.num_heads) % 32 == 0
                     and _on_tpu())
            if fused:
                # Each half is one Pallas kernel: LNs, q/kv projections, the
                # (H, Nq, Nc) probabilities and the MLP intermediates never
                # touch HBM (ops/block_attention.py xattn_half_block +
                # ops/fused_mlp.py mlp_block).
                from mirage_tpu.ops.block_attention import xattn_half_block
                from mirage_tpu.ops.fused_mlp import mlp_block

                x = xattn_half_block(queries, params["query_norm"],
                                     params["context_norm"], params["decoder"],
                                     context_vis, self.num_heads)
                x = mlp_block(x, params["out_norm"], params["mlp"])
            else:
                x = cross_attention_apply(
                    params["decoder"], layer_norm(params["query_norm"], queries),
                    layer_norm(params["context_norm"], context_vis), self.num_heads,
                    impl=impl, deterministic=deterministic, rng=rng)
                x = x + mlp_apply(params["mlp"], layer_norm(params["out_norm"], x),
                                  deterministic=deterministic)
        else:
            x = queries

        if self.depth > 0:
            for i, bp in enumerate(params["decoder_transformer"]):
                r = jax.random.fold_in(rng, i) if rng is not None else None
                x = block_apply(bp, x, self.num_heads, impl=impl,
                                deterministic=deterministic, rng=r)
        return x

    def _finish(self, params, x, nh, nw, pixel_output=True):
        ph, pw = self.patch_hw
        x = linear(params["out_proj"], x)
        if not pixel_output:
            return x
        return unpatchify(x, nh, nw, ph, pw, self.num_channels)

    def __call__(self, params, encoder_tokens, input_info, ids_keep, ids_restore,
                 *, deterministic=True, rng=None, impl="auto", absent_tasks=(),
                 pixel_output=True):
        """encoder_tokens: (B, E+G, D_enc); returns (B, C, H, W), or the
        pre-unpatchify patch tokens (B, N, C*ph*pw) in (c, ph, pw) flat order
        when pixel_output=False (for patch-space losses — the unpatchify is a
        pure layout op the loss can algebraically absorb, losses/masked.py).

        When ids_keep/ids_restore are None (static-layout fast path), the
        visible encoder tokens are the non-absent tasks' chunks in task
        order, so the mask-token unshuffle and visible-context gathers reduce
        to per-task concat/slice (no take_along_axis)."""
        queries, context_vis, (nh, nw) = self._prepare(
            params, encoder_tokens, input_info, ids_keep, ids_restore,
            absent_tasks)
        x = self._tail(params, queries, context_vis,
                       deterministic=deterministic, rng=rng, impl=impl)
        return self._finish(params, x, nh, nw, pixel_output)


# ------------------------------------------------------------- task batching

# Config fields that must match across adapters for the transformer tails to
# be stackable (identical param-tree structure AND identical static routing
# inside _tail/block_apply).
_BATCH_KEYS = ("dim_tokens", "depth", "num_heads", "mlp_ratio", "qkv_bias",
               "use_task_queries", "use_xattn")


def decoders_batchable(adapters, input_info) -> bool:
    """True when every output adapter is a SpatialOutputAdapter with an
    identical transformer tail and identical query token counts — the
    reference pretraining config (three decoders, dim 256 / depth 2 /
    heads 8, 256 tokens each; run_pretraining.py:136-148). Then the tails
    can run as ONE set of task-vmapped kernels instead of per-task
    dispatches (the r4 trace's ~18 ms latency-bound decoder tail)."""
    ads = list(adapters.values())
    if len(ads) < 2:
        return False
    if not all(isinstance(a, SpatialOutputAdapter) for a in ads):
        return False
    a0 = ads[0]
    if not (a0.use_xattn and a0.use_task_queries):
        return False
    if not all(getattr(a, k) == getattr(a0, k) for a in ads for k in _BATCH_KEYS):
        return False
    if not all(a.task in input_info["tasks"] for a in ads):
        return False
    if len({input_info["tasks"][a.task]["num_tokens"] for a in ads}) != 1:
        return False
    # identical task_embeddings key sets -> identical tail pytree structure
    if len({a.context_tasks for a in ads}) != 1:
        return False
    return True


_TAIL_KEYS = ("decoder", "context_norm", "query_norm", "out_norm", "mlp",
              "decoder_transformer")


def _tail_params(p):
    return {k: p[k] for k in _TAIL_KEYS if k in p}


def batched_spatial_decode(adapters, params, encoder_tokens, input_info,
                           ids_keep, ids_restore, *, deterministic=True,
                           rngs=None, impl="auto", absent_tasks=(),
                           pixel_output=True):
    """Run all spatial decoders with their transformer tails stacked on a
    leading task axis: per-task preambles (cheap XLA: projection, unshuffle,
    embeddings), then ONE vmapped tail — jax.vmap lifts each Pallas
    custom-call onto an extra grid dimension, so the 3 tasks' kernels become
    one dispatch each instead of three (task count × fewer sub-millisecond
    custom calls; the r4 pretraining trace's largest non-floor component).
    Numerics are the per-task path's exactly: same kernels, same per-program
    shapes, just a longer grid. `rngs`: (T, key) array or None."""
    tasks = list(adapters.keys())
    a0 = adapters[tasks[0]]
    qs, cs, geoms = [], [], []
    for t in tasks:
        q, c, geom = adapters[t]._prepare(
            params[t], encoder_tokens, input_info, ids_keep, ids_restore,
            absent_tasks)
        qs.append(q)
        cs.append(c)
        geoms.append(geom)
    q = jnp.stack(qs)
    c = jnp.stack(cs)
    tp = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_tail_params(params[t]) for t in tasks])

    if rngs is None:
        x = jax.vmap(lambda p, q, c: a0._tail(
            p, q, c, deterministic=deterministic, rng=None, impl=impl))(tp, q, c)
    else:
        x = jax.vmap(lambda p, q, c, r: a0._tail(
            p, q, c, deterministic=deterministic, rng=r, impl=impl))(
                tp, q, c, rngs)

    preds = {}
    for i, t in enumerate(tasks):
        nh, nw = geoms[i]
        preds[t] = adapters[t]._finish(params[t], x[i], nh, nw, pixel_output)
    return preds
