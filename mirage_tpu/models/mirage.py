"""MIRAGE core model: masked multimodal pretraining forward + light forward.

Parity: mirage/model.py (MIRAGEModel.forward :305-431, MIRAGELight :478-567,
size registry :434-475, :570-609). Functional design: the model is a frozen
dataclass of configs; parameters are a plain pytree created by
``init_params``; all forwards are pure functions of (params, inputs, rng).
"""

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from mirage_tpu.masking.masking import (
    generate_random_masks, masks_to_indices, onehot_gather_rows)
from mirage_tpu.models.encoder import encoder_apply, encoder_init
from mirage_tpu.nn import init as vinit
from mirage_tpu.utils.factory import get_factory_adder
from mirage_tpu.utils.envflags import env_choice as _env_choice
from mirage_tpu.adapters.input_adapters import SemSegInputAdapter
from mirage_tpu.adapters.spatial_output import (batched_spatial_decode,
                                                decoders_batchable)

# Task-batched decoder tails (spatial_output.batched_spatial_decode):
# identical-config SpatialOutputAdapters run as ONE set of task-vmapped
# kernels instead of per-task dispatches. MEASURED NEGATIVE on the chip
# (r5 2026-08-19, scripts/bench_decbatch_ab.py, interleaved): batched
# 218.6 vs per-task 214.2 ms/step median (-1.92%) on the ViT-B
# pretraining step at B=256 — vmap lifts each Pallas call onto a leading
# grid axis, but the 3x-longer grids don't amortize (the per-task calls
# were already DMA-pipelined) and the stacked (3,...) params/queries add
# relayout copies. Default stays off; the path is kept tested
# (tests/test_decoder_batch.py) for wider-decoder configs where per-call
# latency dominates. Env override: MIRAGE_DEC_BATCH=on|off, import-time.
_DEC_BATCH = _env_choice("MIRAGE_DEC_BATCH", "off", ("on", "off")) == "on"


add_model, model_factory = get_factory_adder()


@dataclasses.dataclass(frozen=True, eq=False)
class MIRAGEModel:
    """Multimodal masked ViT. `input_adapters` / `output_adapters` are
    task-keyed dicts of adapter configs (each with init_params/__call__)."""

    input_adapters: Mapping[str, Any]
    output_adapters: Optional[Mapping[str, Any]] = None
    num_global_tokens: int = 1
    dim_tokens: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    compute_dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # Tensor parallelism: ('tensor', t) runs the encoder blocks in the
    # Megatron head/hidden-parallel form (nn/block._tp_block_apply) — the
    # params must be tp_relayout'ed + sharded per parallel/tp.py and the
    # forward must execute inside a shard_map over that axis
    # (train/steps._make_tp_train_step builds this automatically for
    # tensor-only meshes). None = ordinary single-shard encoder.
    tp: Any = None
    # Pipeline parallelism: ('pipe', n_micro) runs the encoder as a GPipe
    # schedule over the 'pipe' mesh axis (parallel/pp.pp_encoder_apply) —
    # the stacked encoder params must be sharded on their leading layer
    # axis per parallel/pp.pp_param_specs and the forward must execute
    # inside a shard_map over that axis (train/steps._make_pp_train_step).
    # Requires drop_path_rate == 0.0 (every reference pretraining config)
    # and no return_all_layers. None = ordinary single-stage encoder.
    pp: Any = None

    def _encoder(self, params_enc, tokens, *, deterministic, rng,
                 grad_free=False):
        """Route the encoder stack: pipelined when `pp` is set, else the
        plain stacked scan."""
        if self.pp is not None:
            from mirage_tpu.parallel.pp import pp_encoder_apply

            assert self.drop_path_rate == 0.0, (
                "pipeline parallelism requires drop_path_rate == 0.0 "
                "(parallel/pp.py scope note)")
            assert self.tp is None, (
                "pipeline x tensor parallelism is not implemented — build "
                "the model with exactly one of tp/pp set")
            axis, n_micro = self.pp
            return pp_encoder_apply(
                params_enc, tokens, self.num_heads, axis=axis,
                n_micro=n_micro, total_depth=self.depth, impl=self.attn_impl,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                deterministic=deterministic, rng=rng, remat=self.remat,
                grad_free=grad_free)
        return encoder_apply(
            params_enc, tokens, self.num_heads, depth=self.depth,
            impl=self.attn_impl, drop=self.drop_rate,
            attn_drop=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate, deterministic=deterministic,
            rng=rng, remat=self.remat, grad_free=grad_free, tp=self.tp)

    # ------------------------------------------------------------------ init

    def init_params(self, key, dtype=jnp.float32):
        n_adapters = len(self.input_adapters) + (
            len(self.output_adapters) if self.output_adapters else 0)
        keys = jax.random.split(key, 3 + n_adapters)
        params: Dict[str, Any] = {}
        i = 0
        params["input_adapters"] = {}
        for task, adapter in self.input_adapters.items():
            params["input_adapters"][task] = adapter.init_params(
                keys[i], self.dim_tokens, dtype=dtype)
            i += 1
        if self.output_adapters is not None:
            params["output_adapters"] = {}
            for task, adapter in self.output_adapters.items():
                params["output_adapters"][task] = adapter.init_params(
                    keys[i], self.dim_tokens, dtype=dtype)
                i += 1
        params["global_tokens"] = vinit.trunc_normal(
            keys[i], (1, self.num_global_tokens, self.dim_tokens), std=0.02, dtype=dtype)
        params["encoder"] = encoder_init(
            keys[i + 1], self.depth, self.dim_tokens, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, dtype=dtype)
        return params

    # ----------------------------------------------------------- input info

    def generate_input_info(self, x: Mapping[str, jax.Array]) -> Dict[str, Any]:
        """Static token bookkeeping (model.py:279-303). Computed from actual
        input shapes — everything here is Python-side (shapes are static
        under jit)."""
        info: Dict[str, Any] = {"tasks": {}}
        i = 0
        for domain, tensor in x.items():
            if domain not in self.input_adapters:
                continue
            adapter = self.input_adapters[domain]
            if isinstance(adapter, SemSegInputAdapter):
                h, w = tensor.shape[-2] * adapter.stride_level, tensor.shape[-1] * adapter.stride_level
            else:
                h, w = tensor.shape[-2], tensor.shape[-1]
            n = adapter.num_tokens((tensor.shape[-2], tensor.shape[-1]))
            ph, pw = adapter.patch_hw
            info["tasks"][domain] = {
                "num_tokens": n,
                "has_posemb": True,
                "start_idx": i,
                "end_idx": i + n,
                "image_size": (h, w),
                "grid_size": (tensor.shape[-2] // ph, tensor.shape[-1] // pw),
            }
            i += n
        info["num_task_tokens"] = i
        info["num_global_tokens"] = self.num_global_tokens
        return info

    # -------------------------------------------------------------- forward

    def embed_inputs(self, params, x: Mapping[str, jax.Array],
                     absent_tasks: Sequence[str] = ()):
        """absent_tasks: modalities statically known to be fully masked
        (wrapper inference zero-fills them). Their adapter outputs are never
        selected by ids_keep and masked decoder positions use mask tokens,
        not input embeddings — so skip the embedding compute entirely and
        substitute zeros (saves the class-emb gather + patch projections of
        reconstructed-only modalities)."""
        tokens = {}
        for domain, tensor in x.items():
            if domain not in self.input_adapters:
                continue
            adapter = self.input_adapters[domain]
            if domain in absent_tasks:
                n = adapter.num_tokens((tensor.shape[-2], tensor.shape[-1]))
                tokens[domain] = jnp.zeros(
                    (tensor.shape[0], n, self.dim_tokens), self.compute_dtype)
            else:
                tokens[domain] = adapter(
                    params["input_adapters"][domain], tensor,
                    compute_dtype=self.compute_dtype)
        return tokens

    def __call__(
        self,
        params,
        x: Union[Mapping[str, jax.Array], jax.Array],
        *,
        mask_inputs: bool = True,
        task_masks: Optional[Mapping[str, jax.Array]] = None,
        num_encoded_tokens: int = 128,
        num_visible: Optional[int] = None,
        alphas: Union[float, Sequence[float]] = 1.0,
        sample_tasks_uniformly: bool = False,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_all_layers: bool = False,
        reshape: bool = False,
        absent_tasks: Sequence[str] = (),
        pixel_outputs: bool = True,
    ):
        """Masked pretraining forward (model.py:305-431).

        absent_tasks: statically-known fully-masked modalities whose input
        embeddings are skipped (only valid with explicit task_masks marking
        them fully masked — the wrapper's zero-fill path).
        pixel_outputs: when False, output adapters return pre-unpatchify
        patch tokens (B, N, C*p*p) for the patch-space training losses.
        Returns (preds_dict, task_masks) when output adapters exist, else
        (encoder_tokens, task_masks).
        """
        if not isinstance(x, Mapping):
            x = {"bscan": x}
        assert not absent_tasks or task_masks is not None, \
            "absent_tasks requires explicit task_masks"
        input_info = self.generate_input_info(x)
        task_order = [d for d in x.keys() if d in self.input_adapters]
        input_task_tokens = self.embed_inputs(params, x, absent_tasks)
        b = next(iter(input_task_tokens.values())).shape[0]
        num_tokens_per_task = [input_task_tokens[t].shape[1] for t in task_order]

        if not mask_inputs:
            num_encoded = sum(num_tokens_per_task)
        else:
            num_encoded = num_encoded_tokens

        if task_masks is None:
            mask_rng = rng if rng is not None else jax.random.PRNGKey(0)
            mask_rng, enc_rng = jax.random.split(mask_rng)
            masks_list, ids_keep, ids_restore = generate_random_masks(
                mask_rng, num_tokens_per_task, b, num_encoded,
                alphas=alphas, sample_tasks_uniformly=sample_tasks_uniformly)
            task_masks = dict(zip(task_order, masks_list))
        else:
            # Explicit-mask path (model.py:378-382). The visible-token count is
            # data-dependent in the reference; here it must be supplied
            # statically via `num_visible` (the wrapper derives it from which
            # modalities are present) to keep shapes jit-stable.
            enc_rng = rng
            if absent_tasks:
                # Static-layout fast path (the wrapper zero-fill contract:
                # absent tasks fully masked, all other tasks fully visible).
                # The shuffle/keep/restore permutations are compile-time
                # constants — the stable argsort of a constant mask keeps
                # present tasks' tokens in task order — so the concat+gather
                # below reduces to slicing, and the decoders rebuild the full
                # sequence by per-task concat (no unshuffle gathers).
                ids_keep = ids_restore = None
            else:
                ids_keep, ids_restore = masks_to_indices(
                    task_masks, task_order,
                    num_visible if num_visible is not None else num_encoded)

        if ids_restore is None:
            present = [t for t in task_order if t not in absent_tasks]
            n_vis = sum(input_task_tokens[t].shape[1] for t in present)
            assert num_visible is None or num_visible == n_vis, (
                f"num_visible ({num_visible}) != visible tokens of present "
                f"tasks ({n_vis}) — absent_tasks requires fully-visible "
                f"present modalities")
            input_tokens = jnp.concatenate(
                [input_task_tokens[t] for t in present], axis=1)
        else:
            input_tokens = jnp.concatenate(
                [input_task_tokens[t] for t in task_order], axis=1)
            # one-hot gather: a take_along_axis over the token axis
            # degenerates to scalar loads on TPU (masking.onehot_gather_rows)
            input_tokens = onehot_gather_rows(input_tokens, ids_keep)

        global_tokens = jnp.broadcast_to(
            params["global_tokens"].astype(input_tokens.dtype),
            (b, self.num_global_tokens, self.dim_tokens))
        input_tokens = jnp.concatenate([input_tokens, global_tokens], axis=1)

        if return_all_layers:
            assert self.pp is None, \
                "return_all_layers is not supported under pipeline parallelism"
            _, layer_outs = encoder_apply(
                params["encoder"], input_tokens, self.num_heads, depth=self.depth,
                impl=self.attn_impl, drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path_rate=self.drop_path_rate, deterministic=deterministic,
                rng=enc_rng, return_layers=tuple(range(self.depth)), remat=self.remat,
                tp=self.tp)
            # (model.py:393-406): all-layer spatial features, global dropped
            first = task_order[0]
            gh, gw = input_info["tasks"][first]["grid_size"]
            feats = {}
            for i in range(self.depth):
                t = layer_outs[i][:, : -self.num_global_tokens]
                feats[f"layer_{i}"] = t.reshape(b, gh, gw, -1).transpose(0, 3, 1, 2)
            return feats

        encoder_tokens, _ = self._encoder(
            params["encoder"], input_tokens, deterministic=deterministic,
            rng=enc_rng)

        if self.output_adapters is None:
            if reshape:
                first = task_order[0]
                gh, gw = input_info["tasks"][first]["grid_size"]
                encoder_tokens = encoder_tokens[:, : -self.num_global_tokens]
                encoder_tokens = encoder_tokens.reshape(b, gh, gw, -1).transpose(0, 3, 1, 2)
            return encoder_tokens, task_masks

        dec_rng = jax.random.split(enc_rng, len(self.output_adapters)) \
            if (enc_rng is not None and not deterministic) else None
        if _DEC_BATCH and decoders_batchable(self.output_adapters, input_info):
            # One set of task-vmapped transformer tails instead of per-task
            # kernel dispatches (spatial_output.batched_spatial_decode) —
            # numerically identical, pinned by test_model_parity.
            preds = batched_spatial_decode(
                self.output_adapters, params["output_adapters"],
                encoder_tokens, input_info, ids_keep, ids_restore,
                deterministic=deterministic, rngs=dec_rng,
                impl=self.attn_impl, absent_tasks=absent_tasks,
                pixel_output=pixel_outputs)
            return preds, task_masks
        preds = {}
        for j, (domain, adapter) in enumerate(self.output_adapters.items()):
            preds[domain] = adapter(
                params["output_adapters"][domain], encoder_tokens, input_info,
                ids_keep, ids_restore, deterministic=deterministic,
                rng=None if dec_rng is None else dec_rng[j], impl=self.attn_impl,
                absent_tasks=absent_tasks, pixel_output=pixel_outputs)
        return preds, task_masks

    # ---------------------------------------------------------- light path

    def process_input(self, params, x: Mapping[str, jax.Array]):
        """Unmasked token assembly (MIRAGELight.process_input, model.py:497-526)."""
        input_info = self.generate_input_info(x)
        task_order = [d for d in x.keys() if d in self.input_adapters]
        input_task_tokens = self.embed_inputs(params, x)
        b = next(iter(input_task_tokens.values())).shape[0]
        tokens = jnp.concatenate([input_task_tokens[t] for t in task_order], axis=1)
        global_tokens = jnp.broadcast_to(
            params["global_tokens"].astype(tokens.dtype),
            (b, self.num_global_tokens, self.dim_tokens))
        tokens = jnp.concatenate([tokens, global_tokens], axis=1)
        return tokens, input_info

    def forward_light(
        self,
        params,
        x: Union[Mapping[str, jax.Array], jax.Array],
        *,
        return_all_layers: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        frozen_encoder: bool = False,
    ):
        """Plain multimodal ViT forward, no masking (MIRAGELight.forward,
        model.py:528-567). Returns encoder tokens (or per-layer list) if no
        output adapters, else task->prediction dict.

        frozen_encoder: set when the encoder AND input adapters carry no
        trainable parameters (seg tuning's freeze_encoder, cls linear
        probing). Puts stop_gradient on the encoder OUTPUT, not just the
        params: param-level stop_gradient alone still makes JAX build the
        dead backward-through-activations scan (and stash f32 per-layer
        activations in the forward scan — 378 MB at the seg config), which
        XLA cannot DCE across the loop boundary. Forward values are
        unchanged."""
        tokens, input_info = self.process_input(params, x)
        if return_all_layers:
            assert self.pp is None, \
                "return_all_layers is not supported under pipeline parallelism"
            _, layer_outs = encoder_apply(
                params["encoder"], tokens, self.num_heads, depth=self.depth,
                impl=self.attn_impl, drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path_rate=self.drop_path_rate, deterministic=deterministic,
                rng=rng, return_layers=tuple(range(self.depth)), remat=self.remat,
                grad_free=frozen_encoder, tp=self.tp)
            encoder_tokens = [layer_outs[i] for i in range(self.depth)]
            if frozen_encoder:
                encoder_tokens = [jax.lax.stop_gradient(t) for t in encoder_tokens]
            final = encoder_tokens
        else:
            final, _ = self._encoder(
                params["encoder"], tokens, deterministic=deterministic,
                rng=rng, grad_free=frozen_encoder)
            if frozen_encoder:
                final = jax.lax.stop_gradient(final)
            encoder_tokens = final

        if self.output_adapters is None:
            return encoder_tokens

        preds = {}
        for j, (domain, adapter) in enumerate(self.output_adapters.items()):
            r = jax.random.fold_in(rng, 1000 + j) \
                if (rng is not None and not deterministic) else None
            preds[domain] = adapter(
                params["output_adapters"][domain], encoder_tokens, input_info,
                deterministic=deterministic, rng=r)
        return preds


# ---------------------------------------------------------------- registry

@add_model
def miragepre_base(input_adapters, output_adapters, **kwargs):
    return MIRAGEModel(input_adapters=input_adapters, output_adapters=output_adapters,
                       dim_tokens=768, depth=12, num_heads=12, mlp_ratio=4,
                       qkv_bias=True, **kwargs)


@add_model
def miragepre_large(input_adapters, output_adapters, **kwargs):
    return MIRAGEModel(input_adapters=input_adapters, output_adapters=output_adapters,
                       dim_tokens=1024, depth=24, num_heads=16, mlp_ratio=4,
                       qkv_bias=True, **kwargs)


@add_model
def miragepre_tiny(input_adapters, output_adapters, **kwargs):
    """Small preset for smoke tests / CI (not a reference size)."""
    return MIRAGEModel(input_adapters=input_adapters, output_adapters=output_adapters,
                       dim_tokens=192, depth=3, num_heads=4, mlp_ratio=4,
                       qkv_bias=True, **kwargs)


# The "light" variants share the class; the light forward is forward_light.
@add_model
def miragelight_base(input_adapters, output_adapters, **kwargs):
    return miragepre_base(input_adapters, output_adapters, **kwargs)


@add_model
def miragelight_large(input_adapters, output_adapters, **kwargs):
    return miragepre_large(input_adapters, output_adapters, **kwargs)
