"""Classification heads over the MIRAGE encoder.

Parity: mirage_wrapper.py:185-244 — three pooling strategies registered in
``miragecls_factory``:
  'global'    mean of patch tokens                  (mirage_wrapper.py:221-222)
  'cls'       mean of global tokens                 (mirage_wrapper.py:229-233)
  'token_mix' concat of both, 2x-wide head          (mirage_wrapper.py:236-244)
Each strips the output adapters, adds LayerNorm(embed_dim, eps 1e-6) + Linear
head, and feeds the single in-domain image through the unmasked forward.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.api.wrapper import MIRAGEWrapper
from mirage_tpu.nn.layers import layer_norm, layer_norm_init, linear
from mirage_tpu.utils.factory import get_factory_adder

add_miragecls, miragecls_factory = get_factory_adder()


class MIRAGECls:
    """Encoder + norm + pooled linear head. Parameters live in
    ``self.params = {'model': backbone, 'norm': ..., 'head': ...}`` — the same
    namespace split as the reference cls checkpoints (misc.py:28-38)."""

    pooling = "global"
    head_factor = 1

    def __init__(
        self,
        num_classes: int,
        input_size=512,
        patch_size=32,
        modalities: str = "bscan",
        weights: Optional[str] = None,
        compute_dtype=jnp.float32,
        attn_impl: str = "auto",
        head_rng: Optional[jax.Array] = None,
        model_override: Optional[str] = None,
    ):
        assert num_classes > 0
        assert "-" not in modalities, "cls heads take a single in-domain"
        self.num_classes = num_classes
        self.in_domain = modalities
        self.wrapper = MIRAGEWrapper(
            input_size=input_size, patch_size=patch_size, modalities=modalities,
            weights=weights, compute_dtype=compute_dtype, attn_impl=attn_impl,
            output_adapters=False, model_override=model_override)
        self.model = self.wrapper.model
        self.embed_dim = self.model.dim_tokens
        self.num_global_tokens = self.model.num_global_tokens

        # torch nn.Linear default init for the head (reference build_head,
        # mirage_wrapper.py:205-206)
        head_rng = head_rng if head_rng is not None else jax.random.PRNGKey(0)
        k_w, k_b = jax.random.split(head_rng)
        fan_in = self.embed_dim * self.head_factor
        bound = 1.0 / (fan_in ** 0.5)
        self.params = {
            "model": self.wrapper.params,
            "norm": layer_norm_init(self.embed_dim),
            "head": {
                "w": jax.random.uniform(k_w, (fan_in, num_classes),
                                        jnp.float32, -bound, bound),
                "b": jax.random.uniform(k_b, (num_classes,),
                                        jnp.float32, -bound, bound),
            },
        }

    # -- functional forward (used by the jitted train step) -----------------

    def pool(self, tokens):
        g = self.num_global_tokens
        if self.pooling == "global":
            return tokens[:, :-g].mean(axis=1)
        if self.pooling == "cls":
            return tokens[:, -g:].mean(axis=1)
        patch = tokens[:, :-g].mean(axis=1)
        global_ = tokens[:, -g:].mean(axis=1)
        return jnp.concatenate([patch, global_], axis=1)

    def apply(self, params, x, *, deterministic=True, rng=None,
              frozen_encoder=False):
        """x: (B, C, H, W) in [0, 1] -> (B, num_classes) logits.
        frozen_encoder: linear probing — stop gradients at the encoder
        output so no dead backward scan is built (forward_light docstring)."""
        tokens = self.model.forward_light(
            params["model"], {self.in_domain: x},
            deterministic=deterministic, rng=rng,
            frozen_encoder=frozen_encoder)
        tokens = layer_norm(params["norm"], tokens)
        pooled = self.pool(tokens).astype(jnp.float32)
        return linear(params["head"], pooled)

    @functools.cached_property
    def _jitted(self):
        return jax.jit(lambda p, x: self.apply(p, x))

    def __call__(self, x):
        return self._jitted(self.params, jnp.asarray(x))

    # -- checkpoint interop -------------------------------------------------

    def load_cls_checkpoint(self, path: str):
        """Load a reference cls checkpoint (keys model.*, norm.*, head.*;
        saved by mutils/misc.py:28-38)."""
        from mirage_tpu.api import convert

        sd = convert.load_torch_checkpoint(path)["model"]
        inner = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
        self.params["model"] = convert.torch_to_params(inner, self.model)
        self.params["norm"] = {"scale": jnp.asarray(sd["norm.weight"]),
                               "bias": jnp.asarray(sd["norm.bias"])}
        self.params["head"] = {"w": jnp.asarray(np.ascontiguousarray(sd["head.weight"].T)),
                               "b": jnp.asarray(sd["head.bias"])}
        return self


@add_miragecls("global")
class MIRAGEClsGlobal(MIRAGECls):
    pooling = "global"
    head_factor = 1


@add_miragecls("cls")
class MIRAGEClsCLS(MIRAGECls):
    pooling = "cls"
    head_factor = 1


@add_miragecls("token_mix")
class MIRAGEClsTokenMix(MIRAGECls):
    pooling = "token_mix"
    head_factor = 2
