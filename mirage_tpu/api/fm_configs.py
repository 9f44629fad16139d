"""Foundation-model config registries for downstream tuning.

Parity: fm_seg_config.py (seg registry keyed by weight-filename substring,
checkpoint surgery + domain conf with 1-vs-3-channel switch by norm type) and
fm_cls_config.py (cls registry building miragecls heads with transform
stacks and linear-probe/full-FT lr defaults).
"""

from typing import Dict, Optional

from mirage_tpu.utils.factory import get_factory_adder

add_seg_fm, seg_fm_factory = get_factory_adder()
add_cls_fm, cls_fm_factory = get_factory_adder()


def pick_fm(factory: Dict[str, type], weights_path: str, **kwargs):
    """Registry lookup by substring of the weights filename
    (run_seg_tuning.py:389-395). kwargs are passed to the FM constructor
    (e.g. linear_probing for the cls registry)."""
    for kw, cls in factory.items():
        if kw in str(weights_path).lower():
            return cls(**kwargs)
    raise ValueError(f"Unknown model for weights: {weights_path} "
                     f"(known: {list(factory)})")


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

class SegFoundModel:
    """norm: input normalization mode; model: model_factory key. Builds the
    per-domain input-adapter configuration and loads/surgeries checkpoints."""

    norm = "minmax"
    model = "miragelight_base"

    def domain_conf(self):
        channels = 1 if self.norm == "minmax" else 3
        return {
            "bscan": {"channels": channels, "stride_level": 1, "semseg": False},
            "slo": {"channels": channels, "stride_level": 1, "semseg": False},
            "semseg": {"num_classes": 4, "stride_level": 4, "semseg": True,
                       "dim_class_emb": 64, "emb_padding_idx": 4},
        }

    def load(self, init_params, model, weights_path: str):
        """Checkpoint surgery + strict=False load (fm_seg_config.py:54-64):
        rename bscanlayermap->semseg, pad class emb, drop output adapters,
        interpolate pos embs to the tuning grid, overlay."""
        from mirage_tpu.api import convert

        if str(weights_path).endswith(".pth"):
            sd = convert.load_torch_checkpoint(weights_path)["model"]
        else:
            sd = convert.load_safetensors(str(weights_path))
        sd = convert.seg_checkpoint_surgery(sd)
        sd = convert.interpolate_pos_embed_sd(sd, model)
        return convert.overlay_torch_params(init_params, sd, model)


@add_seg_fm("mirage-large")
class MIRAGELargeSegFM(SegFoundModel):
    model = "miragelight_large"


@add_seg_fm("mirage-base")
class MIRAGEBaseSegFM(SegFoundModel):
    model = "miragelight_base"


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------

class ClsFoundModel:
    """Builds a MIRAGECls head + the transform stack (fm_cls_config.py:27-164).
    linear_probing: lr 1e-3, freeze all but head; full FT: lr 1e-5."""

    norm = "minmax"
    size_kw = "base"
    # Reference default input sizes: MIRAGE 512 (fm_cls_config.py:137-138),
    # SOTA ViT baselines 224 (fm_cls_config.py:130-131, FoundSOTAModel).
    default_input_size = 512

    def __init__(self, linear_probing: bool = True):
        self.linear_probing = linear_probing
        self.lr = 1e-3 if linear_probing else 1e-5
        self.weight_decay = 1e-2

    def build_model(self, *, num_classes: int, pool: str, weights: str,
                    input_size: int = 512, patch_size: int = 32,
                    compute_dtype=None, attn_impl: str = "auto",
                    model_override=None):
        import jax.numpy as jnp

        from mirage_tpu.api.cls import miragecls_factory

        return miragecls_factory[pool](
            num_classes=num_classes, input_size=input_size,
            patch_size=patch_size, modalities="bscan", weights=weights,
            compute_dtype=compute_dtype or jnp.float32, attn_impl=attn_impl,
            model_override=model_override)

    def build_transform(self, train: bool, input_size: int = 512,
                        fill: Optional[float] = 0.0, affine: bool = True):
        from mirage_tpu.data.augment import ClsTransform

        return ClsTransform(input_size=input_size, train=train, norm=self.norm,
                            fill=fill, affine=affine)

    def trainable_filter(self):
        """Paths that stay trainable under linear probing
        (fm_cls_config.py:111-124: all but 'head.' frozen)."""
        if self.linear_probing:
            return lambda path_names: bool(path_names) and path_names[0] == "head"
        return lambda path_names: True


@add_cls_fm("mirage-large")
class MIRAGELargeClsFM(ClsFoundModel):
    size_kw = "large"


@add_cls_fm("mirage-base")
class MIRAGEBaseClsFM(ClsFoundModel):
    size_kw = "base"


class _BaselineViTCls:
    """Adapter giving the plain ViT baseline the same .params/.apply
    interface run_cls_tuning drives (mutils/vit.py baselines)."""

    def __init__(self, vit, params):
        self.model = vit
        self.params = params

    def apply(self, params, x, *, deterministic=True, rng=None):
        return self.model(params, x, deterministic=deterministic, rng=rng)


class BaselineViTClsFM(ClsFoundModel):
    """Non-MIRAGE baseline: timm-style ViT classifier, ImageNet-RGB norm
    (fm_cls_config.py:101-109 SOTA default), optional timm checkpoint."""

    norm = "imagenet"
    vit_name = "vit_base_patch16"
    default_input_size = 224

    def build_model(self, *, num_classes: int, pool: str, weights: str,
                    input_size: int = 512, patch_size: int = 32,
                    compute_dtype=None, attn_impl: str = "auto",
                    model_override=None):
        import jax
        import jax.numpy as jnp

        from mirage_tpu.models.vit import vit_factory

        assert model_override is None, \
            "--model_override applies to MIRAGE configs only"

        vit = vit_factory[self.vit_name](
            num_classes=num_classes, img_size=input_size, pool=pool,
            compute_dtype=compute_dtype or jnp.float32, attn_impl=attn_impl)
        params = vit.init_params(jax.random.PRNGKey(0))
        import os

        if weights and os.path.exists(str(weights)):
            from mirage_tpu.api import convert

            sd = convert.load_torch_checkpoint(weights)["model"] \
                if str(weights).endswith(".pth") \
                else convert.load_safetensors(str(weights))
            try:
                loaded = vit.params_from_torch(sd)
                # keep the fresh head when num_classes differ
                if loaded["head"]["w"].shape != params["head"]["w"].shape:
                    loaded["head"] = params["head"]
                # 224-grid timm checkpoints at other input sizes: bicubic
                # pos-embed interpolation (mutils/pos_embed.py analog)
                if loaded["pos_embed"].shape != params["pos_embed"].shape:
                    loaded["pos_embed"] = jnp.asarray(
                        convert.interpolate_vit_pos_embed(
                            loaded["pos_embed"], vit.grid))
                params = loaded
            except (KeyError, ValueError) as e:
                print(f">> baseline ViT: partial/absent weights ({e}); "
                      "training from scratch")
        return _BaselineViTCls(vit, params)


@add_cls_fm("vit_large")
class ViTLargeClsFM(BaselineViTClsFM):
    vit_name = "vit_large_patch16"


@add_cls_fm("vit_base")
class ViTBaseClsFM(BaselineViTClsFM):
    vit_name = "vit_base_patch16"
