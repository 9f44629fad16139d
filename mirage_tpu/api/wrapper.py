"""Public inference API: MIRAGEWrapper.

Parity: mirage_wrapper.py:22-183 — loads a reference `.pth` checkpoint (or a
converted `.npz` / safetensors), rebuilds the model for the requested
modalities ('bscan-slo-bscanlayermap'), and runs the explicit-mask forward:
missing modalities are zero-filled with fully-masked task masks, present ones
get fully-visible masks.

Differences by design (TPU-native):
  - forward is a jitted pure function; the wrapper caches one compiled
    executable per modality-presence pattern (a static property).
  - device placement is implicit (default JAX device = the TPU chip).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mirage_tpu.adapters.input_adapters import PatchedInputAdapter, SemSegInputAdapter, pair
from mirage_tpu.adapters.spatial_output import SpatialOutputAdapter
from mirage_tpu.api import convert
from mirage_tpu.models.mirage import MIRAGEModel


def default_domain_conf(task: str) -> Dict:
    """DOMAIN_CONF parity (mirage_wrapper.py:22-44)."""
    if task == "bscanlayermap":
        return {"num_classes": 13, "stride_level": 1, "channels": 13,
                "semseg": True, "dim_class_emb": 64}
    return {"channels": 1, "stride_level": 1, "semseg": False}


class MIRAGEWrapper:
    def __init__(
        self,
        input_size=512,
        patch_size=32,
        modalities: str = "bscan-slo-bscanlayermap",
        weights: Optional[str] = None,
        compute_dtype=jnp.float32,
        attn_impl: str = "auto",
        output_adapters: bool = True,
        mesh=None,
        model_override: Optional[str] = None,
    ):
        """mesh: optional jax.sharding.Mesh for multi-chip serving — pure
        data parallelism: params REPLICATED per device, batches sharded over
        every mesh axis, and the jitted forward wrapped in shard_map. Two
        reasons this beats parameter sharding for serving: (1) the fused
        Pallas kernels only compose with a mesh under shard_map (a
        pallas_call with GSPMD-sharded operands is a hard Mosaic error —
        ops/runtime.py), and inside shard_map each program must hold whole
        layers anyway; (2) inference params are small (MIRAGE-Large bf16
        ≈ 0.7 GB vs 16 GB v5e HBM), so replication costs nothing and saves
        every per-layer collective. None = one chip.

        (There is deliberately no quantize= mode: int8 serving measured a
        NEGATIVE on v5e through this toolchain — XLA int8 dots run at the
        bf16 rate and Mosaic int8 dots at ~2 TOP/s; see ops/quant.py and
        BASELINE.md. The bf16 path additionally keeps reference parity.)"""
        assert weights is not None
        ckpt = convert.load_torch_checkpoint(weights) if str(weights).endswith(".pth") \
            else {"model": convert.load_safetensors(str(weights)), "args": {}}
        sd = ckpt["model"]
        args = dict(ckpt.get("args", {}))

        self.in_domains = modalities.split("-")
        input_size = pair(input_size)
        patch_size = pair(patch_size)
        self.input_size = {}
        self.patch_size = {}
        self.grid_size = {}
        for domain in self.in_domains:
            if domain != "bscanlayermap":
                self.patch_size[domain] = patch_size
                self.input_size[domain] = input_size
            else:
                # mirage_wrapper.py:77-78: fixed 128² / patch 8 for layermaps
                self.patch_size[domain] = (8, 8)
                self.input_size[domain] = (128, 128)
            self.grid_size[domain] = tuple(
                input_size[i] // patch_size[i] for i in range(2))

        self.args = args
        self.out_domains = list(args.get("out_domains", self.in_domains)) if output_adapters else []
        model_name = model_override or args.get("model", "miragepre_base")
        self.model = self._build_model(model_name, args, compute_dtype, attn_impl,
                                       with_outputs=output_adapters)
        self.params = convert.torch_to_params(sd, self.model)
        self._n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params))
        self.mesh = mesh
        if mesh is not None:
            from mirage_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, mesh)
        # per-instance executable caches (an lru_cache on a bound method would
        # key on self and pin params of discarded wrappers)
        self._fwd_cache: Dict = {}
        self._features_model = None
        self._features_jit = None

    _SERVE_AXES = ("data", "fsdp", "tensor")

    def _batch_multiple(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.size  # serving shards the batch over EVERY axis

    def _place_batch(self, tree, batch: int):
        """Pad to the device multiple and shard over all mesh axes (outputs
        sliced back by the callers)."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = (-batch) % self._batch_multiple()

        def place(x):
            if pad:
                x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            spec = P(self._SERVE_AXES, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(place, tree)

    # ------------------------------------------------------------------

    def _build_model(self, model_name, args, compute_dtype, attn_impl, with_outputs=True):
        input_adapters = {}
        for domain in self.in_domains:
            conf = default_domain_conf(domain)
            if conf["semseg"]:
                input_adapters[domain] = SemSegInputAdapter(
                    num_classes=conf["num_classes"],
                    stride_level=conf["stride_level"],
                    patch_size_full=self.patch_size[domain],
                    dim_class_emb=conf["dim_class_emb"],
                    interpolate_class_emb=False,
                    image_size=self.input_size[domain],
                )
            else:
                input_adapters[domain] = PatchedInputAdapter(
                    num_channels=conf["channels"],
                    stride_level=conf["stride_level"],
                    patch_size_full=self.patch_size[domain],
                    image_size=self.input_size[domain],
                )

        output_adapters = None
        if with_outputs and self.out_domains:
            output_adapters = {}
            for domain in self.out_domains:
                conf = default_domain_conf(domain)
                output_adapters[domain] = SpatialOutputAdapter(
                    num_channels=conf.get("num_classes", conf["channels"]),
                    stride_level=conf["stride_level"],
                    patch_size_full=self.patch_size[domain],
                    dim_tokens=args.get("decoder_dim", 256),
                    depth=args.get("decoder_depth", 2),
                    num_heads=args.get("decoder_num_heads", 8),
                    use_task_queries=args.get("decoder_use_task_queries", True),
                    task=domain,
                    context_tasks=tuple(self.in_domains),
                    use_xattn=args.get("decoder_use_xattn", True),
                    image_size=self.input_size[domain],
                )

        if "large" in model_name:
            dim, depth, heads = 1024, 24, 16
        elif "base" in model_name:
            dim, depth, heads = 768, 12, 12
        elif "tiny" in model_name:  # dev/smoke-test size (ours, not reference)
            # checkpoint args may override the dev dims (tests use this to
            # pick kernel-compatible head_dims, e.g. 128/4 -> dh 32)
            dim = args.get("dim_tokens", 192)
            depth = args.get("depth", 3)
            heads = args.get("num_heads", 4)
        else:
            raise ValueError(f"Unknown model size: {model_name}")

        return MIRAGEModel(
            input_adapters=input_adapters,
            output_adapters=output_adapters,
            num_global_tokens=args.get("num_global_tokens", 1),
            dim_tokens=dim, depth=depth, num_heads=heads,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )

    # ------------------------------------------------------------------

    def _compiled_forward(self, present: tuple, batch: int):
        """One jitted executable per (modalities-present, batch) pattern."""
        key = (present, batch)
        if key in self._fwd_cache:
            return self._fwd_cache[key]
        model = self.model

        num_visible = sum(
            self.grid_size[d][0] * self.grid_size[d][1] for d in present)
        absent = tuple(d for d in self.in_domains if d not in present)

        def fwd(params, x, masks):
            out = model(params, x, mask_inputs=False, task_masks=masks,
                        num_visible=num_visible, deterministic=True,
                        absent_tasks=absent)
            return out[0]

        if self.mesh is not None:
            from mirage_tpu.parallel.mesh import dp_shard_map

            fwd = dp_shard_map(fwd, self.mesh, n_batch_args=2,
                               axes=self._SERVE_AXES)
        self._fwd_cache[key] = jax.jit(fwd)
        return self._fwd_cache[key]

    def __call__(self, x: Dict[str, jax.Array]):
        """x: task -> array ((B,1,H,W) float in [0,1], or (B,H,W) int labels
        for bscanlayermap). Missing modalities are zero-filled and masked."""
        x = dict(x)
        some = next(iter(x.values()))
        batch = int(some.shape[0])
        present = tuple(sorted(k for k in x.keys() if k in self.in_domains))
        masks = {}
        for k in self.in_domains:
            if k not in x:
                if k == "bscanlayermap":
                    x[k] = jnp.zeros((batch, *self.input_size[k]), jnp.int32)
                else:
                    x[k] = jnp.zeros((batch, 1, *self.input_size[k]), jnp.float32)
                fill_v = 1
            else:
                x[k] = jnp.asarray(x[k])
                if k == "bscanlayermap":
                    x[k] = x[k].astype(jnp.int32)
                fill_v = 0
            n = self.grid_size[k][0] * self.grid_size[k][1]
            masks[k] = jnp.full((batch, n), fill_v, jnp.int32)
        x = self._place_batch(x, batch)
        masks = self._place_batch(masks, batch)
        padded = batch + (-batch) % self._batch_multiple()
        fwd = self._compiled_forward(present, padded)
        preds = fwd(self.params, x, masks)
        if padded != batch:
            preds = {k: v[:batch] for k, v in preds.items()}
        return preds

    def features(self, x: Dict[str, jax.Array]):
        """Encoder-only features (hf/mirage_hf.py semantics): (B, N+G, D).
        Jitted; one executable per modality-presence pattern."""
        if self._features_model is None:
            import dataclasses

            self._features_model = dataclasses.replace(
                self.model, output_adapters=None)
            model = self._features_model
            feats = lambda params, xs: model.forward_light(params, xs)  # noqa: E731
            if self.mesh is not None:
                from mirage_tpu.parallel.mesh import dp_shard_map

                feats = dp_shard_map(feats, self.mesh, n_batch_args=1,
                                     axes=self._SERVE_AXES)
            self._features_jit = jax.jit(feats)
        x = {k: jnp.asarray(v) if k != "bscanlayermap" else jnp.asarray(v).astype(jnp.int32)
             for k, v in x.items()}
        batch = int(next(iter(x.values())).shape[0])
        x = self._place_batch(x, batch)
        out = self._features_jit(self.params, x)
        padded = batch + (-batch) % self._batch_multiple()
        return out[:batch] if padded != batch else out
