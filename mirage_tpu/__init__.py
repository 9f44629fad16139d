"""MIRAGE-TPU: a TPU-native JAX framework for multimodal retinal-imaging
foundation models, feature-equivalent to j-morano/MIRAGE.

Design (TPU-first, not a port):
  - Functional core: parameters are plain pytrees; every module is a pair of
    pure functions ``init(key, ...) -> params`` and ``apply(params, x, ...)``.
  - The ViT encoder runs as a ``jax.lax.scan`` over stacked per-layer
    parameters (fast compiles, natural remat boundaries).
  - Hot ops (attention) have Pallas TPU kernels with XLA fallbacks for CPU.
  - Patch embedding is a reshape + matmul (MXU-native), not a convolution.
  - Multi-chip scaling via ``jax.sharding.Mesh`` + NamedSharding: data / fsdp /
    tensor axes; collectives are emitted by XLA from sharding specs.
  - PyTorch MIRAGE checkpoints (``.pth`` / safetensors) import losslessly via
    ``mirage_tpu.api.convert``.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from mirage_tpu.utils.factory import get_factory_adder  # noqa: F401
