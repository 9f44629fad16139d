"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the standard JAX
analog of multi-node testing; SURVEY.md §4). Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This image patches jax to default jax_platforms='axon,cpu' regardless of the
# env var; override in-process before the backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, "virtual 8-device CPU mesh required for sharding tests"

REFERENCE_PATH = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_PATH, "mirage"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference repo not mounted")


def stub_reference_deps():
    """The reference imports skimage/torchvision/timm for CLI/baseline paths
    that the parity tests never touch; stub whichever are absent."""
    import sys
    import types

    def _ensure(name, attrs):
        try:
            __import__(name)
        except ImportError:
            parts = name.split(".")
            for i in range(1, len(parts) + 1):
                mod_name = ".".join(parts[:i])
                if mod_name not in sys.modules:
                    mod = types.ModuleType(mod_name)
                    sys.modules[mod_name] = mod
                    if i > 1:
                        setattr(sys.modules[".".join(parts[:i - 1])], parts[i - 1], mod)
            for attr, val in attrs.items():
                setattr(sys.modules[name], attr, val)

    _ensure("skimage.io", {"imread": lambda *a, **k: None,
                           "imsave": lambda *a, **k: None})
    _ensure("skimage.transform", {"resize": lambda *a, **k: None})
    _ensure("torchvision.utils", {"save_image": lambda *a, **k: None})


@pytest.fixture(scope="session")
def reference_path():
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    stub_reference_deps()
    return REFERENCE_PATH


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
