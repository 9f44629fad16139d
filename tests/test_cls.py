"""Parity: classification heads (3 pooling modes) vs the reference, through
the full checkpoint round-trip (.pth wrapper load + cls-checkpoint load)."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")

from conftest import stub_reference_deps as _stub_reference_deps  # noqa: E402


def make_pretrain_ckpt(tmp_path, reference_path):
    """Synthetic reference-format pretraining checkpoint (bscan only)."""
    from functools import partial

    from mirage.input_adapters import PatchedInputAdapter
    from mirage.output_adapters import SpatialOutputAdapter
    from mirage.model import MIRAGEModel

    args = SimpleNamespace(
        model="miragepre_base", num_global_tokens=1, drop_path=0.0,
        grid_sizes=None,
        in_domains=["bscan"], out_domains=["bscan"],
        decoder_dim=64, decoder_depth=1, decoder_num_heads=4,
        decoder_use_task_queries=True, decoder_use_xattn=True,
        input_size={"bscan": (256, 256)}, patch_size={"bscan": (32, 32)},
    )
    input_adapters = {"bscan": PatchedInputAdapter(
        num_channels=1, stride_level=1, patch_size_full=(32, 32), image_size=256)}
    output_adapters = {"bscan": SpatialOutputAdapter(
        num_channels=1, stride_level=1, patch_size_full=(32, 32), dim_tokens=64,
        depth=1, num_heads=4, use_task_queries=True, task="bscan",
        context_tasks=["bscan"], use_xattn=True, image_size=(256, 256))}
    torch.manual_seed(0)
    model = MIRAGEModel(args, input_adapters, output_adapters)
    path = os.path.join(tmp_path, "ckpt.pth")
    torch.save({"model": model.state_dict(), "args": args}, path)
    return path


@requires_reference
@pytest.mark.parametrize("pool", ["global", "cls", "token_mix"])
def test_cls_head_parity(reference_path, tmp_path, rng, pool):
    _stub_reference_deps()
    from mirage_wrapper import miragecls_factory as ref_factory
    from mirage_tpu.api.cls import miragecls_factory

    ckpt = make_pretrain_ckpt(str(tmp_path), reference_path)

    torch.manual_seed(1)
    ref = ref_factory[pool](num_classes=4, input_size=256, patch_size=32,
                            modalities="bscan", weights=ckpt, device="cpu").eval()

    # Round-trip the full cls state (model.* norm.* head.*) through our loader
    cls_path = os.path.join(str(tmp_path), "cls.pth")
    torch.save({"model": ref.state_dict()}, cls_path)

    ours = miragecls_factory[pool](num_classes=4, input_size=256, patch_size=32,
                                   modalities="bscan", weights=ckpt)
    ours.load_cls_checkpoint(cls_path)

    x = rng.random((2, 1, 256, 256), np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours(x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    assert got.shape == (2, 4)


def test_cls_model_override_builds_tiny(tmp_path):
    """--model_override lets the cls stack load non-base/large checkpoints
    (the FM registry otherwise pins the model size from the filename)."""
    import jax

    from mirage_tpu.adapters import PatchedInputAdapter
    from mirage_tpu.api.cls import miragecls_factory
    from mirage_tpu.models.mirage import MIRAGEModel
    from mirage_tpu.train.checkpoint import save_safetensors

    ins = {"bscan": PatchedInputAdapter(num_channels=1, patch_size_full=(8, 8),
                                        image_size=64)}
    core = MIRAGEModel(input_adapters=ins, output_adapters=None,
                       dim_tokens=192, depth=3, num_heads=4)
    params = core.init_params(jax.random.PRNGKey(0))
    weights = tmp_path / "mirage-base_tiny.safetensors"
    save_safetensors(params, core, str(weights))

    cls = miragecls_factory["global"](
        num_classes=3, input_size=64, patch_size=8, weights=str(weights),
        model_override="miragepre_tiny")
    assert cls.model.dim_tokens == 192 and cls.model.depth == 3
    import numpy as np

    logits = cls(np.random.default_rng(0).random((2, 1, 64, 64), np.float32))
    assert logits.shape == (2, 3)
