"""Parity: one-file HF module vs the reference hf/mirage_hf.py (and vs the
full-package wrapper path)."""

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")


@requires_reference
def test_hf_wrapper_parity(reference_path, rng):
    import sys

    sys.path.insert(0, f"{reference_path}/hf")
    from mirage_hf import MIRAGEWrapper as RefHF

    from mirage_tpu.hf import MIRAGEWrapper

    torch.manual_seed(0)
    # small input size keeps the ViT-B CPU forward fast; posemb interp path
    # (16x16 ckpt grid -> 8x8) is exercised on both sides
    ref = RefHF(input_size=256, patch_size=32, modalities="bscan-slo",
                size="base").eval()
    sd = {k: v.detach().numpy() for k, v in ref.model.state_dict().items()}

    ours = MIRAGEWrapper(input_size=256, patch_size=32, modalities="bscan-slo",
                         size="base")
    ours.load_state_dict(sd)

    x = {"bscan": rng.random((1, 1, 256, 256)).astype(np.float32),
         "slo": rng.random((1, 1, 256, 256)).astype(np.float32)}
    with torch.no_grad():
        want = ref({k: torch.from_numpy(v) for k, v in x.items()}).numpy()
    got = np.asarray(ours(x))
    assert got.shape == want.shape == (1, 129, 768)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


@requires_reference
def test_hf_missing_modality_ok(reference_path, rng):
    """Extra checkpoint keys for absent modalities are ignored."""
    import sys

    sys.path.insert(0, f"{reference_path}/hf")
    from mirage_hf import MIRAGEWrapper as RefHF

    from mirage_tpu.hf import MIRAGEWrapper

    torch.manual_seed(0)
    ref = RefHF(input_size=128, patch_size=32, modalities="bscan-slo",
                size="base").eval()
    sd = {k: v.detach().numpy() for k, v in ref.model.state_dict().items()}
    ours = MIRAGEWrapper(input_size=128, patch_size=32, modalities="bscan",
                         size="base")
    ours.load_state_dict(sd)
    out = ours({"bscan": rng.random((2, 1, 128, 128)).astype(np.float32)})
    assert out.shape == (2, 17, 768)
