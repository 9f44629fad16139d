"""A/B: pixel-space vs patch-space pretraining losses at the reference
shapes (B=256; bscan/slo 512^2 norm-pix MSE at p=32, layermap 13-class CE
at 128^2 / p=8).

Times value_and_grad of the LOSS TAIL only, from the decoders' patch tokens
(the piece the MIRAGE_LOSS_SPACE switch swaps): the pixel path pays
unpatchify(pred) + nearest mask-upsample + pixel loss/mask streams and their
backward mirrors; the token path patchifies the target once. Round-3 trace:
norm-pix MSE fwd alone was 3.8 ms/step, losses+masking ~12 ms of 231.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.losses.masked import (masked_ce_loss, masked_ce_loss_tokens,
                                      masked_mse_loss, masked_mse_loss_tokens)
from mirage_tpu.ops.patch_embed import unpatchify


def bench(make_fn, tokens, tgt, mask, iters=30):
    # tgt/mask are jit ARGUMENTS, not closure constants: a closed-over
    # 256x512^2 f32 target gets baked into the HLO and busts the axon
    # tunnel's compile-request body limit (HTTP 413)
    fn = jax.jit(jax.value_and_grad(make_fn))
    loss, g = fn(tokens, tgt, mask)
    float(loss)
    t0 = time.perf_counter()
    acc = tokens
    for _ in range(iters):
        loss, g = fn(acc, tgt, mask)
        acc = g  # chain dispatches through the grad
    float(jnp.sum(g[:, :1, :1]))
    return (time.perf_counter() - t0) / iters


def main():
    b = 256
    rng = np.random.default_rng(0)

    # ---- MSE modality (bscan-like): tokens (B, 256, 1024), target 512^2
    tok = jnp.asarray(rng.standard_normal((b, 256, 1024)), jnp.float32)
    tgt = jnp.asarray(rng.random((b, 1, 512, 512)), jnp.float32)
    mask = jnp.asarray((rng.random((b, 256)) < 0.7).astype(np.float32))

    def mse_pixel(t, tgt, mask):
        return masked_mse_loss(unpatchify(t, 16, 16, 32, 32, 1), tgt, mask,
                               patch_size=32, norm_pix=True)

    def mse_token(t, tgt, mask):
        return masked_mse_loss_tokens(t, tgt, mask, patch_size=32,
                                      norm_pix=True)

    a = float(jax.jit(mse_pixel)(tok, tgt, mask))
    c = float(jax.jit(mse_token)(tok, tgt, mask))
    assert abs(a - c) < 1e-4 * max(1.0, abs(a)), (a, c)
    t_pix = bench(mse_pixel, tok, tgt, mask)
    t_tok = bench(mse_token, tok, tgt, mask)
    print(f"mse pixel: {t_pix*1e3:7.3f} ms  token: {t_tok*1e3:7.3f} ms "
          f"({(t_pix-t_tok)*1e3:+.3f}; x2 modalities = "
          f"{(t_pix-t_tok)*2e3:+.1f} ms/step)", flush=True)

    # ---- CE modality (layermap): tokens (B, 256, 832), target 128^2 ints
    tok = jnp.asarray(rng.standard_normal((b, 256, 13 * 64)), jnp.float32)
    tgt_i = jnp.asarray(rng.integers(0, 13, (b, 128, 128)), jnp.int32)

    def ce_pixel(t, tgt, mask):
        return masked_ce_loss(unpatchify(t, 16, 16, 8, 8, 13), tgt, mask,
                              patch_size=8)

    def ce_token(t, tgt, mask):
        return masked_ce_loss_tokens(t, tgt, mask, patch_size=8)

    a = float(jax.jit(ce_pixel)(tok, tgt_i, mask))
    c = float(jax.jit(ce_token)(tok, tgt_i, mask))
    assert abs(a - c) < 1e-4 * max(1.0, abs(a)), (a, c)
    t_pix = bench(ce_pixel, tok, tgt_i, mask)
    t_tok = bench(ce_token, tok, tgt_i, mask)
    print(f"ce  pixel: {t_pix*1e3:7.3f} ms  token: {t_tok*1e3:7.3f} ms "
          f"({(t_pix-t_tok)*1e3:+.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
