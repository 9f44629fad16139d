"""A/B: de-fused MLP backward (parallel dx kernel + XLA dW contractions)
vs the accumulating backward, at the pretraining flat shape (25344, 768)
x3072 and the cls-FT padded shape (17408, 768)x3072.

The round-3 floor statement named "de-fusing dW reductions" as the
structural lever left: the accumulating backward runs a SEQUENTIAL grid of
99 programs whose f32 accumulator read-modify-writes serialize against the
matmuls, while a 25k-row XLA dW contraction runs at ~90% MFU. The de-fused
kernel drops every accumulator (parallel grid), materializes dh/y/act to
HBM (bf16, pipelined DMA), and leaves dW1 = y^T dh / dW2 = act^T dy to XLA.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.ops.fused_mlp import (_mlp_block_bwd_defused,
                                      _mlp_block_bwd_pallas)


def run(m, d, hdim, tag):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, hdim)) * 0.02, jnp.float32)
    b1 = jnp.zeros((hdim,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hdim, d)) * 0.02, jnp.float32)

    @jax.jit
    def f_acc(x, dy):
        return _mlp_block_bwd_pallas(x, dy, gamma, beta, w1, b1, w2)

    @jax.jit
    def f_def(x, dy):
        return _mlp_block_bwd_defused(x, dy, gamma, beta, w1, b1, w2)

    def time_fn(fn, iters=30):
        outs = fn(x, dy)
        float(jnp.sum(outs[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = dy
        for _ in range(iters):
            outs = fn(x, acc)
            acc = outs[0].astype(jnp.bfloat16)
        float(jnp.sum(acc.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    got_a = f_acc(x, dy)
    got_d = f_def(x, dy)
    for i, (a, c) in enumerate(zip(got_a, got_d)):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        rel = np.max(np.abs(a - c)) / (1e-3 + np.max(np.abs(c)))
        assert rel < 3e-2, f"{tag} output {i}: norm-rel err {rel:.4f}"
    print(f"{tag}: parity ok", flush=True)
    t_a = time_fn(f_acc)
    print(f"{tag} accumulating: {t_a*1e3:7.3f} ms/layer", flush=True)
    t_d = time_fn(f_def)
    print(f"{tag} de-fused:     {t_d*1e3:7.3f} ms/layer "
          f"({(t_a-t_d)*1e3:+.3f} ms, x12 = {(t_a-t_d)*12e3:+.1f} ms/step)",
          flush=True)


def main():
    run(256 * 99, 768, 3072, "pretrain-flat")
    run(64 * 272, 768, 3072, "clsft-pad")
    # exact-flat cls-FT: 257 blocks of 64 rows — the accumulating route
    # rejected this (257 sequential accumulate programs), but on the
    # de-fused PARALLEL grid program count is DMA-pipelined, so flat (no
    # pad copies, no wasted rows) may win
    run(64 * 257, 768, 3072, "clsft-flat")
    # pretraining decoder MLPs (dim 256, 3 decoders x 2 layers, ~5 ms/step
    # through the accumulating route): small fixed footprint -> 2048-row
    # parallel blocks
    run(256 * 256, 256, 1024, "decoder-mlp")
    # ViT-L pretraining (batch 128): the accumulating route's fixed f32
    # weight accumulators (~50 MB at d=1024/h=4096) bust the VMEM block
    # budget and degrade it to 64-row blocks (fused_mlp._pick_bwd_block
    # tier-2); the de-fused kernel carries NO weight accumulators, so its
    # blocks stay large — the structural case for de-fusing
    run(128 * 99, 1024, 4096, "pretrain-large-flat")


if __name__ == "__main__":
    main()
