"""A/B: the AdamW update pass on the real pretraining pytree (ViT-B + 3
decoders, ~111 M params, clip_grad=1.0 like bench_train's step).

The round-4 trace puts "optimizer (AdamW moment fusions)" at ~6-8 ms/step
against a ~4.4 ms one-pass floor (read g+m+n+p, write m+n+p = 28 B/param
+ the clip gnorm's grad read). If XLA materializes the `updates`
intermediate / splits the mu/nu/apply passes, traffic is ~52 B/param
(~7.6 ms) and a fused one-pass kernel on the big stacked encoder leaves
is worth ~2 ms of step time.

Variants:
  xla    — GroupedOptimizer.update as the train step runs it (donated)
  pallas — same semantics with the big aligned leaves routed through the
           fused one-pass Pallas kernel (ops/fused_adamw.py)

CPU smoke: `python scripts/bench_opt.py --iters 2` (runs both, checks
they match bitwise on a tiny model).
Reference workload being accelerated: run_pretraining.py:648-767
(optimizer.step + scaler semantics per train iteration).
"""
import argparse
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def build(tiny=False):
    from __graft_entry__ import _build_mirage
    from mirage_tpu.train.optim import OptimizerConfig, create_optimizer

    if tiny:
        model = _build_mirage("tiny", img=64, layermap=32,
                              compute_dtype=jnp.bfloat16)
    else:
        model = _build_mirage("base", img=512, layermap=128,
                              compute_dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    opt = create_optimizer(OptimizerConfig(
        opt="adamw", betas=(0.9, 0.95), weight_decay=0.05, clip_grad=1.0))
    # grads shaped like params, f32 like the kernels' dW outputs
    keys = iter(jax.random.split(jax.random.PRNGKey(1), 4096))
    grads = jax.tree_util.tree_map(
        lambda p: 1e-3 * jax.random.normal(next(keys), p.shape, jnp.float32),
        params)
    state = opt.init(params)
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e6:.1f} M")
    return opt, params, state, grads


def run(opt, params, state, grads, iters):
    @jax.jit
    def upd(g, s, p, lr):
        return opt.update(g, s, p, lr)

    new_p, new_s, gn = upd(grads, state, params, 1e-4)
    jax.block_until_ready(new_p)
    float(gn)
    p, s = new_p, new_s
    t0 = time.perf_counter()
    for _ in range(iters):
        p, s, gn = upd(grads, s, p, 1e-4)
    # sync through the chained params (gn only depends on fixed grads)
    float(jnp.sum(jax.tree_util.tree_leaves(p)[0][..., :1]))
    dt = (time.perf_counter() - t0) / iters
    return dt, (p, s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="also diff one step's params between the variants "
                         "(2 extra compiles; the CPU interpret test in "
                         "tests/test_optim.py pins numerics already)")
    a = ap.parse_args()

    import mirage_tpu.ops.fused_adamw as fa

    opt, params, state, grads = build(tiny=a.tiny)

    fa.set_enabled(False)
    dt_x, out_x = run(opt, params, state, grads, a.iters)
    print(f"xla    : {dt_x*1e3:7.3f} ms/update", flush=True)

    fa.set_enabled(True)
    dt_p, out_p = run(opt, params, state, grads, a.iters)
    print(f"pallas : {dt_p*1e3:7.3f} ms/update  (routed "
          f"{fa.last_routed_count()} leaves)", flush=True)

    if a.check:
        # numerics: compare one update step (not the chained tail)
        fa.set_enabled(False)
        p1, s1, _ = jax.jit(lambda: opt.update(grads, state, params, 1e-4))()
        fa.set_enabled(True)
        p2, s2, _ = jax.jit(lambda: opt.update(grads, state, params, 1e-4))()
        err = max(float(jnp.max(jnp.abs(x - y)))
                  for x, y in zip(jax.tree_util.tree_leaves(p1),
                                  jax.tree_util.tree_leaves(p2)))
        print(f"max |param diff| after one step: {err:.3e}")


if __name__ == "__main__":
    main()
