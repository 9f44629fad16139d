"""Micro-bench: fwd+bwd of the ConvNeXt depthwise 7x7 conv at the seg shape.

XLA's depthwise dW gradient is a batch_group_count=C convolution whose
cost_analysis flop count is inflated ~C x (scripts/flops.py round-3 finding);
this measures whether the TPU BACKEND also executes it slowly. Variants:
  autodiff       — jax.grad through lax.conv, NCHW
  shiftvjp       — custom VJP: dX grouped conv, dW as 49 shift-multiply-reduce
  nhwc-autodiff  — jax.grad through the PRODUCTION layout (conv2d_nhwc — the
                   seg head is NHWC end-to-end, adapters/seg_heads.py:86)
  nhwc-shiftvjp  — nn/conv._dwconv_nhwc_shift (the wired custom VJP, routed
                   from conv2d by the MIRAGE_DWCONV_VJP gate)

r5 chip result: NCHW 140.4 -> 9.6 ms (14.7x), NHWC autodiff vs shift below.
"""
import functools
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from mirage_tpu.nn.conv import conv2d


def dwconv_ref(w, x):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        feature_group_count=w.shape[0],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


@jax.custom_vjp
def dwconv_shift(w, x):
    return dwconv_ref(w, x)


def _fwd(w, x):
    return dwconv_ref(w, x), (w, x)


def _bwd(res, dy):
    w, x = res
    c = w.shape[0]
    # dX: grouped conv with the spatially-flipped kernel
    wf = jnp.flip(w, axis=(-2, -1))
    dx = jax.lax.conv_general_dilated(
        dy, wf, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        feature_group_count=c, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    # dW[c, ky, kx] = sum_bhw xpad[b,c,h+ky,w+kx] * dy[b,c,h,w]
    xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3)))
    h, wdt = x.shape[-2], x.shape[-1]
    taps = []
    for ky in range(7):
        for kx in range(7):
            sl = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(xp, ky, h, axis=2), kx, wdt, axis=3)
            taps.append(jnp.sum((sl * dy).astype(jnp.float32), axis=(0, 2, 3)))
    dw = jnp.stack(taps, axis=-1).reshape(c, 1, 7, 7).astype(w.dtype)
    return dw, dx


dwconv_shift.defvjp(_fwd, _bwd)


def bench(tag, f, *args, iters=20):
    g = jax.jit(jax.grad(lambda w, x: jnp.sum(f(w, x).astype(jnp.float32)),
                         argnums=(0, 1)))
    dw, dx = g(*args)
    float(jnp.sum(dw.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        dw, dx = g(*args)
        acc = acc + jnp.sum(dw[0, 0, 0, 0].astype(jnp.float32))
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms (fwd+bwd)", flush=True)
    return dw, dx


def dwconv_nhwc_autodiff(w, x):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(3, 3), (3, 3)],
        feature_group_count=w.shape[0],
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


def dwconv_nhwc_shift(w, x):
    from mirage_tpu.nn.conv import _dwconv_nhwc_shift

    return _dwconv_nhwc_shift(w, x, ((3, 3), (3, 3)))


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    B, C, H = 8, 384, 128
    w = jnp.asarray(rng.standard_normal((C, 1, 7, 7)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, C, H, H)) * 0.1, jnp.bfloat16)
    dw_a, dx_a = bench("autodiff", dwconv_ref, w, x)
    dw_s, dx_s = bench("shiftvjp", dwconv_shift, w, x)
    print("dw close:", np.allclose(np.asarray(dw_a, np.float32),
                                   np.asarray(dw_s, np.float32), atol=2e-1,
                                   rtol=1e-1),
          " dx close:", np.allclose(np.asarray(dx_a, np.float32),
                                    np.asarray(dx_s, np.float32), atol=1e-2))
    xl = jnp.transpose(x, (0, 2, 3, 1))  # production layout (seg head is NHWC)
    dw_na, dx_na = bench("nhwc-autodiff", dwconv_nhwc_autodiff, w, xl)
    dw_ns, dx_ns = bench("nhwc-shiftvjp", dwconv_nhwc_shift, w, xl)
    print("nhwc dw close:", np.allclose(np.asarray(dw_na, np.float32),
                                        np.asarray(dw_ns, np.float32),
                                        atol=2e-1, rtol=1e-1),
          " dx close:", np.allclose(np.asarray(dx_na, np.float32),
                                    np.asarray(dx_ns, np.float32), atol=1e-2))
