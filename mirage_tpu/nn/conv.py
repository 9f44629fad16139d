"""Convolution primitives with torch-compatible semantics.

Weights are stored in torch layout — Conv2d: (O, I/groups, kH, kW),
ConvTranspose2d: (I, O/groups, kH, kW) — so checkpoint interop is a direct
array copy (no reshapes to audit). XLA's layout assignment re-tiles these for
the MXU at compile time; on TPU a conv lowers to the same systolic-array
matmuls regardless of the logical layout we pick here.

Capability parity: the conv stacks used by the downstream heads —
ConvNeXt blocks (reference mirage/output_adapter_utils.py:8-46), DPT
reassemble/fusion convs (output_adapter_utils.py:49-225,
output_adapters.py:672-726) and 1x1 head convs.
"""

from functools import partial

import jax
import jax.numpy as jnp

from mirage_tpu.utils.envflags import env_choice

# Depthwise-conv backward route — MEASURED NEGATIVE in production, default
# stays "xla". XLA derives dW as a batch_group_count=C convolution; the r5
# micro (scripts/bench_dwconv.py, seg-head shape B=8/C=384/128², TPU v5e)
# measured that lowering at 139-140 ms fwd+bwd in NCHW vs 9.6 ms for the
# shift-multiply-reduce custom VJP below — but the production head is NHWC
# (adapters/seg_heads.py:86), where XLA's autodiff runs 4.95 ms fwd+bwd
# (~3 TF/s over the 14.8 GFLOP of 49-tap work — the documented VPU floor,
# now pinned by measurement) and the shift VJP REGRESSES to 8.8 ms micro /
# seg step 62.9→56.2, 100.2→78.7 img/s end-to-end. The 14.7× NCHW win is a
# layout artifact production never pays. Mechanism kept (grad parity
# pinned in tests/test_dwconv_vjp.py) for any future NCHW depthwise path.
_DWCONV_VJP = env_choice("MIRAGE_DWCONV_VJP", "xla", ("shift", "xla"))


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _dw_nhwc_raw(w, x, pads):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=list(pads),
        feature_group_count=w.shape[0],
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dwconv_nhwc_shift(w, x, pads):
    """Stride-1 NHWC depthwise conv, w (C,1,kH,kW), symmetric pads — forward
    identical to the XLA route; only the VJP differs (reassociation only)."""
    return _dw_nhwc_raw(w, x, pads)


def _dw_shift_fwd(w, x, pads):
    return _dw_nhwc_raw(w, x, pads), (w, x)


def _dw_shift_bwd(pads, res, dy):
    w, x = res
    c, _, kh, kw = w.shape
    (pt, pb), (pl, pr) = pads
    # dX: grouped conv of dy with the spatially-flipped kernel (the standard
    # transpose of a stride-1 conv), padding k-1-p
    wf = jnp.flip(w, axis=(-2, -1))
    dx = jax.lax.conv_general_dilated(
        dy, wf, window_strides=(1, 1),
        padding=[(kh - 1 - pt, kh - 1 - pb), (kw - 1 - pl, kw - 1 - pr)],
        feature_group_count=c, dimension_numbers=("NHWC", "OIHW", "NHWC"))
    # dW[c,0,ky,kx] = Σ_bhw xpad[b,h+ky,w+kx,c]·dy[b,h,w,c]: kh·kw shifted
    # multiply-reduces. Channels stay in the lane dim, each tap is one
    # VPU-friendly f32 reduction — this replaces XLA's batch_group_count=C
    # conv lowering (the 14.7× micro loss above).
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    b, oh, ow, _ = dy.shape
    taps = []
    for ky in range(kh):
        for kx in range(kw):
            sl = jax.lax.slice(xp, (0, ky, kx, 0), (b, ky + oh, kx + ow, c))
            # cast BEFORE the multiply: under bf16 compute the product must
            # form in f32 (XLA's conv dW widens operands and accumulates in
            # f32; rounding each elementwise product to bf16 first would
            # cost ~2^-8 relative per tap instead of ~2^-24)
            taps.append(jnp.sum(sl.astype(jnp.float32)
                                * dy.astype(jnp.float32), axis=(0, 1, 2)))
    dw = jnp.stack(taps, axis=-1).reshape(c, 1, kh, kw).astype(w.dtype)
    return dw, dx


_dwconv_nhwc_shift.defvjp(_dw_shift_fwd, _dw_shift_bwd)


def conv2d_init(key, in_channels, out_channels, kernel_size, *, groups=1,
                bias=True, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    for the weight, U(±1/sqrt(fan_in)) for the bias."""
    kh, kw = _pair(kernel_size)
    fan_in = (in_channels // groups) * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    k_w, k_b = jax.random.split(key)
    p = {"w": jax.random.uniform(
        k_w, (out_channels, in_channels // groups, kh, kw), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k_b, (out_channels,), dtype, -bound, bound)
    return p


def conv2d(p, x, *, stride=1, padding=0, groups=1, dilation=1,
           channels_last=False):
    """x: (B, C, H, W) — or (B, H, W, C) with channels_last=True; weight
    (O, I/groups, kH, kW) torch layout either way."""
    s = _pair(stride)
    d = _pair(dilation)
    pad = _pair(padding)
    fmt = "NHWC" if channels_last else "NCHW"
    w = p["w"].astype(x.dtype)
    if (_DWCONV_VJP == "shift" and channels_last and groups > 1
            and s == (1, 1) and d == (1, 1)
            and w.shape[0] == groups and w.shape[1] == 1
            and x.shape[-1] == groups):
        y = _dwconv_nhwc_shift(w, x, ((pad[0], pad[0]), (pad[1], pad[1])))
    else:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=s, padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            rhs_dilation=d, feature_group_count=groups,
            dimension_numbers=(fmt, "OIHW", fmt))
    if "b" in p:
        b = p["b"].astype(y.dtype)
        y = y + (b if channels_last else b.reshape(1, -1, 1, 1))
    return y


def conv2d_nhwc(p, x, **kwargs):
    """Channels-last conv2d: x (B, H, W, C); weight stays in the stored torch
    (O, I/groups, kH, kW) layout — lax dimension_numbers map it directly, so
    checkpoint interop is unchanged. On TPU the NHWC form avoids the
    NCHW<->NHWC layout copies XLA otherwise inserts around channels-last
    consumers (the ConvNeXt head's fused-MLP kernels; ~3 ms/step in the
    round-3 seg trace)."""
    return conv2d(p, x, channels_last=True, **kwargs)


def conv_transpose2d_init(key, in_channels, out_channels, kernel_size, *,
                          bias=True, dtype=jnp.float32):
    kh, kw = _pair(kernel_size)
    # torch ConvTranspose2d fan_in is computed on the (I, O, kH, kW) weight's
    # dim-1 product: O*kH*kW
    fan_in = out_channels * kh * kw
    bound = 1.0 / (fan_in ** 0.5)
    k_w, k_b = jax.random.split(key)
    p = {"w": jax.random.uniform(
        k_w, (in_channels, out_channels, kh, kw), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k_b, (out_channels,), dtype, -bound, bound)
    return p


def conv_transpose2d(p, x, *, stride=1, padding=0):
    """torch ConvTranspose2d (output_padding=0, groups=1): fractionally-strided
    conv — lhs_dilation=stride, spatially-flipped kernel, pad k-1-p."""
    s = _pair(stride)
    pad = _pair(padding)
    w = p["w"]  # (I, O, kH, kW)
    kh, kw = w.shape[-2], w.shape[-1]
    w_f = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w_f, window_strides=(1, 1),
        padding=[(kh - 1 - pad[0], kh - 1 - pad[0]),
                 (kw - 1 - pad[1], kw - 1 - pad[1])],
        lhs_dilation=s, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype).reshape(1, -1, 1, 1)
    return y


def batch_norm2d_init(num_features, dtype=jnp.float32):
    return {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }


def batch_norm2d(p, x, *, training=False, eps=1e-5, momentum=0.1):
    """Returns (y, new_stats). In training mode normalizes with batch stats and
    returns EMA-updated running stats (the caller threads them); in eval mode
    uses the stored running stats and returns them unchanged."""
    x32 = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(x32, axis=(0, 2, 3))
        var = jnp.var(x32, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    y = (x32 - mean.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(var.reshape(1, -1, 1, 1) + eps)
    y = y * p["scale"].astype(jnp.float32).reshape(1, -1, 1, 1) \
        + p["bias"].astype(jnp.float32).reshape(1, -1, 1, 1)
    return y.astype(x.dtype), new_stats
