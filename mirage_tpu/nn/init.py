"""Weight initializers reproducing the reference's init scheme.

Scheme (mirage/model.py:95-121): xavier-uniform linears with zero bias, unit
LayerNorm, special fan computation for fused qkv / kv projections (Q, K, V
treated separately), MAE-style xavier on patch projections viewed as linear,
and trunc-normal(0.02) for global/mask/class tokens (mirage/utils.py:44-100).
"""

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std=0.02, mean=0.0, a=-2.0, b=2.0, dtype=jnp.float32):
    """Truncated normal via inverse-CDF of a truncated uniform, matching the
    reference's trunc_normal_ (mirage/utils.py:44-100). a/b are in units of
    std around 0 (the torch convention: absolute cutoffs applied before
    mean/std transform).
    """
    lo = _norm_cdf((a - mean) / std)
    hi = _norm_cdf((b - mean) / std)
    u = jax.random.uniform(key, shape, dtype=jnp.float32, minval=2 * lo - 1, maxval=2 * hi - 1)
    x = jax.scipy.special.erfinv(u)
    x = x * std * math.sqrt(2.0) + mean
    x = jnp.clip(x, a, b)
    return x.astype(dtype)


def _norm_cdf(x):
    return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0


def xavier_uniform(key, shape, fan_in=None, fan_out=None, dtype=jnp.float32):
    """Xavier/Glorot uniform for a (in, out) weight. Explicit fans allow the
    fused-qkv rule (fan_out = out//3, mirage/model.py:99-105)."""
    if fan_in is None:
        fan_in = shape[0]
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-limit, maxval=limit)


def qkv_uniform(key, dim_in, dim_out, n_fused, dtype=jnp.float32):
    """Init for fused qkv (n_fused=3) or kv (n_fused=2) weights, treating each
    of the fused projections separately (mirage/model.py:99-105). Weight layout
    here is (in, out) so torch's shape[0]//n == our shape[1]//n."""
    limit = math.sqrt(6.0 / (dim_out // n_fused + dim_in))
    return jax.random.uniform(key, (dim_in, dim_out), dtype=dtype, minval=-limit, maxval=limit)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
