"""Core NN primitives: linear, layer norm, MLP, GELU, dropout, drop-path.

Functional style: ``*_init(key, ...) -> params`` (plain dicts) and pure apply
functions. Compute-dtype casting happens at call sites; LayerNorm statistics
are always computed in float32 for stability on TPU.

Capability parity: mirage/utils.py:103-159 (DropPath, Mlp), torch nn.Linear /
nn.LayerNorm semantics (eps handling, exact-erf GELU).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from mirage_tpu.nn import init as vinit


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default. NOTE: jax.nn.gelu defaults to
    the tanh approximation, which breaks <1e-5 parity; always use exact."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, dim_in, dim_out, bias=True, dtype=jnp.float32):
    p = {"w": vinit.xavier_uniform(key, (dim_in, dim_out), dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((dim_out,), dtype)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# LayerNorm (eps 1e-6 everywhere in the reference, mirage/model.py:57)
# ---------------------------------------------------------------------------

def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP (2-layer GELU, mirage/utils.py:137-159)
# ---------------------------------------------------------------------------

def mlp_init(key, dim_in, hidden, dim_out=None, dtype=jnp.float32):
    dim_out = dim_out or dim_in
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim_in, hidden, dtype=dtype),
        "fc2": linear_init(k2, hidden, dim_out, dtype=dtype),
    }


def mlp_apply(p, x, *, dropout_rate=0.0, deterministic=True, rng=None):
    x = linear(p["fc1"], x)
    x = gelu(x)
    x = linear(p["fc2"], x)
    x = dropout(x, dropout_rate, deterministic=deterministic, rng=rng)
    return x


# ---------------------------------------------------------------------------
# Dropout / DropPath (stochastic depth, mirage/utils.py:103-134)
# ---------------------------------------------------------------------------

def dropout(x, rate: float, *, deterministic: bool = True, rng: Optional[jax.Array] = None):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x, rate, *, deterministic: bool = True, rng: Optional[jax.Array] = None):
    """Per-sample stochastic depth. `rate` may be a traced scalar (so the
    encoder scan can carry per-layer rates)."""
    if deterministic or (isinstance(rate, (int, float)) and rate == 0.0) or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.uniform(rng, shape) < keep
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
