"""Kernel-engagement gate shared by every Pallas entry point.

The fused kernels (ops/) are only correct/fast on real TPUs, so by default
("auto") they engage iff ``jax.default_backend() == "tpu"``. Two override
modes exist for testing the *composition* of kernels with sharding — the
thing that cannot be exercised on a 1-chip box:

- "interpret": gates report True everywhere and every ``pallas_call`` runs
  in the Pallas interpreter. This lets the CPU test suite run the REAL
  kernel code paths (forward custom-vjp routing AND the Pallas backwards)
  under an 8-virtual-device mesh, e.g. inside ``shard_map`` — proving the
  kernels' numerics compose with sharded programs (tests/test_kernel_sharding.py).
- "force": gates report True but kernels lower as real Mosaic kernels.
  Only useful with AOT cross-platform lowering (``jax.export`` with
  ``platforms=("tpu",)``) on a non-TPU host: it produces the actual
  ``tpu_custom_call`` stablehlo so tests can assert that the shard_map
  wrapping yields a partitionable module. (Running such a computation on
  CPU would fail — Mosaic binaries don't execute there.)

IMPORTANT: on TPU, a ``pallas_call`` whose operands carry NamedShardings
under plain ``jit`` is a HARD error — "Mosaic kernels cannot be
automatically partitioned. Please wrap the call in a shard_map." Every
multi-device code path that wants the kernels engaged must therefore go
through ``shard_map`` (parallel/mesh.py dp_shard_map / train/steps.py's
data-parallel step); GSPMD-sharded (fsdp/tensor) programs must build the
model with ``attn_impl="xla"``.

The mode is read at TRACE time: set it (env MIRAGE_PALLAS or ``set_mode``)
before jitting/tracing, not between calls of an already-traced function.
"""

import contextlib

import jax

from mirage_tpu.utils.envflags import env_choice

_ALLOWED = ("auto", "interpret", "force")
_MODE = env_choice("MIRAGE_PALLAS", "auto", _ALLOWED)


def mode() -> str:
    return _MODE


def set_mode(m: str) -> None:
    global _MODE
    if m not in _ALLOWED:
        raise ValueError(f"MIRAGE_PALLAS mode {m!r} not in {_ALLOWED}")
    _MODE = m


@contextlib.contextmanager
def forced(m: str):
    """Temporarily force a kernel mode (tests)."""
    prev = _MODE
    set_mode(m)
    try:
        yield
    finally:
        set_mode(prev)


def kernels_enabled() -> bool:
    """Should the fused-kernel code paths engage? (gate used by nn/ and the
    custom-vjp backward routers)."""
    if _MODE in ("interpret", "force"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def interpret() -> bool:
    """Should pallas_call run in the interpreter? (threaded as the
    ``interpret=`` static arg of every kernel launcher)."""
    return _MODE == "interpret"
