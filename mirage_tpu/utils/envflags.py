"""Validated environment-variable switches.

The perf A/B switches (MIRAGE_MLP_BWD, MIRAGE_ATTN_BWD, MIRAGE_LOSS_SPACE)
are read once at import; a typo'd value silently falling back to the default
would invalidate a benchmark without any signal (ADVICE r3), so unknown
values raise immediately.
"""

import os


def env_choice(name: str, default: str, allowed: tuple) -> str:
    val = os.environ.get(name, default)
    if val not in allowed:
        raise ValueError(
            f"{name}={val!r} is not one of {sorted(allowed)} — refusing to "
            f"fall back silently (it would corrupt an A/B measurement)")
    return val
