"""Config/flag system: argparse with YAML-file default override.

Parity: run_pretraining.py:59-66/:306-315 — a small pre-parser reads
``-c/--config``, ``yaml.safe_load`` feeds ``parser.set_defaults``, then the
full parse runs; int sizes normalize to per-domain dicts
(run_pretraining.py:328-339).
"""

import argparse
import hashlib
import json
import os


def str2bool(v) -> bool:
    """argparse bool type: accepts true/false/1/0/yes/no (plain type=bool
    would make '--flag False' truthy)."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("true", "1", "yes", "y", "t"):
        return True
    if s in ("false", "0", "no", "n", "f"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def apply_platform_env():
    """Honor JAX_PLATFORMS even when the site patches jax's default platform
    list (this image defaults to 'axon,cpu' regardless of the env var)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    apply_compile_cache()


def apply_compile_cache():
    """Enable JAX's persistent XLA compilation cache for every entry point.

    TPU compiles of novel HLO take tens of seconds to minutes (the reference
    pays the equivalent torch/CUDA warm-up every process start); caching the
    compiled executables on disk makes warm restarts — serving redeploys,
    resumed training, repeated evals — pay only a cache read.

    ``MIRAGE_COMPILE_CACHE`` controls it: a directory path to use, ``off``/
    ``0`` to disable, unset for the default ``~/.cache/mirage_tpu/xla``.
    The default stays off when the process is pinned to the CPU backend
    (tests, interpret-mode smokes) so suites don't write cache files.
    """
    spec = (os.environ.get("MIRAGE_COMPILE_CACHE") or "").strip()
    if spec.lower() in ("0", "off", "false", "no"):
        return
    import jax

    if not spec:
        plat = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
        if plat.split(",")[0].strip() == "cpu":
            return
        spec = os.path.expanduser("~/.cache/mirage_tpu/xla")
    try:
        jax.config.update("jax_compilation_cache_dir", spec)
        # Cache everything that took >=1s to compile, however small the HLO.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def parse_with_yaml(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """-c/--config YAML sets defaults; explicit CLI flags override."""
    import yaml

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("-c", "--config", default="", type=str)
    cfg_args, remaining = pre.parse_known_args(argv)
    if cfg_args.config:
        with open(cfg_args.config) as f:
            cfg = yaml.safe_load(f) or {}
        known = {a.dest for a in parser._actions}
        unknown = set(cfg) - known
        if unknown:
            raise ValueError(f"Unknown config keys in {cfg_args.config}: {sorted(unknown)}")
        parser.set_defaults(**cfg)
    args = parser.parse_args(remaining)
    args.config = cfg_args.config
    return args


def normalize_domain_sizes(args, domains, *, size_attrs=("input_size", "patch_size")):
    """int or {domain: (h, w)} -> {domain: (h, w)} for every domain; computes
    grid_size per domain."""
    for attr in size_attrs:
        v = getattr(args, attr)
        if isinstance(v, int):
            v = {d: (v, v) for d in domains}
        else:
            v = {d: tuple(v[d]) for d in v}
        setattr(args, attr, v)
    args.grid_size = {}
    for d in domains:
        if d in args.input_size and d in args.patch_size:
            args.grid_size[d] = tuple(
                args.input_size[d][i] // args.patch_size[d][i] for i in range(2))
    return args


def args_hash(args, exclude=("config", "output_dir", "device", "resume")) -> str:
    """md5 of the arg namespace for unique output dirs (run_cls_tuning.py:324-327)."""
    d = {k: v for k, v in sorted(vars(args).items()) if k not in exclude}
    return hashlib.md5(json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:12]


def save_args(output_dir: str, args, name: str = "config.json"):
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, name), "w") as f:
        json.dump({k: v for k, v in vars(args).items()}, f, indent=2, default=str)
