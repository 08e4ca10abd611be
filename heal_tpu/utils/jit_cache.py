"""Persistent XLA compilation cache.

The flagship pipelines (bench.py's 16-frame scan, the multi-chip dryrun,
the CLI tools) compile large programs; on this machine compilation goes
through a remote-compile tunnel and a cold compile of the full serving
scan costs minutes. JAX's persistent compilation cache keyes compiled
executables by (HLO, compile options, backend) and survives across
processes, so priming it once makes every later cold start — including
the driver's end-of-round bench run — hit disk instead of the compiler.

Counterpart of the reference's reliance on torch/cuDNN autotune caches;
there is no reference file for this — it is TPU-operational plumbing.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache (idempotent).

    Call before the first ``jax.jit`` execution. Override the location
    with ``HEAL_TPU_JIT_CACHE`` (set to ``0``/``off`` to disable).
    """
    env = os.environ.get("HEAL_TPU_JIT_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    cache_dir = path or env or _DEFAULT_DIR
    import jax

    # CPU-only: skip. Local CPU compiles are cheap, and XLA:CPU AOT cache
    # entries embed host machine features — loading one compiled under a
    # different feature set (e.g. across the sanitized-env re-exec the
    # test suite does) warns about potential SIGILL. The cache's value is
    # the minutes-long remote TPU compiles, which stay enabled.
    if jax.default_backend() == "cpu":
        return ""
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return ""  # older jax without the knobs: silently skip
    return cache_dir


def jit_init(model, rng, batch, **kwargs):
    """``model.init`` under jit on accelerator backends.

    Flax's ``init`` executes the forward eagerly op-by-op; through the
    axon RPC tunnel every op costs ~30 ms, so a full-scale flagship init
    takes minutes (measured 403 s of bench.py's 14-minute cold start).
    Jitting turns it into one compiled program — and one persistent-cache
    entry. On CPU (the test mesh) eager init is already fast and cheaper
    than a compile, so it is left alone.
    """
    import functools

    import jax

    if jax.default_backend() == "cpu":
        return model.init(rng, batch, **kwargs)
    return jax.jit(functools.partial(model.init, **kwargs))(rng, batch)
