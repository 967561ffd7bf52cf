"""Persistent XLA compilation cache.

Single-core host + minutes-long frame compiles make cold starts the worst
part of every CLI invocation; JAX's persistent cache keys compiled
executables by (HLO, backend, flags) and survives across processes, so the
second run of any entry point skips compilation entirely. Enabled by every
CLI main, bench.py, and the test conftest; NR_NO_COMPILE_CACHE=1 opts out.
The cache directory (.jax_cache/ at the repo root by default,
NR_COMPILE_CACHE_DIR overrides) is gitignored build state, not source.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache. Returns the directory in
    use, or None when disabled/unavailable. Safe to call repeatedly and
    before/after backend initialization.

    Platform policy: ON for CPU backends (verified: cross-process reload
    works; XLA:CPU prints benign machine-feature-hint warnings on load),
    OPT-IN via NR_COMPILE_CACHE_TPU=1 for the remote axon TPU until cache
    serialization is verified there — a cache-layer failure must never cost
    a scored bench run."""
    if os.environ.get("NR_NO_COMPILE_CACHE") == "1":
        return None
    on_remote_tpu = (os.environ.get("PALLAS_AXON_POOL_IPS")
                     and os.environ.get("JAX_PLATFORMS", "") != "cpu")
    if on_remote_tpu and os.environ.get("NR_COMPILE_CACHE_TPU") != "1":
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("NR_COMPILE_CACHE_DIR")
    if not cache_dir:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if os.path.isdir(os.path.join(root, ".git")):
            cache_dir = os.path.join(root, ".jax_cache")
        else:
            # Installed package: never write into site-packages.
            cache_dir = os.path.join(
                os.environ.get("XDG_CACHE_HOME",
                               os.path.expanduser("~/.cache")),
                "neural_renderer_tpu", "jax_cache")
    # XLA:CPU prints two benign machine-feature-hint warnings per cached
    # executable load; silence them unless the user chose a log level
    # (must be set before XLA's native libs initialize).
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: the default thresholds skip small/fast compiles,
        # but on this 1-core host even those are worth persisting.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return cache_dir
    except Exception:  # pragma: no cover - config names vary across versions
        return None
