"""Persistent compiled-executable cache shared by the TPU entry points.

The TPU in this environment sits behind a serialized stdio relay with
intermittent outage/degradation windows (CLAUDE.md); a flagship-shape
compile costs ~20 s of window time per mode. Caching compiled executables
on disk means a re-run (driver bench after a builder run, or a queued-bench
re-arm after a window closed mid-run) loads them instead of recompiling —
a short healthy window becomes enough to capture a measurement.

If the PJRT plugin cannot serialize executables, JAX logs a warning per
compile and proceeds uncached — enabling this is never a behavior change.
Set GAVA_JAX_CACHE=0 to disable.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_compilation_cache(cache_dir: str = None) -> bool:
    """Point JAX's compilation cache at a repo-local directory.

    Safe to call multiple times and before or after backend init (it only
    configures where future compiles look). Returns True if enabled.
    """
    if os.environ.get("GAVA_JAX_CACHE", "1") == "0":
        return False
    try:
        import jax
        # TPU-only: relay compiles are what the cache exists to amortize.
        # XLA:CPU AOT reloads also log machine-feature-mismatch errors
        # (+prefer-no-gather pseudo-features) with a SIGILL caveat — not a
        # risk worth taking for the CPU test suite, which compiles fast.
        # (default_backend() initializes the backend; every caller needs
        # the device immediately afterwards anyway.)
        if jax.default_backend() == "cpu":
            return False
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or _DEFAULT_DIR)
        # cache everything that takes longer than a trivial compile; the
        # relay makes even mid-size compiles expensive
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:  # pragma: no cover - old jax without the option
        return False
