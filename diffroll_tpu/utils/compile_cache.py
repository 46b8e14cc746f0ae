"""Persistent XLA compile cache, keyed to survive backend redeploys.

Full-size programs compile in 5–13 minutes over the single-chip tunnel, so
every entrypoint (CLI, bench, profilers) enables jax's persistent
compilation cache. Round-5 finding: the cache kept missing on programs it
had ALREADY compiled — same code, byte-identical lowered StableHLO, same
shapes — because jax hashes `backend.platform_version` into every key, and
the tunneled PJRT plugin reports the REMOTE server's build line in it:

    PJRT C API
    axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49
    TFRT TPU v5 lite
    Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709

Every server redeploy changes the "Built on … cl/…" line, rotating every
cache key (observed as full-size recompiles hours after priming, and as two
executable size classes for the same program — different server builds'
codegen). The plugin's actual compatibility surface is the line above it:
`SerializedExecutable v9; compile-cache v14; compat c49` — the fields it
versions precisely so clients can tell when cached artifacts are stale.

`enable()` therefore installs a cache-key backend hash that keeps the
platform name and every platform_version line EXCEPT the volatile build
line. If the compat fields bump, keys still rotate (correctly). If a kept
entry is nevertheless unloadable, jax's `_cache_read` catches the error and
recompiles (`jax_raise_persistent_cache_errors` defaults False) — the
failure mode is a warning plus the compile we'd have paid anyway.

Opt out with DIFFROLL_CACHE_STABLE_KEY=0 (restores jax's stock key).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/diffroll_tpu/xla"
_VOLATILE_PREFIXES = ("Built on ",)
_installed = False


def stable_platform_version(version: str) -> str:
    """platform_version minus lines that embed build timestamps/CL numbers."""
    return "\n".join(line for line in version.split("\n")
                     if not line.startswith(_VOLATILE_PREFIXES))


def _install_stable_backend_hash() -> None:
    global _installed
    if _installed or os.environ.get("DIFFROLL_CACHE_STABLE_KEY") == "0":
        return
    from jax._src import cache_key

    def _hash_platform(hash_obj, backend):
        cache_key._hash_string(hash_obj, backend.platform)
        cache_key._hash_string(
            hash_obj, stable_platform_version(backend.platform_version))

    cache_key._hash_platform = _hash_platform
    _installed = True


def enable(path: str | None = None,
           min_compile_time_secs: int = 10) -> str:
    """Point jax's persistent compile cache at `path` (created if needed)
    and install the redeploy-stable backend hash. Returns the cache dir."""
    import jax

    path = os.path.expanduser(path or os.environ.get(
        "DIFFROLL_CACHE_DIR", _DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    _install_stable_backend_hash()
    return path
