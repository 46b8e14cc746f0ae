"""Persistent-cache key stability across backend redeploys (r5 finding).

The tunneled PJRT plugin reports the remote server's build line inside
`platform_version`; jax hashes that string into every persistent-cache key,
so a server redeploy rotated every key and full-size programs recompiled
cold hours after being primed. `utils/compile_cache.enable()` installs a
backend hash that drops the volatile line while keeping the plugin's real
compatibility fields.
"""

import hashlib

from diffroll_tpu.utils import compile_cache

AXON_VERSION = ("PJRT C API\n"
                "axon 0.1.0; SerializedExecutable v9; compile-cache v14; "
                "compat c49\n"
                "TFRT TPU v5 lite\n"
                "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")


def test_strips_only_the_build_line():
    got = compile_cache.stable_platform_version(AXON_VERSION)
    assert got == ("PJRT C API\n"
                   "axon 0.1.0; SerializedExecutable v9; compile-cache v14; "
                   "compat c49\n"
                   "TFRT TPU v5 lite")


def test_redeploy_invariant_but_compat_sensitive():
    redeployed = AXON_VERSION.replace(
        "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709",
        "Built on Dec 01 2025 09:00:00 (1764579600) cl/845000000")
    assert (compile_cache.stable_platform_version(AXON_VERSION)
            == compile_cache.stable_platform_version(redeployed))
    # a compat bump MUST still rotate the key: stale executables may not load
    compat_bump = AXON_VERSION.replace("compat c49", "compat c50")
    assert (compile_cache.stable_platform_version(AXON_VERSION)
            != compile_cache.stable_platform_version(compat_bump))


def test_version_without_build_line_passes_through():
    v = "PJRT C API\ncpu"
    assert compile_cache.stable_platform_version(v) == v


def test_enable_installs_patched_hash(tmp_path, monkeypatch):
    import jax
    from jax._src import cache_key

    monkeypatch.delenv("DIFFROLL_CACHE_STABLE_KEY", raising=False)
    monkeypatch.setattr(compile_cache, "_installed", False)
    orig = cache_key._hash_platform
    try:
        got = compile_cache.enable(str(tmp_path / "xla"))
        assert jax.config.jax_compilation_cache_dir == got
        assert cache_key._hash_platform is not orig

        class FakeBackend:
            platform = "tpu"
            platform_version = AXON_VERSION

        class FakeRedeployed:
            platform = "tpu"
            platform_version = AXON_VERSION.replace("cl/831091709",
                                                    "cl/999999999")

        h1, h2 = hashlib.sha256(), hashlib.sha256()
        cache_key._hash_platform(h1, FakeBackend())
        cache_key._hash_platform(h2, FakeRedeployed())
        assert h1.hexdigest() == h2.hexdigest()
    finally:
        cache_key._hash_platform = orig


def test_env_kill_switch(tmp_path, monkeypatch):
    from jax._src import cache_key

    monkeypatch.setenv("DIFFROLL_CACHE_STABLE_KEY", "0")
    monkeypatch.setattr(compile_cache, "_installed", False)
    orig = cache_key._hash_platform
    try:
        compile_cache.enable(str(tmp_path / "xla"))
        assert cache_key._hash_platform is orig
    finally:
        cache_key._hash_platform = orig
