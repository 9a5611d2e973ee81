"""Persistent XLA compilation cache — the flagship test-step program takes
O(minutes) to compile; cache it across processes."""
import os


def enable_compilation_cache(path=None):
    import jax
    path = path or os.environ.get(
        "NTTT_JAX_CACHE", os.path.expanduser("~/.cache/nttt_jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
