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


def init_backend_bounded(timeout_s=240.0, what="jax backend init"):
    """First jax backend touch, bounded; returns the backend name.

    Through the axon remote-TPU tunnel, backend discovery dials the relay;
    when the relay is down that dial hangs forever in EVERY process (the
    plugin registers at interpreter startup, so there is no in-process CPU
    fallback). Run the touch in a daemon thread so a dead relay becomes a
    fast, explicit RuntimeError instead of an unbounded hang. Shared by
    bench.py and __graft_entry__.entry()."""
    import threading
    result = {}

    def _probe():
        import jax
        result["backend"] = jax.default_backend()

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "backend" not in result:
        raise RuntimeError(
            f"{what} did not complete within {timeout_s:.0f}s — the axon "
            "TPU relay is likely down (see CLAUDE.md); nothing local "
            "restarts it")
    return result["backend"]
