"""Persistent XLA compilation-cache bootstrap.

Remote TPU compiles on this environment's tunnel take minutes per program;
the persistent cache makes every subsequent run of the same config start in
seconds.  Must run BEFORE jax is imported — call it at entry-point module
top (cli/main.py, bench.py, __graft_entry__.py all do).
"""

from __future__ import annotations

import os

# Round-5: moved OFF /tmp — the environment recycles /tmp between driver
# sessions, and losing the cache costs ~20 min per fused-GUNet recompile
# over the tunnel.  .scratch/ is gitignored (same home as the ladder data).
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch", "jax_cache_tpu")


def ensure_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    """Idempotent env defaults; explicit user env vars always win."""
    os.makedirs(os.environ.get("JAX_COMPILATION_CACHE_DIR", cache_dir),
                exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    # On hosts with an out-of-tree PJRT plugin (the axon TPU tunnel), the
    # JAX_PLATFORMS env var alone does not stop the plugin from winning
    # backend selection — the config flag must be set too (tests/conftest.py
    # does the same).  Make `JAX_PLATFORMS=cpu python -m boxsegliver_tpu...`
    # mean what it says.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def probe_devices(timeout_s: float = 120.0):
    """jax.devices() in a worker thread with a deadline.

    The axon TPU tunnel HANGS (rather than errors) backend initialization
    when it is wedged; driver-run entry points probe first so they fail in
    minutes with a diagnosable message instead of stalling indefinitely.
    A healthy backend answers in seconds, so the deadline is safe."""
    import threading

    out = {}

    def probe():
        import jax
        out["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        raise RuntimeError(
            f"device backend unreachable after {timeout_s:.0f}s "
            "(TPU tunnel down?) — set JAX_PLATFORMS=cpu for a CPU run")
    return out["devices"]
