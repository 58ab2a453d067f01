"""Persistent XLA compilation cache.

Full-step TPU compiles cost tens of seconds (minutes through remote-
compiler tunnels); a preempted-and-resumed or restarted job pays them
again for identical programs. JAX's persistent cache
(``jax_compilation_cache_dir``) keys serialized executables by program
fingerprint, so every re-run with unchanged shapes/config loads instead
of recompiling. The torch reference has no analogue (eager CUDA).

Enabled by default by the trainer and the serving engine; opt out with
``--trainer.compile_cache_dir=""`` or ``NPS_COMPILE_CACHE=0``. Cache
write/read failures are silent by JAX default
(``jax_raise_persistent_cache_errors=False``) — a bad cache dir degrades
to plain compilation, never to a crash.
"""

import os

import jax

DEFAULT_DIR = "~/.cache/nps_tpu/xla"


def enable_compile_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``cache_dir=None`` uses ``DEFAULT_DIR``; empty string / "0" disables.
    Safe to call repeatedly; returns the directory in use (or None if
    disabled).
    """
    if os.environ.get("NPS_COMPILE_CACHE", "1") in ("0", "false", ""):
        return None
    if cache_dir is None:
        cache_dir = DEFAULT_DIR
    if not cache_dir or str(cache_dir) in ("0", "false"):
        return None
    cache_dir = os.path.expanduser(str(cache_dir))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold (1 s) skips the tiny jits; keep fast compiles
        # out of the cache but catch every real model-step compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never let cache setup kill a run
        print(f"[nps_tpu] compile cache disabled ({e!r})")
        return None
    return cache_dir
