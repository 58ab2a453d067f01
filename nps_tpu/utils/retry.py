"""Bounded retry for transient remote-compiler failures.

The axon TPU backend compiles over an HTTP tunnel; a dropped connection
surfaces as ``jax.errors.JaxRuntimeError: INTERNAL:
http://.../remote_compile: read body: response body closed before all
bytes were read`` at whatever jitted call triggered the inline compile.
In round 4 one such flake killed a 500-epoch GNN convergence run 75
minutes in (epoch-125 ramp-boundary compile). The failure is strictly
compile-path (the ``remote_compile`` URL is in the message), so the
call's donated input buffers were never consumed and the dispatch can
simply be retried once the tunnel recovers.

The gate is deliberately narrow: only messages naming ``remote_compile``
are retried. Execution-time errors (NaNs, OOM, donation-after-use) never
match and propagate immediately.
"""

import time

__all__ = ["is_transient_compile_error", "with_compile_retry"]


def is_transient_compile_error(exc):
    return "remote_compile" in str(exc)


def with_compile_retry(fn, *args, retries=2, delay_s=20.0, **kwargs):
    """Call ``fn(*args, **kwargs)``, retrying up to ``retries`` times when
    the failure is a transient remote-compile tunnel error."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — gated by the predicate
            if attempt >= retries or not is_transient_compile_error(e):
                raise
            attempt += 1
            print(f"[nps_tpu] transient remote-compile failure "
                  f"(retry {attempt}/{retries} in {delay_s:.0f}s): {e}")
            time.sleep(delay_s)
