"""Workarounds for the remote-TPU tunnel runtime.

The tunnel throws transient UNAVAILABLE errors at backend init (observed
killing benchmark chain steps); jax caches init failures per process, so
retrying requires clearing backends between attempts.  Shared by bench.py
and the benchmark scripts (one copy — the logic drifted when it was
duplicated inline).
"""

from __future__ import annotations

import sys
import time

__all__ = ["init_devices_retry"]


def init_devices_retry(tries=10, sleep=30, log=None):
    """jax.devices() with retry on transient UNAVAILABLE backend-init errors.

    Returns the device list; re-raises on a non-UNAVAILABLE error or after
    `tries` attempts."""
    import jax

    if log is None:
        log = lambda m: print(m, file=sys.stderr, flush=True)
    for i in range(tries):
        try:
            return jax.devices()
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or i == tries - 1:
                raise
            log(f"TPU tunnel UNAVAILABLE at init (attempt {i + 1}/{tries}); "
                f"retrying in {sleep}s")
            try:
                import jax.extend.backend as jeb

                jeb.clear_backends()
            except Exception:
                pass
            time.sleep(sleep)
