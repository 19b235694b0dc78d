"""Bounded backend-liveness probe.

A dead axon relay (the TPU tunnel's host process exits on stdin EOF and
cannot be restarted from inside the VM) makes even ``jax.devices()``
block forever — see ``.claude/skills/verify/SKILL.md``.  Probing in a
subprocess with a timeout keeps the CALLER's process hang-free; callers
decide whether a dead backend is fatal (bench.py exits — perf numbers
off-chip would mislead) or recoverable (the driver's compile check falls
back to CPU).
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["probe_backend"]

# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so an env
# override must be re-applied via the CONFIG API inside the probe
_PROBE_SRC = (
    "import os, jax\n"
    "p = os.environ.get('JAX_PLATFORMS')\n"
    "if p: jax.config.update('jax_platforms', p)\n"
    "print(jax.devices()[0].platform)\n")


def probe_backend(timeout_s: int = 240) -> str:
    """Initialize jax's default backend in a bounded subprocess.

    Returns the platform name (e.g. ``'tpu'``) on success; raises
    ``RuntimeError`` if the backend errors or does not come up within
    ``timeout_s`` (the dead-relay signature)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"jax backend did not initialize within {timeout_s}s — "
            "TPU relay likely dead; aborting instead of hanging")
    if r.returncode != 0:
        raise RuntimeError(
            f"jax backend probe failed (rc={r.returncode}): "
            f"{r.stderr.strip()[-400:]}")
    return r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
