"""Backend-init watchdog for the benchmark harnesses.

The TPU on this rig is attached through a tunnel that can die outright:
`jax.devices()` then either raises UNAVAILABLE *or hangs forever* inside
the plugin's retry loop. A hang cannot be interrupted from a thread, so
the probe runs ``jax.devices()`` in a SUBPROCESS under a hard timeout;
the parent only touches jax after a probe succeeds.

On persistent failure the benches emit their JSON line with an explicit
``"error"`` field (plus whatever CPU-side baseline they measured) instead
of a stack trace, so the driver's capture always parses.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

TUNNEL_ADDR = ("127.0.0.1", 8083)

# On this rig the axon sitecustomize pins the platform at interpreter
# start and IGNORES the JAX_PLATFORMS env var; forcing CPU requires
# jax.config.update before first use (same pattern as tests/conftest.py).
_PROBE_SRC = (
    "import os, jax; "
    "os.environ.get('JAX_PLATFORMS') == 'cpu' and "
    "jax.config.update('jax_platforms', 'cpu'); "
    "ds = jax.devices(); print('OK', len(ds), ds[0].platform)"
)


def _socket_alive(timeout: float = 3.0) -> str | None:
    """Fast-path check of the tunnel endpoint. None = listening."""
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(TUNNEL_ADDR)
        return None
    except OSError as e:
        return f"tunnel {TUNNEL_ADDR[0]}:{TUNNEL_ADDR[1]} unreachable: {e}"
    finally:
        s.close()


def probe_backend(timeout: float | None = None,
                  retries: int | None = None,
                  backoff: float = 15.0,
                  log=None) -> str | None:
    """Verify the jax backend initializes. None = healthy; else an
    error string describing the persistent failure.

    Knobs: DADA2_TPU_BENCH_INIT_TIMEOUT (s, default 75),
    DADA2_TPU_BENCH_INIT_RETRIES (default 3).
    """
    if timeout is None:
        timeout = float(os.environ.get("DADA2_TPU_BENCH_INIT_TIMEOUT", 75))
    if retries is None:
        retries = int(os.environ.get("DADA2_TPU_BENCH_INIT_RETRIES", 3))
    log = log or (lambda *a: None)
    last = "no probe attempted"
    for attempt in range(1, retries + 1):
        # Only short-circuit on the socket when the platform is the
        # tunneled one; forced-CPU runs don't need the endpoint.
        if os.environ.get("JAX_PLATFORMS", "") != "cpu":
            sock_err = _socket_alive()
            if sock_err is not None:
                last = sock_err
                log(f"probe {attempt}/{retries}: {last}")
                if attempt < retries:
                    time.sleep(backoff)
                continue
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, timeout=timeout, text=True)
        except subprocess.TimeoutExpired:
            last = f"backend init hung >{timeout:.0f}s (subprocess probe)"
            log(f"probe {attempt}/{retries}: {last}")
            if attempt < retries:
                time.sleep(backoff)
            continue
        if out.returncode == 0 and out.stdout.startswith("OK"):
            log(f"probe {attempt}/{retries}: backend up "
                f"({out.stdout.strip()})")
            return None
        tail = (out.stderr or out.stdout).strip().splitlines()
        last = ("backend init failed: "
                + (tail[-1] if tail else f"rc={out.returncode}"))
        log(f"probe {attempt}/{retries}: {last}")
        if attempt < retries:
            time.sleep(backoff)
    return last
