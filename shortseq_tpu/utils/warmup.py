"""Device->host transfer-path warmup.

On tunneled TPU runtimes the first d2h fetch of a process pays a long
one-time handshake (measured in minutes in some environments).  Pipelines
that will fetch results call start_transfer_warmup() up front so the
handshake overlaps their real work instead of landing on the first result.

The thread is deliberately NON-daemon: the interpreter joins it at
shutdown, which (a) guarantees the handshake isn't abandoned mid-flight -
killing a thread inside the PJRT C++ transfer aborts the process - and
(b) costs nothing in practice, because every caller fetches results and
therefore waits for the handshake anyway.  This is also why the warmup is
started lazily from fetching code paths, never at import.

Residual trade-off: a caller that errors out BEFORE its first fetch (e.g.
a trace-time shape error) leaves interpreter shutdown joining the
in-flight handshake.  Callers' validation fetches normally precede their
raises, so the window is small; SHORTSEQ_TPU_NO_WARMUP=1 disables the
thread entirely for latency-insensitive tooling.
"""

from __future__ import annotations

import os
import threading

_lock = threading.Lock()
_thread: threading.Thread | None = None


def _warm():
    try:
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.zeros((1,), jnp.uint32))
    except Exception:
        pass


def start_transfer_warmup() -> None:
    """Begin the one-time d2h handshake in the background (idempotent)."""
    global _thread
    if os.environ.get("SHORTSEQ_TPU_NO_WARMUP") == "1":
        return
    with _lock:
        if _thread is None:
            _thread = threading.Thread(
                target=_warm, name="shortseq-tpu-d2h-warmup")
            _thread.start()
