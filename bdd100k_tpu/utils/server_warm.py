"""Absorb the remote device server's one-time first-program cost early.

On this deployment the TPU sits behind a tunnel to a persistent device
server.  Measured behaviour (2026-08-17, persistent-cache HITS with
identical keys, so none of this is recompilation):

  * the first postprocess-bearing program a PROCESS executes pays a
    one-time server-side setup of 55-400 s (bimodal with server state);
  * every later program — any shape, any model — loads in 2-9 s;
  * pure-conv programs (no fused postprocess) and trivial Pallas kernels
    load fast even when first, so the cost keys on the first substantial
    postprocess graph, not on Pallas presence or program size.

The host is idle while that happens (the wait is a blocking RPC), so the
fix is overlap, not avoidance: kick off a throwaway batch-1
postprocess-only program in a daemon thread as soon as the detector
config is known, let dataset/loader setup proceed, and `join()` before
anything timing-sensitive.  Drivers and benches call
`start_server_warm(bundle)` right after `build_detector`.
"""

from __future__ import annotations

import threading
import time


class ServerWarm:
    """Handle for the background warm; `join()` before timed phases."""

    def __init__(self, thread: threading.Thread | None = None):
        self._thread = thread
        self.seconds: float | None = None  # set when the warm finishes
        self.error: str | None = None

    def join(self, timeout: float | None = None) -> "ServerWarm":
        if self._thread is not None:
            self._thread.join(timeout)
        return self

    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()


def start_server_warm(bundle) -> ServerWarm:
    """Run a batch-1 postprocess-only program in a daemon thread.

    The program is tiny on the host side (dummy logits, no backbone), hits
    the persistent compilation cache after the first ever run, and absorbs
    the server's one-time first-load cost while the caller does host-only
    setup.  Failures are recorded, never raised — a failed warm only means
    the first real program pays the cost instead.
    """
    import jax
    import jax.numpy as jnp

    # No-op off the remote-TPU single-process path: on CPU (tests) the
    # setup cost doesn't exist and a stray compile thread contends for
    # the core; under multi-host the extra per-process program could
    # desynchronize lockstepped workers past collective timeouts.
    if jax.default_backend() == "cpu" or jax.process_count() > 1:
        handle = ServerWarm()
        handle.seconds = 0.0
        return handle

    def _warm(handle: ServerWarm):
        t0 = time.monotonic()
        try:
            a = bundle.anchors.shape[0]
            loc = jnp.zeros((1, a, 4), jnp.float32)
            cls = jnp.zeros(
                (1, a, bundle.config.num_classes + 1), jnp.float32
            )
            det = jax.jit(bundle.postprocess)(loc, cls)
            # fetch, not block: the warm must cover until the server has
            # REALLY executed the program once — block_until_ready can
            # return early on a fresh executable's first run (see
            # benchmarks.common.fetch_fence, measured 2026-08-18)
            jax.device_get(det.scores[0, 0])
        except Exception as e:  # pragma: no cover - infra-dependent
            handle.error = f"{type(e).__name__}: {e}"
        handle.seconds = time.monotonic() - t0

    handle = ServerWarm()
    handle._thread = threading.Thread(
        target=_warm, args=(handle,), daemon=True
    )
    handle._thread.start()
    return handle
