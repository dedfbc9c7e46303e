"""Backend warm-up helpers for the attached-TPU runtime.

Two pathologies of the tunneled backend shape this module (measured in
round 3, tests/probe_compile_ops.py and the d2h probes):

- The FIRST device->host transfer of a process intermittently stalls
  for minutes (40-570 s observed) while all other traffic — compiles,
  h2d, execution — proceeds normally; subsequent pulls run at normal
  tunnel speed. `start_warm_pull()` absorbs that stall on a daemon
  thread started as early as possible, so the engine's first real pull
  finds the transfer path already unwedged.

- XLA compilation is served remotely and parallelizes ~3.5x across
  concurrent requests (4 canonical sorts: 62 s sequential, 18 s
  concurrent). `compile_concurrently()` drives a list of lowered
  programs through a thread pool; with the persistent compilation
  cache on (longqc_tpu/__init__), the later jit-call of the same
  program hits the disk cache instead of recompiling.
"""

import threading
from logging import getLogger

logger = getLogger(__name__)

_WARM_LOCK = threading.Lock()
_WARM_THREAD = None
_WARM_DONE = threading.Event()


def _warm_pull_body():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    try:
        x = jnp.arange(8, dtype=jnp.int32) + 1
        np.asarray(x)
        dt = time.time() - t0
        if dt > 5.0:
            logger.info("warm pull absorbed a %.0fs transfer stall", dt)
    except Exception as e:  # backend down: leave it to the real caller
        logger.warning("warm pull failed: %r", e)
    finally:
        _WARM_DONE.set()


def start_warm_pull():
    """Start (once per process) a daemon thread that performs a tiny
    device->host pull, absorbing the backend's first-pull stall while
    the caller compiles / stages data. Returns the Event that is set
    when the pull has completed."""
    global _WARM_THREAD
    with _WARM_LOCK:
        if _WARM_THREAD is None:
            _WARM_THREAD = threading.Thread(target=_warm_pull_body,
                                            daemon=True,
                                            name="longqc-warm-pull")
            _WARM_THREAD.start()
    return _WARM_DONE


def compile_concurrently(lowered, max_workers=8, tag="precompile"):
    """Compile a list of (name, lowered) pairs through a thread pool.
    Exceptions are logged, not raised (a failed precompile only means
    the later jit call pays the compile itself). Returns the number
    that compiled cleanly."""
    import concurrent.futures as cf
    import time

    t0 = time.time()
    ok = 0

    def one(item):
        name, lo = item
        lo.compile()
        return name

    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = [ex.submit(one, it) for it in lowered]
        for f in futs:
            try:
                f.result()
                ok += 1
            except Exception as e:
                logger.warning("%s: compile failed: %r", tag, e)
    logger.info("%s: %d/%d programs in %.1fs", tag, ok, len(lowered),
                time.time() - t0)
    return ok
