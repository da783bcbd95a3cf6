"""Multi-process serving supervisor (``service.workers`` > 1).

The reference exposed ``service.workers`` (reference: src/config.py:213)
and delegated process management to uvicorn. Here the supervisor is
first-party: it spawns N fresh interpreter processes (re-exec, never
fork — forking a process with a live JAX runtime corrupts the child),
each binding the same port via SO_REUSEPORT so the kernel load-balances
accepts. CPU serving only: one process owns a TPU chip, so the caller
guards the TPU path and scales with replicas/shards instead.

Lifecycle: SIGTERM/SIGINT to the supervisor fan out to the workers
(which run their own graceful drain, serve/http.py); a worker that dies
unexpectedly is restarted with backoff up to ``max_restarts`` times.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from sskd_tpu.utils.logging import get_logger

logger = get_logger("serve.supervisor")

WORKER_ENV = "SSKD_SERVE_WORKER"  # set in children so they serve, not spawn


def supervise(
    worker_argv: list[str],
    n_workers: int,
    max_restarts: int = 5,
    restart_delay_s: float = 1.0,
) -> int:
    """Run ``n_workers`` copies of ``worker_argv`` until they exit.

    Returns the supervisor's exit code: 0 when every worker exited
    cleanly after a shutdown signal, 1 when any worker exhausted its
    restart budget.
    """
    env = dict(os.environ)
    env[WORKER_ENV] = "1"
    # a worker is a serving process, never a nested supervisor
    env["SEMANTIC_KD_SERVICE__WORKERS"] = "1"

    procs: dict[int, subprocess.Popen] = {}
    restarts = [0] * n_workers
    shutting_down = False

    def _spawn(slot: int) -> None:
        p = subprocess.Popen(worker_argv, env=env)
        procs[slot] = p
        logger.info(f"worker {slot}: pid {p.pid} started")

    def _forward(signum, _frame) -> None:
        nonlocal shutting_down
        shutting_down = True
        logger.info(
            f"{signal.Signals(signum).name} received — stopping workers"
        )
        for p in list(procs.values()):  # copy: _spawn mutates procs
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)

    old_term = signal.signal(signal.SIGTERM, _forward)
    old_int = signal.signal(signal.SIGINT, _forward)
    failed = False
    done: set[int] = set()  # slots no longer supervised
    try:
        for slot in range(n_workers):
            _spawn(slot)
        while len(done) < n_workers:
            for slot in range(n_workers):
                if slot in done:
                    continue
                p = procs[slot]
                code = p.poll()
                if code is None:
                    continue
                if code == 0 or shutting_down:
                    done.add(slot)
                elif restarts[slot] < max_restarts:
                    restarts[slot] += 1
                    logger.warning(
                        f"worker {slot} (pid {p.pid}) exited {code}; "
                        f"restart {restarts[slot]}/{max_restarts}"
                    )
                    time.sleep(restart_delay_s * restarts[slot])
                    if shutting_down:  # signal arrived during the backoff
                        done.add(slot)
                        continue
                    _spawn(slot)
                else:
                    logger.error(
                        f"worker {slot} exhausted {max_restarts} restarts"
                    )
                    failed = True
                    done.add(slot)
            if shutting_down:
                # close the spawn/shutdown race: a worker spawned a tick
                # before the signal never saw _forward's TERM — re-signal
                # live workers each sweep (a draining server ignores the
                # repeat)
                for p in list(procs.values()):
                    if p.poll() is None:
                        p.send_signal(signal.SIGTERM)
            time.sleep(0.1)
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
        for p in procs.values():  # belt-and-braces on abnormal unwind
            if p.poll() is None:
                p.kill()
    codes = {s: p.returncode for s, p in procs.items()}
    logger.info(f"supervisor exiting; worker codes {codes}")

    def _clean(code: int) -> bool:
        # during shutdown, death BY the forwarded SIGTERM is clean too — a
        # worker mid-startup (handlers not yet installed) dies -SIGTERM
        return code == 0 or (shutting_down and code == -signal.SIGTERM)

    return 1 if failed or not all(_clean(c) for c in codes.values()) else 0


def is_worker() -> bool:
    """True inside a supervised worker process."""
    return os.environ.get(WORKER_ENV, "0") == "1"


def reexec_argv() -> list[str]:
    """The argv that re-launches THIS invocation as a single worker."""
    return [sys.executable, "-m", "sskd_tpu.cli.main", *sys.argv[1:]]
