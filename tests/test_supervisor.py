"""Multi-process serving: supervisor lifecycle (spawn, crash-restart,
signal fan-out) and SO_REUSEPORT shared binding — the first-party analog
of the reference's uvicorn --workers (service.workers,
reference: src/config.py:213)."""

import http.client
import os
import signal
import socket
import subprocess
import sys
import threading
import time

import pytest

from sskd_tpu.serve.supervisor import WORKER_ENV, supervise


def test_clean_workers_exit_zero(tmp_path):
    marker = tmp_path / "ran"
    code = f"open({str(marker)!r}, 'a').write('x')"
    assert supervise([sys.executable, "-c", code], n_workers=3) == 0
    assert marker.read_text() == "xxx"


def test_worker_env_set_and_nested_workers_forced_single(tmp_path):
    out = tmp_path / "env"
    code = (
        "import os; open(%r, 'w').write("
        "os.environ['%s'] + ' ' + os.environ['SEMANTIC_KD_SERVICE__WORKERS'])"
        % (str(out), WORKER_ENV)
    )
    assert supervise([sys.executable, "-c", code], n_workers=1) == 0
    assert out.read_text() == "1 1"


def test_crash_restart_budget(tmp_path):
    counter = tmp_path / "runs"
    code = (
        f"open({str(counter)!r}, 'a').write('x')\n"
        "raise SystemExit(3)\n"
    )
    rc = supervise(
        [sys.executable, "-c", code],
        n_workers=1,
        max_restarts=2,
        restart_delay_s=0.05,
    )
    assert rc == 1  # budget exhausted -> failure surfaced
    assert counter.read_text() == "xxx"  # initial run + 2 restarts


def test_sigterm_fans_out_to_workers(tmp_path):
    """SIGTERM to the supervisor reaches every worker; workers that drain
    cleanly produce a 0 supervisor exit. The supervisor installs signal
    handlers, so it runs as a real subprocess here."""
    worker = (
        "import os, signal, time, sys\n"
        "signal.signal(signal.SIGTERM, lambda *a: sys.exit(0))\n"
        "open(os.environ['READY_DIR'] + '/' + str(os.getpid()), 'w').close()\n"
        "time.sleep(30)\n"
    )
    boss = (
        "import sys\n"
        "from sskd_tpu.serve.supervisor import supervise\n"
        f"sys.exit(supervise([sys.executable, '-c', {worker!r}], 2))\n"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as ready_dir, tempfile.NamedTemporaryFile(
        "r", suffix=".log"
    ) as logf:
        env = dict(os.environ, SSKD_LOG_SYNC="1", READY_DIR=ready_dir)
        proc = subprocess.Popen(
            [sys.executable, "-c", boss],
            stdout=open(logf.name, "w"),
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        try:
            # wait until both workers have INSTALLED their handlers (ready
            # markers), not merely been spawned — a SIGTERM landing during
            # interpreter startup kills them with the default disposition
            deadline = time.time() + 60
            while time.time() < deadline:
                if len(os.listdir(ready_dir)) >= 2:
                    break
                time.sleep(0.3)
            else:
                raise AssertionError(
                    "workers never became ready: " + open(logf.name).read()
                )
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=20)
            out = open(logf.name).read()
            assert proc.returncode == 0, out
            assert "stopping workers" in out
        finally:
            if proc.poll() is None:
                proc.kill()


def test_reuse_port_shared_binding():
    """Two Server instances bind the same port with reuse_port=True and
    requests keep succeeding — the kernel spreads accepts between them."""
    import asyncio

    from sskd_tpu.serve.http import App, Request, Response, Server

    servers, loops, threads = [], [], []
    port = 18974
    for tag in ("a", "b"):
        app = App()

        def make(tag=tag):
            async def who(request: Request) -> Response:
                return Response({"worker": tag})

            return who

        app.route("GET", "/who")(make())
        srv = Server(app, host="127.0.0.1", port=port, reuse_port=True)
        loop = asyncio.new_event_loop()

        def run(srv=srv, loop=loop):
            asyncio.set_event_loop(loop)
            loop.run_until_complete(srv.serve())

        t = threading.Thread(target=run, daemon=True)
        t.start()
        servers.append(srv)
        loops.append(loop)
        threads.append(t)
    time.sleep(0.8)
    seen = set()
    try:
        for _ in range(24):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/who")
            resp = conn.getresponse()
            assert resp.status == 200
            import json

            seen.add(json.loads(resp.read())["worker"])
            conn.close()
    finally:
        for srv, loop, t in zip(servers, loops, threads):
            try:
                fut = asyncio.run_coroutine_threadsafe(
                    srv.shutdown(drain_timeout=1.0), loop
                )
                fut.result(timeout=5)
            except Exception:
                pass
            t.join(timeout=5)
            if not loop.is_closed():
                loop.close()
    # kernel hashing decides the spread; both binding AND serving is the
    # contract — observing one tag is legal, observing neither is not
    assert seen and seen <= {"a", "b"}


class _DummyServer:
    def __init__(self, *a, **k):
        self.reuse_port = k.get("reuse_port")

    def run(self):
        pass


def test_cli_workers_routing(monkeypatch):
    """serve --workers N: cpu platform -> supervisor re-exec; non-cpu ->
    warn and serve single-process (never fork over the TPU chip)."""
    import sskd_tpu.serve.app as app_mod
    import sskd_tpu.serve.http as http_mod
    import sskd_tpu.serve.supervisor as sup_mod
    from sskd_tpu.cli.main import main

    created, supervised = [], []
    monkeypatch.setattr(
        app_mod, "create_app", lambda **k: created.append(k) or object()
    )
    monkeypatch.setattr(http_mod, "Server", _DummyServer)
    monkeypatch.setattr(
        sup_mod, "supervise", lambda argv, n, **k: supervised.append(n) or 0
    )
    monkeypatch.delenv(WORKER_ENV, raising=False)

    rc = main(["serve", "--workers", "3", "--platform", "cpu", "--port", "18999"])
    assert rc == 0 and supervised == [3] and created == []

    rc = main(["serve", "--workers", "3", "--port", "18999"])
    assert rc == 0 and supervised == [3]  # not called again
    assert len(created) == 1  # fell back to single-process serving

    # inside a worker the supervisor branch is skipped outright
    monkeypatch.setenv(WORKER_ENV, "1")
    rc = main(["serve", "--workers", "3", "--platform", "cpu", "--port", "18999"])
    assert rc == 0 and supervised == [3] and len(created) == 2
