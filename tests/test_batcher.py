"""Micro-batcher tests: coalescing, ordering, error propagation, and the
batched /search route."""

import asyncio
import threading
import time

import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.serve.batcher import MicroBatcher
from sskd_tpu.serve.http import TestClient


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


class TestMicroBatcher:
    def test_single_item(self):
        async def main():
            batcher = MicroBatcher(lambda xs: [x * 2 for x in xs], window_ms=0)
            out = await batcher.submit(21)
            await batcher.close()
            return out

        assert _run(main()) == 42

    def test_concurrent_coalesce_and_order(self):
        batch_sizes = []

        def fn(xs):
            batch_sizes.append(len(xs))
            time.sleep(0.01)  # make batching windows overlap
            return [x + 100 for x in xs]

        async def main():
            batcher = MicroBatcher(fn, window_ms=5, max_size=8)
            results = await asyncio.gather(*[batcher.submit(i) for i in range(12)])
            await batcher.close()
            return results

        results = _run(main())
        assert results == [i + 100 for i in range(12)]  # positional mapping
        assert max(batch_sizes) > 1  # something actually coalesced
        assert sum(batch_sizes) == 12

    def test_max_size_respected(self):
        sizes = []

        def fn(xs):
            sizes.append(len(xs))
            return xs

        async def main():
            batcher = MicroBatcher(fn, window_ms=50, max_size=3)
            await asyncio.gather(*[batcher.submit(i) for i in range(7)])
            await batcher.close()

        _run(main())
        assert all(s <= 3 for s in sizes)

    def test_error_propagates_per_request(self):
        def fn(xs):
            raise RuntimeError("boom")

        async def main():
            batcher = MicroBatcher(fn, window_ms=0)
            with pytest.raises(RuntimeError, match="boom"):
                await batcher.submit(1)
            await batcher.close()

        _run(main())

    def test_result_count_mismatch_detected(self):
        async def main():
            batcher = MicroBatcher(lambda xs: [1], window_ms=5, max_size=4)
            with pytest.raises(RuntimeError, match="results"):
                await asyncio.gather(batcher.submit(1), batcher.submit(2))
            await batcher.close()

        _run(main())


def test_search_route_through_batcher(monkeypatch, fake_student, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate(
        {"service": {"micro_batch_window_ms": 1.0, "micro_batch_max_size": 8}}
    )
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        assert tc.app.state.search_batcher is not None
        tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        r = tc.post("/search", json_body={"query": "machine learning", "k": 3})
        assert r.status == 200
        body = r.json()
        assert body["total_results"] == 3
        assert [x["rank"] for x in body["results"]] == [1, 2, 3]
        # different k on the same batcher
        r2 = tc.post("/search", json_body={"query": "paris", "k": 5})
        assert r2.json()["total_results"] == 5
    finally:
        tc.close()


def test_search_route_concurrent_batched(monkeypatch, fake_student, temp_index_dir):
    """Hammer the live socket server with concurrent requests; all succeed
    and the batcher coalesces."""
    import json
    import urllib.request

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate(
        {"service": {"micro_batch_window_ms": 2.0, "micro_batch_max_size": 16}}
    )
    app = app_module.create_app(settings=settings)

    from sskd_tpu.serve.http import Server

    server = Server(app, host="127.0.0.1", port=18961)
    loop = asyncio.new_event_loop()

    def run_server():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.serve())

    t = threading.Thread(target=run_server, daemon=True)
    t.start()
    time.sleep(1.0)

    try:
        body = json.dumps({"index_dir": str(temp_index_dir)}).encode()
        urllib.request.urlopen(
            urllib.request.Request(
                "http://127.0.0.1:18961/index/load",
                body,
                {"content-type": "application/json"},
            ),
            timeout=10,
        )

        results = []

        def hit(i):
            payload = json.dumps({"query": f"query {i}", "k": 2}).encode()
            with urllib.request.urlopen(
                urllib.request.Request(
                    "http://127.0.0.1:18961/search",
                    payload,
                    {"content-type": "application/json"},
                ),
                timeout=10,
            ) as resp:
                results.append(json.loads(resp.read()))

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(10)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert len(results) == 10
        assert all(r["total_results"] == 2 for r in results)
    finally:
        # graceful drain (a bare loop.stop() mid-serve raises RuntimeError
        # in the server thread — the test_http_server teardown pattern)
        try:
            fut = asyncio.run_coroutine_threadsafe(
                server.shutdown(drain_timeout=1.0), loop
            )
            fut.result(timeout=5)
        except Exception:
            loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)
        if not loop.is_closed():
            loop.close()
