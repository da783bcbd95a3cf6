#!/usr/bin/env python
"""End-to-end HTTP serving benchmark (reference analog: the serving
p50/p95/throughput tables in docs/operations/scaling-and-performance.md).

Builds a synthetic index, boots the real service in-process (socket server
in a thread), drives it with concurrent HTTP clients, prints a JSON report.

  python scripts/bench_serving.py --rows 100000 --requests 200 --workers 16
"""

import argparse
import concurrent.futures
import json
import socket
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=384)
    parser.add_argument("--requests", type=int, default=200)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--dtype", default="int8")
    parser.add_argument("--model", default=None, help="student checkpoint (default: tiny random)")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--port", type=int, default=0)
    args = parser.parse_args(argv)

    from sskd_tpu.utils.logging import setup_logging
    from sskd_tpu.utils.platform import apply_platform

    setup_logging()
    apply_platform(args.platform)

    import numpy as np

    import sskd_tpu.serve.app as app_module
    from sskd_tpu.config import Settings
    from sskd_tpu.index.builder import IndexBuilder
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.serve.http import Server

    # --- model + index -----------------------------------------------------
    student = (
        StudentModel(args.model)
        if args.model
        else StudentModel("bench-student", config=BertConfig.tiny())
    )
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((args.rows, student.embedding_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    builder = IndexBuilder(
        embedding_dim=student.embedding_dim, dtype=args.dtype, index_type="approx"
    )
    builder.build_from_arrays(emb, [f"d{i}" for i in range(args.rows)])

    # --- boot the real service ---------------------------------------------
    settings = Settings.model_validate(
        {"service": {"micro_batch_window_ms": 2.0, "micro_batch_max_size": 64}}
    )
    app = app_module.create_app(settings=settings)
    app_module.StudentModel = lambda *a, **k: student  # inject

    port = args.port or _free_port()
    server = Server(app, host="127.0.0.1", port=port)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    _wait_ready(port)

    # hot-load the index through the API (exercises the real path)
    idx_dir = Path("artifacts/bench_serving_index")
    builder.save(idx_dir)
    _post(port, "/index/load", {"index_dir": str(idx_dir)})

    # --- drive -------------------------------------------------------------
    def hit(i):
        t0 = time.perf_counter()
        body = _post(
            port,
            "/search",
            {"query": f"benchmark query number {i % 13}", "k": args.k},
        )
        return (time.perf_counter() - t0) * 1000, body["total_results"]

    for i in range(8):  # warm compile buckets
        hit(i)
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.workers) as ex:
        list(ex.map(hit, range(2 * args.workers)))

    seq = sorted(hit(i)[0] for i in range(30))
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.workers) as ex:
        results = list(ex.map(hit, range(args.requests)))
    wall = time.perf_counter() - t0
    lats = sorted(t for t, _ in results)

    report = {
        "metric": "serving_req_per_s",
        "value": round(args.requests / wall, 1),
        "unit": "req/s",
        "detail": {
            "rows": args.rows,
            "dtype": args.dtype,
            "workers": args.workers,
            "sequential_p50_ms": round(seq[len(seq) // 2], 1),
            "concurrent_p50_ms": round(lats[len(lats) // 2], 1),
            "concurrent_p95_ms": round(lats[int(len(lats) * 0.95)], 1),
            "all_correct": all(n == args.k for _, n in results),
        },
    }
    print(json.dumps(report))
    return 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_ready(port: int, timeout: float = 600.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/ready", timeout=5
            ) as r:
                if r.status == 200:
                    return
        except Exception:  # noqa: BLE001 — booting
            time.sleep(1.0)
    raise TimeoutError("service never became ready")


def _post(port: int, path: str, payload: dict, timeout: float = 300.0) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        json.dumps(payload).encode(),
        {"content-type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


if __name__ == "__main__":
    sys.exit(main())
