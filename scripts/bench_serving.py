#!/usr/bin/env python
"""End-to-end HTTP serving benchmark (reference analog: the serving
p50/p95/p99 + throughput tables in docs/operations/scaling-and-performance.md
:305-330 — 12/35/78 ms and 80->1,800 req/s at concurrency 1->80).

Builds a synthetic index, boots the real service in-process (first-party
asyncio socket server in a thread, full middleware stack, micro-batcher,
fused dispatch), drives it with concurrent HTTP clients at a LADDER of
concurrency levels, prints a JSON report and optionally writes it to a
committed artifact.

  python scripts/bench_serving.py --rows 1000000 --requests 400 \
      --levels 1,8,32,64 --arch e5 --out artifacts/bench/serving_tpu.json
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
    parser.add_argument("--requests", type=int, default=200,
                        help="requests per concurrency level")
    parser.add_argument("--levels", default="1,8,32",
                        help="comma-separated concurrency levels")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--dtype", default="int8",
                        choices=["float32", "bfloat16", "int8", "int4"])
    parser.add_argument("--refine-m", type=int, default=0,
                        help="recall-margin rescore candidates (adr-012); "
                             "REQUIRED for a gate-passing --dtype int4 run")
    parser.add_argument("--refine-storage", default="device",
                        choices=["device", "host"],
                        help="where the bf16 refine rows live "
                             "(host = out of HBM, numpy rescore)")
    parser.add_argument("--index-type", default="approx",
                        choices=["approx", "exact", "clustered"],
                        help="serving engine; clustered (cell-probe) is "
                             "the CPU B=1 recommendation — it sweeps only "
                             "nprobe cells instead of the whole corpus")
    parser.add_argument("--cluster-rows", type=int, default=256)
    parser.add_argument("--nprobe", type=int, default=64)
    parser.add_argument("--data-centers", type=int, default=0,
                        help=">0 draws corpus rows from this many gaussian "
                             "centers (noise --data-noise) so the clustered "
                             "engine is measured on data it can actually "
                             "cluster; 0 = uniform random")
    parser.add_argument("--data-noise", type=float, default=0.05)
    parser.add_argument("--model", default=None,
                        help="student checkpoint (default: tiny random)")
    parser.add_argument("--arch", default="tiny", choices=["tiny", "e5"],
                        help="random-weight student arch when no --model: "
                             "'e5' = e5-small-v2 shape (12L/384H) for "
                             "honest encode cost")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--out", default=None,
                        help="also write the JSON report to this path")
    parser.add_argument("--cache", action="store_true",
                        help="enable the result cache (configs/service.yaml "
                             "cache: block) and add a cache-hit-path "
                             "measurement after the distinct-query ladder")
    args = parser.parse_args(argv)

    from sskd_tpu.utils.logging import setup_logging
    from sskd_tpu.utils.platform import apply_platform

    setup_logging()
    apply_platform(args.platform)

    import jax.numpy as jnp
    import numpy as np

    import sskd_tpu.serve.app as app_module
    from sskd_tpu.config import Settings
    from sskd_tpu.index.builder import IndexBuilder
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.serve.http import Server

    # --- model + index -----------------------------------------------------
    if args.model:
        student = StudentModel(args.model)
    elif args.arch == "e5":
        student = StudentModel(
            "bench-student-e5",
            config=BertConfig.e5_small_v2(compute_dtype=jnp.bfloat16),
        )
    else:
        student = StudentModel("bench-student", config=BertConfig.tiny())
    rng = np.random.default_rng(0)
    dim = student.embedding_dim
    if args.data_centers > 0:
        centers = rng.standard_normal((args.data_centers, dim)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        emb = centers[rng.integers(0, args.data_centers, args.rows)]
        emb = emb + args.data_noise * rng.standard_normal(
            (args.rows, dim)
        ).astype(np.float32)
    else:
        emb = rng.standard_normal((args.rows, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    builder = IndexBuilder(
        embedding_dim=dim,
        dtype=args.dtype,
        index_type=args.index_type,
        cluster_rows=args.cluster_rows,
        nprobe=args.nprobe,
        refine_m=args.refine_m,
        refine_storage=args.refine_storage,
    )
    builder.build_from_arrays(emb, [f"d{i}" for i in range(args.rows)])
    # recall of the SERVED engine config vs f32 brute force on 50 held-out
    # embedding-space probes — recorded so a fast-but-lossy config can't
    # masquerade as a win in the committed artifact
    probes = emb[rng.integers(0, args.rows, 50)] + 0.01 * rng.standard_normal(
        (50, dim)
    ).astype(np.float32)
    probes /= np.linalg.norm(probes, axis=1, keepdims=True)
    gt = np.argsort(-(probes @ emb.T), axis=1)[:, :10]
    _, got = builder.search(probes, k=10)
    engine_recall = float(
        np.mean(
            [len(set(got[i].tolist()) & set(gt[i].tolist())) / 10 for i in range(50)]
        )
    )

    # --- boot the real service ---------------------------------------------
    settings = Settings.model_validate(
        {
            "service": {"micro_batch_window_ms": 2.0, "micro_batch_max_size": 64},
            # the distinct-query ladder below never repeats a query, so the
            # engine numbers are cache-independent; --cache additionally
            # measures the hit path on a repeated query
            "cache": {"enabled": bool(args.cache)},
            # /index/load constructs its own builder: the refine-storage
            # deployment knob must ride settings to reach the served index
            "index": {"refine_storage": args.refine_storage},
        }
    )
    app = app_module.create_app(settings=settings)
    app_module.StudentModel = lambda *a, **k: student  # inject

    port = args.port or _free_port()
    server = Server(app, host="127.0.0.1", port=port)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    _wait_ready(port)

    # hot-load the index through the API (exercises the real path); the
    # index is scratch — only the JSON report is a committed artifact
    import tempfile

    idx_dir = Path(tempfile.mkdtemp(prefix="bench_serving_")) / "index"
    builder.save(idx_dir)
    _post(port, "/index/load", {"index_dir": str(idx_dir)})

    # --- drive -------------------------------------------------------------
    # every request textually DISTINCT across the WHOLE run (not just within
    # one level): the tunnel serves repeated identical device computations
    # from a result cache (see bench.py fwd_slope_ms), and with --cache the
    # service's own result cache would serve repeats — either way cycling a
    # small query set would underbill the encode+sweep stages. itertools
    # .count() is atomic in CPython, so concurrent workers never collide.
    import itertools

    words = ["alpha", "bravo", "carbon", "delta", "ember", "falcon", "granite",
             "harbor", "indigo", "jasper", "kettle", "lumen", "marble"]
    _uid = itertools.count()

    def hit(_i):
        i = next(_uid)
        q = f"benchmark {words[i % 13]} query {words[(i // 13) % 13]} number {i}"
        t0 = time.perf_counter()
        body = _post(port, "/search", {"query": q, "k": args.k})
        return (time.perf_counter() - t0) * 1000, body["total_results"]

    for i in range(8):  # warm compile buckets
        hit(i)

    levels = [int(x) for x in args.levels.split(",") if x]
    by_level = []
    all_correct = True
    for workers in levels:
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(hit, range(2 * workers)))  # warm the level
            t0 = time.perf_counter()
            results = list(ex.map(hit, range(args.requests)))
            wall = time.perf_counter() - t0
        lats = sorted(t for t, _ in results)
        all_correct = all_correct and all(n == args.k for _, n in results)
        by_level.append(
            {
                "concurrency": workers,
                "req_per_s": round(args.requests / wall, 1),
                "p50_ms": round(lats[len(lats) // 2], 1),
                "p95_ms": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 1),
                "p99_ms": round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 1),
            }
        )

    seq = sorted(hit(i)[0] for i in range(30))
    best = max(by_level, key=lambda r: r["req_per_s"])

    # --- cache-hit path (--cache): the reference documented a TTL result
    # cache (scaling-and-performance.md "Caching Strategies") but never
    # shipped one; sskd_tpu/serve/cache.py implements it. Measure the hit
    # path on a REPEATED query — every request above is textually distinct,
    # so the ladder's engine numbers are cache-independent.
    cache_block = None
    if args.cache:
        cq = "repeated cache benchmark query"
        first = _post(port, "/search", {"query": cq, "k": args.k})
        lats_hit = []
        all_hits = first.get("cached") is False  # first fill must be a miss
        for _ in range(100):
            t0 = time.perf_counter()
            body = _post(port, "/search", {"query": cq, "k": args.k})
            lats_hit.append((time.perf_counter() - t0) * 1000)
            all_hits = all_hits and body.get("cached") is True

        def hit_cached(_i):
            t0 = time.perf_counter()
            body = _post(port, "/search", {"query": cq, "k": args.k})
            return (time.perf_counter() - t0) * 1000, body.get("cached") is True

        with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
            t0 = time.perf_counter()
            res = list(ex.map(hit_cached, range(args.requests)))
            wall = time.perf_counter() - t0
        all_hits = all_hits and all(c for _, c in res)
        lats_hit.sort()
        cache_block = {
            "hit_p50_ms": round(lats_hit[len(lats_hit) // 2], 2),
            "hit_p95_ms": round(lats_hit[min(len(lats_hit) - 1,
                                             int(len(lats_hit) * 0.95))], 2),
            "hit_req_per_s_c16": round(args.requests / wall, 1),
            "all_hits": all_hits,
            "miss_p50_ms": None,  # filled below from the distinct-query seq
        }

    # Device-dispatch floor: on this host the TPU rides a tunnel whose
    # round-trip dominates small ops (documented timing-artifact mode —
    # docs/operations/runbook). Measure the per-dispatch floor with a
    # 1-element device op so the record can subtract it explicitly; on a
    # local chip this measures dispatch overhead (~0.1 ms) and the
    # subtraction is a no-op. VERDICT r4 item 4.
    import jax

    tiny = jnp.ones((1,), jnp.float32)
    tiny_fn = jax.jit(lambda x: x + 1.0)
    tiny_fn(tiny).block_until_ready()  # compile outside the timed loop
    floors = []
    for _ in range(30):
        t0 = time.perf_counter()
        tiny_fn(tiny).block_until_ready()
        floors.append((time.perf_counter() - t0) * 1000)
    floor_ms = round(sorted(floors)[len(floors) // 2], 2)
    # the /search path costs ~2 device dispatches (encode, sweep) unless
    # the fused searcher collapses them to 1
    seq_p50 = round(seq[len(seq) // 2], 1)
    report = {
        "metric": "serving_req_per_s",
        "value": best["req_per_s"],
        "unit": "req/s",
        "detail": {
            "rows": args.rows,
            "dtype": args.dtype,
            "index_type": args.index_type,
            "nprobe": args.nprobe if args.index_type == "clustered" else None,
            "data_centers": args.data_centers or None,
            "engine_recall_at_10": engine_recall,
            "refine_m": args.refine_m,
            "refine_storage": args.refine_storage if args.refine_m else None,
            "student_arch": (args.model or args.arch),
            "requests_per_level": args.requests,
            "sequential_p50_ms": seq_p50,
            "device_dispatch_floor_ms": floor_ms,
            "backend": jax.default_backend(),
            "sequential_p50_ms_minus_2x_floor": round(
                max(0.0, seq_p50 - 2 * floor_ms), 1
            ),
            "by_concurrency": by_level,
            "all_correct": all_correct,
            "result_cache": (
                {**cache_block, "miss_p50_ms": seq_p50}
                if cache_block is not None
                else None
            ),
            "reference": {
                "p50_p95_p99_ms": [12, 35, 78],
                "req_per_s_range": [80, 1800],
                "setup": "Cloud Run 8 vCPU, ONNX INT8, 100k HNSW "
                         "(ref scaling-and-performance.md:305-330)",
            },
        },
    }
    print(json.dumps(report))
    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(report, indent=2) + "\n")
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
