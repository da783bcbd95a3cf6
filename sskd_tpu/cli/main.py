"""semantic-kd CLI — the reference declared this entry point but never
committed it (reference: pyproject.toml:61 ``semantic-kd = src.cli.main:app``
with an empty src/cli/, SURVEY.md L8 "phantom Typer CLI"). Implemented for
real, argparse-based, covering the reference's Makefile verbs and scripts.

Usage examples:
  semantic-kd demo-data --out data/raw/demo --samples 200
  semantic-kd prepare --data-dir data --dataset demo
  semantic-kd integrity --data-dir data --dataset demo
  semantic-kd train --data-dir data --dataset demo --stage 2 --epochs 3
  semantic-kd index build --model artifacts/models/kd_student/best_model \\
      --data data/chunks/demo/train.parquet --out artifacts/index
  semantic-kd index validate --dir artifacts/index
  semantic-kd eval --model ... --data ...
  semantic-kd serve --port 8000 --index artifacts/index
  semantic-kd export --model ... --out ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_platform_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (cpu/tpu); overrides host pinning",
    )
    p.add_argument("--cpu-devices", type=int, default=None, help="virtual CPU device count")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="semantic-kd",
        description="TPU-native semantic-search + knowledge-distillation framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("demo-data", help="generate the offline synthetic dataset")
    p.add_argument("--out", default="data/raw/demo")
    p.add_argument("--samples", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--splits",
        default="train=0.8,validation=0.2",
        help="name=fraction list, e.g. train=0.7,validation=0.15,test=0.15",
    )
    p.add_argument(
        "--see-also",
        type=int,
        default=0,
        help="lexical-trap tail words per doc (query-side words of OTHER "
        "concepts). 0 = calibrated demo default: tails put query vocabulary "
        "into irrelevant docs, which a shared-embedding bi-encoder cannot "
        "fully gate — measured KD/teacher 0.86 with tails vs 0.97 without "
        "at the same budget, while the task stays de-saturated",
    )
    p.add_argument("--n-hard", type=int, default=3, help="hard distractors per query")
    _add_platform_arg(p)

    p = sub.add_parser("prepare", help="chunk raw JSONL to parquet")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--dataset", default="demo")
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--stride", type=int, default=80)
    p.add_argument("--max-samples", type=int, default=None)
    _add_platform_arg(p)

    p = sub.add_parser("integrity", help="verify dataset integrity")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--dataset", default="demo")
    _add_platform_arg(p)

    p = sub.add_parser("train", help="run the end-to-end KD training pipeline")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--dataset", default="demo")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--stage", type=int, default=None, choices=[1, 2, 3])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--tiny", action="store_true", help="tiny architectures (demo/CI)")
    p.add_argument(
        "--student-arch",
        default="tiny",
        choices=["tiny", "demo"],
        help="with --tiny: student size — 'tiny' (2L/64H, CI-fast) or "
        "'demo' (4L/128H; the from-scratch bi-encoder needs the extra "
        "capacity to close on the cross-encoder teacher in the ablation)",
    )
    p.add_argument(
        "--save-init",
        default=None,
        help="save the untrained student here before training (the fair "
        "'vanilla' baseline for KD ablations)",
    )
    p.add_argument(
        "--dev-data",
        default=None,
        help="held-out raw JSONL: full-corpus retrieval nDCG@10 on it drives "
        "early stopping and best-model selection",
    )
    p.add_argument("--data-parallel", type=int, default=None,
                   help="DP mesh size (default: mesh.data_parallel setting)")
    _add_platform_arg(p)

    p = sub.add_parser(
        "train-teacher",
        help="train the cross-encoder teacher on relevance labels "
        "(zero-egress stand-in for the hub-pretrained reranker)",
    )
    p.add_argument("--data-dir", default="data")
    p.add_argument("--dataset", default="demo")
    p.add_argument("--out", required=True, help="teacher checkpoint dir")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--max-len", type=int, default=64)
    p.add_argument("--tiny", action="store_true")
    _add_platform_arg(p)

    p = sub.add_parser("index", help="vector index operations")
    index_sub = p.add_subparsers(dest="index_command", required=True)
    pb = index_sub.add_parser("build", help="encode a corpus parquet and build the index")
    pb.add_argument("--model", required=True)
    pb.add_argument("--data", required=True, help="prepared corpus parquet")
    pb.add_argument("--out", required=True)
    pb.add_argument("--batch-size", type=int, default=256)
    pb.add_argument("--max-docs", type=int, default=None)
    pb.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16", "int8", "int4"],
                    help="default: index.dtype setting")
    pb.add_argument("--method", default=None,
                    choices=["exact", "approx", "clustered"],
                    help="default: index.search_method setting")
    pb.add_argument("--refine-m", type=int, default=None,
                    help="int8+approx: candidates for the exact bf16 "
                    "rescore stage (default: index.refine_m setting; "
                    "0 disables)")
    pb.add_argument("--tiny", action="store_true")
    _add_platform_arg(pb)
    pv = index_sub.add_parser("validate", help="recall gate vs brute force")
    pv.add_argument("--dir", required=True)
    pv.add_argument("--queries", type=int, default=None,
                    help="default: index.validation_queries setting")
    pv.add_argument("--k", type=int, default=10)
    pv.add_argument("--min-recall", type=float, default=None,
                    help="default: index.validation_recall_at_10 setting")
    pv.add_argument("--nprobe", type=int, default=None,
                    help="clustered indexes: override the saved nprobe for "
                    "this validation (a query-time knob — no rebuild needed; "
                    "serve honors SEMANTIC_KD_INDEX__NPROBE the same way)")
    _add_platform_arg(pv)

    p = sub.add_parser("eval", help="retrieval evaluation of a model over raw JSONL")
    p.add_argument("--model", required=True)
    p.add_argument("--data", required=True, help="raw JSONL (msmarco layout)")
    p.add_argument("--max-samples", type=int, default=200)
    p.add_argument("--out", default=None, help="write metrics JSON here")
    p.add_argument("--tiny", action="store_true")
    p.add_argument(
        "--teacher",
        action="store_true",
        help="the model is a cross-encoder teacher checkpoint (ranks by pair scoring)",
    )
    _add_platform_arg(p)

    p = sub.add_parser(
        "eval-beir",
        help="doc-level retrieval eval over a prepared BEIR corpus "
        "(chunk top-k + MaxSim doc aggregation)",
    )
    p.add_argument("--model", required=True)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--dataset", required=True, help="e.g. fiqa / scifact / trec-covid")
    p.add_argument("--max-queries", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--tiny", action="store_true")
    _add_platform_arg(p)

    p = sub.add_parser("compare", help="3-way compare + acceptance gate")
    p.add_argument("--kd-model", required=True)
    p.add_argument("--vanilla-model", required=True)
    p.add_argument(
        "--teacher-model",
        default=None,
        help="teacher checkpoint: adds the teacher row and enforces the "
        ">=95%%-of-teacher acceptance gate (reference: evaluate_and_compare.py:129-134)",
    )
    p.add_argument("--data", required=True)
    p.add_argument("--max-samples", type=int, default=200)
    p.add_argument("--out", default=None)
    p.add_argument("--gate-ratio", type=float, default=0.95)
    p.add_argument("--tiny", action="store_true")
    _add_platform_arg(p)

    p = sub.add_parser("serve", help="start the search service")
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--model", default=None, help="student model path")
    p.add_argument("--index", default=None, help="index dir to preload")
    p.add_argument("--device", default=None)
    p.add_argument(
        "--shards",
        type=int,
        default=None,
        help="shard the index over N chips (mesh.index_parallel)",
    )
    p.add_argument(
        "--hybrid-bm25",
        default=None,
        metavar="DIR",
        help="enable hybrid BM25+semantic fusion with this BM25 index dir",
    )
    p.add_argument(
        "--workers",
        type=int,
        default=None,
        help="CPU-serving worker processes sharing the port via "
        "SO_REUSEPORT (default service.workers; ignored with a warning "
        "on TPU — one process owns the chip)",
    )
    _add_platform_arg(p)

    p = sub.add_parser("export", help="quantized index-matrix / model export")
    p.add_argument("--model", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--skip-validate", action="store_true")
    _add_platform_arg(p)

    p = sub.add_parser("config", help="print the resolved settings tree")
    p.add_argument("--production-audit", action="store_true")
    _add_platform_arg(p)

    p = sub.add_parser(
        "doctor",
        help="environment diagnostics: backend, devices, native libs, "
        "caches, index dir health",
    )
    p.add_argument("--index", default=None, help="index dir to inspect")
    _add_platform_arg(p)

    return parser


def _tiny_student(path_or_name: str, tiny: bool):
    from sskd_tpu.models import StudentModel

    if tiny and not Path(path_or_name).is_dir():
        from sskd_tpu.models import BertConfig

        return StudentModel(path_or_name, config=BertConfig.tiny())
    return StudentModel(path_or_name)


def _load_eval_inputs(raw_jsonl: str, max_samples: int):
    # graded qrels (cross-query sidecar when present, else row-local
    # grades; grade == is_selected for binary data): nDCG uses the grades
    # as gains, so hard near-misses (demo grade 1) score partial credit
    from sskd_tpu.cli.pipeline import load_eval_inputs

    return load_eval_inputs(raw_jsonl, max_samples)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from sskd_tpu.utils.logging import setup_logging
    from sskd_tpu.utils.platform import apply_platform

    setup_logging()
    apply_platform(getattr(args, "platform", None), getattr(args, "cpu_devices", None))

    # multi-host slices: no-op unless SSKD_COORDINATOR/SSKD_NUM_PROCESSES set
    from sskd_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    from sskd_tpu.config import get_settings

    settings = get_settings()

    if args.command == "demo-data":
        from sskd_tpu.data.demo import generate_demo_dataset

        split_spec = [part.split("=") for part in args.splits.split(",")]
        manifest = generate_demo_dataset(
            args.out,
            num_samples=args.samples,
            seed=args.seed,
            splits=tuple(name for name, _ in split_spec),
            split_fractions=tuple(float(f) for _, f in split_spec),
            see_also=args.see_also,
            n_hard=args.n_hard,
        )
        print(json.dumps(manifest, indent=2))
        return 0

    if args.command == "prepare":
        from sskd_tpu.data.prepare import prepare_dataset

        manifest = prepare_dataset(
            args.data_dir,
            dataset=args.dataset,
            max_tokens=args.max_tokens,
            stride=args.stride,
            max_samples=args.max_samples,
        )
        print(json.dumps(manifest, indent=2))
        return 0

    if args.command == "integrity":
        from sskd_tpu.data.integrity import check_dataset_integrity

        report = check_dataset_integrity(args.data_dir, args.dataset)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 1

    if args.command == "train":
        from sskd_tpu.cli.pipeline import run_train_pipeline

        if args.batch_size:
            settings = settings.model_copy(deep=True)
            settings.training.batch_size = args.batch_size
        student_config = teacher_config = None
        if args.tiny:
            from sskd_tpu.models import BertConfig

            student_config = (
                BertConfig.demo_teacher()
                if getattr(args, "student_arch", "tiny") == "demo"
                else BertConfig.tiny()
            )
            teacher_config = BertConfig.tiny()
        mesh = None
        if args.data_parallel is None:
            dp_setting = settings.mesh.data_parallel
            args.data_parallel = dp_setting if dp_setting > 0 else 1
        if args.data_parallel > 1:
            from sskd_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(data_parallel=args.data_parallel, index_parallel=1)
        result = run_train_pipeline(
            settings,
            data_dir=args.data_dir,
            output_dir=args.output_dir,
            dataset=args.dataset,
            max_samples=args.max_samples,
            stage=args.stage,
            epochs=args.epochs,
            student_config=student_config,
            teacher_config=teacher_config,
            mesh=mesh,
            save_init_to=args.save_init,
            dev_data=args.dev_data,
        )
        print(json.dumps({k: v for k, v in result.items() if k != "history"}, indent=2))
        return 0

    if args.command == "train-teacher":
        from sskd_tpu.data.registry import get_raw_path
        from sskd_tpu.kd.teacher_train import TeacherTrainer, triples_from_raw
        from sskd_tpu.models import TeacherModel

        raw = get_raw_path(args.data_dir, args.dataset, "train")
        triples = triples_from_raw(raw, max_samples=args.max_samples)
        teacher_config, tokenizer = None, None
        if args.tiny:
            from sskd_tpu.models import BertConfig
            from sskd_tpu.tokenization import WordPieceTokenizer

            # corpus-fitted vocab: the bundled default tokenizer is a tiny
            # fallback whose near-character pieces make topic matching
            # needlessly hard for the 2L demo model
            texts = sorted({q for q, _, _ in triples} | {d for _, d, _ in triples})
            tokenizer = WordPieceTokenizer.build_from_corpus(texts, vocab_size=2048)
            teacher_config = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
        teacher = TeacherModel(
            settings.teacher.model_name,
            config=teacher_config,
            tokenizer=tokenizer,
            max_seq_length=settings.teacher.max_seq_length,
        )
        result = TeacherTrainer(
            teacher,
            learning_rate=args.lr,
            rng_impl=settings.training.rng_impl,
        ).train(
            triples,
            steps=args.steps,
            batch_size=args.batch_size,
            max_len=args.max_len,
        )
        teacher.save(args.out)
        print(
            json.dumps(
                {
                    "out": args.out,
                    "steps": result["steps"],
                    "final_loss": result["final_loss"],
                    "heldout_pair_accuracy": result["heldout_pair_accuracy"],
                    "num_triples": len(triples),
                },
                indent=2,
            )
        )
        return 0

    if args.command == "index":
        from sskd_tpu.index.builder import IndexBuilder

        if args.index_command == "build":
            student = _tiny_student(args.model, args.tiny)
            builder = IndexBuilder(
                embedding_dim=student.embedding_dim,
                dtype=args.dtype or settings.index.dtype,
                index_type=args.method or settings.index.search_method,
                metric=settings.index.metric,
                block_rows=settings.index.block_rows,
                recall_target=settings.index.recall_target,
                cluster_rows=settings.index.cluster_rows,
                nprobe=settings.index.nprobe,
                refine_m=(
                    args.refine_m
                    if args.refine_m is not None
                    else settings.index.refine_m
                ),
                refine_storage=settings.index.refine_storage,
            )
            builder.build_from_parquet(
                student, args.data, batch_size=args.batch_size, max_docs=args.max_docs
            )
            builder.save(args.out)
            print(json.dumps({"ntotal": builder.ntotal, "out": args.out}))
            return 0
        if args.index_command == "validate":
            builder = IndexBuilder().load(args.dir)
            if args.nprobe is not None:
                builder.nprobe = args.nprobe
            n_queries = args.queries or settings.index.validation_queries
            min_recall = (
                args.min_recall
                if args.min_recall is not None
                else settings.index.validation_recall_at_10
            )
            report = builder.validate(n_queries=n_queries, k=args.k)
            report["passed"] = report[f"recall@{args.k}"] >= min_recall
            print(json.dumps(report, indent=2))
            return 0 if report["passed"] else 1

    if args.command == "eval":
        from sskd_tpu.kd.eval import KDEvaluator

        q_map, corpus, qrels = _load_eval_inputs(args.data, args.max_samples)
        ev = KDEvaluator()
        if args.teacher:
            from sskd_tpu.models import TeacherModel

            teacher = TeacherModel(args.model)
            metrics = ev.evaluate_retrieval_teacher(teacher, q_map, corpus, qrels)
        else:
            model = _tiny_student(args.model, args.tiny)
            metrics = ev.evaluate_retrieval(model, q_map, corpus, qrels)
        print(json.dumps(metrics, indent=2))
        if args.out:
            Path(args.out).parent.mkdir(parents=True, exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(metrics, f, indent=2)
        return 0

    if args.command == "eval-beir":
        from sskd_tpu.data.prepare import load_beir_eval
        from sskd_tpu.kd.eval import KDEvaluator

        queries, chunks_df, qrels = load_beir_eval(
            args.data_dir, args.dataset, max_queries=args.max_queries
        )
        model = _tiny_student(args.model, args.tiny)
        metrics = KDEvaluator().evaluate_retrieval_chunked(
            model,
            queries,
            chunks_df["text"].tolist(),
            chunks_df["doc_id"].tolist(),
            qrels,
        )
        print(json.dumps(metrics, indent=2))
        if args.out:
            Path(args.out).parent.mkdir(parents=True, exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(metrics, f, indent=2)
        return 0

    if args.command == "compare":
        from sskd_tpu.kd.eval import KDEvaluator

        kd = _tiny_student(args.kd_model, args.tiny)
        vanilla = _tiny_student(args.vanilla_model, args.tiny)
        q_map, corpus, qrels = _load_eval_inputs(args.data, args.max_samples)
        ev = KDEvaluator()
        results = {
            "kd_student": ev.evaluate_retrieval(kd, q_map, corpus, qrels),
            "vanilla": ev.evaluate_retrieval(vanilla, q_map, corpus, qrels),
        }
        gate = None
        if args.teacher_model:
            from sskd_tpu.models import TeacherModel

            teacher = TeacherModel(args.teacher_model)
            results["teacher"] = ev.evaluate_retrieval_teacher(
                teacher, q_map, corpus, qrels
            )
            teacher_ndcg = results["teacher"].get("ndcg@10", 0.0)
            gate = {
                "teacher_ndcg@10": teacher_ndcg,
                "threshold": args.gate_ratio * teacher_ndcg,
                "kd_passes": bool(
                    results["kd_student"].get("ndcg@10", 0.0)
                    >= args.gate_ratio * teacher_ndcg
                ),
            }
        report = KDEvaluator.generate_report(results, title="Model comparison")
        if gate is not None:
            status = "PASSED" if gate["kd_passes"] else "FAILED"
            report += (
                f"\nAcceptance gate (KD >= {args.gate_ratio:.0%} of teacher "
                f"nDCG@10 = {gate['threshold']:.4f}): **{status}**\n"
            )
        print(report)
        if args.out:
            with open(args.out, "w") as f:
                f.write(report)
        if gate is not None and not gate["kd_passes"]:
            return 1
        return 0

    if args.command == "serve":
        import os

        from sskd_tpu.serve.app import create_app
        from sskd_tpu.serve.http import Server
        from sskd_tpu.serve.supervisor import is_worker, reexec_argv, supervise
        from sskd_tpu.utils.logging import get_logger

        if settings.service.log_level != "info":
            # service.log_level (reference: src/config.py:214) — rebuild the
            # sink at the configured threshold
            setup_logging(level=settings.service.log_level, force=True)
        elif settings.debug:
            setup_logging(level="debug", force=True)

        n_workers = (
            args.workers if args.workers is not None else settings.service.workers
        )
        if n_workers > 1 and not is_worker():
            plat = getattr(args, "platform", None) or os.environ.get(
                "SSKD_PLATFORM"
            )
            if plat != "cpu":
                # one process owns a TPU chip: local forks would fight over
                # it — TPU serving scales with replicas/index shards
                get_logger("cli").warning(
                    f"service.workers={n_workers} ignored on non-cpu "
                    "platform; serving single-process (scale TPU serving "
                    "with replicas/shards)"
                )
            else:
                return supervise(reexec_argv(), n_workers)

        if args.shards or args.hybrid_bm25:
            settings = settings.model_copy(deep=True)
            if args.shards:
                settings.mesh.index_parallel = args.shards
            if args.hybrid_bm25:
                settings.search.hybrid.enabled = True
                settings.search.hybrid.bm25_index_path = args.hybrid_bm25
        app = create_app(
            settings=settings,
            student_model_path=args.model,
            device=args.device,
            preload_index_dir=args.index,
        )
        server = Server(
            app,
            host=args.host or settings.service.host,
            port=args.port or settings.service.port,
            read_timeout=settings.service.read_timeout_s,
            idle_timeout=settings.service.idle_timeout_s,
            max_connections=settings.service.max_connections,
            reuse_port=is_worker(),
        )
        metrics_port = settings.monitoring.prometheus_port
        if metrics_port and settings.monitoring.prometheus_enabled:
            # separate internal metrics listener (the reference declared
            # prometheus_port but never served it): both servers share one
            # loop; a single drain handler stops both on SIGTERM/SIGINT
            import asyncio
            import signal

            from sskd_tpu.serve import metrics as m
            from sskd_tpu.serve.http import App as _App
            from sskd_tpu.serve.http import Response as _Response

            mapp = _App()

            @mapp.get(settings.monitoring.prometheus_path)
            async def _metrics(request):
                return _Response(
                    m.render(),
                    media_type="text/plain; version=0.0.4; charset=utf-8",
                )

            mserver = Server(
                mapp, host="0.0.0.0", port=metrics_port, handle_signals=False
            )
            server.handle_signals = False

            async def _run_both():
                loop = asyncio.get_running_loop()

                def _drain():
                    for s in (server, mserver):
                        if not s._closing:
                            asyncio.ensure_future(s.shutdown())

                for sig in (signal.SIGTERM, signal.SIGINT):
                    try:
                        loop.add_signal_handler(sig, _drain)
                    except (NotImplementedError, RuntimeError):
                        pass
                await asyncio.gather(server.serve(), mserver.serve())

            asyncio.run(_run_both())
            return 0
        server.run()
        return 0

    if args.command == "export":
        from sskd_tpu.models.export import export_student_model

        model = _tiny_student(args.model, tiny=False)
        report = export_student_model(
            model, args.out, validate=not args.skip_validate
        )
        print(json.dumps(report, indent=2))
        return 0

    if args.command == "config":
        print(json.dumps(settings.model_dump(mode="json"), indent=2))
        if args.production_audit:
            problems = settings.validate_for_production()
            print(json.dumps({"production_problems": problems}, indent=2))
            return 0 if not problems else 1
        return 0

    if args.command == "doctor":
        from sskd_tpu.utils.doctor import run_doctor

        report = run_doctor(index_dir=args.index, settings=settings)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 1

    return 2


if __name__ == "__main__":
    sys.exit(main())
