"""CLI + pipeline tests — the real version of the reference's phantom
src/cli/main.py (SURVEY.md L8) exercised command-by-command in-process."""

import json

import pytest

from sskd_tpu.cli.main import main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """demo-data -> prepare once for the whole module."""
    root = tmp_path_factory.mktemp("cliws")
    data_dir = root / "data"
    rc = main(
        [
            "demo-data",
            "--out",
            str(data_dir / "raw" / "demo"),
            "--samples",
            "24",
        ]
    )
    assert rc == 0
    rc = main(["prepare", "--data-dir", str(data_dir), "--dataset", "demo"])
    assert rc == 0
    return root


def test_integrity_command(workspace):
    assert main(["integrity", "--data-dir", str(workspace / "data"), "--dataset", "demo"]) == 0


def test_config_command(capsys):
    assert main(["config"]) == 0
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["student"]["embedding_dim"] == 384


def test_config_production_audit():
    assert main(["config", "--production-audit"]) == 1  # defaults fail the audit


def test_train_tiny_stage2_and_artifacts(workspace, capsys):
    out_dir = workspace / "run"
    rc = main(
        [
            "train",
            "--data-dir",
            str(workspace / "data"),
            "--dataset",
            "demo",
            "--output-dir",
            str(out_dir),
            "--stage",
            "2",
            "--epochs",
            "1",
            "--tiny",
            "--batch-size",
            "4",
        ]
    )
    assert rc == 0
    assert (out_dir / "best_model" / "params.msgpack").exists()
    assert (out_dir / "mined_stage2.json").exists()
    assert (out_dir / "history.json").exists()


def test_index_build_validate_eval(workspace, capsys):
    out_dir = workspace / "run"
    idx_dir = workspace / "index"
    rc = main(
        [
            "index",
            "build",
            "--model",
            str(out_dir / "best_model"),
            "--data",
            str(workspace / "data" / "chunks" / "demo" / "train.parquet"),
            "--out",
            str(idx_dir),
            "--dtype",
            "int8",
        ]
    )
    assert rc == 0
    rc = main(
        ["index", "validate", "--dir", str(idx_dir), "--queries", "20", "--k", "5",
         "--min-recall", "0.9"]
    )
    assert rc == 0
    rc = main(
        [
            "eval",
            "--model",
            str(out_dir / "best_model"),
            "--data",
            str(workspace / "data" / "raw" / "demo" / "train.jsonl"),
            "--max-samples",
            "10",
            "--out",
            str(workspace / "metrics.json"),
        ]
    )
    assert rc == 0
    metrics = json.loads((workspace / "metrics.json").read_text())
    assert "ndcg@10" in metrics


def test_index_build_clustered_method(workspace):
    """--method clustered builds a cell-probe index end-to-end through the
    CLI, persists the permutation layout, and passes validate."""
    out_dir = workspace / "run"
    idx_dir = workspace / "cidx"
    rc = main(
        [
            "index",
            "build",
            "--model",
            str(out_dir / "best_model"),
            "--data",
            str(workspace / "data" / "chunks" / "demo" / "train.parquet"),
            "--out",
            str(idx_dir),
            "--method",
            "clustered",
        ]
    )
    assert rc == 0
    assert (idx_dir / "perm.npy").exists()
    assert (idx_dir / "centroids.npy").exists()
    rc = main(
        ["index", "validate", "--dir", str(idx_dir), "--queries", "20",
         "--k", "5", "--min-recall", "0.8"]
    )
    assert rc == 0


def test_export_command(workspace):
    out_dir = workspace / "run"
    rc = main(
        [
            "export",
            "--model",
            str(out_dir / "best_model"),
            "--out",
            str(workspace / "export"),
        ]
    )
    assert rc == 0
    report = json.loads((workspace / "export" / "export_report.json").read_text())
    assert report["validation_passed"] is True
    assert report["compression_ratio"] > 1.5


def test_compare_command(workspace, capsys):
    out_dir = workspace / "run"
    rc = main(
        [
            "compare",
            "--kd-model",
            str(out_dir / "best_model"),
            "--vanilla-model",
            str(out_dir / "best_model"),
            "--data",
            str(workspace / "data" / "raw" / "demo" / "train.jsonl"),
            "--max-samples",
            "8",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "kd_student" in out and "vanilla" in out


def test_doctor_command(capsys, tmp_path):
    """`semantic-kd doctor` automates the runbook probes: required checks
    pass in this environment, a bogus index dir fails the run (exit 1)."""
    import json

    assert main(["doctor"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["ok"] is True
    for name in ("jax_device", "native_tokenizer", "dependencies"):
        assert report["checks"][name]["ok"], name
    assert report["checks"]["jax_device"]["backend"] == "cpu"

    assert main(["doctor", "--index", str(tmp_path / "nope")]) == 1
    bad = json.loads(capsys.readouterr().out)
    assert bad["ok"] is False and not bad["checks"]["index"]["ok"]
