"""Data layer tests: demo generation, prepare (both MS MARCO layouts),
integrity checks (the phantom test_data_integrity.py the reference's
Makefile referenced but never wrote — SURVEY.md 4.4)."""

import json

import pandas as pd
import pytest

from sskd_tpu.data.demo import generate_demo_dataset
from sskd_tpu.data.integrity import (
    check_dataset_integrity,
    check_no_duplicates,
    check_schema,
    compute_file_hash,
    require_integrity,
)
from sskd_tpu.data.prepare import prepare_dataset, prepare_msmarco_split
from sskd_tpu.data.registry import (
    ensure_dirs,
    get_chunks_path,
    get_dataset_config,
    get_raw_dir,
    get_raw_path,
)
from sskd_tpu.exceptions import DataIntegrityError, DatasetNotFoundError


def test_registry():
    cfg = get_dataset_config("msmarco")
    assert cfg.source == "ms_marco/v2.1"
    with pytest.raises(DatasetNotFoundError):
        get_dataset_config("nope")


def test_demo_dataset_shape(tmp_path):
    manifest = generate_demo_dataset(tmp_path / "raw" / "demo", num_samples=20)
    assert manifest["splits"]["train"]["num_samples"] == 16
    assert manifest["splits"]["validation"]["num_samples"] == 4
    with open(tmp_path / "raw" / "demo" / "train.jsonl") as f:
        row = json.loads(f.readline())
    assert "passages" in row and "passage_text" in row["passages"]
    assert 1 in row["passages"]["is_selected"]


def test_demo_deterministic(tmp_path):
    generate_demo_dataset(tmp_path / "a", num_samples=10, seed=7)
    generate_demo_dataset(tmp_path / "b", num_samples=10, seed=7)
    assert (tmp_path / "a" / "train.jsonl").read_text() == (
        tmp_path / "b" / "train.jsonl"
    ).read_text()


@pytest.fixture
def demo_data_dir(tmp_path):
    ensure_dirs(tmp_path, "demo")
    generate_demo_dataset(get_raw_dir(tmp_path, "demo"), num_samples=20)
    return tmp_path


class TestPrepare:
    def test_prepare_split(self, demo_data_dir):
        out = prepare_msmarco_split(demo_data_dir, "train", dataset="demo")
        df = pd.read_parquet(out)
        assert set(df.columns) >= {"chunk_id", "doc_id", "text", "is_relevant"}
        assert (df["is_relevant"] == 1).any()
        assert df["chunk_id"].is_unique
        # synthetic doc ids follow {qid}_passage_{i}
        assert df["doc_id"].str.contains("_passage_").all()

    def test_prepare_legacy_list_layout(self, tmp_path):
        ensure_dirs(tmp_path, "demo")
        raw = get_raw_path(tmp_path, "demo", "train")
        with open(raw, "w") as f:
            f.write(
                json.dumps(
                    {
                        "query_id": 1,
                        "query": "q",
                        "passages": [
                            {"passage_text": "legacy passage one", "is_selected": 1},
                            {"passage_text": "legacy passage two", "is_selected": 0},
                        ],
                    }
                )
                + "\n"
            )
        out = prepare_msmarco_split(tmp_path, "train", dataset="demo")
        df = pd.read_parquet(out)
        assert len(df) == 2
        assert df["is_relevant"].tolist() == [1, 0]

    def test_prepare_dataset_manifest(self, demo_data_dir):
        manifest = prepare_dataset(demo_data_dir, dataset="demo")
        assert "train" in manifest["splits"]
        assert manifest["splits"]["train"]["num_chunks"] > 0


class TestIntegrity:
    def test_file_hash_stable(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("hello")
        assert compute_file_hash(p) == compute_file_hash(p)
        p2 = tmp_path / "y.txt"
        p2.write_text("hellp")
        assert compute_file_hash(p) != compute_file_hash(p2)

    def test_integrity_ok(self, demo_data_dir):
        prepare_dataset(demo_data_dir, dataset="demo")
        report = check_dataset_integrity(demo_data_dir, "demo")
        assert report["ok"], report["problems"]

    def test_integrity_catches_truncation(self, demo_data_dir):
        prepare_dataset(demo_data_dir, dataset="demo")
        raw = get_raw_path(demo_data_dir, "demo", "train")
        lines = raw.read_text().splitlines()
        raw.write_text("\n".join(lines[:-2]) + "\n")
        report = check_dataset_integrity(demo_data_dir, "demo")
        assert not report["ok"]
        with pytest.raises(DataIntegrityError):
            require_integrity(demo_data_dir, "demo")

    def test_duplicate_and_schema_checks(self, demo_data_dir):
        prepare_dataset(demo_data_dir, dataset="demo")
        pq = get_chunks_path(demo_data_dir, "demo", "train")
        df = pd.read_parquet(pq)
        df = pd.concat([df, df.head(1)])  # duplicate a chunk id
        df.to_parquet(pq, index=False)
        assert check_no_duplicates(pq)
        df = df.drop(columns=["tokens"])
        df.to_parquet(pq, index=False)
        assert any("missing columns" in p for p in check_schema(pq))


def test_demo_qrels_only_for_eval_splits(tmp_path):
    """Cross-query qrels sidecars are emitted for eval splits only: nothing
    evaluates on train, and the text-keyed sidecar is O(queries x matching
    docs x text len) — 49 MB at 600 samples when it was written."""
    from sskd_tpu.data.demo import generate_demo_dataset

    manifest = generate_demo_dataset(
        tmp_path,
        num_samples=30,
        splits=("train", "validation", "test"),
        split_fractions=(0.7, 0.15, 0.15),
    )
    assert not (tmp_path / "train.qrels.jsonl").exists()
    assert (tmp_path / "validation.qrels.jsonl").exists()
    assert (tmp_path / "test.qrels.jsonl").exists()
    assert "qrels_file" not in manifest["splits"]["train"]
    assert "qrels_file" in manifest["splits"]["test"]
