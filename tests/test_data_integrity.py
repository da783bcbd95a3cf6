"""Data integrity smoke suite — the file the reference's Makefile referenced
but never committed (reference: Makefile:69, SURVEY.md 4.4). End-to-end:
generate -> prepare -> corrupt in every supported way -> detect."""

import json

import pandas as pd
import pytest

from sskd_tpu.data.demo import generate_demo_dataset
from sskd_tpu.data.integrity import check_dataset_integrity, require_integrity
from sskd_tpu.data.prepare import prepare_dataset
from sskd_tpu.data.registry import ensure_dirs, get_chunks_path, get_raw_dir, get_raw_path
from sskd_tpu.exceptions import DataIntegrityError


@pytest.fixture
def prepared(tmp_path):
    ensure_dirs(tmp_path, "demo")
    generate_demo_dataset(get_raw_dir(tmp_path, "demo"), num_samples=16)
    prepare_dataset(tmp_path, dataset="demo")
    return tmp_path


def test_clean_dataset_passes(prepared):
    assert check_dataset_integrity(prepared, "demo")["ok"]


def test_missing_manifest_detected(prepared):
    (get_raw_dir(prepared, "demo") / "_manifest.json").unlink()
    assert not check_dataset_integrity(prepared, "demo")["ok"]


def test_truncated_raw_detected(prepared):
    raw = get_raw_path(prepared, "demo", "validation")
    lines = raw.read_text().splitlines()
    raw.write_text("\n".join(lines[:-1]) + "\n")
    report = check_dataset_integrity(prepared, "demo")
    assert any("lines != manifest" in p for p in report["problems"])


def test_missing_parquet_detected(prepared):
    get_chunks_path(prepared, "demo", "train").unlink()
    report = check_dataset_integrity(prepared, "demo")
    assert any("missing prepared parquet" in p for p in report["problems"])


def test_duplicate_chunk_ids_detected(prepared):
    pq = get_chunks_path(prepared, "demo", "train")
    df = pd.read_parquet(pq)
    pd.concat([df, df.head(2)]).to_parquet(pq, index=False)
    report = check_dataset_integrity(prepared, "demo")
    assert any("duplicate" in p for p in report["problems"])


def test_empty_text_detected(prepared):
    pq = get_chunks_path(prepared, "demo", "train")
    df = pd.read_parquet(pq)
    df.loc[df.index[0], "text"] = ""
    df.to_parquet(pq, index=False)
    report = check_dataset_integrity(prepared, "demo")
    assert any("empty text" in p for p in report["problems"])


def test_require_integrity_raises_with_problem_list(prepared):
    raw = get_raw_path(prepared, "demo", "train")
    raw.write_text(raw.read_text() + json.dumps({"query_id": 999, "query": "x"}) + "\n")
    with pytest.raises(DataIntegrityError) as err:
        require_integrity(prepared, "demo")
    assert err.value.details["problems"]
