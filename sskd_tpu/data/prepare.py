"""Raw JSONL -> chunked Parquet preparation (reference: src/data/prepare.py).

Handles both MS MARCO v2.1 layouts the reference handled
(reference: prepare.py:16-135): the nested
``passages{passage_text[], is_selected[]}`` dict and the legacy list of
passage dicts. Long passages are chunked with the sliding-window
TextChunker (512 tokens / stride 80 in the pipeline,
reference: scripts/train_kd_pipeline.py:139-151) and every chunk becomes a
row with the reference's schema:
``{chunk_id, doc_id, query_id, query_text, text, tokens, is_relevant,
split, updated_at}`` (reference: prepare.py row shape), written as
snappy Parquet + ``_manifest.json``.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from sskd_tpu.data.registry import get_chunks_dir, get_raw_path
from sskd_tpu.exceptions import DataError
from sskd_tpu.utils.chunk import TextChunker
from sskd_tpu.utils.logging import get_logger

logger = get_logger("data.prepare")

REQUIRED_COLUMNS = (
    "chunk_id",
    "doc_id",
    "query_id",
    "query_text",
    "text",
    "tokens",
    "is_relevant",
    "split",
    "updated_at",
)


def _iter_passages(row: dict):
    """Yield (passage_text, is_selected) from either MS MARCO layout."""
    passages = row.get("passages")
    if passages is None:
        return
    if isinstance(passages, dict):  # v2.1 nested layout
        texts = passages.get("passage_text", [])
        selected = passages.get("is_selected", [0] * len(texts))
        for text, sel in zip(texts, selected):
            yield text, int(sel)
    elif isinstance(passages, list):  # legacy list-of-dicts layout
        for p in passages:
            yield p.get("passage_text", ""), int(p.get("is_selected", 0))
    else:
        raise DataError(f"unrecognized passages layout: {type(passages)}")


def prepare_msmarco_split(
    data_dir: str | Path,
    split: str,
    dataset: str = "msmarco",
    chunker: TextChunker | None = None,
    max_tokens: int = 512,
    stride: int = 80,
    max_samples: int | None = None,
) -> Path:
    """One split: JSONL -> chunked parquet (reference: prepare.py:16-135)."""
    import pandas as pd

    raw_path = get_raw_path(data_dir, dataset, split)
    if not raw_path.exists():
        raise DataError(f"raw split not found: {raw_path}")
    chunker = chunker or TextChunker(max_tokens=max_tokens, stride=stride)

    now = datetime.now(timezone.utc).isoformat()
    rows = []
    n_queries = 0
    with open(raw_path) as f:
        for line in f:
            if max_samples and n_queries >= max_samples:
                break
            row = json.loads(line)
            qid = str(row.get("query_id", n_queries))
            qtext = row.get("query", "")
            n_queries += 1
            for pi, (text, selected) in enumerate(_iter_passages(row)):
                doc_id = f"{qid}_passage_{pi}"
                chunks = chunker.chunk_text(text) or []
                for chunk in chunks:
                    rows.append(
                        {
                            "chunk_id": f"{doc_id}_c{chunk.chunk_index}",
                            "doc_id": doc_id,
                            "query_id": qid,
                            "query_text": qtext,
                            "text": chunk.text,
                            "tokens": chunk.num_tokens,
                            "is_relevant": selected,
                            "split": split,
                            "updated_at": now,
                        }
                    )
    if not rows:
        raise DataError(f"no rows produced from {raw_path}")
    df = pd.DataFrame(rows, columns=list(REQUIRED_COLUMNS))
    out_dir = get_chunks_dir(data_dir, dataset)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{split}.parquet"
    df.to_parquet(out_path, compression="snappy", index=False)
    logger.info(f"prepared {dataset}/{split}: {n_queries} queries -> {len(df)} chunks")
    return out_path


def prepare_dataset(
    data_dir: str | Path,
    dataset: str = "msmarco",
    splits: tuple[str, ...] = ("train", "validation"),
    max_tokens: int = 512,
    stride: int = 80,
    max_samples: int | None = None,
) -> dict:
    """All splits + manifest (reference: prepare.py:206-299)."""
    chunker = TextChunker(max_tokens=max_tokens, stride=stride)
    manifest: dict = {"dataset": dataset, "splits": {}}
    for split in splits:
        path = prepare_msmarco_split(
            data_dir,
            split,
            dataset=dataset,
            chunker=chunker,
            max_samples=max_samples,
        )
        import pandas as pd

        n = len(pd.read_parquet(path, columns=["chunk_id"]))
        manifest["splits"][split] = {"file": str(path), "num_chunks": n}
    out_dir = get_chunks_dir(data_dir, dataset)
    with open(out_dir / "_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
