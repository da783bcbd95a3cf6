"""Bundled synthetic dataset generator — the offline stand-in for MS MARCO.

The reference's demo pipeline pulled 200 MS MARCO samples from the HF hub
(reference: scripts/run_demo_pipeline.sh:10-14, src/data/fetch.py:31). This
host has zero egress, so the demo/e2e path generates a deterministic
synthetic corpus with the same JSONL shape as the fetcher's MS MARCO output
(nested ``passages{passage_text[], is_selected[]}``, reference:
src/data/prepare.py MS MARCO v2.1 format), letting every downstream stage —
chunking, BM25, mining, KD training, index build, serving — run unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_TOPICS = [
    ("machine learning", "algorithms that learn patterns from data"),
    ("neural networks", "layered models inspired by biological neurons"),
    ("paris france", "the capital city known for the eiffel tower"),
    ("python programming", "a popular language for scripting and data science"),
    ("solar system", "planets orbiting the sun in elliptical paths"),
    ("climate change", "global warming driven by greenhouse gas emissions"),
    ("human heart", "the organ that pumps blood through the body"),
    ("world war two", "the global conflict fought from 1939 to 1945"),
    ("photosynthesis", "how plants convert sunlight into chemical energy"),
    ("stock market", "exchanges where company shares are traded"),
    ("black holes", "regions of spacetime with inescapable gravity"),
    ("immune system", "the body's defense against infection and disease"),
    ("renewable energy", "power from wind solar and hydro sources"),
    ("ancient rome", "the empire that ruled the mediterranean world"),
    ("dna genetics", "the molecule carrying hereditary information"),
    ("ocean currents", "large scale movement of seawater around the globe"),
]

_QUERY_TEMPLATES = [
    "what is {t}",
    "how does {t} work",
    "explain {t}",
    "facts about {t}",
    "history of {t}",
]

_FILLER = [
    "many researchers study this subject in depth",
    "there are several important aspects to consider",
    "recent developments changed the field significantly",
    "experts continue to debate the finer points",
    "practical applications appear in everyday life",
]


def generate_demo_dataset(
    output_dir: str | Path,
    num_samples: int = 200,
    passages_per_query: int = 4,
    seed: int = 42,
    splits: tuple[str, ...] = ("train", "validation"),
    split_fractions: tuple[float, ...] = (0.8, 0.2),
) -> dict:
    """Write ``{split}.jsonl`` files + ``_manifest.json`` in the fetcher's
    MS MARCO layout and return the manifest dict
    (reference manifest shape: src/data/fetch.py:14-66)."""
    rng = np.random.default_rng(seed)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    rows = []
    for i in range(num_samples):
        topic, gloss = _TOPICS[i % len(_TOPICS)]
        template = _QUERY_TEMPLATES[i % len(_QUERY_TEMPLATES)]
        query = template.format(t=topic)
        # canonical per topic (no random filler): after text-dedup every query
        # has exactly ONE relevant doc in the corpus, so retrieval metrics
        # measure ranking skill instead of arbitrary tie-breaks between
        # unlabeled near-duplicates
        positive = f"{topic} explained: {gloss}."
        passage_texts = [positive]
        is_selected = [1]
        for _ in range(passages_per_query - 1):
            other_topic, other_gloss = _TOPICS[int(rng.integers(len(_TOPICS)))]
            if other_topic == topic:
                other_topic, other_gloss = _TOPICS[
                    (_TOPICS.index((topic, gloss)) + 1) % len(_TOPICS)
                ]
            passage_texts.append(
                f"{other_topic} overview: {other_gloss}. "
                f"{_FILLER[int(rng.integers(len(_FILLER)))]}."
            )
            is_selected.append(0)
        rows.append(
            {
                "query_id": i,
                "query": query,
                "passages": {
                    "passage_text": passage_texts,
                    "is_selected": is_selected,
                },
                "answers": [gloss],
            }
        )

    manifest: dict = {"dataset": "demo", "splits": {}}
    start = 0
    for split, frac in zip(splits, split_fractions):
        count = int(round(num_samples * frac))
        split_rows = rows[start : start + count]
        start += count
        path = out / f"{split}.jsonl"
        with open(path, "w") as f:
            for row in split_rows:
                f.write(json.dumps(row) + "\n")
        manifest["splits"][split] = {
            "file": str(path),
            "num_samples": len(split_rows),
        }
    with open(out / "_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
