"""Mount-and-run MS MARCO eval path, executed end-to-end.

The real e5/bge weights and MS MARCO dev data cannot exist on this
zero-egress host; what CAN be proven is that everything down-stack of
the mounted artifacts runs: scripts/eval_msmarco.py is driven here on a
tiny dev sample written in the REAL MS MARCO v2.1 layout, with the KD
student at the REAL e5-small-v2 shape (12L/384H, 30522 vocab) loaded
from a REAL HF checkpoint format (config.json + model.safetensors,
random weights — conversion is name-based, so real weights convert
identically), a second HF checkpoint as the vanilla arm, and an HF
XLM-RoBERTa classifier as the teacher (real family, small shape: the
conversion/scoring path is shape-agnostic and 560M params would swamp
CI). All four reference arms run: vanilla, kd_student, teacher, and
kd_student_reranked (reference docs/overview/results-and-benchmarks.md:
26-48). The day the artifacts are mounted, the same command produces
the 0.88-north-star measurement.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def msmarco_dev(tmp_path_factory):
    """Tiny dev split in the v2.1 nested (dict-of-lists) layout."""
    rng = np.random.default_rng(3)
    path = tmp_path_factory.mktemp("msmarco") / "dev.jsonl"
    topics = [
        ("capital of france", "paris is the capital of france"),
        ("tallest mountain", "mount everest is the tallest mountain"),
        ("speed of light", "light travels at about 300000 km per second"),
        ("python creator", "guido van rossum created the python language"),
        ("largest ocean", "the pacific is the largest ocean on earth"),
        ("first moon landing", "apollo 11 landed on the moon in 1969"),
        ("longest river", "the nile is often called the longest river"),
        ("human chromosomes", "humans have 23 pairs of chromosomes"),
    ]
    fillers = [
        f"unrelated filler passage number {i} about topic {rng.integers(100)}"
        for i in range(40)
    ]
    with open(path, "w") as f:
        for qi, (q, pos) in enumerate(topics):
            negs = [fillers[(qi * 5 + j) % len(fillers)] for j in range(5)]
            texts = [pos] + negs
            sel = [1] + [0] * len(negs)
            f.write(
                json.dumps(
                    {
                        "query_id": qi,
                        "query": q,
                        "passages": {
                            "passage_text": texts,
                            "is_selected": sel,
                        },
                    }
                )
                + "\n"
            )
    return path


def _save_hf(model, cfg, out):
    from safetensors.numpy import save_file

    out.mkdir(parents=True, exist_ok=True)
    sd = {
        k: v.detach().cpu().numpy()
        for k, v in model.state_dict().items()
        # shared/tied or position-id buffers are not weights
        if "position_ids" not in k
    }
    save_file(sd, out / "model.safetensors")
    with open(out / "config.json", "w") as f:
        f.write(cfg.to_json_string())
    return out


@pytest.fixture(scope="module")
def hf_student_real_shape(tmp_path_factory):
    """Random-weight HF checkpoint at the REAL e5-small-v2 shape."""
    cfg = transformers.BertConfig(
        vocab_size=30522,
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=1536,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    return _save_hf(
        model, cfg, tmp_path_factory.mktemp("hf") / "e5-small-v2"
    )


@pytest.fixture(scope="module")
def hf_teacher_small(tmp_path_factory):
    """HF XLM-RoBERTa classifier (bge-reranker family), small shape."""
    cfg = transformers.XLMRobertaConfig(
        vocab_size=1002,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        max_position_embeddings=130,
        num_labels=1,
    )
    torch.manual_seed(1)
    model = transformers.XLMRobertaForSequenceClassification(cfg)
    return _save_hf(
        model, cfg, tmp_path_factory.mktemp("hf") / "bge-reranker"
    )


def test_eval_msmarco_end_to_end(
    msmarco_dev, hf_student_real_shape, hf_teacher_small, tmp_path
):
    import scripts.eval_msmarco as em

    out = tmp_path / "msmarco_dev.json"
    rc = em.main(
        [
            "--msmarco-dev", str(msmarco_dev),
            "--kd-model", str(hf_student_real_shape),
            "--vanilla-model", str(hf_student_real_shape),
            "--teacher-model", str(hf_teacher_small),
            "--queries", "6",
            "--batch-size", "16",
            "--out", str(out),
        ]
    )
    assert rc == 0
    report = json.loads(out.read_text())

    assert report["protocol"]["queries"] == 6
    for arm in ("kd_student", "vanilla", "teacher", "kd_student_reranked"):
        m = report["results"][arm]
        assert 0.0 <= m["ndcg@10"] <= 1.0, (arm, m)
        assert 0.0 <= m["mrr@10"] <= 1.0, (arm, m)
    v = report["verdict"]
    assert set(v) >= {
        "north_star_0.88_ndcg10",
        "kd_ndcg10",
        "teacher_ndcg10",
        "kd_over_teacher",
        "acceptance_gate_95pct",
    }
    # markdown twin written alongside
    assert out.with_suffix(".md").exists()
    # random weights must NOT accidentally pass the north star (sanity
    # that the verdict is computed from the measured numbers)
    assert v["kd_ndcg10"] == round(
        report["results"]["kd_student"]["ndcg@10"], 4
    )
