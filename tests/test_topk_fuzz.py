"""Property fuzz: every engine configuration against brute force over
randomized shapes, k values, dtypes, block sizes, and duplicate-heavy
score distributions."""

import numpy as np
import pytest

import jax.numpy as jnp

from sskd_tpu.ops.quant import quantize_rows
from sskd_tpu.ops.topk import cosine_topk
from sskd_tpu.ops.topk_pallas import cosine_topk_pallas

CASES = [
    # (seed, n, d, b, k, block)
    (0, 37, 32, 1, 5, 128),
    (1, 129, 64, 3, 1, 128),
    (2, 512, 48, 7, 17, 256),
    (3, 1000, 128, 2, 100, 512),
    (4, 255, 16, 5, 10, 128),
    (5, 2048, 64, 4, 64, 1024),
]


def _data(seed, n, d, b, duplicates=False):
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    if duplicates:
        corpus[n // 2 :] = corpus[: n - n // 2]  # heavy exact ties
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return corpus, queries


@pytest.mark.parametrize("seed,n,d,b,k,block", CASES)
def test_exact_xla_matches_brute_force(seed, n, d, b, k, block):
    corpus, queries = _data(seed, n, d, b)
    vals, idx = cosine_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k=k, block_rows=block
    )
    gt = queries @ corpus.T
    k_eff = min(k, n)
    gt_sorted = np.sort(gt, axis=1)[:, ::-1][:, :k_eff]
    np.testing.assert_allclose(np.asarray(vals)[:, :k_eff], gt_sorted, rtol=1e-5)
    # indices must produce those scores
    picked = np.take_along_axis(gt, np.asarray(idx)[:, :k_eff], axis=1)
    np.testing.assert_allclose(picked, gt_sorted, rtol=1e-5)
    if k > n:
        assert (np.asarray(idx)[:, n:] == -1).all()


@pytest.mark.parametrize("seed,n,d,b,k,block", CASES[:4])
def test_exact_pallas_matches_brute_force(seed, n, d, b, k, block):
    if k > 128:
        pytest.skip("kernel capacity")
    corpus, queries = _data(seed, n, d, b)
    vals, idx = cosine_topk_pallas(
        jnp.asarray(queries), jnp.asarray(corpus), k=k, block_rows=block,
        interpret=True,
    )
    gt = queries @ corpus.T
    k_eff = min(k, n)
    gt_sorted = np.sort(gt, axis=1)[:, ::-1][:, :k_eff]
    np.testing.assert_allclose(np.asarray(vals)[:, :k_eff], gt_sorted, rtol=1e-5)


def test_exact_with_heavy_duplicates():
    corpus, queries = _data(7, 400, 32, 4, duplicates=True)
    vals, idx = cosine_topk(jnp.asarray(queries), jnp.asarray(corpus), k=20, block_rows=128)
    gt = queries @ corpus.T
    gt_sorted = np.sort(gt, axis=1)[:, ::-1][:, :20]
    np.testing.assert_allclose(np.asarray(vals), gt_sorted, rtol=1e-5)
    # no duplicate indices returned per query
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 20


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_quantized_engines_self_retrieve(dtype):
    corpus, _ = _data(9, 600, 64, 1)
    if dtype == "int4":
        from sskd_tpu.ops.quant import quantize_rows_int4

        v8, scales = quantize_rows_int4(jnp.asarray(corpus))
    else:
        v8, scales = quantize_rows(jnp.asarray(corpus))
    probes = jnp.asarray(corpus[:16])
    for method in ("exact", "approx"):
        _, idx = cosine_topk(
            probes, v8, k=1, block_rows=256, row_scales=scales, method=method
        )
        assert np.asarray(idx)[:, 0].tolist() == list(range(16)), method


def test_zero_norm_query_no_nan():
    corpus, _ = _data(11, 100, 16, 1)
    q = jnp.zeros((2, 16), jnp.float32)
    vals, idx = cosine_topk(q, jnp.asarray(corpus), k=5, block_rows=128)
    assert np.isfinite(np.asarray(vals)).all()
    assert (np.asarray(idx) >= 0).all()


@pytest.mark.parametrize("seed,n,d,b,k", [(20, 513, 32, 3, 7), (21, 1280, 64, 2, 25)])
def test_int4_pallas_xla_cross_parity(seed, n, d, b, k):
    """The Pallas in-VMEM unpack engine and the XLA full-unpack fallback
    are two implementations of one quantized dot — identical result sets."""
    from sskd_tpu.ops.quant import quantize_rows_int4

    corpus, queries = _data(seed, n, d, b)
    packed, scales = quantize_rows_int4(jnp.asarray(corpus))
    q = jnp.asarray(queries)
    v_p, i_p = cosine_topk_pallas(q, packed, k=k, block_rows=256, row_scales=scales, interpret=True)
    from sskd_tpu.ops.topk import cosine_topk_core

    v_x, i_x = cosine_topk_core(q, packed, k=k, block_rows=256, row_scales=scales)
    np.testing.assert_array_equal(np.sort(np.asarray(i_p)), np.sort(np.asarray(i_x)))
    np.testing.assert_allclose(
        np.sort(np.asarray(v_p)), np.sort(np.asarray(v_x)), rtol=1e-5, atol=1e-6
    )
