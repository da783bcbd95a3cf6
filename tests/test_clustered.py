"""Clustered (cell-probe) index mode — the TPU-native IVF analog
(reference surface: src/config.py FAISSConfig ivf params + the IVF-PQ
scale story in docs/operations/scaling-and-performance.md:115-152).

Pins: balanced-partition invariants, probe-search exactness at full
nprobe, recall on clusterable data at small nprobe, builder round-trip
with the permutation/centroid layout, position mapping through serving."""

from __future__ import annotations

import numpy as np
import pytest

from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.ops.cluster import auto_cells, build_clusters
from sskd_tpu.ops.topk_cluster import clustered_topk


def _mixture(n, d, n_modes, spread, seed=0):
    """Gaussian-mixture corpus on the sphere — the data regime clustering
    exists for."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_modes, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_modes, n)
    x = centers[assign] + spread * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x.astype(np.float32)


class TestBuildClusters:
    def test_perm_is_permutation_and_balanced(self):
        x = _mixture(3000, 32, 8, 0.2)
        n_cells, rpc = auto_cells(3000, target_rows_per_cell=512)
        perm, cent = build_clusters(x, n_cells, rpc)
        assert sorted(perm.tolist()) == list(range(3000))
        assert cent.shape == (n_cells, 32)
        # every cell except the last holds exactly rpc rows
        assert (n_cells - 1) * rpc < 3000 <= n_cells * rpc

    def test_centroids_normalized(self):
        x = _mixture(1000, 16, 4, 0.1)
        n_cells, rpc = auto_cells(1000, 256)
        _, cent = build_clusters(x, n_cells, rpc)
        np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)

    def test_cells_are_coherent(self):
        # rows in one cell should be nearer their own centroid than a
        # random cell's centroid, on strongly clustered data
        x = _mixture(2048, 32, 4, 0.05, seed=1)
        n_cells, rpc = auto_cells(2048, 256)
        perm, cent = build_clusters(x, n_cells, rpc)
        xr = x[perm]
        own = ((xr[:rpc] @ cent[0]) > (xr[:rpc] @ cent[n_cells - 1])).mean()
        assert own > 0.9

    def test_auto_cells_rounding(self):
        n_cells, rpc = auto_cells(1_000_000)
        assert rpc % 256 == 0
        assert n_cells * rpc >= 1_000_000
        assert abs(rpc - 1000) < 300  # ~sqrt(N)


class TestClusteredTopk:
    def _setup(self, n=2048, d=32, dtype="float32"):
        import jax.numpy as jnp

        x = _mixture(n, d, 8, 0.15)
        n_cells, rpc = auto_cells(n, 256)
        perm, cent = build_clusters(x, n_cells, rpc)
        xr = x[perm]
        scales = None
        if dtype == "int8":
            from sskd_tpu.ops.quant import quantize_rows

            xr_q, s = quantize_rows(xr)
            corpus = jnp.asarray(np.asarray(xr_q))
            scales = jnp.asarray(np.asarray(s, np.float32))
        else:
            corpus = jnp.asarray(xr)
        # pad to full cells
        pad = n_cells * rpc - corpus.shape[0]
        if pad:
            corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
            if scales is not None:
                scales = jnp.pad(scales, (0, pad), constant_values=1.0)
        q = _mixture(8, d, 8, 0.15, seed=42)
        return q, x, corpus, jnp.asarray(cent), perm, rpc, n_cells, scales, n

    def test_full_nprobe_is_exact(self):
        q, x, corpus, cent, perm, rpc, n_cells, scales, n = self._setup()
        vals, idx = clustered_topk(
            np.asarray(q), corpus, cent, k=10, nprobe=n_cells,
            rows_per_cell=rpc, row_scales=scales, valid_n=n,
        )
        idx = np.asarray(idx)
        gt = np.argsort(-(q @ x.T), axis=1)[:, :10]
        mapped = perm[idx]  # reordered -> original
        for i in range(q.shape[0]):
            assert set(mapped[i]) == set(gt[i])

    def test_small_nprobe_recall_on_clustered_data(self):
        q, x, corpus, cent, perm, rpc, n_cells, scales, n = self._setup()
        nprobe = max(2, n_cells // 4)
        vals, idx = clustered_topk(
            np.asarray(q), corpus, cent, k=10, nprobe=nprobe,
            rows_per_cell=rpc, row_scales=scales, valid_n=n,
        )
        mapped = perm[np.clip(np.asarray(idx), 0, n - 1)]
        gt = np.argsort(-(q @ x.T), axis=1)[:, :10]
        recall = np.mean(
            [len(set(mapped[i]) & set(gt[i])) / 10 for i in range(q.shape[0])]
        )
        # probing a quarter of the cells must recover far more than a
        # quarter of the true neighbors (pruning follows the data), and
        # most of them outright on clusterable data
        assert recall >= 0.7
        assert recall >= 2.5 * nprobe / n_cells

    def test_int8_path(self):
        q, x, corpus, cent, perm, rpc, n_cells, scales, n = self._setup(
            dtype="int8"
        )
        assert scales is not None
        vals, idx = clustered_topk(
            np.asarray(q), corpus, cent, k=5, nprobe=n_cells,
            rows_per_cell=rpc, row_scales=scales, valid_n=n,
        )
        idx = np.asarray(idx)
        assert ((idx >= 0) & (idx < n)).all()
        # scores descending
        v = np.asarray(vals)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_tail_padding_never_returned(self):
        q, x, corpus, cent, perm, rpc, n_cells, scales, n = self._setup()
        _, idx = clustered_topk(
            np.asarray(q), corpus, cent, k=10, nprobe=n_cells,
            rows_per_cell=rpc, row_scales=scales, valid_n=n,
        )
        assert (np.asarray(idx) < n).all()


class TestClusteredBuilder:
    def _build(self, tmp_path, n=1500, d=32, dtype="float32"):
        x = _mixture(n, d, 6, 0.15)
        ids = [f"d{i}" for i in range(n)]
        b = IndexBuilder(
            embedding_dim=d, index_type="clustered", dtype=dtype,
            cluster_rows=256, nprobe=4,
        )
        b.build_from_arrays(x, ids, texts=[f"text {i}" for i in range(n)])
        return b, x, ids

    def test_search_maps_to_original_positions(self, tmp_path):
        b, x, ids = self._build(tmp_path)
        # self-retrieval: each query row must find itself first
        q = x[:8]
        vals, idx = b.search(q, k=3)
        assert [ids[i] for i in idx[:, 0]] == [f"d{i}" for i in range(8)]

    def test_save_load_roundtrip(self, tmp_path):
        b, x, ids = self._build(tmp_path)
        out = tmp_path / "cidx"
        b.save(out)
        b2 = IndexBuilder().load(out)
        assert b2.index_type == "clustered"
        assert b2._perm is not None and b2._centroids is not None
        assert b2.nprobe == 4
        v1, i1 = b.search(x[:4], k=5)
        v2, i2 = b2.search(x[:4], k=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2, rtol=1e-5)

    def test_perm_checksum_guard(self, tmp_path):
        b, x, ids = self._build(tmp_path)
        out = tmp_path / "cidx"
        b.save(out)
        perm = np.load(out / "perm.npy")
        perm[:2] = perm[[1, 0]]
        np.save(out / "perm.npy", perm)
        from sskd_tpu.exceptions import IndexLoadError

        with pytest.raises(IndexLoadError):
            IndexBuilder().load(out)

    def test_validate_gate_runs_cell_probe_path(self, tmp_path):
        b, x, ids = self._build(tmp_path)
        report = b.validate(n_queries=64, k=10)
        assert report["recall@10"] >= 0.9  # clusterable data

    def test_large_batch_falls_back_to_sweep(self, tmp_path):
        from sskd_tpu.ops.topk_cluster import CLUSTER_MAX_BATCH

        b, x, ids = self._build(tmp_path)
        q = x[: CLUSTER_MAX_BATCH + 8]
        vals, idx = b.search(q, k=3)
        # fallback still maps positions: self-retrieval holds
        assert [ids[i] for i in idx[:, 0]][:8] == [f"d{i}" for i in range(8)]

    def test_int8_clustered(self, tmp_path):
        b, x, ids = self._build(tmp_path, dtype="int8")
        vals, idx = b.search(x[:4], k=3)
        assert [ids[i] for i in idx[:, 0]] == [f"d{i}" for i in range(4)]

    def test_sharded_clustered_self_retrieval(self, tmp_path):
        """Cells sharded over ICI: each shard probes its local top cells,
        the all-gather merge returns ORIGINAL row positions."""
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        b, x, ids = self._build(tmp_path)
        mesh = create_mesh(data_parallel=1, index_parallel=2)
        sharded = ShardedIndex.from_builder(b, mesh)
        vals, idx = sharded.search(x[:8], k=3)
        assert [ids[i] for i in idx[:, 0]] == [f"d{i}" for i in range(8)]

    def test_sharded_clustered_recall_ge_single_device(self, tmp_path):
        """Every shard probes nprobe cells, so the probe union covers more
        cells than the single-device engine: recall must not drop."""
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        b, x, ids = self._build(tmp_path)
        q = x[100:140]
        gt = np.argsort(-(q @ x.T), axis=1)[:, :10]
        mesh = create_mesh(data_parallel=1, index_parallel=4)
        sharded = ShardedIndex.from_builder(b, mesh)
        _, si = sharded.search(q, k=10)
        _, bi = b.search(q, k=10)

        def recall(pred):
            return np.mean(
                [len(set(pred[i]) & set(gt[i])) / 10 for i in range(len(q))]
            )

        assert recall(si) >= recall(bi) - 1e-9

    def test_sharded_clustered_save_load(self, tmp_path):
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        b, x, ids = self._build(tmp_path)
        mesh = create_mesh(data_parallel=1, index_parallel=2)
        sharded = ShardedIndex.from_builder(b, mesh)
        out = tmp_path / "sharded_cidx"
        sharded.save(out)
        # reload onto a DIFFERENT shard count (mesh-shape agnostic layout)
        mesh4 = create_mesh(data_parallel=1, index_parallel=4)
        s2 = ShardedIndex(mesh4).load(out)
        assert s2._perm is not None and s2.nprobe == 4
        v1, i1 = sharded.search(x[:6], k=5)
        v2, i2 = s2.search(x[:6], k=5)
        # both probe unions cover the data; top-1 self-retrieval agrees
        np.testing.assert_array_equal(i1[:, 0], i2[:, 0])

    def test_sharded_clustered_large_batch_sweep(self, tmp_path):
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.ops.topk_cluster import CLUSTER_MAX_BATCH
        from sskd_tpu.parallel.mesh import create_mesh

        b, x, ids = self._build(tmp_path)
        mesh = create_mesh(data_parallel=1, index_parallel=2)
        sharded = ShardedIndex.from_builder(b, mesh)
        q = x[: CLUSTER_MAX_BATCH + 4]
        _, idx = sharded.search(q, k=3)
        assert [ids[i] for i in idx[:8, 0]] == [f"d{i}" for i in range(8)]


class TestPallasEligibility:
    """The cell-gather kernel's dispatch gate — the B cap is a safety
    bound (B=200 faulted the TPU worker; serving never sends >64)."""

    def test_batch_cap(self):
        from sskd_tpu.ops.topk_cluster import (
            CLUSTER_MAX_BATCH,
            _pallas_eligible,
        )

        ok = dict(backend="tpu", P=2048, D=384, rpc=256, is_int8=True)
        assert _pallas_eligible(B=1, **ok)
        assert _pallas_eligible(B=CLUSTER_MAX_BATCH, **ok)
        assert not _pallas_eligible(B=CLUSTER_MAX_BATCH + 1, **ok)
        assert not _pallas_eligible(B=200, **ok)

    def test_tiling_requirements(self):
        from sskd_tpu.ops.topk_cluster import _pallas_eligible

        base = dict(backend="tpu", B=4, P=2048, D=384, rpc=256, is_int8=True)
        assert _pallas_eligible(**base)
        assert not _pallas_eligible(**{**base, "backend": "cpu"})
        assert not _pallas_eligible(**{**base, "P": 2047})  # not cell-aligned
        assert not _pallas_eligible(**{**base, "D": 100})  # lane tiling
        # int8 needs 32-row sublane multiples; f32 only 8
        assert not _pallas_eligible(**{**base, "P": 2400, "rpc": 24})
        assert _pallas_eligible(
            **{**base, "P": 2400, "rpc": 24, "is_int8": False}
        )


class TestFlatTopk:
    """_flat_topk (two-level binmax extraction) must be EXACTLY lax.top_k
    on wide rows — it backs the clustered engine's candidate extraction."""

    def test_matches_lax_topk_wide(self):
        import jax
        import jax.numpy as jnp

        from sskd_tpu.ops.topk_cluster import _flat_topk

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 8192)).astype(np.float32))
        vals, idx = _flat_topk(x, 10)
        ref_v, ref_i = jax.lax.top_k(x, 10)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v))
        # positions must point at the same values (ties may reorder)
        np.testing.assert_allclose(
            np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1),
            np.asarray(ref_v),
        )

    def test_narrow_rows_fall_back(self):
        import jax.numpy as jnp

        from sskd_tpu.ops.topk_cluster import _flat_topk

        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 300)),
                        dtype=jnp.float32)
        vals, idx = _flat_topk(x, 5)
        assert vals.shape == (2, 5)

    def test_with_neg_inf_sentinels(self):
        import jax.numpy as jnp

        from sskd_tpu.ops.topk_cluster import _NEG_INF, _flat_topk

        x = np.full((1, 4096 + 128), _NEG_INF, np.float32)
        x[0, 5] = 3.0
        x[0, 4000] = 2.0
        vals, idx = _flat_topk(jnp.asarray(x), 3)
        assert np.asarray(idx)[0, 0] == 5
        assert np.asarray(idx)[0, 1] == 4000
        assert np.asarray(vals)[0, 2] <= _NEG_INF / 2


class TestComposeParity:
    """The unjitted compose/impl bodies must agree with the jitted public
    entries (they exist to avoid nested-jit operand copies)."""

    def test_cosine_topk_compose_matches(self):
        import jax.numpy as jnp

        from sskd_tpu.ops.topk import cosine_topk, cosine_topk_compose

        rng = np.random.default_rng(2)
        c = jnp.asarray(rng.standard_normal((2048, 64)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        v1, i1 = cosine_topk(q, c, k=5, method="approx", valid_n=2000)
        v2, i2 = cosine_topk_compose(q, c, k=5, method="approx", valid_n=2000)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    def test_clustered_impl_matches_public(self):
        import jax.numpy as jnp

        from sskd_tpu.ops.topk_cluster import clustered_topk, clustered_topk_impl

        x = _mixture(1024, 32, 4, 0.15)
        from sskd_tpu.ops.cluster import auto_cells, build_clusters

        n_cells, rpc = auto_cells(1024, 256)
        perm, cent = build_clusters(x, n_cells, rpc)
        xr = jnp.asarray(x[perm])
        pad = n_cells * rpc - 1024
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0)))
        q = jnp.asarray(x[:4])
        kw = dict(k=5, nprobe=2, rows_per_cell=rpc, valid_n=1024)
        v1, i1 = clustered_topk(q, xr, jnp.asarray(cent), **kw)
        v2, i2 = clustered_topk_impl(q, xr, jnp.asarray(cent), **kw)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestNprobeOverride:
    def test_cli_validate_nprobe_override(self, tmp_path):
        """nprobe is a query-time knob: validate can re-gate a saved index
        at a different nprobe without a rebuild."""
        x = _mixture(1200, 32, 6, 0.15)
        b = IndexBuilder(
            embedding_dim=32, index_type="clustered", cluster_rows=256, nprobe=1
        )
        b.build_from_arrays(x, [f"d{i}" for i in range(1200)])
        out = tmp_path / "cidx"
        b.save(out)

        from sskd_tpu.cli.main import main

        # full probing must pass a high bar even where nprobe=1 may not
        rc = main(
            ["index", "validate", "--dir", str(out), "--queries", "32",
             "--k", "10", "--min-recall", "0.95", "--nprobe", "5"]
        )
        assert rc == 0
        b2 = IndexBuilder().load(out)
        assert b2.nprobe == 1  # the saved meta is untouched

    def test_settings_nprobe_overrides_preload(self, tmp_path, monkeypatch):
        """An explicitly-set index.nprobe setting wins over the index meta
        at serve time (SEMANTIC_KD_INDEX__NPROBE without rebuild)."""
        from sskd_tpu.config import Settings

        explicit = Settings.model_validate({"index": {"nprobe": 3}})
        assert "nprobe" in explicit.index.model_fields_set
        default = Settings()
        assert "nprobe" not in default.index.model_fields_set


class TestClusteredServing:
    def test_fused_search_maps_positions(self, tmp_path):
        """The fused serving path (approx sweep over reordered rows) must
        return original positions for doc-id lookup."""
        x = _mixture(1200, 32, 6, 0.15)
        ids = [f"d{i}" for i in range(1200)]
        b = IndexBuilder(
            embedding_dim=32, index_type="clustered", cluster_rows=256, nprobe=4
        )
        b.build_from_arrays(x, ids)
        mapped = b.map_positions(np.array([[0, 5, -1]]))
        assert mapped.shape == (1, 3)
        assert mapped[0, 2] == -1
        assert 0 <= mapped[0, 0] < 1200

    @pytest.fixture(scope="class")
    def fused_setup(self):
        from sskd_tpu.models import BertConfig, StudentModel
        from sskd_tpu.serve.fused import FusedSearcher
        from sskd_tpu.tokenization import WordPieceTokenizer

        docs = [f"document about topic {i} with words {i}" for i in range(600)]
        tok = WordPieceTokenizer.build_from_corpus(
            docs[:50] + ["query find topic"], vocab_size=512
        )
        student = StudentModel(
            "tiny-clustered",
            config=BertConfig.tiny(vocab_size=tok.vocab_size),
            tokenizer=tok,
        )
        b = IndexBuilder(
            embedding_dim=student.embedding_dim,
            index_type="clustered",
            dtype="int8",
            cluster_rows=256,
            nprobe=3,  # == n_cells for 600 rows: probe path is exhaustive
        )
        emb = student.encode_documents(docs)
        b.build_from_arrays(emb, [f"d{i}" for i in range(len(docs))])
        return student, b, FusedSearcher(student, b)

    def test_engine_selection_by_batch(self, fused_setup, monkeypatch):
        from sskd_tpu.ops.topk_cluster import CLUSTER_MAX_BATCH

        _, _, fused = fused_setup
        # default: serving uses the measured-faster sweep (adr-009)
        assert fused._engine(16) == "approx"
        assert fused._engine(CLUSTER_MAX_BATCH * 2) == "approx"
        # opt-in: cell probing for small padded batches
        monkeypatch.setenv("SSKD_SERVE_CELL_PROBE", "1")
        assert fused._engine(16) == "clustered"
        assert fused._engine(CLUSTER_MAX_BATCH) == "clustered"
        assert fused._engine(CLUSTER_MAX_BATCH * 2) == "approx"

    def test_fused_clustered_matches_unfused(self, fused_setup, monkeypatch):
        """Small-batch fused dispatch (cell probe opted in) composes the
        cell-probe engine and returns the same original-position hits as
        builder.search."""
        monkeypatch.setenv("SSKD_SERVE_CELL_PROBE", "1")
        student, b, fused = fused_setup
        fused._jit_cache.clear()
        queries = ["find topic 3", "find topic 17"]
        fv, fi = fused.search_texts(queries, k=5)  # padded_n=16 -> clustered
        q_emb = student.encode_queries(queries)
        uv, ui = b.search(q_emb, k=5)
        np.testing.assert_array_equal(fi, ui)
        np.testing.assert_allclose(fv, uv, atol=1e-4)
        # jit cache keyed by engine
        assert any(key[2] == "clustered" for key in fused._jit_cache)

    def test_fused_default_sweep_matches_positions(self, fused_setup):
        """Default serving path (approx sweep over reordered rows) must
        return identical hits mapped to original positions."""
        student, b, fused = fused_setup
        fused._jit_cache.clear()
        queries = ["find topic 3", "find topic 17"]
        fv, fi = fused.search_texts(queries, k=5)
        q_emb = student.encode_queries(queries)
        uv, ui = b.search(q_emb, k=5)
        np.testing.assert_array_equal(fi, ui)
        assert all(key[2] == "approx" for key in fused._jit_cache)

    def test_fused_large_batch_falls_back(self, fused_setup):
        from sskd_tpu.ops.topk_cluster import CLUSTER_MAX_BATCH

        student, b, fused = fused_setup
        queries = [f"find topic {i}" for i in range(CLUSTER_MAX_BATCH + 1)]
        fv, fi = fused.search_texts(queries, k=5)
        assert fi.shape == (len(queries), 5)
        assert (fi < 600).all()
        assert any(key[2] == "approx" for key in fused._jit_cache)
