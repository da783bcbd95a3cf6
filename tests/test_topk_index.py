"""Index engine tests: exact blocked top-k, int8 path, persistence layout,
sharded search on the 8-device virtual CPU mesh (SURVEY.md section 4.4 —
the multi-device tests the reference lacked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sskd_tpu.exceptions import IndexBuildError, IndexLoadError, IndexVersionError
from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.ops.quant import dequantize_rows, quantization_error, quantize_rows
from sskd_tpu.ops.topk import cosine_topk, merge_topk


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestCosineTopK:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        corpus = _normed(rng, 1000, 64)
        queries = _normed(rng, 8, 64)
        vals, idx = cosine_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10, block_rows=128)
        gt = queries @ corpus.T
        gt_idx = np.argsort(-gt, axis=1)[:, :10]
        np.testing.assert_array_equal(np.asarray(idx), gt_idx)
        np.testing.assert_allclose(
            np.asarray(vals), np.take_along_axis(gt, gt_idx, 1), rtol=1e-5
        )

    def test_k_larger_than_corpus_pads_with_sentinels(self):
        rng = np.random.default_rng(1)
        corpus = _normed(rng, 5, 16)
        queries = _normed(rng, 2, 16)
        vals, idx = cosine_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10, block_rows=128)
        assert idx.shape == (2, 10)
        assert (np.asarray(idx)[:, 5:] == -1).all()

    def test_block_not_dividing_corpus(self):
        rng = np.random.default_rng(2)
        corpus = _normed(rng, 777, 32)
        queries = _normed(rng, 3, 32)
        vals, idx = cosine_topk(jnp.asarray(queries), jnp.asarray(corpus), k=5, block_rows=256)
        gt_idx = np.argsort(-(queries @ corpus.T), axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), gt_idx)

    def test_int8_high_recall(self):
        rng = np.random.default_rng(3)
        corpus = _normed(rng, 2000, 64)
        queries = _normed(rng, 16, 64)
        values, scales = quantize_rows(jnp.asarray(corpus))
        vals, idx = cosine_topk(
            jnp.asarray(queries), values, k=10, block_rows=512, row_scales=scales
        )
        gt_idx = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
        recall = np.mean(
            [len(set(idx[i].tolist()) & set(gt_idx[i])) / 10 for i in range(16)]
        )
        assert recall >= 0.95

    def test_approx_method_recall(self):
        rng = np.random.default_rng(11)
        corpus = _normed(rng, 3000, 64)
        queries = _normed(rng, 16, 64)
        vals, idx = cosine_topk(
            jnp.asarray(queries), jnp.asarray(corpus), k=10,
            method="approx", recall_target=0.95,
        )
        gt_idx = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
        recall = np.mean(
            [len(set(np.asarray(idx)[i].tolist()) & set(gt_idx[i])) / 10 for i in range(16)]
        )
        assert recall >= 0.9  # CPU approx_max_k still meets a loose floor
        assert idx.shape == (16, 10)

    def test_approx_index_builder_gate(self):
        rng = np.random.default_rng(12)
        emb = _normed(rng, 2000, 384)
        b = IndexBuilder(index_type="approx", dtype="int8")
        b.build_from_arrays(emb, [str(i) for i in range(2000)])
        report = b.validate(n_queries=50, k=10)
        assert report["recall@10"] >= 0.9
        _, idx = b.search(emb[:3], k=1)
        assert idx[:, 0].tolist() == [0, 1, 2]

    def test_merge_topk(self):
        scores = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
        indices = jnp.asarray([[10, 20, 30, 40]], dtype=jnp.int32)
        v, i = merge_topk(scores, indices, 2)
        assert np.asarray(v).tolist() == [[5.0, 4.0]]
        assert np.asarray(i).tolist() == [[20, 40]]


class TestQuant:
    def test_roundtrip_error_small(self):
        rng = np.random.default_rng(4)
        x = _normed(rng, 100, 384)
        err = quantization_error(x)
        assert err["min_row_cosine"] > 0.999
        assert err["max_abs_err"] < 0.01

    def test_dequantize_shape(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(_normed(rng, 10, 8))
        v, s = quantize_rows(x)
        assert v.dtype == jnp.int8 and s.shape == (10,)
        assert dequantize_rows(v, s).shape == (10, 8)


class TestIndexBuilder:
    def test_build_search_contract(self, fake_student, sample_documents):
        b = IndexBuilder(embedding_dim=384)
        emb = fake_student.encode_documents(sample_documents)
        ids = [f"d{i}" for i in range(len(sample_documents))]
        b.build_from_arrays(emb, ids, texts=list(sample_documents))
        assert b.ntotal == len(sample_documents)
        assert b.doc_ids == ids
        q = fake_student.encode_queries(["anything"])
        scores, idx = b.search(q, k=3)
        assert scores.shape == (1, 3) and idx.shape == (1, 3)
        # self-retrieval: a doc embedding finds itself first
        scores, idx = b.search(emb[4], k=1)
        assert idx[0, 0] == 4
        assert scores[0, 0] == pytest.approx(1.0, abs=1e-4)

    def test_save_load_roundtrip(self, temp_index_dir):
        b = IndexBuilder()
        b.load(temp_index_dir)
        assert b.ntotal == 10
        assert len(b.doc_ids) == 10
        assert b.texts is not None
        s, i = b.search(np.ones(384, dtype=np.float32), k=2)
        assert i.shape == (1, 2)

    def test_load_rejects_corruption(self, temp_index_dir):
        vec = np.load(temp_index_dir / "vectors.npy")
        vec[0, 0] += 1.0
        np.save(temp_index_dir / "vectors.npy", vec)
        with pytest.raises(IndexLoadError):
            IndexBuilder().load(temp_index_dir)

    def test_load_rejects_bad_version(self, temp_index_dir):
        (temp_index_dir / "INDEX_VERSION").write_text("bogus-9\n")
        with pytest.raises(IndexVersionError):
            IndexBuilder().load(temp_index_dir)

    def test_int8_index_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        emb = _normed(rng, 200, 384)
        ids = [f"d{i}" for i in range(200)]
        b = IndexBuilder(dtype="int8")
        b.build_from_arrays(emb, ids)
        out = tmp_path / "idx8"
        b.save(out)
        b2 = IndexBuilder().load(out)
        assert b2.dtype == "int8"
        _, idx = b2.search(emb[:4], k=1)
        assert idx[:, 0].tolist() == [0, 1, 2, 3]

    def test_bfloat16_index_roundtrip(self, tmp_path):
        rng = np.random.default_rng(13)
        emb = _normed(rng, 150, 384)
        b = IndexBuilder(dtype="bfloat16")
        b.build_from_arrays(emb, [str(i) for i in range(150)])
        out = tmp_path / "idxbf16"
        b.save(out)
        b2 = IndexBuilder().load(out)
        assert b2.dtype == "bfloat16"
        _, idx = b2.search(emb[:4], k=1)
        assert idx[:, 0].tolist() == [0, 1, 2, 3]
        assert b2.validate(n_queries=30, k=10)["recall@10"] >= 0.97

    def test_refined_index_roundtrip_and_recall(self, tmp_path):
        """int8 + refine_m: the bf16 rescore stage must survive save/load
        and beat (or match) the plain-int8 recall vs f32 brute force."""
        rng = np.random.default_rng(21)
        emb = _normed(rng, 1500, 64)
        ids = [f"d{i}" for i in range(1500)]
        b = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=32
        )
        b.build_from_arrays(emb, ids)
        out = tmp_path / "idx_refined"
        b.save(out)
        b2 = IndexBuilder().load(out)
        assert b2.refine_m == 32
        assert b2._refine is not None

        q = _normed(rng, 40, 64)
        gt = np.argsort(-(q @ emb.T), axis=1)[:, :10]
        _, idx_ref = b2.search(q, k=10)
        plain = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx"
        ).build_from_arrays(emb, ids)
        _, idx_plain = plain.search(q, k=10)

        def recall(idx):
            return np.mean(
                [len(set(idx[i]) & set(gt[i])) / 10 for i in range(len(q))]
            )

        assert recall(idx_ref) >= recall(idx_plain) - 1e-9
        assert recall(idx_ref) >= 0.97
        # scores come from the bf16 rescore: near the true f32 values
        vals, idx2 = b2.search(q[:2], k=5)
        true = (q[:2] @ emb.T)
        for r in range(2):
            for c in range(5):
                assert abs(vals[r, c] - true[r, idx2[r, c]]) < 0.02

    def test_refined_corrupt_refine_rows_rejected(self, tmp_path):
        rng = np.random.default_rng(22)
        emb = _normed(rng, 300, 64)
        b = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=16
        )
        b.build_from_arrays(emb, [str(i) for i in range(300)])
        out = tmp_path / "idx_corrupt"
        b.save(out)
        data = np.load(out / "refine.npy")
        data.view(np.uint8)[0] ^= 0xFF
        np.save(out / "refine.npy", data)
        with pytest.raises(IndexLoadError):
            IndexBuilder().load(out)

    def test_refined_missing_refine_file_rejected(self, tmp_path):
        """A deleted refine.npy is the same class of corrupt index as a
        checksum mismatch: load() must fail loudly, not silently fall
        back to the plain int8 sweep (which loses the advertised recall
        margin)."""
        rng = np.random.default_rng(24)
        emb = _normed(rng, 300, 64)
        b = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=16
        )
        b.build_from_arrays(emb, [str(i) for i in range(300)])
        out = tmp_path / "idx_missing_refine"
        b.save(out)
        (out / "refine.npy").unlink()
        with pytest.raises(IndexLoadError, match="refine.npy"):
            IndexBuilder().load(out)

    def test_refined_k_exceeds_ntotal_sentinels(self):
        rng = np.random.default_rng(23)
        emb = _normed(rng, 6, 64)
        b = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=32
        )
        b.build_from_arrays(emb, [str(i) for i in range(6)])
        vals, idx = b.search(_normed(rng, 2, 64), k=10)
        assert idx.shape == (2, 10)
        assert (idx[:, 6:] == -1).all()

    def test_host_refine_matches_device_refine(self):
        """refine_storage="host" (adr-012): the numpy rescore over
        host-resident bf16 rows returns the same top-k as the in-program
        device rescore, and the refine rows never get staged to a device
        buffer."""
        rng = np.random.default_rng(31)
        emb = _normed(rng, 1500, 64)
        ids = [str(i) for i in range(1500)]
        dev = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=32
        ).build_from_arrays(emb, ids)
        host = IndexBuilder(
            embedding_dim=64,
            dtype="int8",
            index_type="approx",
            refine_m=32,
            refine_storage="host",
        ).build_from_arrays(emb, ids)
        q = _normed(rng, 40, 64)
        vals_d, idx_d = dev.search(q, k=10)
        vals_h, idx_h = host.search(q, k=10)
        assert host._device_refine is None  # the HBM copy never exists
        assert dev._device_refine is not None
        np.testing.assert_array_equal(idx_h, idx_d)
        np.testing.assert_allclose(vals_h, vals_d, atol=5e-3)

    def test_refine_storage_flip_resyncs_placement(self):
        """Flipping refine_storage on a LIVE builder (after the first
        search placed device arrays) re-syncs the bf16 rows: device->host
        drops the HBM copy, host->device restores it, and results match
        across the flips."""
        rng = np.random.default_rng(33)
        emb = _normed(rng, 900, 64)
        b = IndexBuilder(
            embedding_dim=64, dtype="int8", index_type="approx", refine_m=24
        ).build_from_arrays(emb, [str(i) for i in range(900)])
        q = _normed(rng, 8, 64)
        vals0, idx0 = b.search(q, k=5)  # placement happens here
        assert b._device_refine is not None
        b.refine_storage = "host"
        assert b._device_refine is None  # HBM copy dropped immediately
        vals1, idx1 = b.search(q, k=5)
        np.testing.assert_array_equal(idx1, idx0)
        b.refine_storage = "device"
        assert b._device_refine is not None  # restored for the device path
        vals2, idx2 = b.search(q, k=5)
        np.testing.assert_array_equal(idx2, idx0)
        with pytest.raises(IndexBuildError):
            b.refine_storage = "hbm"

    def test_host_refine_int4_recall_and_load(self, tmp_path):
        """int4 + host refine: recall clears the gate (the capacity config
        this mode exists for), and a loader constructed with
        refine_storage="host" keeps the loaded rows host-side."""
        rng = np.random.default_rng(32)
        emb = _normed(rng, 1500, 64)
        ids = [str(i) for i in range(1500)]
        b = IndexBuilder(
            embedding_dim=64, dtype="int4", index_type="approx", refine_m=40
        ).build_from_arrays(emb, ids)
        out = tmp_path / "idx_int4_host"
        b.save(out)
        h = IndexBuilder(refine_storage="host").load(out)
        assert h.refine_storage == "host"  # load() keeps the deployment knob
        q = _normed(rng, 50, 64)
        gt = np.argsort(-(q @ emb.T), axis=1)[:, :10]
        _, idx = h.search(q, k=10)
        assert h._device_refine is None
        recall = np.mean(
            [len(set(idx[i]) & set(gt[i])) / 10 for i in range(len(q))]
        )
        assert recall >= 0.97
        # rescored scores match f32 truth at bf16 resolution
        vals, idx2 = h.search(q[:2], k=5)
        true = q[:2] @ emb.T
        for r in range(2):
            for c in range(5):
                assert abs(vals[r, c] - true[r, idx2[r, c]]) < 0.02

    def test_host_refine_k_exceeds_ntotal_sentinels(self):
        rng = np.random.default_rng(33)
        emb = _normed(rng, 6, 64)
        b = IndexBuilder(
            embedding_dim=64,
            dtype="int8",
            index_type="approx",
            refine_m=32,
            refine_storage="host",
        ).build_from_arrays(emb, [str(i) for i in range(6)])
        vals, idx = b.search(_normed(rng, 2, 64), k=10)
        assert idx.shape == (2, 10)
        assert (idx[:, 6:] == -1).all()
        assert not np.isfinite(vals[:, 6:]).any()

    def test_refine_storage_validated(self):
        with pytest.raises(IndexBuildError, match="refine_storage"):
            IndexBuilder(refine_storage="hbm")

    @pytest.mark.parametrize("seed", [7, 19, 42])
    def test_host_refine_fuzz_parity(self, seed):
        """Fuzz: host and device refine storage return identical rankings
        across random corpus sizes (incl. non-multiples of engine blocks),
        dtypes, refine_m and k — the host rescore mirrors the device
        arithmetic exactly, so any divergence is a bug, not noise."""
        rng = np.random.default_rng(seed)
        n = int(rng.integers(200, 2100))
        dtype = rng.choice(["int8", "int4"])
        refine_m = int(rng.choice([8, 24, 48]))
        k = int(rng.choice([3, 10, 17]))
        emb = _normed(rng, n, 64)
        ids = [str(i) for i in range(n)]
        kw = dict(
            embedding_dim=64, dtype=dtype, index_type="approx",
            refine_m=refine_m,
        )
        dev = IndexBuilder(**kw).build_from_arrays(emb, ids)
        host = IndexBuilder(**kw, refine_storage="host").build_from_arrays(
            emb, ids
        )
        q = _normed(rng, 9, 64)
        vd, id_ = dev.search(q, k=k)
        vh, ih = host.search(q, k=k)
        np.testing.assert_array_equal(ih, id_)
        valid = id_ >= 0
        np.testing.assert_allclose(vh[valid], vd[valid], atol=5e-3)

    def test_validation_gate(self, tmp_path):
        rng = np.random.default_rng(8)
        emb = _normed(rng, 300, 384)
        b = IndexBuilder(dtype="int8")
        b.build_from_arrays(emb, [str(i) for i in range(300)])
        report = b.validate(n_queries=50, k=10)
        assert report["recall@10"] >= 0.97  # reference gate configs/index.yaml:55

    def test_build_from_parquet(self, fake_student, corpus_parquet):
        b = IndexBuilder()
        b.build_from_parquet(fake_student, corpus_parquet, batch_size=4)
        assert b.ntotal == 10
        assert b.doc_ids[0] == "d0_c0"
        assert b.texts is not None


class TestShardedIndex:
    def test_sharded_matches_single_device(self):
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        assert jax.device_count() == 8, "tests need the 8-device CPU mesh"
        mesh = create_mesh(data_parallel=1, index_parallel=8)
        rng = np.random.default_rng(9)
        emb = _normed(rng, 1000, 64)
        ids = [f"d{i}" for i in range(1000)]
        queries = _normed(rng, 4, 64)

        sharded = ShardedIndex(mesh, block_rows=128)
        sharded.build_from_arrays(emb, ids)
        s_vals, s_idx = sharded.search(queries, k=10)

        gt = queries @ emb.T
        gt_idx = np.argsort(-gt, axis=1)[:, :10]
        np.testing.assert_array_equal(s_idx, gt_idx)
        np.testing.assert_allclose(
            s_vals, np.take_along_axis(gt, gt_idx, 1), rtol=1e-5
        )

    def test_sharded_int8(self):
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data_parallel=1, index_parallel=8)
        rng = np.random.default_rng(10)
        emb = _normed(rng, 512, 64)
        sharded = ShardedIndex(mesh, block_rows=128)
        sharded.build_from_arrays(emb, [str(i) for i in range(512)], dtype="int8")
        _, idx = sharded.search(emb[:4], k=1)
        assert idx[:, 0].tolist() == [0, 1, 2, 3]

    def test_from_builder(self, fake_student, sample_documents):
        from sskd_tpu.index.sharded import ShardedIndex
        from sskd_tpu.parallel.mesh import create_mesh

        b = IndexBuilder(embedding_dim=384)
        emb = fake_student.encode_documents(sample_documents)
        b.build_from_arrays(emb, [f"d{i}" for i in range(10)])
        mesh = create_mesh(data_parallel=1, index_parallel=8)
        sharded = ShardedIndex.from_builder(b, mesh)
        _, idx = sharded.search(emb[3], k=1)
        assert idx[0, 0] == 3


class TestQuantInt4:
    def test_pack_unpack_exact(self):
        """unpack(pack(x)) reproduces the clipped nibble codes exactly."""
        from sskd_tpu.ops.quant import quantize_rows_int4, unpack_int4

        rng = np.random.default_rng(31)
        x = _normed(rng, 64, 32)
        packed, scales = quantize_rows_int4(jnp.asarray(x))
        nib = np.asarray(unpack_int4(packed))
        assert nib.dtype == np.int8 and nib.shape == (64, 32)
        assert nib.min() >= -7 and nib.max() <= 7
        expect = np.clip(np.round(x / np.asarray(scales)[:, None]), -7, 7)
        np.testing.assert_array_equal(nib, expect.astype(np.int8))

    def test_roundtrip_error_bounds(self):
        from sskd_tpu.ops.quant import quantization_error_int4

        rng = np.random.default_rng(32)
        x = _normed(rng, 100, 384)
        err = quantization_error_int4(x)
        # 4-bit symmetric absmax on normalized gaussian rows: ~0.99 cosine
        assert err["min_row_cosine"] > 0.97
        assert err["max_abs_err"] < 0.1

    def test_packed_halves_layout(self):
        """Column j of packed holds dim j (low nibble) and dim j + D/2
        (high nibble) — the layout consumers' half-dots rely on."""
        from sskd_tpu.ops.quant import quantize_rows_int4

        x = jnp.asarray([[7.0, -7.0, 3.0, 0.0]])  # scale = 1.0
        packed, scales = quantize_rows_int4(x)
        assert float(scales[0]) == pytest.approx(1.0)
        p = np.asarray(packed)[0].astype(int)  # int: uint8 - 8 would wrap
        assert (p[0] & 15) - 8 == 7 and (p[0] >> 4) - 8 == 3
        assert (p[1] & 15) - 8 == -7 and (p[1] >> 4) - 8 == 0


class TestInt4Index:
    def test_int4_index_roundtrip(self, tmp_path):
        rng = np.random.default_rng(33)
        emb = _normed(rng, 200, 384)
        ids = [f"d{i}" for i in range(200)]
        b = IndexBuilder(dtype="int4")
        b.build_from_arrays(emb, ids)
        assert b._vectors.shape == (200, 192) and b._vectors.dtype == np.uint8
        out = tmp_path / "idx4"
        b.save(out)
        b2 = IndexBuilder().load(out)
        assert b2.dtype == "int4"
        _, idx = b2.search(emb[:4], k=1)
        assert idx[:, 0].tolist() == [0, 1, 2, 3]
        assert b2.validate(n_queries=30, k=10)["recall@10"] >= 0.9

    def test_int4_refined_recall(self, tmp_path):
        """int4 + refine_m: exact bf16 rescore lifts recall to the gate the
        raw int4 sweep can't guarantee (the production int4 configuration)."""
        rng = np.random.default_rng(34)
        emb = _normed(rng, 1500, 64)
        ids = [f"d{i}" for i in range(1500)]
        b = IndexBuilder(
            embedding_dim=64, dtype="int4", index_type="approx", refine_m=40
        )
        b.build_from_arrays(emb, ids)
        out = tmp_path / "idx4r"
        b.save(out)
        b2 = IndexBuilder().load(out)

        q = _normed(rng, 40, 64)
        gt = np.argsort(-(q @ emb.T), axis=1)[:, :10]
        _, idx_ref = b2.search(q, k=10)
        plain = IndexBuilder(
            embedding_dim=64, dtype="int4", index_type="approx"
        ).build_from_arrays(emb, ids)
        _, idx_plain = plain.search(q, k=10)

        def recall(idx):
            return np.mean(
                [len(set(idx[i]) & set(gt[i])) / 10 for i in range(len(q))]
            )

        assert recall(idx_ref) >= recall(idx_plain) - 1e-9
        assert recall(idx_ref) >= 0.97

    def test_validate_gate_credits_refine(self):
        """validate() must brute-force against the bf16 refine rows when they
        exist (they ARE the original embeddings) — otherwise the gate scores
        the refine rescore against the quantized reconstruction and a larger
        refine_m can't move the number (the regression this pins)."""
        rng = np.random.default_rng(36)
        emb = _normed(rng, 1500, 64)
        ids = [f"d{i}" for i in range(1500)]
        plain = IndexBuilder(
            embedding_dim=64, dtype="int4", index_type="approx"
        ).build_from_arrays(emb, ids)
        refined = IndexBuilder(
            embedding_dim=64, dtype="int4", index_type="approx", refine_m=64
        ).build_from_arrays(emb, ids)
        r_plain = plain.validate(n_queries=64, k=10)["recall@10"]
        r_ref = refined.validate(n_queries=64, k=10)["recall@10"]
        assert r_ref >= r_plain - 1e-9
        assert r_ref >= 0.97

    def test_int4_clustered_rejected(self):
        with pytest.raises(IndexBuildError, match="int4"):
            IndexBuilder(dtype="int4", index_type="clustered")

    def test_int4_half_footprint(self):
        rng = np.random.default_rng(35)
        emb = _normed(rng, 64, 128)
        ids = [str(i) for i in range(64)]
        b8 = IndexBuilder(embedding_dim=128, dtype="int8").build_from_arrays(emb, ids)
        b4 = IndexBuilder(embedding_dim=128, dtype="int4").build_from_arrays(emb, ids)
        assert b4._vectors.nbytes * 2 == b8._vectors.nbytes
