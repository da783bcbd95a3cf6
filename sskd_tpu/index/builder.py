"""Exact TPU vector index with the reference's FAISSIndexBuilder contract.

Implements the reconstructed API of the reference's missing
``src/index/build_index.py`` (SURVEY.md section 2.5): ``build_from_parquet /
build_from_arrays / save / load / search / doc_ids / ntotal`` — but backed by
the blocked-matmul engine in :mod:`sskd_tpu.ops.topk` instead of FAISS HNSW.

On-disk layout (superset of the reference's intended production layout,
reference: configs/index.yaml:39-44 + conftest.py:184-200):

    index_dir/
      INDEX_VERSION      — layout version string
      meta.json          — dim/metric/dtype/ntotal + checksums
      vectors.npy        — [N, D] f32 (or int8 values when quantized)
      scales.npy         — [N] f32 per-row scales (int8 only)
      norms.npy          — [N] f32 original row norms (MaxSim aggregation)
      doc_ids.json       — position -> doc id
      texts.json         — optional doc texts for serving

Search is exact, so the reference's build-time validation gate
(recall@10 >= 0.97 vs brute force, configs/index.yaml:52-56) is satisfied by
construction for f32; for int8 the gate is checked against the f32 scores by
``validate()``.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Sequence

import numpy as np

from sskd_tpu.exceptions import (
    IndexBuildError,
    IndexLoadError,
    IndexVersionError,
)
from sskd_tpu.utils.logging import get_logger

INDEX_VERSION = "sskd-exact-1"

logger = get_logger("index")


def _sha256(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


class IndexBuilder:
    """Exact cosine/dot top-k index over an HBM-resident matrix."""

    def __init__(
        self,
        embedding_dim: int = 384,
        index_type: str = "exact",
        metric: str = "cosine",
        dtype: str = "float32",
        block_rows: int = 262144,
        recall_target: float = 0.99,
        cluster_rows: int = 0,
        nprobe: int = 64,
        refine_m: int = 0,
        refine_storage: str = "device",
    ):
        """``index_type``: "exact" (blocked full top-k, recall 1.0),
        "approx" (fused binned top-k — the TPU-native analog of the
        reference's HNSW approximation, ~9x faster at 1M rows, gated by
        ``validate()`` against the same recall@10 >= 0.97 criterion,
        reference: configs/index.yaml:52-56), or "clustered" (balanced
        cell-probe pruning — the IVF analog, reference: src/config.py
        FAISSConfig ivf params; sweeps only ``nprobe`` cells per query for
        small-batch latency; large batches fall back to the approx sweep).

        ``cluster_rows``: target rows per cell for "clustered" (0 = auto,
        ~sqrt(N)). ``nprobe``: probed cells per query.

        ``refine_m`` (int8/int4 + approx only): two-stage search — the
        quantized sweep fetches refine_m candidates whose bf16 rows are
        rescored exactly (ops/topk.py refined_topk_core). Costs 2 extra
        bytes/elem of HBM for the bf16 copy; measured recall@10 vs
        exact-f32 0.9945 at 1M rows (plain int8 sweep: 0.972). 0 disables.

        ``refine_storage`` (adr-012): where the bf16 refine rows live.
        ``"device"`` (default) keeps them in HBM and rescoring runs inside
        the same device program as the sweep; ``"host"`` keeps them in host
        RAM — the sweep returns refine_m candidate positions, whose rows
        are gathered and rescored in numpy. Host storage frees the 2
        bytes/elem of HBM (7.7 GB at 10M x 384) so the quantized capacity
        win survives refinement, at the cost of one extra device->host
        hop per search (a deployment choice, not an index property — it is
        NOT persisted in the on-disk layout). Single-device only: sharded
        serving keeps refine rows on-device with their shard.

        ``dtype="int4"`` stores rows packed two-values-per-byte
        (ops/quant.py halves layout): half the int8 sweep's HBM traffic —
        the bound in the B=1 serving regime — and double the capacity per
        chip. The exact Pallas engine unpacks nibbles in VMEM; recall sits
        below int8's, so pair int4 with ``refine_m`` (or gate with
        ``validate()``). Not supported with index_type="clustered"."""
        if metric not in ("cosine", "dot"):
            raise IndexBuildError(f"unsupported metric {metric!r}")
        if dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise IndexBuildError(f"unsupported index dtype {dtype!r}")
        if index_type not in ("exact", "approx", "clustered"):
            raise IndexBuildError(f"unsupported index_type {index_type!r}")
        if refine_storage not in ("device", "host"):
            raise IndexBuildError(
                f"unsupported refine_storage {refine_storage!r}"
            )
        if dtype == "int4" and index_type == "clustered":
            raise IndexBuildError(
                "int4 storage is not supported with the clustered engine "
                "(the cell-probe kernel gathers unpacked rows)"
            )
        self.embedding_dim = embedding_dim
        self.index_type = index_type
        self.metric = metric
        self.dtype = dtype
        self.block_rows = block_rows
        self.recall_target = recall_target
        self.cluster_rows = cluster_rows
        self.nprobe = nprobe
        self.refine_m = refine_m
        self._refine_storage = refine_storage
        self.doc_ids: list[str] = []
        self.texts: list[str] | None = None
        self._vectors: np.ndarray | None = None  # f32 or int8
        self._scales: np.ndarray | None = None
        self._refine: np.ndarray | None = None  # bf16 rows (refine_m > 0)
        self._norms: np.ndarray | None = None
        # clustered mode: vectors are stored row-REORDERED so each cell is
        # one contiguous block; _perm maps reordered position -> original
        self._perm: np.ndarray | None = None
        self._centroids: np.ndarray | None = None
        self._rows_per_cell: int = 0
        self._device_vectors = None  # jax arrays, lazily placed
        self._device_scales = None
        self._device_centroids = None
        self._device_refine = None

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------

    @property
    def refine_storage(self) -> str:
        return self._refine_storage

    @refine_storage.setter
    def refine_storage(self, value: str) -> None:
        """Query-time knob (adr-012): flipping it re-syncs the bf16 refine
        rows' device placement immediately — "host" drops the HBM copy
        (the capacity win is the point), "device" restores it. Without the
        re-sync, a flip after the first search would silently keep serving
        the OLD placement: host mode with the rows still pinned in HBM, or
        device mode rescoring against refine_rows=None."""
        if value not in ("device", "host"):
            raise IndexBuildError(f"unsupported refine_storage {value!r}")
        self._refine_storage = value
        if self._device_vectors is not None:  # placement already happened
            import jax.numpy as jnp

            self._device_refine = (
                jnp.asarray(self._refine)
                if self._refine is not None and value == "device"
                else None
            )

    @property
    def ntotal(self) -> int:
        return 0 if self._vectors is None else int(self._vectors.shape[0])

    @property
    def is_built(self) -> bool:
        return self._vectors is not None

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    def build_from_arrays(
        self,
        embeddings: np.ndarray,
        doc_ids: Sequence[str],
        texts: Sequence[str] | None = None,
    ) -> "IndexBuilder":
        """Build from precomputed embeddings [N, D]."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.embedding_dim:
            raise IndexBuildError(
                f"embeddings shape {emb.shape} != [N, {self.embedding_dim}]"
            )
        if len(doc_ids) != emb.shape[0]:
            raise IndexBuildError("doc_ids length != embedding rows")
        norms = np.linalg.norm(emb, axis=1)
        if self.metric == "cosine":
            emb = emb / np.maximum(norms[:, None], 1e-12)
        self._norms = norms.astype(np.float32)  # ORIGINAL row order
        if self.index_type == "clustered":
            from sskd_tpu.ops.cluster import auto_cells, build_clusters

            n_cells, rpc = auto_cells(emb.shape[0], self.cluster_rows)
            self._perm, self._centroids = build_clusters(emb, n_cells, rpc)
            self._rows_per_cell = rpc
            emb = emb[self._perm]  # cell-contiguous storage
        if self.dtype in ("int8", "int4"):
            from sskd_tpu.ops.quant import quantize_rows, quantize_rows_int4

            if self.dtype == "int8":
                values, scales = quantize_rows(emb)
            else:
                values, scales = quantize_rows_int4(emb)
            self._vectors = np.asarray(values)
            self._scales = np.asarray(scales)
            if self.refine_m > 0:
                import ml_dtypes

                self._refine = emb.astype(ml_dtypes.bfloat16)
        elif self.dtype == "bfloat16":
            import ml_dtypes

            self._vectors = emb.astype(ml_dtypes.bfloat16)
            self._scales = None
        else:
            self._vectors = emb
            self._scales = None
        self.doc_ids = [str(d) for d in doc_ids]
        self.texts = list(texts) if texts is not None else None
        self._device_vectors = None
        logger.info(f"built index: ntotal={self.ntotal} dtype={self.dtype}")
        return self

    def build_from_parquet(
        self,
        model,
        parquet_path: str | Path,
        batch_size: int = 256,
        max_docs: int | None = None,
        text_column: str = "text",
        id_column: str = "chunk_id",
    ) -> "IndexBuilder":
        """Encode a prepared-corpus parquet with ``model.encode_documents``
        and build (reference: scripts/build_faiss_index.py:55-62)."""
        import pandas as pd

        df = pd.read_parquet(parquet_path, columns=[id_column, text_column])
        if max_docs:
            df = df.head(max_docs)
        texts = df[text_column].tolist()
        ids = df[id_column].astype(str).tolist()
        emb = model.encode_documents(texts, batch_size=batch_size)
        return self.build_from_arrays(np.asarray(emb), ids, texts=texts)

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------

    def save(self, output_dir: str | Path) -> Path:
        if not self.is_built:
            raise IndexBuildError("cannot save an empty index")
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / "vectors.npy", self._vectors)
        if self._scales is not None:
            np.save(out / "scales.npy", self._scales)
        if self._norms is not None:
            np.save(out / "norms.npy", self._norms)
        with open(out / "doc_ids.json", "w") as f:
            json.dump(self.doc_ids, f)
        if self.texts is not None:
            with open(out / "texts.json", "w") as f:
                json.dump(self.texts, f)
        if self._refine is not None:
            np.save(out / "refine.npy", self._refine)
        if self._perm is not None:
            np.save(out / "perm.npy", self._perm)
            np.save(out / "centroids.npy", self._centroids)
        meta = {
            "embedding_dim": self.embedding_dim,
            "index_type": self.index_type,
            "recall_target": self.recall_target,
            "metric": self.metric,
            "dtype": self.dtype,
            "refine_m": self.refine_m if self._refine is not None else 0,
            "ntotal": self.ntotal,
            "checksums": {
                "vectors": _sha256(self._vectors),
                "doc_ids": hashlib.sha256(
                    json.dumps(self.doc_ids).encode()
                ).hexdigest(),
            },
        }
        if self._refine is not None:
            meta["checksums"]["refine"] = _sha256(self._refine)
        if self._perm is not None:
            meta["cluster"] = {
                "rows_per_cell": self._rows_per_cell,
                "n_cells": int(self._centroids.shape[0]),
                "nprobe": self.nprobe,
            }
            meta["checksums"]["perm"] = _sha256(self._perm)
        with open(out / "meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        (out / "INDEX_VERSION").write_text(INDEX_VERSION + "\n")
        logger.info(f"saved index to {out} (ntotal={self.ntotal})")
        return out

    def load(self, index_dir: str | Path) -> "IndexBuilder":
        path = Path(index_dir)
        version_file = path / "INDEX_VERSION"
        if not version_file.exists():
            raise IndexLoadError(f"no INDEX_VERSION in {path}")
        version = version_file.read_text().strip()
        if version != INDEX_VERSION:
            raise IndexVersionError(
                f"index version {version!r} != supported {INDEX_VERSION!r}"
            )
        with open(path / "meta.json") as f:
            meta = json.load(f)
        vectors = np.load(path / "vectors.npy")
        if meta["dtype"] == "bfloat16" and vectors.dtype.kind == "V":
            # numpy round-trips ml_dtypes.bfloat16 as a 2-byte void dtype
            import ml_dtypes

            vectors = vectors.view(ml_dtypes.bfloat16)
        if _sha256(vectors) != meta["checksums"]["vectors"]:
            raise IndexLoadError("vectors checksum mismatch — corrupt index")
        with open(path / "doc_ids.json") as f:
            doc_ids = json.load(f)
        if (
            hashlib.sha256(json.dumps(doc_ids).encode()).hexdigest()
            != meta["checksums"]["doc_ids"]
        ):
            raise IndexLoadError("doc_ids checksum mismatch — corrupt index")
        self.embedding_dim = meta["embedding_dim"]
        self.metric = meta["metric"]
        self.dtype = meta["dtype"]
        self.index_type = meta.get("index_type", "exact")
        self.recall_target = meta.get("recall_target", 0.99)
        self.refine_m = int(meta.get("refine_m", 0))
        self._vectors = vectors
        self._scales = (
            np.load(path / "scales.npy") if (path / "scales.npy").exists() else None
        )
        self._norms = (
            np.load(path / "norms.npy") if (path / "norms.npy").exists() else None
        )
        self._refine = None
        if self.refine_m > 0 and not (path / "refine.npy").exists():
            # A missing refine file is the same class of corrupt/partial
            # index as a checksum mismatch: silently falling back to the
            # plain int8 sweep would quietly lose the advertised recall
            # margin (0.9945 -> 0.972). Fail loudly like the checksums do.
            raise IndexLoadError(
                "meta records refine_m "
                f"{self.refine_m} > 0 but refine.npy is missing — "
                "corrupt or partially-written index"
            )
        if self.refine_m > 0 and (path / "refine.npy").exists():
            import ml_dtypes

            refine = np.load(path / "refine.npy")
            if refine.dtype.kind == "V":
                refine = refine.view(ml_dtypes.bfloat16)
            if _sha256(refine) != meta["checksums"].get("refine"):
                raise IndexLoadError("refine checksum mismatch — corrupt index")
            self._refine = refine
        self.doc_ids = [str(d) for d in doc_ids]
        texts_file = path / "texts.json"
        if texts_file.exists():
            with open(texts_file) as f:
                self.texts = json.load(f)
        else:
            self.texts = None
        if "cluster" in meta:
            self._perm = np.load(path / "perm.npy")
            if _sha256(self._perm) != meta["checksums"].get("perm"):
                raise IndexLoadError("perm checksum mismatch — corrupt index")
            self._centroids = np.load(path / "centroids.npy")
            self._rows_per_cell = int(meta["cluster"]["rows_per_cell"])
            self.nprobe = int(meta["cluster"]["nprobe"])
        else:
            self._perm = None
            self._centroids = None
            self._rows_per_cell = 0
        self._device_vectors = None
        self._device_centroids = None
        self._device_refine = None
        logger.info(f"loaded index from {path} (ntotal={self.ntotal})")
        return self

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def _ensure_device(self):
        import jax.numpy as jnp

        if self._device_vectors is None:
            # Pre-pad rows to the Pallas block multiple ONCE at staging time.
            # Without this the exact Pallas engine pads inside the jit on
            # every call, materializing a full corpus copy per search
            # (pallas_call inputs can't fuse pads); searches mask rows
            # >= valid_n (= ntotal) so results are unchanged.
            from sskd_tpu.ops.topk_pallas import BLOCK_ROWS

            n = self._vectors.shape[0]
            padded = -(-n // BLOCK_ROWS) * BLOCK_ROWS if n >= BLOCK_ROWS else n
            if self._perm is not None:
                # clustered storage must cover every full cell block, AND
                # stay a multiple of rows_per_cell — the Pallas cell-probe
                # path requires P % rpc == 0 (it silently falls back to the
                # slow XLA gather otherwise)
                rpc = self._rows_per_cell
                padded = max(padded, self._centroids.shape[0] * rpc)
                padded = -(-padded // rpc) * rpc
            vec = self._vectors
            scales = self._scales
            if padded != n:
                vec = np.concatenate(
                    [vec, np.zeros((padded - n, vec.shape[1]), vec.dtype)]
                )
                if scales is not None:
                    scales = np.concatenate(
                        [scales, np.ones(padded - n, scales.dtype)]
                    )
            self._device_vectors = jnp.asarray(vec)
            self._device_scales = (
                jnp.asarray(scales) if scales is not None else None
            )
            self._device_centroids = (
                jnp.asarray(self._centroids)
                if self._centroids is not None
                else None
            )
            self._device_refine = (
                jnp.asarray(self._refine)
                if self._refine is not None and self.refine_storage == "device"
                else None
            )

    def search(self, query_emb: np.ndarray, k: int = 10):
        """Top-k search. ``query_emb`` [B, D] (or [D]); returns
        (scores [B, k], indices [B, k]) numpy, -1/-inf padded — FAISS
        convention (reference: serve/app.py:293-300)."""
        import jax.numpy as jnp

        from sskd_tpu.ops.topk import cosine_topk

        if not self.is_built:
            raise IndexLoadError("index not built/loaded")
        q = np.asarray(query_emb, dtype=np.float32)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        if q.shape[1] != self.embedding_dim:
            raise IndexBuildError(
                f"query dim {q.shape[1]} != index dim {self.embedding_dim}"
            )
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        self._ensure_device()
        block = min(self.block_rows, max(128, self.ntotal))
        if self.index_type == "clustered":
            from sskd_tpu.ops.topk_cluster import (
                CLUSTER_MAX_BATCH,
                clustered_topk,
            )

            if q.shape[0] <= CLUSTER_MAX_BATCH:
                vals, idx = clustered_topk(
                    jnp.asarray(q),
                    self._device_vectors,
                    self._device_centroids,
                    k=k,
                    nprobe=self.nprobe,
                    rows_per_cell=self._rows_per_cell,
                    row_scales=self._device_scales,
                    valid_n=self.ntotal,
                )
            else:
                # probe union approaches the corpus at large B — the full
                # approx sweep is the better engine there
                vals, idx = cosine_topk(
                    jnp.asarray(q),
                    self._device_vectors,
                    k=k,
                    block_rows=block,
                    row_scales=self._device_scales,
                    valid_n=self.ntotal,
                    method="approx",
                    recall_target=self.recall_target,
                )
            return np.asarray(vals), self.map_positions(np.asarray(idx))
        if self._refine is not None and self.index_type == "approx":
            if self.refine_storage == "host":
                from sskd_tpu.ops.topk import refined_candidates

                m = max(k, min(self.refine_m, self.ntotal))
                _, cand = refined_candidates(
                    jnp.asarray(q),
                    self._device_vectors,
                    refine_m=m,
                    row_scales=self._device_scales,
                    valid_n=self.ntotal,
                    block_rows=max(block, 1_048_576),
                )
                return self._host_rescore(q, np.asarray(cand), k)
            from sskd_tpu.ops.topk import refined_topk

            vals, idx = refined_topk(
                jnp.asarray(q),
                self._device_vectors,
                self._device_refine,
                k=k,
                refine_m=self.refine_m,
                row_scales=self._device_scales,
                valid_n=self.ntotal,
                block_rows=max(block, 1_048_576),
            )
            return np.asarray(vals), np.asarray(idx)
        vals, idx = cosine_topk(
            jnp.asarray(q),
            self._device_vectors,
            k=k,
            block_rows=block,
            row_scales=self._device_scales,
            valid_n=self.ntotal,
            method=self.index_type,
            recall_target=self.recall_target,
        )
        return np.asarray(vals), np.asarray(idx)

    def _host_rescore(
        self, q: np.ndarray, cand: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact rescore of sweep candidates against the HOST-resident bf16
        refine rows (``refine_storage="host"``): gather [B, m] candidate
        rows, f32 dot against the (already normalized) queries, top-k.
        Mirrors the device rescore's padding convention (-inf scores, -1
        positions for invalid slots)."""
        rows = self._refine
        safe = np.clip(cand, 0, rows.shape[0] - 1)
        gathered = rows[safe].astype(np.float32)  # [B, m, D]
        # mirror the device rescore's arithmetic (bf16 inputs, f32
        # accumulation): round q to bf16 before the f32 products so host
        # and device storage modes rank identically on near-ties
        q_bf = q.astype(rows.dtype).astype(np.float32)
        sc = np.einsum("bd,bmd->bm", q_bf, gathered, optimize=True)
        sc = np.where(cand >= 0, sc, -np.inf).astype(np.float32)
        order = np.argsort(-sc, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(sc, order, axis=1)
        idx = np.where(
            np.isfinite(vals), np.take_along_axis(cand, order, axis=1), -1
        ).astype(np.int32)
        if vals.shape[1] < k:  # refine_m (clamped to ntotal) < k
            pad = k - vals.shape[1]
            vals = np.concatenate(
                [vals, np.full((vals.shape[0], pad), -np.inf, np.float32)],
                axis=1,
            )
            idx = np.concatenate(
                [idx, np.full((idx.shape[0], pad), -1, np.int32)], axis=1
            )
        return vals, idx

    def map_positions(self, idx: np.ndarray) -> np.ndarray:
        """Map engine positions to ORIGINAL row positions (identity unless
        the index is clustered, whose rows are stored cell-reordered)."""
        if self._perm is None:
            return idx
        idx = np.asarray(idx)
        safe = np.clip(idx, 0, len(self._perm) - 1)
        return np.where(idx >= 0, self._perm[safe], -1).astype(idx.dtype)

    def get_texts(self, indices: Sequence[int]) -> list[str | None]:
        out = []
        for i in indices:
            if self.texts is not None and 0 <= i < len(self.texts):
                out.append(self.texts[i])
            else:
                out.append(None)
        return out

    def position_of(self, doc_id: str) -> int | None:
        """Index position for a doc id (None when unknown). The inverse map
        is built lazily on first use — the hybrid fusion path needs id->text
        lookups for BM25-only candidates."""
        if not hasattr(self, "_pos_by_id") or len(self._pos_by_id) != len(
            self.doc_ids
        ):
            self._pos_by_id = {d: i for i, d in enumerate(self.doc_ids)}
        return self._pos_by_id.get(doc_id)

    # ------------------------------------------------------------------
    # Validation gate
    # ------------------------------------------------------------------

    def validate(
        self, n_queries: int = 1000, k: int = 10, seed: int = 0
    ) -> dict[str, float]:
        """Build-time recall gate (reference: configs/index.yaml:52-56).

        Exact f32 search has recall 1.0 by construction; for int8/int4 the
        gate measures recall of the quantized search against f32 brute force
        over ``n_queries`` corpus-derived probes. The brute-force corpus is
        the closest available stand-in for the original embeddings: the bf16
        refine rows when ``refine_m > 0`` (they ARE the originals, so the
        gate credits the refine rescore), else the dequantized storage (the
        gate then measures sweep fidelity to what is stored).
        """
        if not self.is_built:
            raise IndexLoadError("index not built/loaded")
        rng = np.random.default_rng(seed)
        n = min(n_queries, self.ntotal)
        probe_rows = rng.choice(self.ntotal, size=n, replace=False)
        if self._refine is not None:
            full = self._refine.astype(np.float32)
        elif self.dtype == "int8":
            from sskd_tpu.ops.quant import dequantize_rows

            full = np.asarray(dequantize_rows(self._vectors, self._scales))
        elif self.dtype == "int4":
            from sskd_tpu.ops.quant import dequantize_rows_int4

            full = np.asarray(dequantize_rows_int4(self._vectors, self._scales))
        else:
            full = self._vectors.astype(np.float32)
        queries = full[probe_rows] + rng.normal(0, 0.05, (n, self.embedding_dim)).astype(
            np.float32
        )
        queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        # ground truth: f32 brute force (positions mapped to original order
        # when the storage is cell-reordered)
        gt_scores = queries @ full.T
        gt_top = self.map_positions(np.argsort(-gt_scores, axis=1)[:, :k])
        if self.index_type == "clustered":
            # chunk below the dispatcher threshold so the gate measures the
            # cell-probe path, not the large-batch sweep fallback
            from sskd_tpu.ops.topk_cluster import CLUSTER_MAX_BATCH

            parts = [
                self.search(queries[i : i + CLUSTER_MAX_BATCH], k=k)[1]
                for i in range(0, n, CLUSTER_MAX_BATCH)
            ]
            idx = np.concatenate(parts, axis=0)
        else:
            _, idx = self.search(queries, k=k)
        recall = float(
            np.mean(
                [
                    len(set(gt_top[i]) & set(idx[i])) / k
                    for i in range(n)
                ]
            )
        )
        return {"recall@%d" % k: recall, "n_queries": float(n)}
