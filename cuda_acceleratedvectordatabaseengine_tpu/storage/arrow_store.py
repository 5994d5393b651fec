"""Arrow IPC columnar persistence (F2, ``format/storage.h:44-89``).

Same design as the reference's ``ArrowStorage``: RecordBatch files with
schema (uint64 id, list<float32> vector) for vectors, centroids and PQ
codebooks (codebook id packs (m << 16 | k) exactly as the reference does at
``format/storage.cpp:255-271``), offset/length slicing on read, and
memory-mapped whole-file reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

VECTOR_SCHEMA = pa.schema(
    [("id", pa.uint64()), ("vector", pa.list_(pa.float32()))]
)

CODES_SCHEMA = pa.schema(
    [("id", pa.uint64()), ("code", pa.list_(pa.uint8()))]
)


class VectorFileWriter:
    """Chunk-appending writer for the vectors schema: one record batch per
    ``append``, so a >RAM corpus streams to disk without ever
    concatenating (readers slice across batches transparently). Used by
    the chunked epoch builder for the pq_capacity tier's host-rerank
    rows."""

    def __init__(self, path: str):
        self._writer = ipc.new_file(path, VECTOR_SCHEMA)
        self.rows = 0

    def append(self, ids: np.ndarray, vectors: np.ndarray) -> None:
        n, dim = vectors.shape
        flat = pa.array(
            np.ascontiguousarray(vectors, np.float32).reshape(-1)
        )
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
        )
        vec_col = pa.ListArray.from_arrays(offsets, flat)
        self._writer.write_batch(pa.record_batch(
            {"id": pa.array(np.asarray(ids, np.uint64)), "vector": vec_col},
            schema=VECTOR_SCHEMA,
        ))
        self.rows += n

    def close(self) -> None:
        self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ArrowStorage:
    """Stateless read/write helpers over Arrow IPC files."""

    # ------------------------------------------------------------------ #
    # vectors
    # ------------------------------------------------------------------ #

    @staticmethod
    def write_vectors(path: str, ids: np.ndarray, vectors: np.ndarray) -> None:
        """Write ``[n]`` uint64 ids + ``[n, dim]`` fp32 vectors."""
        n, dim = vectors.shape
        flat = pa.array(
            np.ascontiguousarray(vectors, np.float32).reshape(-1)
        )
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
        )
        vec_col = pa.ListArray.from_arrays(offsets, flat)
        table = pa.table(
            {"id": pa.array(ids.astype(np.uint64)), "vector": vec_col},
            schema=VECTOR_SCHEMA,
        )
        with ipc.new_file(path, VECTOR_SCHEMA) as w:
            w.write_table(table)

    @staticmethod
    def read_vectors(
        path: str, offset: int = 0, length: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Read back (ids [n], vectors [n, dim]); supports row slicing like
        the reference's offset/length read (``format/storage.cpp:160-180``).
        Uses memory-mapped IPC so large corpora page in lazily."""
        with pa.memory_map(path) as source:
            table = ipc.open_file(source).read_all()
            if offset or length is not None:
                table = table.slice(offset, length)
            ids = table.column("id").to_numpy(zero_copy_only=False)
            vec = table.column("vector")
            flat = vec.combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        n = len(ids)
        dim = flat.size // max(n, 1)
        return ids.astype(np.uint64), flat.reshape(n, dim).copy()

    @staticmethod
    def num_rows(path: str) -> int:
        """Total row count from file metadata — no vector data is read
        (the chunked builder sizes arena capacity from this before any
        chunk loads)."""
        with pa.memory_map(path) as source:
            reader = ipc.open_file(source)
            return sum(
                reader.get_batch(i).num_rows
                for i in range(reader.num_record_batches)
            )

    @staticmethod
    def iter_vector_chunks(path: str, chunk_rows: int):
        """Yield ``(ids, vectors)`` slices of at most ``chunk_rows`` rows.
        Each chunk is materialized independently off the memory map, so
        peak host RAM is one chunk regardless of corpus size — the
        streaming read the reference's offset/length API was built for
        (``format/storage.cpp:160-180``) but its builder never used."""
        total = ArrowStorage.num_rows(path)
        for off in range(0, total, chunk_rows):
            yield ArrowStorage.read_vectors(
                path, offset=off, length=min(chunk_rows, total - off)
            )

    @staticmethod
    def read_train_sample(
        path: str, rows: int, n_slices: int = 32
    ) -> np.ndarray:
        """Gather ≈``rows`` training vectors as evenly spaced slices
        across the whole file (bounded RAM, robust to sorted/clustered
        row order — a head-of-file sample would train on whatever the
        first chunk happens to contain)."""
        total = ArrowStorage.num_rows(path)
        rows = min(rows, total)
        n_slices = max(1, min(n_slices, rows))
        per = -(-rows // n_slices)
        stride = max(total // n_slices, per)
        parts = []
        got = 0
        for i in range(n_slices):
            off = min(i * stride, max(total - per, 0))
            take = min(per, total - off, rows - got)
            if take <= 0:
                break
            parts.append(
                ArrowStorage.read_vectors(path, offset=off, length=take)[1]
            )
            got += take
        return np.concatenate(parts) if parts else np.zeros((0, 0))

    # ------------------------------------------------------------------ #
    # centroids / codebooks — same schema, synthetic ids
    # ------------------------------------------------------------------ #

    @staticmethod
    def write_centroids(path: str, centroids: np.ndarray) -> None:
        ids = np.arange(centroids.shape[0], dtype=np.uint64)
        ArrowStorage.write_vectors(path, ids, centroids)

    @staticmethod
    def read_centroids(path: str) -> np.ndarray:
        _, c = ArrowStorage.read_vectors(path)
        return c

    @staticmethod
    def write_codebooks(path: str, codebooks: np.ndarray) -> None:
        """``[m, ks, dsub]`` fp32; row id = (m << 16) | k, matching
        ``format/storage.cpp:255-271``."""
        m, ks, dsub = codebooks.shape
        ids = (
            (np.repeat(np.arange(m, dtype=np.uint64), ks) << np.uint64(16))
            | np.tile(np.arange(ks, dtype=np.uint64), m)
        )
        ArrowStorage.write_vectors(path, ids, codebooks.reshape(m * ks, dsub))

    @staticmethod
    def read_codebooks(path: str) -> np.ndarray:
        ids, flat = ArrowStorage.read_vectors(path)
        m = int((ids[-1] >> np.uint64(16)) + 1)
        ks = flat.shape[0] // m
        return flat.reshape(m, ks, flat.shape[1])

    # ------------------------------------------------------------------ #
    # PQ codes
    # ------------------------------------------------------------------ #

    @staticmethod
    def write_codes(path: str, ids: np.ndarray, codes: np.ndarray) -> None:
        n, m = codes.shape
        flat = pa.array(np.ascontiguousarray(codes, np.uint8).reshape(-1))
        offsets = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
        col = pa.ListArray.from_arrays(offsets, flat)
        table = pa.table(
            {"id": pa.array(ids.astype(np.uint64)), "code": col},
            schema=CODES_SCHEMA,
        )
        with ipc.new_file(path, CODES_SCHEMA) as w:
            w.write_table(table)

    @staticmethod
    def read_codes(path: str) -> tuple[np.ndarray, np.ndarray]:
        with pa.memory_map(path) as source:
            table = ipc.open_file(source).read_all()
            ids = table.column("id").to_numpy(zero_copy_only=False)
            flat = table.column("code").combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        n = len(ids)
        m = flat.size // max(n, 1)
        return ids.astype(np.uint64), flat.reshape(n, m).copy()
