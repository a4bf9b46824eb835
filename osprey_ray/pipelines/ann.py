"""Similarity search over the ``embeddings`` table.

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (the baseline; exact, SQL-checkable with
  ``list_cosine_similarity``);
- LSH-bucketed ANN (random hyperplane signs) as the scale path: candidates
  only within matching buckets (multi-probe over all tables), recall
  reported against brute force;
- embedding cosine near-duplicate pairs.

All in float64 so ranking ties match DuckDB's double math.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _read_emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    arr = t["embedding"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(ids)
    return ids, flat.reshape(len(ids), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_set(sf_dir: str, n_queries: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """First n_queries vectors (by vec_id) are the query set."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids, m = _to_matrix(t)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    return ids[:n_queries], m[:n_queries]


def q_ann_bruteforce(sf_dir: str, k: int = 5, n_queries: int = 10):
    """Exact cosine top-k: per-batch partial top-k against the broadcast
    query matrix, final merge on the driver (tiny: n_queries × k rows).
    Self-matches excluded.  Output ranks only (ints) for hash parity."""
    q_ids, q_m = _query_set(sf_dir, n_queries)
    qn = _normalize(q_m)

    def partial(t: pa.Table) -> pa.Table:
        ids, m = _to_matrix(t)
        sims = _normalize(m) @ qn.T  # (batch, nq)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            s = sims[:, qi]
            mask = ids != q_ids[qi]
            cand = np.flatnonzero(mask)
            top = cand[np.argsort(-s[cand], kind="stable")[: k * 2]]
            out_q.extend([q_ids[qi]] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_emb(sf_dir).map_batches(partial, batch_format="pyarrow").to_pandas()
    # final exact top-k merge (sim desc, neighbor_id asc tie-break)
    parts = parts.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    topk = parts.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return pa.table(
        {
            "query_id": pa.array(topk["query_id"], pa.int64()),
            "neighbor_id": pa.array(topk["neighbor_id"], pa.int64()),
            "rank": pa.array(topk["rank"], pa.int64()),
        }
    )


class LshHasher:
    """Random-hyperplane LSH (actor stage; planes drawn once per actor from
    a fixed seed so every actor agrees)."""

    def __init__(self, dim: int = 64, n_tables: int = 16, n_bits: int = 6, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables

    def signatures(self, m: np.ndarray) -> np.ndarray:
        # (n, tables) integer bucket ids
        out = np.empty((m.shape[0], self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (m @ self.planes[t].T) > 0  # (n, n_bits)
            out[:, t] = bits @ (1 << np.arange(bits.shape[1]))
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, m = _to_matrix(t)
        sig = self.signatures(_normalize(m))
        n, T = sig.shape
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, T), pa.int64()),
                "table_id": pa.array(np.tile(np.arange(T), n), pa.int32()),
                "bucket": pa.array(sig.reshape(-1), pa.int64()),
            }
        )


def q_ann_lsh(sf_dir: str, k: int = 5, n_queries: int = 10):
    """LSH-bucketed ANN + recall vs brute force.  Candidates = vectors
    sharing any (table, bucket) with the query; exact rerank inside the
    candidate set.  Returns per-query candidate count and recall_pct."""
    q_ids, q_m = _query_set(sf_dir, n_queries)
    hasher = LshHasher(dim=q_m.shape[1])
    q_sig = hasher.signatures(_normalize(q_m))

    buckets = _read_emb(sf_dir).map_batches(
        LshHasher, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"dim": q_m.shape[1]},
    ).to_pandas()

    bucket_sets = [
        set(map(tuple, zip(q_sig[i], range(hasher.n_tables)))) for i in range(len(q_ids))
    ]
    key = list(zip(buckets["bucket"], buckets["table_id"]))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids_all, m_all = _to_matrix(t)
    mn = _normalize(m_all)
    pos = {int(v): i for i, v in enumerate(ids_all)}
    qn = _normalize(q_m)

    brute = q_ann_bruteforce(sf_dir, k, n_queries).to_pandas()
    rows = []
    for qi, qid in enumerate(q_ids):
        cand_ids = {
            int(v)
            for v, key_ in zip(buckets["vec_id"], key)
            if key_ in bucket_sets[qi] and int(v) != int(qid)
        }
        cand = sorted(cand_ids)
        if cand:
            idx = np.array([pos[c] for c in cand])
            sims = mn[idx] @ qn[qi]
            order = np.argsort(-sims, kind="stable")[:k]
            got = {cand[i] for i in order.tolist()}
        else:
            got = set()
        want = set(brute[brute["query_id"] == qid]["neighbor_id"].tolist())
        recall = int(round(100 * len(got & want) / max(1, len(want))))
        rows.append((int(qid), len(cand), recall))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_candidates": pa.array([r[1] for r in rows], pa.int64()),
            "recall_pct": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_embed_neardup(sf_dir: str, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim ≥ τ).
    Per-batch matmul against the broadcast full matrix — O(n²/B) work per
    batch, which at real scale becomes the LSH path above."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids_all, m_all = _to_matrix(t)
    order = np.argsort(ids_all)
    ids_all, m_all = ids_all[order], _normalize(m_all[order])

    def pairs(t: pa.Table) -> pa.Table:
        ids, m = _to_matrix(t)
        sims = _normalize(m) @ m_all.T
        a_out, b_out = [], []
        for i in range(len(ids)):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                if ids[i] < ids_all[j]:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids_all[j]))
        return pa.table(
            {"vec_a": pa.array(a_out, pa.int64()), "vec_b": pa.array(b_out, pa.int64())}
        )

    ds = _read_emb(sf_dir).map_batches(pairs, batch_format="pyarrow")
    # materialize to a schema-stable Table (an empty Dataset loses its
    # schema through to_pandas, which would fail the driver's schema check)
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    if not parts:
        return schema.empty_table()
    return pa.concat_tables([p.select(["vec_a", "vec_b"]) for p in parts])
