"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix — the canonical "small side via ray.put,
lookup inside map_batches" pattern), plus an LSH-bucketed approximate
variant as the scale path (random-hyperplane signs -> bucket groupby ->
within-bucket exact search).

The embedding model itself is the T3 analog (``llm_client.py:128-148``:
SentenceTransformer loaded once per worker); here embeddings are
pre-computed input, and the scorer state is the broadcast query matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.numerics import round_half_away

N_QUERIES = 5  # queries = embeddings with vec_id < N_QUERIES
TOP_K = 10
COS_DECIMALS = 6  # rank on rounded cosine; deterministic tie-break by vec_id
LSH_PLANES = 4  # hyperplane count for the approximate variant


def _read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Load the N_QUERIES query vectors (tiny driver-side read)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = t.filter(pa.compute.less(t["vec_id"], N_QUERIES))
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, m


class BruteForceScorer:
    """Actor-pool stage: per batch, cosine of every row vs the broadcast
    query matrix, emitting per-batch partial top-k per query."""

    def __init__(self, query_ref):
        qids, qm = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = qids
        self.qm = qm
        self.qnorm = np.linalg.norm(qm, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        sims = (self.qm @ m.T) / np.outer(self.qnorm, norms)  # (Q, B)
        sims = round_half_away(sims, COS_DECIMALS)
        q_out, n_out, c_out = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            mask = ids != qid  # exclude self
            order = np.lexsort((ids[mask], -row[mask]))[: TOP_K]
            sel = np.nonzero(mask)[0][order]
            q_out.extend([int(qid)] * len(sel))
            n_out.extend(ids[sel].tolist())
            c_out.extend(row[sel].tolist())
        return pa.table(
            {
                "qid": pa.array(q_out, type=pa.int64()),
                "nid": pa.array(n_out, type=pa.int64()),
                "cos": pa.array(c_out, type=pa.float64()),
            }
        )


def ann_brute_topk(sf_dir: str) -> ray.data.Dataset:
    """Exact cosine top-10 neighbors for each of the 5 query vectors.

    Output: (qid, nid, cos) — cos rounded to 6 dp; ranking by
    (cos desc, nid asc).  Per-batch partial top-k then a final per-query
    top-k in map_groups (no global sort of the full score matrix)."""
    ref = ray.put(_query_matrix(sf_dir))
    partials = _read_embeddings(sf_dir).map_batches(
        BruteForceScorer,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "nid"], ascending=[False, True]).head(TOP_K)
        return g[["qid", "nid", "cos"]]

    return partials.groupby("qid").map_groups(final_topk, batch_format="pandas")


def ann_lsh_topk(sf_dir: str, n_planes: int = LSH_PLANES) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing, exact search only
    within each query's bucket.  Deterministic planes (seeded).  Returns a
    pandas DataFrame (qid, nid, cos, bucket) — the scale path demonstrator;
    accuracy measured against ann_brute_topk in tests."""
    qids, qm = _query_matrix(sf_dir)
    # deterministic hyperplanes from a fixed seed and the embedding dim
    rng = np.random.RandomState(7)
    planes = rng.standard_normal((qm.shape[1], n_planes))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        m = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        signs = (m @ p) > 0  # (B, planes)
        bucket = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    ds = _read_embeddings(sf_dir).map_batches(bucketize, batch_format="pyarrow")
    q_signs = (qm @ planes) > 0
    q_buckets = (q_signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)

    def search(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        sel = np.nonzero(q_buckets == b)[0]
        if len(sel) == 0:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "nid": pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64"),
                 "bucket": pd.Series([], dtype="int64")}
            )
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        out = []
        for qi in sel:
            sims = round_half_away((qm[qi] @ m.T) / (np.linalg.norm(qm[qi]) * norms), COS_DECIMALS)
            mask = ids != qids[qi]
            order = np.lexsort((ids[mask], -sims[mask]))[:TOP_K]
            take = np.nonzero(mask)[0][order]
            for t in take:
                out.append((int(qids[qi]), int(ids[t]), float(sims[t]), b))
        return pd.DataFrame(out, columns=["qid", "nid", "cos", "bucket"])

    return ds.groupby("bucket").map_groups(search, batch_format="pandas").to_pandas()


ORACLE_SQL: dict[str, str] = {
    "ann_brute_topk": f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid, e.vec_id AS nid,
         round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])),
               {COS_DECIMALS}) AS cos
  FROM q, embeddings e WHERE e.vec_id != q.qid
)
SELECT qid, nid, cos FROM s
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) <= {TOP_K}
""",
}
