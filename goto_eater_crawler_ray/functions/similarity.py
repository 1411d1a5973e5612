"""Similarity search over an embedding column (list<float>), Ray-Data-first.

Two paths over the ``embeddings`` table (vec_id, embedding, label):

  brute-force cosine top-k  — baseline: one numpy matmul per batch against
      a query matrix broadcast ONCE with ``ray.put`` (never re-shipped per
      batch); exact, SQL-oracle-twin-able via DuckDB list_cosine_similarity.
  LSH-bucketed ANN          — scale path: random-hyperplane signatures
      (sign-LSH, Charikar 2002) bucket both corpus and queries; search only
      within matching buckets via a groupby co-location. Approximate; the
      test measures recall against brute force instead of an SQL oracle.

Embedding cosine near-dup (threshold pairs) reuses the same matmul shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 contiguous matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(emb_ds, query_ids: list[int], k: int = 5, round_dp: int = 4, exclude_same_label: bool = False):
    """Exact cosine top-k: (query_id, neighbor_id, rank, score).

    Self-matches excluded.  Scores rounded so the DuckDB oracle twin
    hash-matches bit-for-bit.

    ``exclude_same_label=True`` is the hard-negative miner (contrastive
    training pairs): only corpus vectors with a DIFFERENT ``label`` than
    the query are candidates.  The query labels broadcast with the query
    matrix; ``emb_ds`` must then carry a ``label`` column."""
    import ray

    q_rows = emb_ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    q_rows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = _l2_normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    q_labels = np.array([r["label"] for r in q_rows]) if exclude_same_label else None
    q_ref = ray.put((q_ids, q_mat, q_labels))

    def score_batch(batch: pa.Table) -> pa.Table:
        ids, mat, labels = ray.get(q_ref)
        c_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        c_labels = batch.column("label").to_numpy(zero_copy_only=False) if labels is not None else None
        c_mat = _l2_normalize(_as_matrix(batch.column("embedding")))
        sims = c_mat @ mat.T  # (n_corpus, n_query)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(ids):
            mask = c_ids != qid
            if labels is not None:
                mask &= c_labels != labels[j]
            n_ids, s = c_ids[mask], sims[mask, j]
            # local top-k pre-prune BEFORE the groupby shuffle (same trick
            # as window.top_n_per_key): the global top-k under the
            # (score desc, neighbor_id asc) total order is contained in the
            # union of per-batch top-ks under the same order, so the
            # exchange carries O(blocks*k*queries) rows instead of
            # O(corpus*queries)
            if len(s) > k:
                top = np.lexsort((n_ids, -s))[:k]
                n_ids, s = n_ids[top], s[top]
            out_q.append(np.full(len(n_ids), qid))
            out_n.append(n_ids)
            out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    _empty_topk = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
            "rank": pd.Series(dtype="int64"),
        }
    )

    def topk_per_query(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # schema-stable empty block (sort tails emit these)
            return _empty_topk
        # deterministic tie-break on neighbor_id
        df = df.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64), score=np.round(df["score"].to_numpy(), round_dp))
        return df

    scored = emb_ds.map_batches(score_batch, batch_format="pyarrow")
    return scored.groupby("query_id").map_groups(topk_per_query, batch_format="pandas")


class SignLSH:
    """Random-hyperplane signature stage (actor pool: planes built once)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.weights = (1 << np.arange(n_planes, dtype=np.uint64))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs.astype(np.uint64) * self.weights[None, :]).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column("embedding"))
        return batch.append_column("bucket", pa.array(self.bucket_of(mat), pa.uint64()))


def lsh_ann_topk(emb_ds, query_ids: list[int], dim: int, k: int = 5, n_planes: int = 8):
    """Approximate top-k: sign-LSH buckets -> per-bucket exact rerank.
    Queries whose bucket lacks k neighbors return fewer rows (documented
    approximation; recall measured against brute force in tests)."""
    bucketed = emb_ds.map_batches(SignLSH, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes}, batch_format="pyarrow", concurrency=(1, 4))
    qset = set(query_ids)

    _empty_ann = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        qs = df[df["vec_id"].isin(qset)] if not df.empty else df
        if df.empty or qs.empty:
            return _empty_ann
        mat = _l2_normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
        ids = df["vec_id"].to_numpy()
        out = []
        for _, q in qs.iterrows():
            qv = _l2_normalize(np.array([q["embedding"]], dtype=np.float64))[0]
            sims = mat @ qv
            order = np.lexsort((ids, -sims))
            taken = 0
            for idx in order:
                if ids[idx] == q["vec_id"]:
                    continue
                taken += 1
                out.append((q["vec_id"], ids[idx], taken, round(float(sims[idx]), 4)))
                if taken == k:
                    break
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank", "score"])

    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def cosine_near_dup_pairs(emb_ds, threshold: float = 0.95, id_limit: int | None = None, round_dp: int = 4):
    """Embedding-cosine near-duplicate pairs (a<b, sim>=threshold).

    Two paths:
      * ``id_limit`` set — EXACT: corpus matmul against a broadcast
        reference matrix explicitly bounded to ``vec_id < id_limit``
        (SQL-oracle-twin-able; the broadcast is id_limit rows, never the
        corpus).
      * ``id_limit=None`` — the at-scale default routes through
        multi-table sign-LSH bucketing (:func:`lsh_cosine_pairs`):
        pairs are found inside hash buckets via groupby co-location, so
        nothing corpus-sized is ever materialized or broadcast.
        Approximate (recall measured against the exact path in tests).
    """
    import ray

    if id_limit is None:
        return lsh_cosine_pairs(emb_ds, threshold=threshold, round_dp=round_dp)
    ref_ds = emb_ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], id_limit)), batch_format="pyarrow"
    )
    rows = ref_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows])
    mat = _l2_normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    ref = ray.put((ids, mat))

    _empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
    )

    def pairs(batch: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(ref)
        c_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if id_limit is not None:
            keep = c_ids < id_limit
            batch = batch.filter(pa.array(keep))
            c_ids = c_ids[keep]
        if len(c_ids) == 0:
            return _empty
        c_mat = _l2_normalize(_as_matrix(batch.column("embedding")))
        sims = c_mat @ r_mat.T
        ii, jj = np.nonzero((sims >= threshold) & (c_ids[:, None] < r_ids[None, :]))
        return pa.table(
            {
                "vec_a": pa.array(c_ids[ii], pa.int64()),
                "vec_b": pa.array(r_ids[jj], pa.int64()),
                "cos_sim": pa.array(np.round(sims[ii, jj], round_dp), pa.float64()),
            }
        )

    return emb_ds.map_batches(pairs, batch_format="pyarrow")


_COS_PAIR_SCHEMA = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_sim", pa.float64())])


class MultiTableSignLSH:
    """Actor-pool stage: explode each vector into ``n_tables`` independent
    sign-LSH bucket rows (table_id, bucket, vec_id, embedding).  Multiple
    tables trade shuffle volume for recall: a cos≈0.95 pair lands in the
    same bucket of at least one of 8 x 8-plane tables w.h.p. (Charikar
    2002 collision probability (1 - theta/pi)^planes per table)."""

    def __init__(self, dim: int, n_planes: int = 8, n_tables: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, n_planes))
        self.weights = 1 << np.arange(n_planes, dtype=np.uint64)
        self.n_tables = n_tables

    N_BUCKET_PARTS = 256  # coarse groupby partitions (see lsh_cosine_pairs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base = batch.select(["vec_id", "embedding"])
        if n == 0:
            return (
                base.append_column("table_id", pa.array([], pa.int32()))
                .append_column("bucket", pa.array([], pa.uint64()))
                .append_column("bucket_part", pa.array([], pa.int32()))
            )
        mat = _as_matrix(batch.column("embedding"))
        t_ids, buckets = [], []
        for t in range(self.n_tables):
            signs = (mat @ self.planes[t]) > 0
            buckets.append((signs.astype(np.uint64) * self.weights[None, :]).sum(axis=1))
            t_ids.append(np.full(n, t, dtype=np.int32))
        rep = pa.concat_tables([base] * self.n_tables)
        tid = np.concatenate(t_ids)
        bkt = np.concatenate(buckets)
        part = ((bkt * np.uint64(self.n_tables) + tid.astype(np.uint64)) & np.uint64(self.N_BUCKET_PARTS - 1)).astype(np.int32)
        return (
            rep.append_column("table_id", pa.array(tid, pa.int32()))
            .append_column("bucket", pa.array(bkt, pa.uint64()))
            .append_column("bucket_part", pa.array(part, pa.int32()))
        )


def lsh_cosine_pairs(
    emb_ds,
    threshold: float = 0.95,
    round_dp: int = 4,
    n_planes: int = 8,
    n_tables: int = 8,
    hot_bucket_cap: int = 2000,
):
    """Unbounded-corpus cosine near-dup pairs via multi-table sign-LSH:
    bucket rows shuffle (groupby co-location), pairwise matmul is
    bucket-local, and cross-table pair dedup is ONE aggregate shuffle of
    only the passing pairs.  Nothing touches the driver.  Buckets larger
    than ``hot_bucket_cap`` emit star pairs against the bucket minimum
    (documented hot-key guard)."""
    from ray.data.aggregate import Max

    first = emb_ds.take(1)
    if not first:
        import ray.data as rd

        return rd.from_arrow(_COS_PAIR_SCHEMA.empty_table())
    dim = len(first[0]["embedding"])

    bucketed = emb_ds.map_batches(
        MultiTableSignLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "n_tables": n_tables},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def per_bucket_part(part_tbl: pa.Table) -> pa.Table:
        # coarse partition: many complete (table_id, bucket) buckets per
        # call, singleton runs skipped wholesale (cuts the dominant
        # per-tiny-group map_groups overhead; co-location preserved since
        # bucket_part is a pure function of the bucket key)
        n = part_tbl.num_rows
        if n < 2:
            return _COS_PAIR_SCHEMA.empty_table()
        tid = part_tbl.column("table_id").to_numpy(zero_copy_only=False)
        bkt = part_tbl.column("bucket").to_numpy(zero_copy_only=False)
        ids = part_tbl.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _l2_normalize(_as_matrix(part_tbl.column("embedding")))
        order = np.lexsort((ids, bkt, tid))
        tid, bkt, ids, mat = tid[order], bkt[order], ids[order], mat[order]
        starts = np.flatnonzero(np.concatenate(([True], (tid[1:] != tid[:-1]) | (bkt[1:] != bkt[:-1]))))
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        out_a, out_b, out_s = [], [], []
        for s_, e_ in zip(starts[sizes >= 2], ends[sizes >= 2]):
            b_ids, b_mat = ids[s_:e_], mat[s_:e_]
            bn = e_ - s_
            if bn > hot_bucket_cap:  # hot-bucket star guard
                sims = b_mat[1:] @ b_mat[0]
                keep = sims >= threshold
                if keep.any():
                    out_a.append(np.full(int(keep.sum()), b_ids[0], dtype=np.int64))
                    out_b.append(b_ids[1:][keep])
                    out_s.append(sims[keep])
            else:
                sims = b_mat @ b_mat.T
                ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
                if len(ii):
                    out_a.append(b_ids[ii].astype(np.int64))
                    out_b.append(b_ids[jj])
                    out_s.append(sims[ii, jj])
        if not out_a:
            return _COS_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
                "cos_sim": pa.array(np.round(np.concatenate(out_s), round_dp), pa.float64()),
            }
        )

    cand = bucketed.groupby("bucket_part").map_groups(per_bucket_part, batch_format="pyarrow")
    # cos_sim identical wherever found -> Max == the value; one shuffle
    return cand.groupby(["vec_a", "vec_b"]).aggregate(Max("cos_sim", alias_name="cos_sim"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — trained coarse quantizer, the classic scale path
# ---------------------------------------------------------------------------


def ivf_train_centroids(emb_ds, n_centroids: int = 16, sample_limit: int = 4096, iters: int = 10, seed: int = 3):
    """Train the IVF coarse quantizer: Lloyd's k-means on a BOUNDED sample
    (explicit ``sample_limit`` — the standard IVF recipe trains on a small
    sample, never the corpus; public literature: Sivic-Zisserman Video
    Google 2003, FAISS IVF docs).  Returns an L2-normalized (k, d) centroid
    matrix — a few KB, broadcast to every stage."""
    rows = emb_ds.limit(sample_limit).take_all()
    X = _l2_normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(X))
    cent = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cent)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
            else:  # empty cluster: reseed to the worst-served point
                new[c] = X[sims.max(axis=1).argmin()]
        cent = _l2_normalize(new)
    return cent


def ivf_ann_topk(emb_ds, query_ids: list[int], k: int = 5, n_centroids: int = 16, n_probe: int = 2, round_dp: int = 4, centroids=None):
    """IVF approximate top-k: assign every corpus vector to its nearest
    trained centroid (one matmul per batch against the broadcast centroid
    matrix), route each query to its ``n_probe`` nearest lists, search
    only inside those lists via groupby co-location, then merge per-query
    candidates with one tiny groupby.  Recall is tested against brute
    force; raise ``n_probe`` to trade throughput for recall.  Pass
    ``centroids`` (a pre-trained L2-normalized (k, d) matrix) to skip
    training — the frozen-model production shape, which also makes the
    whole search a deterministic function expressible in SQL."""
    import ray

    cent = ivf_train_centroids(emb_ds, n_centroids=n_centroids) if centroids is None else np.asarray(centroids, np.float64)
    cent_ref = ray.put(cent)

    q_rows = emb_ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    q_rows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = _l2_normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    # each query probes its n_probe nearest lists
    probe_lists = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    q_ref = ray.put((q_ids, q_mat, probe_lists))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], batch.schema.field("embedding").type),
                    "list_id": pa.array([], pa.int32()),
                }
            )
        mat = _l2_normalize(_as_matrix(batch.column("embedding")))
        lists = (mat @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {"vec_id": batch.column("vec_id"), "embedding": batch.column("embedding"), "list_id": pa.array(lists, pa.int32())}
        )

    _cand_schema = pa.schema(
        [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64())]
    )

    def search_list(group: pa.Table) -> pa.Table:
        ids_, mat_, probes_ = ray.get(q_ref)
        if group.num_rows == 0:
            return _cand_schema.empty_table()
        lid = int(group.column("list_id")[0].as_py())
        probing = np.flatnonzero((probes_ == lid).any(axis=1))
        if len(probing) == 0:
            return _cand_schema.empty_table()
        c_ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        c_mat = _l2_normalize(_as_matrix(group.column("embedding")))
        sims = c_mat @ mat_[probing].T  # (n_list, n_probing)
        out_q, out_n, out_s = [], [], []
        for j, qi in enumerate(probing):
            qid = ids_[qi]
            mask = c_ids != qid  # exclude self
            top = np.argsort(-sims[mask, j], kind="stable")[:k]
            out_q.append(np.full(len(top), qid, dtype=np.int64))
            out_n.append(c_ids[mask][top].astype(np.int64))
            out_s.append(sims[mask, j][top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    _empty_final = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
            "rank": pd.Series(dtype="int64"),
        }
    )

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_final
        df = df.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        return df.assign(
            rank=np.arange(1, len(df) + 1, dtype=np.int64), score=np.round(df["score"].to_numpy(), round_dp)
        )

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow")
    cands = assigned.groupby("list_id").map_groups(search_list, batch_format="pyarrow")
    return cands.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def kmeans_clusters(emb_ds, n_clusters: int = 8, sample_limit: int = 4096, iters: int = 10, seed: int = 3):
    """Spherical k-means cluster assignment over the embedding column —
    the standard corpus-clustering / semantic-bucketing op for training
    data curation (and the same machinery IVF uses for its coarse
    quantizer): train centroids on a BOUNDED driver sample
    (`ivf_train_centroids`), `ray.put` the KB-sized centroid matrix once,
    then one matmul per batch assigns every vector.  Nothing corpus-sized
    leaves the workers; deterministic for a fixed seed.  Non-SQL
    (iterative training) -> rows-only driver check + pytest invariants."""
    import ray

    cent = ivf_train_centroids(emb_ds, n_centroids=n_clusters, sample_limit=sample_limit, iters=iters, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int32())})
        c = ray.get(cent_ref)
        mat = _l2_normalize(_as_matrix(batch.column("embedding")))
        lab = (mat @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table({"vec_id": batch.column("vec_id"), "cluster": pa.array(lab, pa.int32())})

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def grouped_centroids(ds, label_col: str = "label", emb_col: str = "embedding", scale: int = 10_000):
    """Per-label embedding centroids as flat ``(label, dim, centroid)``
    rows with the mean emitted as ``round(mean*scale)`` BIGINT — the
    class-centroid statistic diversity/dedup curation pipelines compute
    over a labeled corpus.

    Combiner shape: each batch reduces to at most ``labels × d`` partial
    ``(label, dim, sum, count)`` rows (one `np.add.at` scatter per
    batch, no per-row Python), so the single ``groupby(label, dim)``
    exchange carries partials, never embeddings.  SQL twin: zip-UNNEST
    of the list column + GROUP BY — mean computed as ``sum/count`` on
    both sides so the scaled-int hash matches."""
    from ray.data.aggregate import Sum

    empty = pa.schema(
        [
            pa.field("label", pa.int64()),
            pa.field("dim", pa.int64()),
            pa.field("s", pa.float64()),
            pa.field("n", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty.empty_table()
        emb = _as_matrix(t.column(emb_col))
        labels = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), emb.shape[1]
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, inv, emb)
        counts = np.bincount(inv, minlength=k)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k), pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = t.column("s").to_numpy(zero_copy_only=False) / t.column("n").to_numpy(zero_copy_only=False)
        # DuckDB round() is half AWAY from zero; np.round is half-to-even —
        # a mean landing on an exact .5 centi-unit would hash-mismatch.
        m = mean * scale
        rounded = np.sign(m) * np.floor(np.abs(m) + 0.5)
        return pa.table(
            {
                "label": t.column("label"),
                "dim": t.column("dim"),
                "centroid_4dp": pa.array(rounded.astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pca_project(ds, id_col: str = "vec_id", emb_col: str = "embedding", scale: int = 10_000):
    """Projection of every embedding onto the corpus's top principal
    component — distributed PCA via the two-moment trick: each batch
    emits ONE row of sufficient statistics ``(n, Σx, Σx xᵀ flattened)``
    (d=64 → ~33 KB), the driver merges the tiny partial table, solves
    the d×d eigenproblem locally (O(d³), corpus-size-independent), and
    a second streaming pass projects each vector onto the broadcast
    component.  Sign fixed deterministically (largest-|loading|
    component positive).  Non-SQL (eigendecomposition) -> rows-only;
    subspace-equivalence pytest against full-matrix numpy PCA."""
    import ray

    def moment_partials(t: pa.Table) -> pa.Table:
        emb = _as_matrix(t.column(emb_col))
        n, d = emb.shape
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([emb.sum(axis=0)], pa.list_(pa.float64())),
                "xtx": pa.array([(emb.T @ emb).ravel()], pa.list_(pa.float64())),
            }
        )

    mom = ds.map_batches(moment_partials, batch_format="pyarrow").to_pandas()
    # an empty dataset never invokes the UDF, so the frame can lack columns
    n = int(mom["n"].sum()) if "n" in mom.columns else 0
    if n == 0:
        import ray.data

        # Dataset on every path (callers must not duck-type the return)
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "pc1_proj_4dp": pa.array([], pa.int64())})
        )
    s = np.sum(np.stack(mom["s"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(mom["xtx"].to_numpy()), axis=0)
    d = len(s)
    mu = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mu, mu)
    _, vecs = np.linalg.eigh(cov)
    pc1 = vecs[:, -1]
    if pc1[np.argmax(np.abs(pc1))] < 0:
        pc1 = -pc1
    ref = ray.put((mu, pc1))

    def project(t: pa.Table) -> pa.Table:
        mu_b, pc_b = ray.get(ref)
        emb = _as_matrix(t.column(emb_col))
        proj = (emb - mu_b) @ pc_b if len(emb) else np.zeros(0)
        return pa.table(
            {
                id_col: t.column(id_col),
                "pc1_proj_4dp": pa.array(np.round(proj * scale).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def pq_train_codebooks(emb_ds, m: int = 8, k: int = 16, sample_limit: int = 4096, iters: int = 10, seed: int = 5):
    """Product-quantization codebooks (Jégou/Douze/Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): plain Lloyd
    k-means run independently per SUBSPACE (d/m dims each) on a BOUNDED
    sample — like IVF training, the standard recipe fits the model on a
    few thousand vectors, never the corpus.  Returns an (m, k, d/m)
    codebook tensor (a few KB, broadcast to every encode task)."""
    rows = emb_ds.limit(sample_limit).take_all()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d = X.shape[1]
    assert d % m == 0, (d, m)
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, sub), np.float64)
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        kk = min(k, len(Xs))
        cent = Xs[rng.choice(len(Xs), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(axis=1)
            for c in range(kk):
                mem = Xs[a == c]
                cent[c] = mem.mean(axis=0) if len(mem) else Xs[d2.min(axis=1).argmax()]
        books[s, :kk] = cent
    return books


def pq_encode(emb_ds, codebooks, cc=None):
    """PQ ENCODE: (vec_id, subspace, code) — per batch, one (n, k)
    matmul per subspace against the broadcast codebooks;
    ``argmin ||x_s - c||² == argmin(||c||² - 2·x_s·c)`` with ties to
    the lowest code (numpy argmin ↔ the twin's ORDER BY score, code).
    Pass ``cc`` (the frozen ``||c||²`` table) so the Ray pass and the
    SQL twin score with the IDENTICAL literals."""
    B = np.asarray(codebooks, np.float64)
    m, k, sub = B.shape
    cc = (B**2).sum(-1) if cc is None else np.asarray(cc, np.float64)

    def enc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "subspace": pa.array([], pa.int64()), "code": pa.array([], pa.int64())}
            )
        mat = _as_matrix(t.column("embedding"))
        n = len(mat)
        codes = np.empty((n, m), np.int64)
        for s in range(m):
            Xs = mat[:, s * sub : (s + 1) * sub]
            codes[:, s] = (cc[s][None, :] - 2.0 * (Xs @ B[s].T)).argmin(axis=1)
        vec = np.repeat(t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64), m)
        return pa.table(
            {
                "vec_id": pa.array(vec, pa.int64()),
                "subspace": pa.array(np.tile(np.arange(m, dtype=np.int64), n), pa.int64()),
                "code": pa.array(codes.reshape(-1), pa.int64()),
            }
        )

    return emb_ds.map_batches(enc, batch_format="pyarrow")


def pq_adc_topk(emb_ds, codebooks, cc, lut, k_top: int = 10):
    """PQ asymmetric-distance top-k (the PQ paper's ADC search): encode
    each corpus vector, then its approximate distance to the frozen
    query is the EXACT int64 sum of per-subspace micro-unit lookup
    entries ``lut[s, code_s]`` — codes and distance computed in the
    SAME batch pass (no shuffle), per-block top-k prune bounds the
    final sort input.  ``lut`` is frozen alongside the codebooks, so
    the twin joins the identical integer table and the hash check is
    exact up to the code assignment itself."""
    B = np.asarray(codebooks, np.float64)
    m, k, sub = B.shape
    cc = np.asarray(cc, np.float64)
    lut = np.asarray(lut, np.int64)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "adc_micro": pa.array([], pa.int64())})
        mat = _as_matrix(t.column("embedding"))
        n = len(mat)
        adc = np.zeros(n, np.int64)
        for s in range(m):
            Xs = mat[:, s * sub : (s + 1) * sub]
            codes = (cc[s][None, :] - 2.0 * (Xs @ B[s].T)).argmin(axis=1)
            adc += lut[s, codes]
        out = pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "adc_micro": pa.array(adc, pa.int64()),
            }
        )
        # per-block top-k prune before the tiny global sort
        if out.num_rows > k_top:
            df = out.to_pandas().sort_values(["adc_micro", "vec_id"], kind="mergesort").head(k_top)
            out = pa.Table.from_pandas(df, preserve_index=False)
        return out

    return emb_ds.map_batches(score, batch_format="pyarrow").sort(["adc_micro", "vec_id"]).limit(k_top)
