"""Content-defined chunking (CDC) — the rsync / LBFS / FastCDC idea
(Muthitacharoen et al., "A Low-Bandwidth Network File System", SOSP
2001): cut each document into variable-size chunks at positions where a
hash of the local content crosses a threshold, so an insertion or
deletion only reshapes the chunks it touches — unlike fixed-size
blocks, shared content keeps producing identical chunks and dedups
across documents.  The storage-side dedup primitive a 100-TB corpus
store runs under its text/media blobs.

In-sandbox model: token-level chunking — token t closes a chunk when
``md5_number_upper(t) % divisor == 0`` (expected chunk = divisor
tokens) or at document end; the chunk's identity is
``md5_number_upper(join(tokens, ' ')) % 2^61``.  (FastCDC adds min/max
chunk-size clamps and gear tables; the boundary rule here is the plain
content-hash threshold, which keeps the DuckDB twin token-identical.)

Scale shape: chunking is BATCH-LOCAL (one streaming map_batches pass,
boundaries never cross documents, the text never shuffles); the dedup
accounting exchanges one row per chunk keyed by the 8-byte chunk hash
(combiner-first groupby), and only 4 scalars reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import md5_u64
from .text import _split_tokens

DIVISOR = 16  # expected tokens per chunk
FP_MOD = np.uint64(1) << np.uint64(61)

_CHUNK_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("chunk_idx", pa.int64()), ("n_toks", pa.int64()), ("chunk_hash", pa.int64())]
)


def cdc_chunk_batch(t: pa.Table, divisor: int = DIVISOR) -> pa.Table:
    """One batch's complete chunking: (doc_id, chunk_idx, n_toks,
    chunk_hash), ``chunk_idx`` 1-based within its document.  Vectorized:
    one md5 pass over the batch's distinct-token-free flat token array
    for boundaries, an exclusive within-document cumsum for chunk ids,
    one pandas group-join to materialize chunk strings, one md5 pass to
    hash them."""
    if t.num_rows == 0:
        return _CHUNK_SCHEMA.empty_table()
    parents, toks = _split_tokens(t)
    n = len(parents)
    if n == 0:
        return _CHUNK_SCHEMA.empty_table()
    words = toks.to_pandas().to_numpy()
    idx = np.arange(n)
    seg_start = np.concatenate(([True], parents[1:] != parents[:-1]))
    seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
    last_of_doc = np.concatenate([parents[1:] != parents[:-1], [True]])
    closes = (md5_u64(words) % np.uint64(divisor) == 0) | last_of_doc
    e = np.concatenate(([0], np.cumsum(closes)[:-1]))  # global exclusive prefix
    chunk_idx = 1 + (e - e[seg_first])  # within-doc exclusive prefix of closes
    df = pd.DataFrame({"p": parents, "c": chunk_idx, "w": words})
    g = df.groupby(["p", "c"], sort=False)["w"].agg([("s", " ".join), ("n", "size")]).reset_index()
    h = (md5_u64(g["s"].to_numpy()) % FP_MOD).astype(np.int64)
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[g["p"].to_numpy()]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64), pa.int64()),
            "chunk_idx": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            "n_toks": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "chunk_hash": pa.array(h, pa.int64()),
        }
    )


def cdc_chunks(docs_ds, divisor: int = DIVISOR):
    """Dataset of every document's content-defined chunks — one
    streaming map_batches pass, no shuffle."""
    return docs_ds.map_batches(lambda t: cdc_chunk_batch(t, divisor), batch_format="pyarrow")


def cdc_dedup_stats(docs_ds, divisor: int = DIVISOR):
    """Corpus-level CDC dedup accounting, ONE row: total chunks,
    distinct chunk hashes, total tokens, and tokens SAVED by storing
    each distinct chunk once (keeping the minimum-length occurrence —
    deterministic under the negligible-but-possible 2^61 hash
    collision, and mirrored in the twin).  The exchange carries one row
    per chunk keyed by hash; only the 4 scalars reach the driver."""
    from ray.data.aggregate import Count, Min, Sum

    per_hash = (
        cdc_chunks(docs_ds, divisor)
        .groupby("chunk_hash")
        .aggregate(Count(alias_name="n_occ"), Sum("n_toks", alias_name="sum_t"), Min("n_toks", alias_name="min_t"))
    )

    def partials(t: pa.Table) -> pa.Table:
        occ = t.column("n_occ").to_numpy(zero_copy_only=False)
        st = t.column("sum_t").to_numpy(zero_copy_only=False)
        mt = t.column("min_t").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_chunks": pa.array([int(occ.sum())], pa.int64()),
                "n_distinct": pa.array([t.num_rows], pa.int64()),
                "n_toks_total": pa.array([int(st.sum())], pa.int64()),
                "n_toks_saved": pa.array([int((st - mt).sum())], pa.int64()),
            }
        )

    df = per_hash.map_batches(partials, batch_format="pyarrow").to_pandas()
    agg = df.sum() if len(df) else {}  # token-less corpus: all-zero row
    return pa.table(
        {
            "n_chunks": pa.array([int(agg.get("n_chunks", 0))], pa.int64()),
            "n_distinct": pa.array([int(agg.get("n_distinct", 0))], pa.int64()),
            "n_toks_total": pa.array([int(agg.get("n_toks_total", 0))], pa.int64()),
            "n_toks_saved": pa.array([int(agg.get("n_toks_saved", 0))], pa.int64()),
        }
    )
