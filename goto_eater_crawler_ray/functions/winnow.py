"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
— the MOSS algorithm): hash every word k-gram, slide a window of w
consecutive k-gram hashes over each document, and select the RIGHTMOST
minimum of every window.  The guarantee: any shared substring of at
least w+k-1 words between two documents shares at least one selected
fingerprint, while only ~2/(w+1) of the k-grams are kept — the
local-sampling property that makes substring-plagiarism / near-dup
detection work without shipping the token stream.

Scale shape: selection is BATCH-LOCAL (windows never cross documents
and a document never spans batches, so each task emits its docs'
complete fingerprint sets — the text never shuffles); the pair stage
exchanges only the selected (fp, doc) rows, grouped by a COARSE hash of
the fingerprint (O(coarse) group calls, not O(|fps|)) with the pair
join vectorized inside each partition.  Hot fingerprints (a boilerplate
phrase shared by f docs) fan out f² pairs — the same quadratic hazard
`functions/dedup.py` documents for band buckets; at corpus scale cap or
drop fingerprints above a doc-frequency bound before pairing.

EXACT-ORACLE protocol: fp = md5_number_upper(gram) % 2^61 (int64), the
window min/rightmost-argmin is pure integer comparison, so the DuckDB
twin (window-function min + rightmost-position join) hash-checks the
selected sets and the pair counts exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import md5_u64
from .text import _split_tokens

K = 4  # words per k-gram
W = 8  # k-gram hashes per winnowing window
FP_MOD = np.uint64(1) << np.uint64(61)

_FP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()), ("fp", pa.int64())])


def winnow_batch(t: pa.Table, k: int = K, w: int = W) -> pa.Table:
    """One batch's complete winnowing selection: distinct
    (doc_id, pos, fp) rows, ``pos`` the 1-based k-gram start index.
    Documents with fewer than w k-grams (but >= 1) contribute their
    single whole-document window's rightmost minimum; documents with
    fewer than k tokens contribute nothing.  Fully vectorized: one
    sliding_window_view over the batch's flat k-gram hash array with
    cross-document windows masked out, a reversed argmin for the
    rightmost-tie rule, and one lexsort pass for the short documents."""
    if t.num_rows == 0:
        return _FP_SCHEMA.empty_table()
    parents, toks = _split_tokens(t)
    words = toks.to_pandas().to_numpy()
    m = len(words) - k + 1
    if m <= 0:
        return _FP_SCHEMA.empty_table()
    # parents is nondecreasing, so window-start == window-end parent
    # implies the whole k-gram is one document
    ok = parents[k - 1 : m + k - 1] == parents[:m]
    s = pd.Series(words[:m][ok])
    for j in range(1, k):
        s = s + " " + pd.Series(words[j : m + j][ok])
    kh = (md5_u64(s.to_numpy()) % FP_MOD).astype(np.int64)
    kpar = parents[:m][ok].astype(np.int64)
    n = len(kh)
    if n == 0:
        return _FP_SCHEMA.empty_table()
    idx = np.arange(n)
    seg_start = np.concatenate(([True], kpar[1:] != kpar[:-1]))
    seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
    kpos = idx - seg_first + 1  # 1-based k-gram position within its doc

    picks = []
    if n >= w:
        swv = np.lib.stride_tricks.sliding_window_view(kh, w)  # (n-w+1, w)
        valid = kpar[w - 1 :] == kpar[: n - w + 1]
        if valid.any():
            j = np.flatnonzero(valid)
            # rightmost argmin: argmin of the reversed window is the
            # FIRST minimum from the right
            am = (w - 1) - np.argmin(swv[valid][:, ::-1], axis=1)
            picks.append(j + am)
    seg_len = np.bincount(kpar, minlength=t.num_rows)
    short = seg_len[kpar] < w  # k-grams of docs with 1 <= m_d < w
    if short.any():
        si = np.flatnonzero(short)
        # per doc: smallest hash first, rightmost position breaking ties
        order = np.lexsort((-kpos[si], kh[si], kpar[si]))
        pps = kpar[si][order]
        first = np.concatenate(([True], pps[1:] != pps[:-1]))
        picks.append(si[order[first]])
    if not picks:
        return _FP_SCHEMA.empty_table()
    sel = np.unique(np.concatenate(picks))  # dedups overlapping windows
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[kpar[sel]]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64), pa.int64()),
            "pos": pa.array(kpos[sel], pa.int64()),
            "fp": pa.array(kh[sel], pa.int64()),
        }
    )


def winnow_fingerprints(docs_ds, k: int = K, w: int = W):
    """Dataset of each document's winnowing fingerprints
    (doc_id, pos, fp) — one streaming map_batches pass, no shuffle."""
    return docs_ds.map_batches(lambda t: winnow_batch(t, k, w), batch_format="pyarrow")


def winnow_dup_pairs(docs_ds, min_shared: int = 2, k: int = K, w: int = W, coarse: int = 256):
    """Document pairs sharing >= min_shared DISTINCT fingerprints
    (doc_a < doc_b, n_shared) — the MOSS similarity report.  The
    selected fingerprints are made distinct per (doc, fp) by one
    groupby, then pairs are emitted inside COARSE fp-hash partitions
    (a pandas self-merge per partition — O(coarse) group calls) and
    counted by one groupby(doc_a, doc_b)."""
    from ray.data.aggregate import Count, Sum

    fps = (
        winnow_fingerprints(docs_ds, k, w)
        .groupby(["doc_id", "fp"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["doc_id", "fp"])
    )

    def add_coarse(t: pa.Table) -> pa.Table:
        f = t.column("fp").to_numpy(zero_copy_only=False)
        return t.append_column("_pp", pa.array((f % coarse).astype(np.int64), pa.int64()))

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        p = df[["fp", "doc_id"]].merge(df[["fp", "doc_id"]], on="fp", suffixes=("_a", "_b"))
        p = p[p["doc_id_a"] < p["doc_id_b"]]
        g = p.groupby(["doc_id_a", "doc_id_b"], sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {
                "doc_a": g["doc_id_a"].to_numpy(np.int64),
                "doc_b": g["doc_id_b"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    pairs = (
        fps.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )
    return pairs.filter(expr=f"n_shared >= {int(min_shared)}")
