"""CCNet-style language-model perplexity scoring + head/middle/tail
bucketing (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020) — the quality-partitioning
operator a pretraining pipeline runs after language ID: score every
document with a cheap LM, then split each language's corpus into
head/middle/tail perplexity buckets.

CCNet uses a KenLM 5-gram; no LM toolkit is installable here, so the
in-sandbox model is an add-one-smoothed BIGRAM LM over hashed token
buckets — the same hash feature space as DSIR (`functions/importance`),
and like DSIR it is closed-form from counts: training is ONE streaming
combiner pass (per-batch (u, v, n) pair-count partials, ≤B²+B rows per
batch whatever the batch size, into one tiny groupby), so there is no
iteration and no shuffle of the text.

EXACT-ORACLE protocol (the repo's fixed-point discipline): per-token
negative log-likelihood in int64 MICRO-units,
    first token:  nll1[v]    = round(1e6·ln((N+B)/(c1[v]+1)))
    continuation: nll2[u,v]  = round(1e6·ln((ctx[u]+B)/(c2[u,v]+1)))
each ONE ln of ONE double ratio of exact ints (< 2^53, asserted), so a
document's total NLL is an order-independent integer sum and
    avg_nll_micro = round(nll_micro / n_toks)
(one double division of two exact ints, half-away rounded) is the
deterministic stand-in for log-perplexity.  The DuckDB twin evaluates
the token-identical expressions.

Bucketing is CCNet's head/middle/tail: per-language TERTILE thresholds
(exact order statistics at rank floor((n-1)·q/3)+1 via the value-range
rank machinery — no global sort), then head if avg ≤ t1, middle if
≤ t2, else tail.  Only the |langs|×2 threshold rows reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .importance import _EXACT_DOUBLE, SCALE, _round_half_away
from .sampling import md5_u64
from .text import _split_tokens

N_BUCKETS = 256


def token_buckets_batch(t: pa.Table, n_buckets: int = N_BUCKETS):
    """(parent_row_index, bucket) flat int64 arrays of the batch's token
    OCCURRENCES in document order — ``md5_number_upper(token) % B``,
    md5 evaluated once per DISTINCT token in the batch."""
    parents, toks = _split_tokens(t)
    if len(parents) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    codes, uniques = pd.factorize(toks.to_pandas(), sort=False)
    buckets = (md5_u64(np.asarray(uniques)) % np.uint64(n_buckets)).astype(np.int64)
    return parents.astype(np.int64), buckets[codes]


def lm_train(docs_ds, n_buckets: int = N_BUCKETS):
    """ONE streaming combiner pass → the bigram LM's exact count state:
    ``(c1[v], c2[u, v], n_tokens)``.  Per-batch partials are bincounts
    keyed ``u*B + v`` for pairs and a sentinel ``u = -1`` row family for
    unigrams — ≤ B² + B rows per batch regardless of batch size; only
    the aggregated ≤ B² + B rows reach the driver."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        parents, buckets = token_buckets_batch(t, n_buckets)
        if len(buckets) == 0:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        same = parents[1:] == parents[:-1]
        flat = buckets[:-1][same] * n_buckets + buckets[1:][same]
        pc_ = np.bincount(flat, minlength=n_buckets * n_buckets).astype(np.int64)
        uc = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        nzp = np.flatnonzero(pc_)
        nzu = np.flatnonzero(uc)
        return pa.table(
            {
                "u": pa.array(np.concatenate([nzp // n_buckets, np.full(len(nzu), -1, np.int64)]), pa.int64()),
                "v": pa.array(np.concatenate([nzp % n_buckets, nzu]), pa.int64()),
                "n": pa.array(np.concatenate([pc_[nzp], uc[nzu]]), pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ B² + B rows — the legal small driver materialization
    )
    c1 = np.zeros(n_buckets, np.int64)
    c2 = np.zeros((n_buckets, n_buckets), np.int64)
    u = agg["u"].to_numpy().astype(np.int64)
    v = agg["v"].to_numpy().astype(np.int64)
    n = agg["n"].to_numpy().astype(np.int64)
    uni = u == -1
    c1[v[uni]] = n[uni]
    c2[u[~uni], v[~uni]] = n[~uni]
    return c1, c2, int(c1.sum())


def lm_nll_weights(c1: np.ndarray, c2: np.ndarray, n_tokens: int, scale: int = SCALE):
    """The LM's int64 micro-unit NLL tables ``(nll1[v], nll2[u, v])`` —
    add-one smoothing, each weight ONE ln of ONE double ratio of exact
    ints (asserted < 2^53), half-away rounded; always ≥ 0."""
    n_buckets = len(c1)
    ctx = c2.sum(axis=1)
    assert int(n_tokens + n_buckets) < _EXACT_DOUBLE and int(ctx.max() + n_buckets) < _EXACT_DOUBLE
    nll1 = _round_half_away(np.log(float(n_tokens + n_buckets) / (c1 + 1).astype(np.float64)) * float(scale))
    nll2 = _round_half_away(
        np.log((ctx + n_buckets)[:, None].astype(np.float64) / (c2 + 1).astype(np.float64)) * float(scale)
    )
    return nll1, nll2


def lm_doc_nll(docs_ds, nll1: np.ndarray, nll2: np.ndarray, carry_cols: tuple = ()):
    """Pass-2 stateless scorer: per document
    ``nll_micro = nll1[b_0] + Σ_i nll2[b_{i-1}, b_i]`` (exact int64 sum
    over the doc's token sequence) and
    ``avg_nll_micro = round(nll_micro / n_toks)`` (0 for token-less
    docs).  The B + B² int64 weight tables (~0.5 MB) ride the task
    closure — broadcast once per task; the text never shuffles."""
    nll1 = np.asarray(nll1, np.int64)
    nll2 = np.asarray(nll2, np.int64)
    n_buckets = len(nll1)

    def score(t: pa.Table) -> pa.Table:
        s = np.zeros(t.num_rows, np.int64)
        n = np.zeros(t.num_rows, np.int64)
        parents, buckets = token_buckets_batch(t, n_buckets)
        if len(buckets):
            np.add.at(n, parents, 1)
            first = np.concatenate([[True], parents[1:] != parents[:-1]])
            np.add.at(s, parents[first], nll1[buckets[first]])
            same = ~first[1:]
            np.add.at(s, parents[1:][same], nll2[buckets[:-1][same], buckets[1:][same]])
        avg = np.zeros(t.num_rows, np.int64)
        nz = n > 0
        avg[nz] = _round_half_away(s[nz].astype(np.float64) / n[nz].astype(np.float64))
        cols = {
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_toks": pa.array(n, pa.int64()),
            "nll_micro": pa.array(s, pa.int64()),
            "avg_nll_micro": pa.array(avg, pa.int64()),
        }
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return docs_ds.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(scored_ds, lang_col: str = "lang"):
    """CCNet's head/middle/tail split: per-language TERTILE thresholds
    (t1, t2) over ``avg_nll_micro`` as EXACT order statistics (rank
    ``floor((n-1)·q/3)+1``, value-range rank machinery — the full table
    is exchanged once, no global sort), broadcast back (|langs|×2 rows),
    then a stateless labeling pass: head if avg ≤ t1, middle if ≤ t2,
    else tail."""
    import pyarrow.compute as pc

    from .window import exact_order_stats_per_key

    scored = scored_ds.materialize()  # (doc_id, lang, 3 ints) — branch point, tiny vs the text
    th_rows = exact_order_stats_per_key(
        scored, key_col=lang_col, value_col="avg_nll_micro", id_col="doc_id", quarters=(1, 2), denom=3
    ).take_all()  # |langs| × 2 rows
    langs = sorted({r[lang_col] for r in th_rows})
    lang_arr = pa.array(langs, pa.string())
    t1 = np.zeros(len(langs), np.int64)
    t2 = np.zeros(len(langs), np.int64)
    for r in th_rows:
        (t1 if r["quarter"] == 1 else t2)[langs.index(r[lang_col])] = int(r["value"])

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    lang_col: pa.array([], pa.string()),
                    "avg_nll_micro": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        li = pc.index_in(t.column(lang_col), value_set=lang_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        avg = t.column("avg_nll_micro").to_numpy(zero_copy_only=False)
        bucket = np.where(avg <= t1[li], "head", np.where(avg <= t2[li], "middle", "tail"))
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                lang_col: t.column(lang_col),
                "avg_nll_micro": t.column("avg_nll_micro").cast(pa.int64()),
                "bucket": pa.array(bucket, pa.string()),
            }
        )

    return scored.map_batches(label, batch_format="pyarrow")
