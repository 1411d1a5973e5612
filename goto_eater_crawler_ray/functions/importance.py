"""DSIR-style hashed n-gram importance weighting + resampling
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023, arXiv:2302.03169) — the data-selection
operator a pretraining pipeline runs to upweight documents that look
like a target domain.

Pipeline shape (the paper's, re-expressed Ray-Data-first):
  1. featurize each document as a bag of hashed n-grams (unigrams +
     adjacent bigrams → md5 bucket in [0, N_BUCKETS));
  2. estimate TWO bucket distributions in ONE streaming pass — the
     target domain's and the raw corpus's — as exact integer
     occurrence counts (per-batch combiner partials, ≤N_BUCKETS rows
     per batch regardless of batch size, into one tiny groupby);
  3. per-bucket log importance weight  w_b ~ log p_target(b)/p_raw(b)
     with add-one smoothing, as int64 MICRO-units;
  4. per-document importance score = exact int64 SUM of w over the
     document's gram OCCURRENCES (stateless pass-2 scorer; the 256-row
     weight table is the only thing broadcast — the text never
     shuffles in either pass);
  5. select by top-k importance, or RESAMPLE via the Gumbel-top-k
     trick with deterministic per-doc hash noise (the paper samples
     ∝ exp(score); Gumbel noise from a hash makes that reproducible
     across runs, widths and partitionings).

EXACT-ORACLE protocol (the repo's fixed-point discipline, cf.
`bigram_pmi` / `pagerank_exact`): each weight is rounded HALF-AWAY from
ONE ln of ONE double ratio of exact-int products,
    w_b = round(1e6 * ln(((t_b+1)*(R+B)) / ((r_b+1)*(T+B)))),
so document scores are order-independent integer sums and the DuckDB
twin evaluates the token-identical expression.  The int products must
stay below 2^53 for the double conversion to be exact on both sides —
asserted, and comfortably true at every oracle-gate scale (documented
bound; at true 100-TB scale only the twin's exactness argument lapses,
the engine's integer aggregation is unchanged).

Tokenization is the repo's shared SQL-twin protocol
(`text._split_tokens`): whitespace split of trim(text), empty tokens
dropped; gram hash is ``md5_number_upper(gram) % B`` (md5 first 8
bytes little-endian), evaluated once per DISTINCT gram per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import md5_u64
from .text import _split_tokens

N_BUCKETS = 256
SCALE = 1_000_000  # micro-unit fixed point, shared with the SQL twins
_EXACT_DOUBLE = 1 << 53


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB round() is half AWAY from zero; np.round is half-to-even."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def gram_buckets_batch(t: pa.Table, n_buckets: int = N_BUCKETS):
    """(parent_row_index, bucket) flat int64 arrays of the batch's hashed
    unigram + adjacent-bigram feature OCCURRENCES.  md5 is evaluated once
    per DISTINCT gram in the batch (corpora repeat grams heavily) and
    scattered back through a factorize — exactly
    ``md5_number_upper(gram) % n_buckets``."""
    parents, toks = _split_tokens(t)
    if len(parents) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    words = toks.to_pandas().to_numpy()
    same = parents[1:] == parents[:-1]
    bigrams = (pd.Series(words[:-1][same]) + " " + pd.Series(words[1:][same])).to_numpy()
    grams = np.concatenate([words, bigrams])
    gram_parents = np.concatenate([parents, parents[:-1][same]]).astype(np.int64)
    codes, uniques = pd.factorize(pd.Series(grams), sort=False)
    buckets = (md5_u64(np.asarray(uniques)) % np.uint64(n_buckets)).astype(np.int64)
    return gram_parents, buckets[codes]


def gram_distribution(docs_ds, target_langs=("en",), n_buckets: int = N_BUCKETS):
    """ONE streaming pass over documents → dense exact-integer occurrence
    counts ``(n_target[b], n_raw[b])`` for b in 0..n_buckets-1.  Per-batch
    combiner partials (two bincounts, ≤n_buckets rows whatever the batch
    size) into one tiny groupby(b); only the ≤n_buckets aggregated rows
    reach the driver — the legal small materialization."""
    from ray.data.aggregate import Sum

    tset = frozenset(target_langs)
    idx = np.arange(n_buckets, dtype=np.int64)

    def partials(t: pa.Table) -> pa.Table:
        parents, buckets = gram_buckets_batch(t, n_buckets)
        if len(buckets) == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "n_target": pa.array([], pa.int64()),
                    "n_raw": pa.array([], pa.int64()),
                }
            )
        langs = t.column("lang").to_pylist()
        is_target = np.array([lang in tset for lang in langs], bool)[parents]
        raw = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        tgt = np.bincount(buckets[is_target], minlength=n_buckets).astype(np.int64)
        return pa.table({"b": pa.array(idx, pa.int64()), "n_target": pa.array(tgt, pa.int64()), "n_raw": pa.array(raw, pa.int64())})

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n_target", alias_name="n_target"), Sum("n_raw", alias_name="n_raw"))
        .to_pandas()  # ≤ n_buckets rows — the legal kind of driver materialization
    )
    n_target = np.zeros(n_buckets, np.int64)
    n_raw = np.zeros(n_buckets, np.int64)
    b = agg["b"].to_numpy().astype(np.int64)
    n_target[b] = agg["n_target"].to_numpy().astype(np.int64)
    n_raw[b] = agg["n_raw"].to_numpy().astype(np.int64)
    return n_target, n_raw


def dsir_weights(n_target: np.ndarray, n_raw: np.ndarray, scale: int = SCALE) -> np.ndarray:
    """Per-bucket int64 micro-unit log importance weights,
    ``round(scale * ln(((t_b+1)*(R+B)) / ((r_b+1)*(T+B))))`` — one ln of
    one double ratio of exact-int products, half-away rounded (the SQL
    twin evaluates the identical expression)."""
    n_buckets = len(n_target)
    total_t = int(n_target.sum())
    total_r = int(n_raw.sum())
    num = (n_target.astype(object) + 1) * (total_r + n_buckets)  # exact python ints
    den = (n_raw.astype(object) + 1) * (total_t + n_buckets)
    assert int(max(num.max(), den.max())) < _EXACT_DOUBLE, (
        "dsir_weights: count product exceeds 2^53 — the double conversion "
        "would round and the SQL twin's exactness argument lapses"
    )
    ratio = num.astype(np.float64) / den.astype(np.float64)
    return _round_half_away(np.log(ratio) * float(scale))


def dsir_score(docs_ds, weights: np.ndarray):
    """Pass-2 stateless scorer: per-document importance = exact int64 sum
    of ``weights[bucket]`` over the doc's gram occurrences.  The weight
    table (≤N_BUCKETS int64s) rides the task closure — broadcast once per
    task, never per row; emits (doc_id, dsir_score) for EVERY document
    (gram-less docs score 0)."""
    w = np.asarray(weights, np.int64)
    n_buckets = len(w)

    def score(t: pa.Table) -> pa.Table:
        s = np.zeros(t.num_rows, np.int64)
        parents, buckets = gram_buckets_batch(t, n_buckets)
        if len(buckets):
            np.add.at(s, parents, w[buckets])
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()), "dsir_score": pa.array(s, pa.int64())})

    return docs_ds.map_batches(score, batch_format="pyarrow")


def gumbel_micro(doc_ids) -> np.ndarray:
    """Deterministic per-key Gumbel(0,1) noise in int64 micro-units:
    ``round(1e6 * -ln(-ln(u)))`` with ``u = (md5_number_upper(key) % 1e6
    + 0.5) / 1e6`` — the hash-determinism trick applied to the
    Gumbel-top-k resampling rule so the sample is a pure function of the
    keys (reproducible across runs, widths and partitionings)."""
    u = ((md5_u64(doc_ids) % np.uint64(SCALE)).astype(np.float64) + 0.5) / float(SCALE)
    return _round_half_away(-np.log(-np.log(u)) * float(SCALE))


def nb_train(docs_ds, label_col: str = "lang", n_buckets: int = N_BUCKETS):
    """Distributed multinomial Naive Bayes TRAINING over hashed gram
    features — the count-based linear model (the same feature space
    fastText-style classifiers use; NB's weights are closed-form from
    counts, so training is ONE streaming combiner pass, no iterations).

    Per-batch partials: (label, bucket, n) gram-occurrence counts — at
    most C×n_buckets rows per batch whatever the batch size — into one
    tiny groupby; a second label-only pass counts documents per class
    for the prior.  Returns ``(labels, W, bias)`` with labels sorted
    ascending, ``W[c, b] = round(1e6·ln((t_cb+1)/(T_c+B)))`` and
    ``bias[c] = round(1e6·ln(n_c/N))`` — each ONE ln of ONE exact-int
    ratio, so prediction is an exact int64 argmax the SQL twin
    replicates."""
    from ray.data.aggregate import Count, Sum

    def partials(t: pa.Table) -> pa.Table:
        parents, buckets = gram_buckets_batch(t, n_buckets)
        if len(buckets) == 0:
            return pa.table(
                {"label": pa.array([], pa.string()), "b": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        labs = pd.Series(t.column(label_col).to_pylist())
        codes, uniq = pd.factorize(labs, sort=True)
        flat = codes[parents] * n_buckets + buckets
        cnt = np.bincount(flat, minlength=len(uniq) * n_buckets).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "label": pa.array(np.asarray(uniq)[nz // n_buckets], pa.string()),
                "b": pa.array((nz % n_buckets).astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    gram_counts = (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ C × n_buckets rows — legal driver materialization
    )
    doc_counts = (
        docs_ds.select_columns([label_col]).groupby(label_col).aggregate(Count(alias_name="n_docs")).to_pandas()
    )
    labels = sorted(doc_counts[label_col].tolist())
    lab_idx = {lab: i for i, lab in enumerate(labels)}
    n_classes = len(labels)
    counts = np.zeros((n_classes, n_buckets), np.int64)
    counts[
        gram_counts["label"].map(lab_idx).to_numpy(),
        gram_counts["b"].to_numpy().astype(np.int64),
    ] = gram_counts["n"].to_numpy().astype(np.int64)
    totals = counts.sum(axis=1)
    assert int(totals.max() + n_buckets) < _EXACT_DOUBLE
    w = _round_half_away(np.log((counts + 1).astype(np.float64) / (totals + n_buckets)[:, None].astype(np.float64)) * float(SCALE))
    n_docs = np.zeros(n_classes, np.int64)
    n_docs[doc_counts[label_col].map(lab_idx).to_numpy()] = doc_counts["n_docs"].to_numpy().astype(np.int64)
    bias = _round_half_away(np.log(n_docs.astype(np.float64) / float(n_docs.sum())) * float(SCALE))
    return labels, w, bias


def nb_predict(docs_ds, labels: list[str], w: np.ndarray, bias: np.ndarray, carry_cols: tuple = (), emit_score: bool = False):
    """Stateless broadcast NB scoring: per-doc class scores are exact
    int64 sums  bias[c] + Σ_occurrences w[c, bucket]; predicted label =
    argmax with ties to the lexicographically smallest label (labels are
    sorted, np.argmax takes the first maximum).  The C×B weight matrix
    rides the task closure; emits (doc_id, pred[, nb_score]) for EVERY
    document (gram-less docs get the prior argmax)."""
    w = np.asarray(w, np.int64)
    bias = np.asarray(bias, np.int64)
    labs = np.asarray(labels, object)
    n_buckets = w.shape[1]

    def score(t: pa.Table) -> pa.Table:
        s = np.tile(bias, (t.num_rows, 1))
        parents, buckets = gram_buckets_batch(t, n_buckets)
        if len(buckets):
            np.add.at(s, parents, w[:, buckets].T)
        best = np.argmax(s, axis=1) if t.num_rows else np.empty(0, np.int64)
        cols = {"doc_id": t.column("doc_id").cast(pa.int64()), "pred": pa.array(labs[best], pa.string())}
        if emit_score:
            cols["nb_score"] = pa.array(s[np.arange(t.num_rows), best], pa.int64())
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return docs_ds.map_batches(score, batch_format="pyarrow")


def dsir_resample(docs_ds, weights: np.ndarray, k: int):
    """Gumbel-top-k importance resampling (the paper's sampler, made
    deterministic): key = dsir_score + gumbel_micro(doc_id) (exact int64
    addition), take the global top-k by (key desc, doc_id asc).  Local
    per-block top-k pre-prune bounds the sort input to k rows per block."""
    scored = dsir_score(docs_ds, weights)

    def with_noise(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dsir_score": pa.array([], pa.int64()),
                    "resample_key": pa.array([], pa.int64()),
                }
            )
        g = gumbel_micro(t.column("doc_id"))
        key = t.column("dsir_score").to_numpy(zero_copy_only=False) + g
        return t.append_column("resample_key", pa.array(key, pa.int64()))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        df = t.to_pandas().sort_values(["resample_key", "doc_id"], ascending=[False, True], kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        scored.map_batches(with_noise, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["resample_key", "doc_id"], descending=[True, False])
        .limit(k)
    )
