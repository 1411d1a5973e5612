"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The missing half of the tokenizer story: ``token_counts`` / ``tokenize_flat``
APPLY a tokenization; this module LEARNS one — the classic Sennrich et al.
(2016) merge-table algorithm, re-expressed Ray-Data-first:

1. **Word-frequency table once.**  The corpus-scaled pass (documents →
   whitespace words → ``groupby(word).count()``) happens exactly once;
   everything after operates on the VOCAB table (one row per distinct
   word), which is what a 100 TB corpus collapses to (~10^8 rows, not
   10^12).  Each vocab row carries its symbol sequence as a
   ``list<string>`` column.
2. **Pair counts are alphabet-bounded.**  Per merge iteration, a
   ``map_batches`` combiner counts adjacent symbol pairs weighted by word
   frequency batch-locally, then one tiny ``groupby(l, r).sum()`` —
   the global pair domain is at most (|alphabet| + k)^2 rows (symbols are
   initial characters plus the <= k merged symbols), corpus-INDEPENDENT,
   so the driver-side argmax reads a bounded table, never the corpus.
3. **Merge application is segment-vectorized.**  The per-iteration rewrite
   of every vocab row's symbol sequence runs on the flattened symbol
   array + word offsets: one boolean adjacency match, one run-parity
   pass to resolve overlapping matches left-to-right (BPE's scan order),
   one scatter — no Python loop over words.

Determinism contract: argmax ties break on (count DESC, left ASC, right
ASC); with exact int64 counts the learned merge table is bit-identical
across partitionings and widths.  The oracle twin embeds the merge table
computed by :func:`bpe_train_local` — an INDEPENDENT single-process
reference implementation of the textbook algorithm (dict + scan, no Ray,
no shared code path) — frozen per gate scale by
``tools/freeze_bpe_pins.py``, so the driver's hash check is a true
cross-implementation comparison, same contract as the frozen-model
oracles (``_ivf_frozen.py``, ``_kmeans_frozen.py``).

Reference parity note: the reference repo has no tokenizer training (its
text ops stop at normalization, goto-eater-crawler pipelines.py:40-60);
this operator is part of the beyond-reference LLM-data suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# local reference implementation (tests + pin freezing; NOT used by the
# distributed path)
# ---------------------------------------------------------------------------


def _word_freqs_local(texts) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for txt in texts:
        for w in txt.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def bpe_train_local(texts, k: int) -> list[tuple[str, str, str, int]]:
    """Textbook single-process BPE (Sennrich alg. 1): returns up to ``k``
    merges as (left, right, merged, pair_count) in learning order.  The
    cross-implementation oracle for :func:`bpe_train`."""
    return _merges_from_vocab(_word_freqs_local(texts), k)


def _merges_from_vocab(word_freqs: dict[str, int], k: int) -> list[tuple[str, str, str, int]]:
    vocab = {tuple(w) + (END_OF_WORD,): n for w, n in word_freqs.items()}
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # max count, ties -> lexicographically smallest (left, right)
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def bpe_encode_local(texts, merges) -> dict[str, int]:
    """Textbook BPE APPLICATION (the independent reference for
    :func:`bpe_token_counts`): tokenize every word with the merge list in
    learning order, return total count per emitted token."""
    counts: dict[str, int] = {}
    for w, n in _word_freqs_local(texts).items():
        syms = list(w) + [END_OF_WORD]
        for a, b, *_ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        for s in syms:
            counts[s] = counts.get(s, 0) + n
    return counts


# ---------------------------------------------------------------------------
# distributed path
# ---------------------------------------------------------------------------


def _to_symbol_rows(t: pa.Table) -> pa.Table:
    """documents batch -> (word, freq=batch-local count, syms) rows; the
    batch-local combine shrinks the stream before the one corpus-scaled
    word groupby."""
    wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
    flat = wl.flatten()
    flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    agg = pa.table({"word": flat}).group_by("word").aggregate([("word", "count")])
    return pa.table({"word": agg.column("word"), "freq": agg.column("word_count").cast(pa.int64())})


def _explode_syms(t: pa.Table) -> pa.Table:
    """(word, freq) -> (word, freq, syms list<string>): characters + </w>."""
    words = t.column("word").to_pylist()
    syms = pa.array([list(w) + [END_OF_WORD] for w in words], pa.list_(pa.string()))
    return pa.table({"word": t.column("word"), "freq": t.column("freq"), "syms": syms})


def _flat_view(t: pa.Table):
    """Flattened symbol view of a vocab batch: (flat symbols as numpy
    object array, parent word index per symbol, per-word freq array)."""
    syms = t.column("syms").combine_chunks()
    flat = np.asarray(syms.flatten().to_pylist(), dtype=object)
    parents = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
    freq = t.column("freq").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return flat, parents, freq


def _pair_partials(t: pa.Table) -> pa.Table:
    """Batch-local adjacent-pair counts weighted by word freq (the
    combiner: output rows <= distinct pairs in batch, alphabet-bounded)."""
    flat, parents, freq = _flat_view(t)
    if len(flat) < 2:
        return pa.table({"l": pa.array([], pa.string()), "r": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
    adj = parents[:-1] == parents[1:]
    li, ri = np.flatnonzero(adj), np.flatnonzero(adj) + 1
    w = freq[parents[li]]
    part = pa.table(
        {
            "l": pa.array(flat[li], pa.string()),
            "r": pa.array(flat[ri], pa.string()),
            "w": pa.array(w, pa.int64()),
        }
    ).group_by(["l", "r"]).aggregate([("w", "sum")])
    return pa.table({"l": part.column("l"), "r": part.column("r"), "c": part.column("w_sum").cast(pa.int64())})


def _merge_flat(flat: np.ndarray, parents: np.ndarray, a: str, b: str):
    """One merge pass over a flattened symbol array: rewrite adjacent
    (a, b) within each parent segment to a+b, left-to-right
    non-overlapping exactly like the reference scan — within a RUN of
    consecutive matching positions only even offsets merge (position i
    and i+1 share symbol i+1, and BPE keeps the leftmost)."""
    n = len(flat)
    if n >= 2:
        m = (parents[:-1] == parents[1:]) & (flat[:-1] == a) & (flat[1:] == b)
        idx = np.flatnonzero(m)
    else:
        idx = np.empty(0, np.int64)
    if not len(idx):
        return flat, parents
    run_start = np.r_[True, np.diff(idx) != 1]
    run_id = np.cumsum(run_start) - 1
    starts = idx[run_start]
    keep = idx[(idx - starts[run_id]) % 2 == 0]
    flat = flat.copy()
    flat[keep] = a + b
    mask = np.ones(n, bool)
    mask[keep + 1] = False
    return flat[mask], parents[mask]


def _apply_merge(a: str, b: str):
    """Batch fn rewriting every vocab row's symbol sequence for merge
    (a, b) via :func:`_merge_flat`."""

    def fn(t: pa.Table) -> pa.Table:
        flat, parents, _ = _flat_view(t)
        new_flat, new_parents = _merge_flat(flat, parents, a, b)
        lengths = np.bincount(new_parents, minlength=t.num_rows) if len(new_flat) else np.zeros(t.num_rows, np.int64)
        offsets = np.zeros(t.num_rows + 1, np.int64)
        np.cumsum(lengths, out=offsets[1:])
        syms = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(new_flat, pa.string()))
        return pa.table({"word": t.column("word"), "freq": t.column("freq"), "syms": syms})

    return fn


def bpe_train(docs_ds, k: int, max_local_vocab: int = 200_000) -> pa.Table:
    """Learn up to ``k`` BPE merges over ``docs_ds.text`` distributed;
    returns (rank int64 1-based, pair_left, pair_right, merged,
    pair_count int64) in learning order — bit-identical to
    :func:`bpe_train_local` on the same corpus.

    The corpus-scaled work (documents -> word-freq vocab) is always
    distributed; when the resulting DISTINCT-WORD table fits under
    ``max_local_vocab`` rows the merge loop runs locally on the driver
    (bounded by the gate, like ``pagerank_exact``'s small-graph path) —
    the k merge rounds are pure vocab-table iteration, and k pipeline
    executions of fixed cost dwarf the compute at small vocab.  Forced-
    path equivalence is pytest-pinned (``max_local_vocab=0`` vs default
    in tests/test_bpe.py)."""
    from ray.data.aggregate import Sum

    vocab = (
        docs_ds.map_batches(_to_symbol_rows, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
        .map_batches(_explode_syms, batch_format="pyarrow")
        .materialize()  # vocab-sized (distinct words), re-read each merge round
    )
    if vocab.count() <= max_local_vocab:
        freqs: dict[str, int] = {}
        for t in (pa.table(b) for b in vocab.iter_batches(batch_format="pyarrow")):
            for w, n in zip(t.column("word").to_pylist(), t.column("freq").to_pylist()):
                freqs[w] = freqs.get(w, 0) + n
        rows = [(i + 1, a, b, m, c) for i, (a, b, m, c) in enumerate(_merges_from_vocab(freqs, k))]
        return _merge_rows_table(rows)
    rows = []
    for rank in range(1, k + 1):
        counts = (
            vocab.map_batches(_pair_partials, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("c", alias_name="c"))
        )
        # pair domain is (|alphabet|+k)^2-bounded — a driver argmax over a
        # small table, not a corpus materialization
        batches = [pa.table(b) for b in counts.iter_batches(batch_format="pyarrow")]
        pairs = pa.concat_tables(batches) if batches else pa.table({})
        if pairs.num_rows == 0 or pairs.num_columns == 0:
            break
        order = pc.sort_indices(
            pairs, sort_keys=[("c", "descending"), ("l", "ascending"), ("r", "ascending")]
        )
        top = pairs.take(order[:1])
        a, b = top.column("l")[0].as_py(), top.column("r")[0].as_py()
        rows.append((rank, a, b, a + b, top.column("c")[0].as_py()))
        vocab = vocab.map_batches(_apply_merge(a, b), batch_format="pyarrow").materialize()
    return _merge_rows_table(rows)


def bpe_token_counts(docs_ds, merges) -> "object":
    """Tokenize ``docs_ds.text`` with a learned merge list (pairs in
    learning order) and count tokens — the corpus-scaled APPLY side.
    Per batch: whitespace words -> char+``</w>`` symbol stream -> the k
    merges as k segment-vectorized :func:`_merge_flat` passes -> one
    batch-local count (the combiner; output rows bounded by the token
    vocabulary, <= |alphabet| + k symbols).  One tiny token groupby
    globally; the text never shuffles.  Returns a Dataset of
    (token, n int64)."""
    from ray.data.aggregate import Sum

    pairs = [(m[0], m[1]) for m in merges]

    def encode(t: pa.Table) -> pa.Table:
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
        flat_words = wl.flatten()
        flat_words = flat_words.filter(pc.greater(pc.binary_length(flat_words), 0))
        words = flat_words.to_pylist()
        # symbol stream: chars of each word + terminal, parent = word index
        lens = pc.utf8_length(flat_words).to_numpy(zero_copy_only=False).astype(np.int64) if words else np.empty(0, np.int64)
        total = int((lens + 1).sum())
        flat = np.empty(total, dtype=object)
        term_pos = np.cumsum(lens + 1) - 1
        char_mask = np.ones(total, bool)
        char_mask[term_pos] = False
        joined = "".join(words)
        try:  # ASCII fast path: one C-level decode instead of a char loop
            chars = np.frombuffer(joined.encode("ascii"), dtype="S1").astype("U1").astype(object)
        except UnicodeEncodeError:
            chars = np.asarray(list(joined), dtype=object)
        flat[char_mask] = chars
        flat[~char_mask] = END_OF_WORD
        parents = np.repeat(np.arange(len(words), dtype=np.int64), lens + 1)
        for a, b in pairs:
            flat, parents = _merge_flat(flat, parents, a, b)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        toks, cnts = np.unique(flat.astype(str), return_counts=True)
        return pa.table({"token": pa.array(toks, pa.string()), "n": pa.array(cnts.astype(np.int64), pa.int64())})

    return (
        docs_ds.map_batches(encode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


def _merge_rows_table(rows) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "pair_left": pa.array([r[1] for r in rows], pa.string()),
            "pair_right": pa.array([r[2] for r in rows], pa.string()),
            "merged": pa.array([r[3] for r in rows], pa.string()),
            "pair_count": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
