"""Text-analysis stages for large-scale training-data pipelines.

All are vectorized ``map_batches`` transforms over the ``documents`` table
(doc_id, text, lang, source, n_chars).  Where a stage needs per-worker
state (compiled patterns, stopword structures, n-gram profiles) it is a
callable CLASS → actor pool; pure-kernel stages are plain functions.

Oracle parity: token counts / quality metrics / fingerprints are defined
to be expressible in ANSI SQL (DuckDB twin in ``__ray_entry__.oracle_sql``)
— e.g. whitespace tokens = regexp split, fingerprint = md5 — so the
driver's value-hash comparison is exact, not approximate.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ._partitions import auto_num_partitions
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "to", "and")  # fixed, mirrored in oracle SQL

_WS = re.compile(r"\s+")
_WORD = re.compile(r"[a-z]+|[0-9]+|[^\sa-z0-9]")  # BPE-ish coarse tokens
_PUNCT = re.compile(r"[^\w\s]")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace tokens + regex (BPE-ish) tokens per doc — pure Arrow/regex.

    SQL twin: len(regexp_split_to_array(text,'\\s+')) and
    len(regexp_extract_all(text, ...)).
    """
    text = batch.column("text")
    ws = pc.add(pc.count_substring_regex(text, pattern=_WS.pattern), 1)
    re_toks = pc.count_substring_regex(text, pattern=_WORD.pattern)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "ws_tokens": pc.cast(ws, pa.int64()),
            "re_tokens": pc.cast(re_toks, pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Length / punctuation / stopword-ratio quality signals (vectorized).

    SQL twin uses the same closed-form; ratios rounded to 6 dp on both
    sides so the value-hash compare is exact.
    """
    text = batch.column("text")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.add(pc.count_substring_regex(text, pattern=_WS.pattern), 1)
    n_punct = pc.count_substring_regex(text, pattern=_PUNCT.pattern)
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = pc.count_substring_regex(text, pattern=stop_pat)
    punct_ratio = pc.round(pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())), ndigits=6)
    stop_ratio = pc.round(pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(n_tokens, pa.float64())), ndigits=6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = md5 hex of the text (content addressing).
    SQL twin: md5(text)."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
    return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, pa.string())})


class LangId:
    """Language ID heuristic — stateful stage (tables built once per actor
    in ``__init__``, SURVEY guidance on actor pools).

    Two real, public signals (no model download needed):
      1. SCRIPT pass, fully vectorized: the whole batch's text is decoded
         to a single uint32 codepoint array (one ``utf-32`` encode), and
         per-doc Unicode-block counts (kana / CJK / hangul / cyrillic /
         arabic / latin) come from ``np.add.reduceat`` over block masks.
         Kana>0 -> ja; CJK w/o kana -> zh; hangul -> ko; etc.
      2. For latin-script docs, a STOPWORD vote: token-set overlap with
         small per-language function-word lists (en/de/fr/es) — the
         classic cheap discriminator among European languages.

    Deterministic across processes (pure table lookups, no hashing).
    """

    STOPWORDS = {
        "en": frozenset("the of and to in is you that it he was for on are as with his they at be this".split()),
        "de": frozenset("der die das und ist du dass es er war für auf sind als mit sein sie bei sei nicht ein eine".split()),
        "fr": frozenset("le la les de et est tu que il était pour sur sont comme avec son ils à être ce une dans".split()),
        "es": frozenset("el la los de y es tú que él era para en son como con su ellos ser esta una las del".split()),
    }
    # (lo, hi, lang-or-script) unicode blocks
    _BLOCKS = (
        (0x3040, 0x30FF, "kana"),  # hiragana + katakana
        (0x4E00, 0x9FFF, "cjk"),
        (0xAC00, 0xD7AF, "hangul"),
        (0x0400, 0x04FF, "cyrillic"),
        (0x0600, 0x06FF, "arabic"),
    )

    def __init__(self):
        self._word_re = __import__("re").compile(r"[a-zà-ÿäöüß]+")

    def _latin_vote(self, text: str) -> str:
        tokens = set(self._word_re.findall(text.lower()))
        best, best_n = "en", -1
        for lang, sw in self.STOPWORDS.items():
            n = len(tokens & sw)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array([], pa.string())})
        # one vectorized codepoint pass over the whole batch; a 0 sentinel
        # keeps reduceat bounds in range, and zero-length docs (reduceat's
        # empty-segment quirk returns a neighbor element) are masked out
        joined = "".join(texts)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        cps = np.append(cps, np.uint32(0))
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        bounds = np.concatenate(([0], np.cumsum(lens)))[:-1]
        empty = lens == 0
        counts = {}
        for lo, hi, name in self._BLOCKS:
            mask = ((cps >= lo) & (cps <= hi)).astype(np.int64)
            counts[name] = np.add.reduceat(mask, bounds)
            counts[name][empty] = 0
        preds = []
        for i, t in enumerate(texts):
            if counts["kana"][i] > 0:
                preds.append("ja")
            elif counts["cjk"][i] > 0:
                preds.append("zh")
            elif counts["hangul"][i] > 0:
                preds.append("ko")
            elif counts["cyrillic"][i] > 0:
                preds.append("ru")
            elif counts["arabic"][i] > 0:
                preds.append("ar")
            else:
                preds.append(self._latin_vote(t))
        return pa.table({"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds, pa.string())})


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable approximate-distinct sketch (partial-agg pattern)
# ---------------------------------------------------------------------------


class HLL:
    """HyperLogLog sketch (Flajolet et al. 2007, public): p-bit register
    index, 64-bit hashes; registers merge with elementwise max — the
    mergeable-sketch shape the ray_guide recommends for aggregation at
    scale (one sketch per batch, tiny merge stage; no row shuffle)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1 (vectorized via bit tricks)
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.ones(len(h), dtype=bool)
        probe = np.uint64(1) << np.uint64(63)
        for i in range(64 - self.p + 1):
            hit = mask & ((rest & probe) == 0)
            lz[hit] += 1
            mask &= hit
            probe >>= np.uint64(1)
            if not mask.any():
                break
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HLL":
        obj = cls(blob[0])
        obj.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return obj


_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_HLL_SEED = np.uint64(0x9E3779B97F4A7C15)
_HLL_MULT = np.uint64(0x100000001B3)  # FNV-1a 64 prime


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Vigna 2015, public domain): full-avalanche
    64-bit mix — uniform leading-zero statistics for the HLL estimator."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= _SPLITMIX_C1
        h ^= h >> np.uint64(27)
        h *= _SPLITMIX_C2
        h ^= h >> np.uint64(31)
    return h


def _string_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit string hash: gather the UTF-8 bytes into a padded
    (n, words) uint64 matrix with ONE fancy-index, then a word-wise
    polynomial mix + splitmix64 finalizer — the same vectorized-mix shape
    as dedup.explode_bands; O(maxlen/8) numpy passes, no per-row Python.
    Length is folded into the seed so zero-padding can't collide with
    literal trailing NULs; nulls hash as empty strings."""
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    off = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
    lens = np.diff(off)
    h = _mix64(lens.astype(np.uint64) ^ _HLL_SEED)
    maxlen = int(lens.max())
    if maxlen == 0:
        return h
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    width = ((maxlen + 7) // 8) * 8
    pos = np.arange(width)
    idx = np.minimum(off[:-1, None] + pos[None, :], len(data) - 1)
    bytes_m = np.where(pos[None, :] < lens[:, None], data[idx], 0).astype(np.uint8)
    words = np.ascontiguousarray(bytes_m).reshape(n, width).view(np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width // 8):
            h = h * _HLL_MULT + words[:, j]
    return _mix64(h)


def _hll_hashes(vals) -> np.ndarray:
    """Uniform 64-bit hashes, fully vectorized.

    Integer arrays (numpy, Arrow, or plain iterables of ints) go through
    the splitmix64 finalizer in one numpy pass; strings through the
    padded-word polynomial hash.  Anything else falls back to hashing
    ``str(v)``.  (crc32 pairs are too correlated for leading-zero
    statistics and bias the estimator; both mixes here are
    full-avalanche.)"""
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if not isinstance(vals, pa.Array):
        a = np.asarray(vals)
        if np.issubdtype(a.dtype, np.integer):
            with np.errstate(over="ignore"):
                return _mix64(a.astype(np.int64, copy=False).astype(np.uint64) ^ _HLL_SEED)
        vals = pa.array([str(v) for v in vals], pa.string())
    if pa.types.is_integer(vals.type):
        v = pc.cast(vals.fill_null(0), pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            return _mix64(v ^ _HLL_SEED)
    return _string_hashes(pc.cast(vals, pa.string()))


def hll_sketch(ds, column: str, p: int = 12) -> HLL:
    """Merged HLL sketch of a column via per-batch partials reduced in one
    tiny driver merge — nothing but 4 KB sketches cross the wire.  The
    register state is a pure function of the value SET (max is
    associative/commutative), so it is batching- and width-independent."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hll_hashes(t.column(column)))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    sketches = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = HLL(p)
    for row in sketches:
        merged.merge(HLL.from_bytes(row["sketch"]))
    return merged


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) from the merged HLL sketch."""
    return hll_sketch(ds, column, p).estimate()


def tfidf_terms(docs_ds):
    """Distributed TF-IDF statistics: (doc_id, term, tf, df) — all exact
    INTEGERS so a DuckDB unnest/GROUP BY twin hash-matches (the float
    ``tf·ln(N/df)`` fold is a trivial scalar on top; the distributed work
    is the two aggregations and the join, which is what this verifies).

    Shape: term frequencies are computed ENTIRELY batch-locally (a
    document lives in one row, so its tf vector never crosses a
    partition — classic combiner); the distinct (doc, term, tf) rows then
    shuffle ONCE (groupby term), and document frequency is attached
    in-group as the group size.  At 100 TB the single exchange carries
    distinct doc-term pairs, not token streams."""

    def tf_batch(t: pa.Table) -> pa.Table:
        wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
        flat = wl.flatten()
        keep = pc.greater(pc.binary_length(flat), 0)
        parents = pc.list_parent_indices(wl).filter(keep)
        terms = flat.filter(keep)
        df = pd.DataFrame(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), parents).to_numpy(zero_copy_only=False),
                "term": terms.to_pandas(),
            }
        )
        g = df.groupby(["doc_id", "term"], as_index=False, sort=False).size().rename(columns={"size": "tf"})
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(g["term"], pa.string()),
                "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
            }
        )

    tf = docs_ds.map_batches(tf_batch, batch_format="pyarrow")
    out_schema = pa.schema([("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()), ("df", pa.int64())])

    def with_df(g: pa.Table) -> pa.Table:
        # tf rows are distinct (doc, term), so df(term) == the group size —
        # attaching it inside the SAME groupby-term shuffle replaces an
        # aggregate + hash join (whose internal partitioning chokes on
        # key-count < partition-count with columnless empty blocks).
        # Skew caveat: a term present in every document makes one group
        # corpus-sized; production tf-idf drops ultra-common terms first
        # (or computes df via aggregate + broadcast when vocab is bounded).
        if g.num_rows == 0:
            return out_schema.empty_table()
        return g.append_column("df", pa.array(np.full(g.num_rows, g.num_rows), pa.int64()))

    return tf.groupby("term").map_groups(with_df, batch_format="pyarrow")


def _split_tokens(t: pa.Table):
    """Whitespace tokens of the batch's ``text`` column as (parent_row_index,
    token) flat arrays — the SQL-twin tokenization
    ``list_filter(string_split_regex(trim(text), '\\s+'), w -> len(w) > 0)``."""
    wl = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text"))).combine_chunks()
    flat = wl.flatten()
    keep = pc.greater(pc.binary_length(flat), 0)
    parents = pc.list_parent_indices(wl).filter(keep).to_numpy(zero_copy_only=False)
    return parents, flat.filter(keep)


def heavy_hitter_topk(
    docs_ds, k: int = 20, capacity: int = 4096, max_candidates: int = 100_000, num_partitions: int | None = None
):
    """EXACT corpus top-k tokens via a mergeable heavy-hitter sketch + an
    exact recount pass — the scale path that :func:`top_ngrams`' full
    ``groupby(token)`` can't take at 100 TB (the full-domain exchange
    carries every distinct token; this one carries ≤ ``capacity`` rows
    per batch).

    Pass 1 (sketch): each batch counts its tokens exactly (vectorized
    ``value_counts``), keeps only the top-``capacity`` items with the
    (capacity+1)-th largest local count ``t_b`` subtracted (a mergeable
    SpaceSaving/Misra-Gries-style truncation: the surviving counter is a
    LOWER bound, and any item's true batch count exceeds its emitted
    counter by at most ``t_b``), and emits ``t_b`` under a sentinel key.
    One ``groupby(token).Sum`` merges the partials, so globally
    ``est(x) <= count(x) <= est(x) + slack`` with ``slack = Σ_b t_b`` —
    for natural-language token tails ``t_b`` is ~1 per batch.

    Pass 2 (exact): candidates = every sketched token whose upper bound
    reaches the k-th largest lower bound (a guaranteed superset of the
    true top-k among sketched tokens; unsketched tokens are covered by
    the final guard below).  Their exact counts come from a second
    streaming pass filtered to the broadcast candidate set; ties broken
    (count DESC, token ASC) exactly as the SQL twin.

    Guard: if the k-th exact count is not > ``slack`` (so an unsketched
    token could in principle belong in the top-k), fall back to the exact
    full-domain groupby — correctness never depends on the sketch bound.
    """
    import ray
    from ray.data.aggregate import Sum

    if num_partitions is None:
        # corpus-sized auto-sizing (repo convention, metadata-cheap for
        # parquet reads); also keeps the shuffle partition count at or
        # below the group-domain size for small corpora, so no hash
        # partition is empty (schema-less RefBundle log noise)
        num_partitions = auto_num_partitions(docs_ds.count())

    def sketch_partials(t: pa.Table) -> pa.Table:
        _, toks = _split_tokens(t)
        empty = pa.table({"token": pa.array([], pa.string()), "est": pa.array([], pa.int64())})
        if len(toks) == 0:
            return empty
        vc = toks.to_pandas().value_counts()  # sorted desc, ties by insertion
        if len(vc) > capacity:
            t_b = int(vc.iloc[capacity])
            kept = vc.iloc[:capacity] - t_b
            kept = kept[kept > 0]
        else:
            t_b = 0
            kept = vc
        tokens = list(kept.index)
        ests = kept.to_numpy(dtype=np.int64)
        if t_b:
            # "" never appears as a token (_split_tokens drops empties)
            tokens.append("")
            ests = np.append(ests, t_b)
        return pa.table({"token": pa.array(tokens, pa.string()), "est": pa.array(ests, pa.int64())})

    # partials are consolidated to num_partitions blocks BEFORE the
    # groupby: Ray's aggregate emits schema-less empty output blocks when
    # the group domain is smaller than its input block count, and the
    # partials are sketch-sized (≤ capacity rows per input block), so the
    # extra exchange is negligible next to the corpus pass
    merged = (
        docs_ds.map_batches(sketch_partials, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("token", num_partitions=num_partitions)
        .aggregate(Sum("est", alias_name="est"))
        .materialize()  # read 3× below
    )
    # candidate selection stays distributed: only k rows (the lower-bound
    # threshold) and the ≤ max_candidates survivors ever reach the driver
    slack_df = merged.map_batches(
        lambda t: t.filter(pc.equal(t.column("token"), "")), batch_format="pyarrow"
    ).to_pandas()
    slack = int(slack_df["est"].sum()) if len(slack_df) else 0
    top_est = (
        merged.map_batches(lambda t: t.filter(pc.not_equal(t.column("token"), "")), batch_format="pyarrow")
        .sort(["est", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    def exact_fallback() -> pa.Table:
        """Full-domain exact top-k — correctness never depends on the
        sketch bound."""

        def count_partials(t: pa.Table) -> pa.Table:
            _, toks = _split_tokens(t)
            vc = toks.to_pandas().value_counts()
            return pa.table({"token": pa.array(vc.index, pa.string()), "c": pa.array(vc.to_numpy(), pa.int64())})

        return (
            docs_ds.map_batches(count_partials, batch_format="pyarrow")
            .repartition(num_partitions)
            .groupby("token", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
            .sort(["c", "token"], descending=[True, False])
            .limit(k)
            .to_pandas()
            .pipe(pa.Table.from_pandas, preserve_index=False)
        )

    if len(top_est) == 0:
        if slack == 0:
            # nothing was truncated anywhere -> the corpus truly has no tokens
            return pa.table({"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        # every batch truncated everything away (capacity below the batch
        # token-tail): the sketch carries no signal — go exact
        return exact_fallback()
    kth_lower = int(top_est["est"].iloc[-1])
    cands_ds = merged.map_batches(
        lambda t: t.filter(
            pc.and_(pc.not_equal(t.column("token"), ""), pc.greater_equal(pc.add(t.column("est"), slack), kth_lower))
        ),
        batch_format="pyarrow",
    )
    n_cands = cands_ds.count()
    if n_cands > max_candidates:
        raise ValueError(f"{n_cands} heavy-hitter candidates > max_candidates={max_candidates}; raise capacity")
    cands = cands_ds.to_pandas()["token"].to_numpy()
    cand_ref = ray.put(set(cands.tolist()))

    def recount(t: pa.Table) -> pa.Table:
        _, toks = _split_tokens(t)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        s = toks.to_pandas()
        cand = ray.get(cand_ref)
        vc = s[s.isin(cand)].value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()), "c": pa.array(vc.to_numpy(), pa.int64())})

    exact = (
        docs_ds.map_batches(recount, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("token", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="c"))
        .sort(["c", "token"], descending=[True, False])
        .limit(k)
    )
    out = exact.to_pandas()
    if slack > 0 and (len(out) < k or int(out["c"].iloc[-1]) <= slack):
        # sketch bound too loose for this corpus/capacity: fewer than k
        # candidates survived, or an unsketched token (count ≤ slack)
        # could still belong in the top-k — go exact
        return exact_fallback()
    return pa.Table.from_pandas(out, preserve_index=False)


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document — the standard
    LLM-corpus quality gate (repetitious documents are low quality):
    word count, distinct-word count, top unigram frequency, top bigram
    frequency.  All-integer outputs so the DuckDB unnest/GROUP BY twin
    hash-matches exactly.

    Entirely batch-local (a document lives in one row): tokens are
    exploded WITHIN the batch with Arrow kernels, counted with one pandas
    groupby, and scattered back — no shuffle at any scale."""
    parents, toks = _split_tokens(batch)
    words = toks.to_pandas().to_numpy()
    n = batch.num_rows
    n_words = np.bincount(parents, minlength=n).astype(np.int64)
    n_unique = np.zeros(n, np.int64)
    top_tf = np.zeros(n, np.int64)
    top_bigram_tf = np.zeros(n, np.int64)
    if len(words):
        uni = pd.DataFrame({"p": parents, "w": words}).groupby(["p", "w"], sort=False).size()
        per = uni.groupby(level=0).agg(["size", "max"])
        idx = per.index.to_numpy()
        n_unique[idx] = per["size"].to_numpy()
        top_tf[idx] = per["max"].to_numpy()
    if len(words) > 1:
        same = parents[1:] == parents[:-1]  # bigrams never cross documents
        if same.any():
            bg = pd.Series(words[:-1][same]) + " " + pd.Series(words[1:][same])
            bper = (
                pd.DataFrame({"p": parents[:-1][same], "b": bg.to_numpy()})
                .groupby(["p", "b"], sort=False)
                .size()
                .groupby(level=0)
                .max()
            )
            top_bigram_tf[bper.index.to_numpy()] = bper.to_numpy()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_unique": pa.array(n_unique, pa.int64()),
            "top_tf": pa.array(top_tf, pa.int64()),
            "top_bigram_tf": pa.array(top_bigram_tf, pa.int64()),
        }
    )


def bm25_topk(docs_ds, query_terms: list[str], k: int = 10, scale: int = 1_000_000):
    """Distributed BM25 ranked retrieval for a fixed query-term set.

    Scale shape (the part worth verifying):
      1. one batch-local pass computes per-doc length + per-query-term tf
         (Arrow split + bincount — no token stream ever leaves the task);
         the NARROW per-doc stats table (k+2 int columns) is materialized
         so the text corpus is read exactly once,
      2. corpus constants (N, avg doc length, per-term document frequency)
         are one tiny ``Dataset.aggregate`` — scalars to the driver, the
         legal kind of driver materialization,
      3. scoring is a second batch-local pass over the narrow stats with
         the constants in the closure (broadcast, not re-shipped),
      4. top-k = per-batch local top-k pre-prune (window.py trick) before
         the global sort+limit, so the exchange carries O(blocks·k) rows.

    Constants k1=1.2, b=0.75, (k1+1)=2.2 are literals mirrored digit-for-
    digit in the SQL twin, and the per-term score sum runs in query-term
    order, so the float arithmetic matches DuckDB's left-to-right
    evaluation and the scaled-integer hash compare is exact."""
    from ray.data.aggregate import Count, Sum

    K1, B, K1P1 = 1.2, 0.75, 2.2
    nq = len(query_terms)

    def stats(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        n = t.num_rows
        cols = {
            "doc_id": t.column("doc_id"),
            "dl": pa.array(np.bincount(parents, minlength=n), pa.int64()),
        }
        for i, qt in enumerate(query_terms):
            mask = pc.equal(toks, qt).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[mask], minlength=n)
            cols[f"tf_{i}"] = pa.array(tf, pa.int64())
            cols[f"m_{i}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    st = docs_ds.map_batches(stats, batch_format="pyarrow").materialize()
    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sumdl")] + [
        Sum(f"m_{i}", alias_name=f"df_{i}") for i in range(nq)
    ]
    g = st.aggregate(*aggs)
    if not g or not g.get("n"):
        # empty corpus: no docs -> no corpus constants; return an empty
        # (doc_id, score) dataset rather than dividing by n_docs == 0
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())})
        )
    n_docs = float(g["n"])
    avgdl = float(g["sumdl"]) / n_docs
    idf = [float(np.log((n_docs - g[f"df_{i}"] + 0.5) / (g[f"df_{i}"] + 0.5) + 1.0)) for i in range(nq)]

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy().astype(np.float64)
        norm = K1 * (1.0 - B + B * (dl / avgdl))
        s = np.zeros(len(dl))
        for i in range(nq):
            tf = t.column(f"tf_{i}").to_numpy().astype(np.float64)
            s = s + (idf[i] * tf) * K1P1 / (tf + norm)
        # DuckDB round() is half AWAY from zero (pc.round is half-to-even)
        scaled = s * scale
        sc = pa.array((np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64), pa.int64())
        out = pa.table({"doc_id": t.column("doc_id"), "score": sc})
        return out.filter(pc.greater(out.column("score"), 0))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = np.lexsort((t.column("doc_id").to_numpy(), -t.column("score").to_numpy()))[:k]
        return t.take(pa.array(order))

    return (
        st.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def bigram_pmi(docs_ds, min_count: int = 5, n_top: int = 50, scale: int = 1_000_000):
    """Collocation extraction by pointwise mutual information —
    ``pmi(w1,w2) = ln(N·c12 / (c1·c2))`` over adjacent-word bigrams
    (Church & Hanks 1990, public), the standard phrase-mining /
    tokenizer-merge-candidate op.  N is the total bigram count, c12 the
    bigram count, c1/c2 the corpus unigram counts.

    Shape: unigram and bigram counts are combined batch-locally before
    their (single) groupby exchanges; bigrams below ``min_count`` are
    dropped BEFORE decoration, so the two distributed hash joins against
    the unigram table carry only the frequent-bigram set (vocab-bounded,
    never the token stream); ln scoring is a stateless pass with N as a
    closure scalar (the legal kind), and the final sort+limit runs over
    the already-small scored set.  All counts are exact integers and the
    ln argument is one integer-ratio division, so the SQL twin is
    float-exact under the 6-dp scaled-int emission (numpy and DuckDB ln
    are bit-equal on this libm — measured for the HLL correction)."""
    from ray.data.aggregate import Sum

    def uni_partials(t: pa.Table) -> pa.Table:
        _, toks = _split_tokens(t)
        vc = pd.Series(toks.to_pandas().to_numpy()).value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()), "c": pa.array(vc.to_numpy(), pa.int64())})

    def bi_partials(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        if len(words) < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()), "c12": pa.array([], pa.int64())}
            )
        same = parents[1:] == parents[:-1]
        vc = pd.DataFrame({"w1": words[:-1][same], "w2": words[1:][same]}).groupby(["w1", "w2"], sort=False).size()
        idx = vc.index
        return pa.table(
            {
                "w1": pa.array(idx.get_level_values(0), pa.string()),
                "w2": pa.array(idx.get_level_values(1), pa.string()),
                "c12": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    uni = docs_ds.map_batches(uni_partials, batch_format="pyarrow").groupby("w").aggregate(Sum("c", alias_name="c"))
    bi = (
        docs_ds.map_batches(bi_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c12", alias_name="c12"))
        .materialize()  # read twice: the N scalar and the frequent set
    )
    n_total = int(bi.aggregate(Sum("c12"))["sum(c12)"] or 0)
    if n_total == 0:
        return bi  # empty corpus: empty (w1, w2, c12) set, schema-stable enough for callers

    freq = bi.filter(expr=f"c12 >= {int(min_count)}")
    n_parts = max(2, min(64, freq.count() // 100_000 + 2))
    u1 = uni.map_batches(lambda t: pa.table({"u1w": t.column("w"), "c1": t.column("c")}), batch_format="pyarrow")
    u2 = uni.map_batches(lambda t: pa.table({"u2w": t.column("w"), "c2": t.column("c")}), batch_format="pyarrow")
    j = freq.join(u1, join_type="inner", num_partitions=n_parts, on=("w1",), right_on=("u1w",)).join(
        u2, join_type="inner", num_partitions=n_parts, on=("w2",), right_on=("u2w",)
    )

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False)
        c1 = t.column("c1").to_numpy(zero_copy_only=False)
        c2 = t.column("c2").to_numpy(zero_copy_only=False)
        pmi = np.log((n_total * c12).astype(np.float64) / (c1 * c2)) * float(scale)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c12": t.column("c12"),
                "pmi_6dp": pa.array((np.sign(pmi) * np.floor(np.abs(pmi) + 0.5)).astype(np.int64), pa.int64()),
            }
        )

    return j.map_batches(score, batch_format="pyarrow").sort(["pmi_6dp", "w1", "w2"], descending=[True, False, False]).limit(n_top)


def top_ngrams(docs_ds, n_top: int = 20):
    """Corpus-wide top-N bigram counts — the classic corpus-statistics op
    (n-gram frequency tables for LM smoothing / contamination checks).

    Combiner shape: bigrams are counted batch-locally (explode + one
    pandas groupby, bigrams never cross documents), so the single
    groupby(bigram) exchange carries per-batch DISTINCT bigram partials,
    not the token stream; a per-batch local top-N pre-prune cannot be
    applied before the global Sum (a globally frequent bigram may be
    locally rare), so the prune happens after the aggregate, before the
    final sort.  Ties broken by bigram text ascending, mirrored in SQL."""
    from ray.data.aggregate import Sum

    def bigram_partials(t: pa.Table) -> pa.Table:
        parents, toks = _split_tokens(t)
        words = toks.to_pandas().to_numpy()
        if len(words) < 2:
            return pa.table({"bigram": pa.array([], pa.string()), "c": pa.array([], pa.int64())})
        same = parents[1:] == parents[:-1]
        bg = pd.Series(words[:-1][same]) + " " + pd.Series(words[1:][same])
        vc = bg.value_counts()
        return pa.table({"bigram": pa.array(vc.index, pa.string()), "c": pa.array(vc.to_numpy(), pa.int64())})

    counts = docs_ds.map_batches(bigram_partials, batch_format="pyarrow").groupby("bigram").aggregate(Sum("c", alias_name="c"))

    def local_topn(t: pa.Table) -> pa.Table:
        if t.num_rows <= n_top:
            return t
        df = t.to_pandas().sort_values(["c", "bigram"], ascending=[False, True], kind="mergesort").head(n_top)
        return pa.Table.from_pandas(df, preserve_index=False)

    return counts.map_batches(local_topn, batch_format="pyarrow").sort(["c", "bigram"], descending=[True, False]).limit(n_top)


# Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446 §A1.1, adapted
# to the synthetic corpus's ranges) — fixed, mirrored in the oracle SQL.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 80
GOPHER_MIN_MEAN_WORD_LEN = 4.2
GOPHER_MAX_MEAN_WORD_LEN = 4.8
GOPHER_MAX_WORD_LEN = 7
GOPHER_MIN_STOPWORDS = 2


def gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style multi-rule document quality signals (Rae et al. 2021):
    word count bounds, mean word length band, max word length cap, and a
    minimum stopword count — plus the conjunctive ``gopher_pass`` gate.
    Fully vectorized: one whitespace split for the batch, per-doc
    sums/maxima via ``np.bincount`` / ``np.maximum.reduceat`` over the
    flat (parent, token) arrays.  The mean is rounded to 6 dp on both
    sides (SQL-twin protocol shared with ``quality_score_batch``);
    zero-word docs take 0 mean / 0 max via the ``greatest``/``coalesce``
    guards mirrored in the twin."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "mean_word_len": pa.array([], pa.float64()),
                "max_word_len": pa.array([], pa.int64()),
                "n_stop": pa.array([], pa.int64()),
                "gopher_pass": pa.array([], pa.int64()),
            }
        )
    parents, toks = _split_tokens(batch)
    tok_len = pc.utf8_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.bincount(parents, minlength=n).astype(np.int64)
    sum_len = np.bincount(parents, weights=tok_len, minlength=n).astype(np.int64)
    max_len = np.zeros(n, np.int64)
    np.maximum.at(max_len, parents, tok_len)
    mean_len = np.round(sum_len / np.maximum(n_words, 1), 6)
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = pc.cast(pc.count_substring_regex(batch.column("text"), pattern=stop_pat), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    ok = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (max_len <= GOPHER_MAX_WORD_LEN)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_len, pa.float64()),
            "max_word_len": pa.array(max_len, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "gopher_pass": pa.array(ok.astype(np.int64), pa.int64()),
        }
    )
