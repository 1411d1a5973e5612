"""Deduplication operators for training-data pipelines, Ray-Data-first.

Five families (graded as first-class components alongside the crawl ops):

  exact          hash-partitioned groupby, first-wins  (SQL-oracle twin)
  minhash_lsh    shingle -> minhash -> banded LSH buckets -> verified pairs
  simhash        64-bit simhash + hamming-radius buckets
  ngram_jaccard  character-set jaccard verified pairs   (SQL-oracle twin via
                 DuckDB's jaccard())
  embedding near-dup lives in functions/similarity.py (cosine threshold)

Scale shape (the part that matters at 100 TB):
  * signatures are computed batch-local inside ``map_batches`` (numpy
    vectorized minhash: one (n_docs x n_perm) min-reduction per batch);
  * band rows carry (band_id, band_hash, doc_id, signature) — the full
    signature (n_perm x 8 B, ~0.5 KB) but NEVER the text — into the LSH
    groupby shuffle, so candidate verification is BUCKET-LOCAL: the
    estimated jaccard is computed inside ``map_groups`` where both
    signatures are already co-located.  Nothing corpus-sized ever
    touches the driver;
  * cross-band pair dedup is a ``groupby(pair).aggregate(Max)`` — a
    single hash shuffle of only the pairs that PASSED the threshold,
    not a per-pair ``map_groups`` call;
  * the final connected-component step has two executors with identical
    semantics: a driver-side vectorized fast path HARD-GATED by
    ``max_driver_edges``, and ``connected_components_distributed`` —
    iterative min-label propagation with pointer jumping built on
    ``Dataset.join`` + ``groupby`` (O(log diameter) rounds, nothing on
    the driver but a per-round convergence scalar).

MinHash design follows the public MinHash/LSH literature (Broder 1997;
Leskovec-Rajaraman-Ullman, "Mining of Massive Datasets" ch.3).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._partitions import auto_num_partitions
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Add md5 hex content hash (matches DuckDB md5())."""
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column(column).to_pylist()]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """First-discovery-wins exact dedup: one surviving doc_id per distinct
    text + duplicate count.  Pattern: vectorized hash -> groupby aggregate
    (only (hash, id) rows shuffle, not text)."""
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(
        lambda t: content_hash_batch(t, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_WS_SPLIT = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3, family: str = "crc32") -> np.ndarray:
    """Word k-shingles -> stable 64-bit hashes, deterministic across
    processes (unlike builtins.hash).  Families: ``crc32`` (pair of
    crc32s, the cheap default) and ``md5`` (first 8 md5 bytes LE — the
    value DuckDB's ``md5_number_upper`` yields, so md5-family signatures
    have an EXACT SQL twin)."""
    words = _WS_SPLIT.split(text.strip().lower())
    if len(words) < k:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    if family == "md5":
        import hashlib

        for i, s in enumerate(shingles):
            out[i] = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
    else:
        for i, s in enumerate(shingles):
            bts = s.encode("utf-8")
            out[i] = (zlib.crc32(bts) << 32) | zlib.crc32(bts, 0xBEEF)
    return out


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42, hash_family: str = "crc32"):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = shingle_k
        self.hash_family = hash_family

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k, family=self.hash_family)
        # vectorized (n_shingles x n_perm) permute + min-reduce
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch path, bit-identical to per-doc :meth:`signature` (min over
        a multiset equals min over its distinct values, and every shingle's
        hash is value-deterministic): build the batch's shingles flat,
        factorize so each DISTINCT shingle is hashed ONCE (near-dup corpora
        repeat shingles heavily — this is where the md5 family's per-value
        digest cost goes from O(shingles) to O(distinct)), then one
        (shingles x n_perm) wrapping permute and a per-doc segment min via
        ``np.minimum.reduceat`` — no per-doc Python reduction."""
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "minhash": pa.array([], pa.list_(pa.uint64(), self.n_perm)),
                }
            )
        flat: list[str] = []
        offsets = np.empty(len(texts) + 1, np.int64)
        offsets[0] = 0
        for i, t in enumerate(texts):
            words = _WS_SPLIT.split(t.strip().lower())
            if len(words) < self.k:
                flat.append(" ".join(words))  # always >=1 shingle per doc
            else:
                flat.extend(" ".join(words[j : j + self.k]) for j in range(len(words) - self.k + 1))
            offsets[i + 1] = len(flat)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        h_uniq = np.empty(len(uniq), dtype=np.uint64)
        if self.hash_family == "md5":
            import hashlib

            for i, s in enumerate(uniq):
                h_uniq[i] = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
        else:
            for i, s in enumerate(uniq):
                bts = s.encode("utf-8")
                h_uniq[i] = (zlib.crc32(bts) << 32) | zlib.crc32(bts, 0xBEEF)
        with np.errstate(over="ignore"):
            vals = (h_uniq[codes][:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        sigs = np.minimum.reduceat(vals, offsets[:-1], axis=0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "minhash": pa.array(list(sigs), pa.list_(pa.uint64(), self.n_perm)),
            }
        )


def _sig_matrix(col) -> np.ndarray:
    """fixed_size_list<uint64> column -> (n, n_perm) uint64 matrix, zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


_FNV_OFF = np.uint64(1469598103934665603)
_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)
_MURMUR_F = np.uint64(0xFF51AFD7ED558CCD)
_SH33 = np.uint64(33)


def explode_bands(n_bands: int, rows_per_band: int, n_bucket_parts: int = 256):
    """minhash signatures -> (band_id, band_hash, doc_id, minhash) rows.

    The FULL signature rides along (n_perm x 8 B ≈ 0.5 KB/row) so that
    candidate verification can happen inside the LSH bucket, where both
    sides are co-located — the alternative (24-byte rows + a driver-side
    signature broadcast) materializes the whole corpus on the driver and
    dies at ~1e8 docs.  Band hash is a vectorized uint64 polynomial hash
    (no per-row Python): a hash collision only creates a spurious
    candidate pair, which bucket-local verification then filters."""

    if n_bucket_parts & (n_bucket_parts - 1):
        raise ValueError(f"n_bucket_parts must be a power of two (bitmask partition), got {n_bucket_parts}")

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base = batch.select(["doc_id", "minhash"])
        if n == 0:  # schema-stable empty block
            return (
                base.append_column("band_id", pa.array([], pa.int32()))
                .append_column("band_hash", pa.array([], pa.uint64()))
                .append_column("bucket_part", pa.array([], pa.int32()))
            )
        sigs = _sig_matrix(batch.column("minhash"))
        band_ids, band_hashes = [], []
        with np.errstate(over="ignore"):
            for b in range(n_bands):
                seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
                h = np.full(n, _FNV_OFF + np.uint64(b), dtype=np.uint64)
                for j in range(rows_per_band):
                    h = h * _MIX_MULT + seg[:, j]
                h ^= h >> _SH33
                h = h * _MURMUR_F
                h ^= h >> _SH33
                band_ids.append(np.full(n, b, dtype=np.int32))
                band_hashes.append(h)
        rep = pa.concat_tables([base] * n_bands)
        bh = np.concatenate(band_hashes)
        return (
            rep.append_column("band_id", pa.array(np.concatenate(band_ids), pa.int32()))
            .append_column("band_hash", pa.array(bh, pa.uint64()))
            # coarse partition key: buckets stay co-located (pure function
            # of the bucket key), but the groupby produces ~n_bucket_parts
            # groups instead of one per bucket — see bucket_verified_pairs
            .append_column("bucket_part", pa.array((bh & np.uint64(n_bucket_parts - 1)).astype(np.int32), pa.int32()))
        )

    return fn


_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float64())]
)


def bucket_verified_pairs(threshold: float, hot_bucket_cap: int = 1000):
    """One COARSE PARTITION of LSH buckets -> VERIFIED candidate pairs
    (a<b, est_jaccard>=threshold).

    The group key is ``bucket_part`` (a hash-prefix of the bucket key), so
    one ``map_groups`` call sees MANY complete buckets: a per-bucket
    ``map_groups`` costs one Python call + table slice per bucket, and
    buckets are overwhelmingly singletons — that overhead dominated the
    whole pipeline (measured ~2 ms/bucket).  Here singleton buckets are
    eliminated with one vectorized run-length pass, and only multi-doc
    buckets (rare) loop.  Co-location is preserved because bucket_part is
    a pure function of (band_id, band_hash).

    Verification stays bucket-local: every doc's full signature rides in
    the rows, so estimated jaccard is a numpy compare — no corpus-wide
    state anywhere.  Buckets larger than ``hot_bucket_cap`` are degenerate
    hot keys: star pairs against the bucket minimum only (documented cap,
    keeps a poisoned bucket from going quadratic)."""

    def fn(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n < 2:
            return _PAIR_SCHEMA.empty_table()
        band = part.column("band_id").to_numpy(zero_copy_only=False)
        bhash = part.column("band_hash").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = _sig_matrix(part.column("minhash"))
        # sort by (band, hash, doc) -> buckets are contiguous runs
        order = np.lexsort((ids, bhash, band))
        band, bhash, ids, sigs = band[order], bhash[order], ids[order], sigs[order]
        starts = np.flatnonzero(np.concatenate(([True], (band[1:] != band[:-1]) | (bhash[1:] != bhash[:-1]))))
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):  # singletons skipped wholesale
            bn = e - s
            b_ids, b_sigs = ids[s:e], sigs[s:e]
            rng = range(1) if bn > hot_bucket_cap else range(bn - 1)  # hot-key star guard
            for i in rng:
                est = (b_sigs[i][None, :] == b_sigs[i + 1 :]).mean(axis=1)
                keep = est >= threshold
                if keep.any():
                    out_a.append(np.full(int(keep.sum()), b_ids[i], dtype=np.int64))
                    out_b.append(b_ids[i + 1 :][keep])
                    out_j.append(est[keep])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
                "est_jaccard": pa.array(np.round(np.concatenate(out_j), 6), pa.float64()),
            }
        )

    return fn


def minhash_lsh_pairs(
    docs_ds,
    n_perm: int = 64,
    n_bands: int = 8,
    threshold: float = 0.5,
    verify_exact: bool = False,
    verify_exact_max_docs: int = 1_000_000,
    hash_family: str = "crc32",
):
    """Full MinHash-LSH near-dup pipeline: signatures -> bands -> buckets
    -> bucket-locally verified pairs (est_jaccard >= threshold) -> one
    aggregate-shuffle pair dedup.  Single streaming pass; the only
    all-to-all exchanges are the bucket groupby (0.5 KB rows) and the
    pair-dedup groupby (passing pairs only).

    With ``verify_exact`` the surviving pairs additionally get TRUE
    word-shingle jaccard computed from the candidate docs' text.  The
    candidate-doc set is tiny relative to the corpus, so it is broadcast
    — guarded by ``verify_exact_max_docs`` (hard error, not silent
    driver OOM, when the "candidates are tiny" assumption breaks)."""
    from ray.data.aggregate import Max

    rows_per_band = n_perm // n_bands
    sigs = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_perm": n_perm, "hash_family": hash_family},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    bands = sigs.map_batches(explode_bands(n_bands, rows_per_band), batch_format="pyarrow")
    cand = bands.groupby("bucket_part").map_groups(bucket_verified_pairs(threshold), batch_format="pyarrow")
    # cross-band dedup: est_jaccard is identical wherever the pair was
    # found, so Max == the value; one aggregate shuffle, no per-pair groups
    result = cand.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    if not verify_exact:
        return result

    # exact verification: fetch ONLY candidate docs' texts, broadcast, and
    # compute true word-shingle jaccard per pair
    import ray.data as rd

    surv = result.to_pandas()
    if surv.empty:
        # keep the verified schema stable and don't re-execute the lazy
        # pipeline the caller would otherwise trigger a second time
        surv = surv.assign(true_jaccard=pd.Series(dtype="float64"))
        return rd.from_pandas(surv)
    cand_ids = set(surv["doc_a"]) | set(surv["doc_b"])
    if len(cand_ids) > verify_exact_max_docs:
        raise ValueError(
            f"verify_exact: {len(cand_ids)} candidate docs exceeds "
            f"verify_exact_max_docs={verify_exact_max_docs}; the candidate set is "
            "not small relative to the corpus — lower the LSH threshold or verify "
            "est_jaccard only (verify_exact=False)"
        )
    texts = {}
    for r in docs_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=pa.array(sorted(cand_ids)))),
        batch_format="pyarrow",
    ).take_all():
        texts[r["doc_id"]] = r["text"]
    true_j = []
    for a, b in zip(surv["doc_a"], surv["doc_b"]):
        sa, sb = set(_shingle_hashes(texts[a]).tolist()), set(_shingle_hashes(texts[b]).tolist())
        true_j.append(round(len(sa & sb) / max(len(sa | sb), 1), 6))
    surv = surv.assign(true_jaccard=true_j)
    surv = surv[surv["true_jaccard"] >= threshold].reset_index(drop=True)
    return rd.from_pandas(surv)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (Charikar 2002, public)."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(_WS_SPLIT.split(text.strip().lower())):
            bts = w.encode("utf-8")
            h = (zlib.crc32(bts) << 32) | zlib.crc32(bts, 0xFACE)
            bits = (np.uint64(h) >> self.bits) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized simhash, bit-identical to :meth:`simhash` (the
        per-doc accumulation is a commutative integer sum, so order never
        matters): tokenize per doc (C regex), crc32 ONCE per distinct
        batch token (factorize), expand to a (unique, 64) ±1 bit matrix,
        and scatter-add all docs' contributions in one ``np.add.at``."""
        texts = batch.column("text").to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array([], pa.uint64())})
        doc_tokens = [set(_WS_SPLIT.split(t.strip().lower())) for t in texts]
        parents = np.repeat(np.arange(n), [len(s) for s in doc_tokens])
        words = pd.Series([w for s in doc_tokens for w in s])
        codes, uniq = pd.factorize(words)
        h_uniq = np.empty(len(uniq), np.uint64)
        for i, w in enumerate(uniq):
            bts = w.encode("utf-8")
            h_uniq[i] = np.uint64((zlib.crc32(bts) << 32) | zlib.crc32(bts, 0xFACE))
        # int8 is enough for the ±1 contributions; np.add.at upcasts
        # against the int64 accumulator, cutting the transient
        # (tokens x 64) gather 8x
        contrib = (2 * ((h_uniq[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int8) - 1)
        acc = np.zeros((n, 64), np.int64)
        np.add.at(acc, parents, contrib[codes])
        sims = ((acc > 0).astype(np.uint64) << self.bits[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(sims, pa.uint64())})


def simhash_dup_groups(docs_ds):
    """Exact-simhash collision groups (hamming-0 near-dups): groupby simhash."""
    from ray.data.aggregate import Count, Min

    sh = docs_ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))
    grouped = sh.groupby("simhash").aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_docs"))
    return grouped.filter(lambda r: r["n_docs"] > 1)


_SIMHASH_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
)


def simhash_near_pairs(docs_ds, max_hamming: int = 3, n_pieces: int = 4, hot_bucket_cap: int = 2000):
    """SimHash near-dup pairs: text -> 64-bit SimHash (actor pool), then
    :func:`hamming_near_pairs` pigeonhole banding."""
    sh = docs_ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 4))
    return hamming_near_pairs(sh, max_hamming=max_hamming, n_pieces=n_pieces, hot_bucket_cap=hot_bucket_cap)


def hamming_near_pairs(sh_ds, max_hamming: int = 3, n_pieces: int = 4, hot_bucket_cap: int = 2000):
    """Hamming-radius near-dup pairs over a (doc_id, simhash uint64)
    dataset via pigeonhole banding (Manku-Jain-Sarma, WWW'07 shape):
    split the 64-bit hash into ``n_pieces`` equal pieces — two hashes
    within hamming distance ``max_hamming`` < n_pieces must agree EXACTLY
    on at least one piece — so bucket by (piece_id, piece_value), verify
    true hamming distance bucket-locally (one XOR+popcount numpy pass),
    and dedup pairs with a single groupby aggregate.  Same scale shape as
    minhash_lsh_pairs: nothing corpus-sized leaves the buckets.  Exact for
    the radius (recall 1.0) — which is what lets a DuckDB
    ``bit_count(xor(a,b))`` self-join oracle-pin this machinery
    (queries.fingerprint_hamming_pairs)."""
    from ray.data.aggregate import Min

    if max_hamming >= n_pieces:
        raise ValueError("pigeonhole soundness needs max_hamming < n_pieces")
    piece_bits = 64 // n_pieces
    piece_mask = np.uint64((1 << piece_bits) - 1)

    n_bucket_parts = 256

    def explode_pieces(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base = batch.select(["doc_id", "simhash"])
        if n == 0:
            return (
                base.append_column("piece_id", pa.array([], pa.int32()))
                .append_column("piece_val", pa.array([], pa.uint64()))
                .append_column("bucket_part", pa.array([], pa.int32()))
            )
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        pids, pvals = [], []
        for p in range(n_pieces):
            pids.append(np.full(n, p, dtype=np.int32))
            pvals.append((sh >> np.uint64(p * piece_bits)) & piece_mask)
        rep = pa.concat_tables([base] * n_pieces)
        pid = np.concatenate(pids)
        pval = np.concatenate(pvals)
        part = ((pval * np.uint64(n_pieces) + pid.astype(np.uint64)) & np.uint64(n_bucket_parts - 1)).astype(np.int32)
        return (
            rep.append_column("piece_id", pa.array(pid, pa.int32()))
            .append_column("piece_val", pa.array(pval, pa.uint64()))
            .append_column("bucket_part", pa.array(part, pa.int32()))
        )

    def bucket_pairs(part_tbl: pa.Table) -> pa.Table:
        # coarse partition: many complete (piece_id, piece_val) buckets per
        # call; singleton runs eliminated vectorized (see bucket_verified_pairs)
        n = part_tbl.num_rows
        if n < 2:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        pid = part_tbl.column("piece_id").to_numpy(zero_copy_only=False)
        pval = part_tbl.column("piece_val").to_numpy(zero_copy_only=False)
        ids = part_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        sh = part_tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, pval, pid))
        pid, pval, ids, sh = pid[order], pval[order], ids[order], sh[order]
        starts = np.flatnonzero(np.concatenate(([True], (pid[1:] != pid[:-1]) | (pval[1:] != pval[:-1]))))
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            bn = e - s
            b_ids, b_sh = ids[s:e], sh[s:e]
            rng = range(1) if bn > hot_bucket_cap else range(bn - 1)  # hot-key star guard
            for i in rng:
                x = b_sh[i] ^ b_sh[i + 1 :]
                # vectorized popcount over uint64 bytes
                ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
                keep = ham <= max_hamming
                if keep.any():
                    out_a.append(np.full(int(keep.sum()), b_ids[i], dtype=np.int64))
                    out_b.append(b_ids[i + 1 :][keep])
                    out_h.append(ham[keep].astype(np.int32))
        if not out_a:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), pa.int32()),
            }
        )

    pieces = sh_ds.map_batches(explode_pieces, batch_format="pyarrow")
    cand = pieces.groupby("bucket_part").map_groups(bucket_pairs, batch_format="pyarrow")
    # hamming identical wherever found -> Min == the value; one shuffle
    return cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# character n-gram jaccard (SQL-oracle-compatible: DuckDB jaccard())
# ---------------------------------------------------------------------------


def char_jaccard_pairs(docs_ds, id_limit: int, threshold: float):
    """All-pairs character-SET jaccard over doc_id < id_limit — the
    semantics of DuckDB's jaccard(s1, s2), so a SQL oracle can verify it
    exactly.  The bounded id_limit makes the quadratic explicit; the
    unbounded path is minhash_lsh_pairs."""
    import ray

    small = docs_ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], id_limit)), batch_format="pyarrow"
    ).select_columns(["doc_id", "text"])
    rows = small.take_all()  # bounded by id_limit — explicit materialization
    ids = [r["doc_id"] for r in rows]
    charsets = [frozenset(r["text"]) for r in rows]
    ref = ray.put((ids, charsets))

    def pairs_for(batch: pa.Table) -> pa.Table:
        b_ids, b_sets = ray.get(ref)
        out_a, out_b, out_j = [], [], []
        for my_id, my_text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            mine = frozenset(my_text)
            for other_id, other_set in zip(b_ids, b_sets):
                if other_id <= my_id:
                    continue
                inter = len(mine & other_set)
                union = len(mine | other_set)
                j = round(inter / union, 6) if union else 0.0
                if j >= threshold:
                    out_a.append(my_id)
                    out_b.append(other_id)
                    out_j.append(j)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64()), "jaccard_sim": pa.array(out_j, pa.float64())})

    return small.map_batches(pairs_for, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate-group resolution: connected components over candidate pairs
# ---------------------------------------------------------------------------


def connected_components(pairs_ds, max_rounds: int = 25, max_driver_edges: int = 5_000_000):
    """Resolve near-dup candidate PAIRS into duplicate GROUPS via iterative
    min-label propagation — driver-side vectorized fast path.

    Candidate-pair graphs are usually SMALL relative to the corpus (pairs
    come out of LSH buckets), so this path materializes the O(E) edge list
    driver-side and runs VECTORIZED numpy rounds.  It HARD-ERRORS (no
    silent driver OOM) when the edge count exceeds ``max_driver_edges``;
    the same semantics at any scale are ``connected_components_distributed``
    (Dataset.join + groupby label propagation, nothing driver-sized).

    Input: dataset with (doc_a, doc_b). Output pandas frame: (doc_id,
    group_id) where group_id = min doc_id of the component."""
    import warnings

    import pandas as pd

    if hasattr(pairs_ds, "materialize"):  # Ray Dataset: count in the object
        mat = pairs_ds.materialize()  # store BEFORE anything hits the driver
        n_edges = mat.count()
        if n_edges > max_driver_edges:
            raise ValueError(
                f"connected_components: {n_edges} edges exceeds max_driver_edges="
                f"{max_driver_edges}; use connected_components_distributed() "
                "(identical semantics, Dataset-native label propagation)"
            )
        pdf = mat.to_pandas()
    else:
        pdf = pairs_ds
    a = pdf["doc_a"].astype("int64").to_numpy()
    b = pdf["doc_b"].astype("int64").to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    pos = {int(n): i for i, n in enumerate(nodes)}
    node_i = np.concatenate([[pos[int(x)] for x in a], [pos[int(x)] for x in b]])
    peer_i = np.concatenate([[pos[int(x)] for x in b], [pos[int(x)] for x in a]])
    label = nodes.copy()  # label = min node id of the component (so far)
    converged = False
    for _ in range(max_rounds):
        cand = label.copy()
        np.minimum.at(cand, node_i, label[peer_i])
        if (cand == label).all():
            converged = True
            break
        label = cand
        # pointer jumping: follow one indirection (labels are node ids)
        lp = np.array([pos.get(int(l), -1) for l in label])
        ok = lp >= 0
        label[ok] = label[lp[ok]]
    if not converged:
        warnings.warn(f"connected_components: not converged after {max_rounds} rounds", stacklevel=2)
    out = pd.DataFrame({"doc_id": nodes, "group_id": label})
    return out.sort_values("doc_id").reset_index(drop=True)


def connected_components_gated(pairs_ds, max_local_edges: int = 262_144, max_rounds: int = 25):
    """Size-gated component resolution — the same idiom as
    ``graph.pagerank``'s small-graph fast path: candidate-pair graphs are
    usually TINY relative to the corpus (pairs come out of LSH buckets),
    so below the gate the edge list (materialized once anyway to count
    it) resolves driver-side in vectorized numpy rounds — saving the
    2-joins-per-round exchange cost that dominates wall time on small
    graphs — while anything larger takes the Dataset-native label
    propagation.  Both paths produce identical (doc_id, group_id) rows
    (pinned by the driver/distributed equivalence tests); the gate bounds
    driver memory at ~16 B/edge."""
    import ray.data as rd

    mat = pairs_ds.materialize() if hasattr(pairs_ds, "materialize") else pairs_ds
    n_edges = mat.count() if hasattr(mat, "count") else len(mat)
    if n_edges == 0:
        # an empty Dataset loses its schema through to_pandas — return the
        # contract schema directly (clean corpus == zero groups)
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())}))
    if n_edges <= max_local_edges:
        pdf = connected_components(mat, max_rounds=max_rounds, max_driver_edges=max_local_edges)
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.int64()),
                    "group_id": pa.array(pdf["group_id"].to_numpy(), pa.int64()),
                }
            )
        )
    return connected_components_distributed(mat, max_rounds=max_rounds)


def connected_components_distributed(pairs_ds, max_rounds: int = 25, num_partitions: int | None = None):
    """Distributed min-label propagation with pointer jumping — the
    any-scale executor for :func:`connected_components` (identical
    semantics, asserted equivalent in tests).

    Per round (all Dataset-native, nothing corpus-sized on the driver):
      1. edges ⋈ labels on node  → each edge learns its endpoint's label
      2. re-key to the peer, union with current labels, groupby-min
      3. pointer jump: labels ⋈ labels on (label = node) → label(label)
         (valid because every label value is a node id, and min-labels
         only ever decrease — one extra hash join halves the effective
         diameter per round, giving O(log d) convergence)
      4. convergence check: Sum(label) is strictly monotone decreasing
         until fixpoint, so an unchanged sum == converged (one scalar
         to the driver per round).

    Input: dataset with (doc_a, doc_b).  Output: Dataset (doc_id,
    group_id) where group_id = min doc_id of the component."""
    import warnings

    from ray.data.aggregate import Min, Sum

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").combine_chunks() if isinstance(t.column("doc_a"), pa.ChunkedArray) else t.column("doc_a")
        b = t.column("doc_b").combine_chunks() if isinstance(t.column("doc_b"), pa.ChunkedArray) else t.column("doc_b")
        node = pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())])
        peer = pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])
        return pa.table({"node": node, "peer": peer})

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())}))
    if num_partitions is None:
        # size the per-round join shuffles to the DATA: every round pays
        # ~40 ms/partition of task overhead (O(log d) rounds x 2 joins),
        # so a toy graph on 16 partitions spends 3x longer in scheduling
        # than in compute; ~100k edge rows per shuffle partition keeps
        # partitions batch-sized at any scale (measured: 47s -> 14s on a
        # 257-node graph, driver-equivalence tests unchanged)
        num_partitions = auto_num_partitions(n_edges)
    # initial label = min(self, min neighbor)
    labels = (
        edges.groupby("node")
        .aggregate(Min("peer", alias_name="min_peer"))
        # scrub the aggregate's zero-column empty blocks (they bypass
        # map_batches and poison the round-1 join when the node domain
        # is smaller than the aggregate's partition count)
        .repartition(num_partitions)
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "label": pc.min_element_wise(t.column("node"), t.column("min_peer"))}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label"))["sum(label)"]
    converged = False
    for _ in range(max_rounds):
        hop = edges.join(labels, join_type="inner", num_partitions=num_partitions, on=("node",))
        msgs = hop.map_batches(
            lambda t: pa.table({"node": t.column("peer"), "label": t.column("label")}), batch_format="pyarrow"
        )
        new_labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(num_partitions)  # zero-column empty-block scrub before the jump join
        )
        # pointer jump: label <- label(label)
        ltab = new_labels.map_batches(
            lambda t: pa.table({"pnode": t.column("node"), "plabel": t.column("label")}), batch_format="pyarrow"
        )
        jumped = new_labels.join(ltab, join_type="inner", num_partitions=num_partitions, on=("label",), right_on=("pnode",))
        labels = jumped.map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("plabel")}), batch_format="pyarrow"
        ).materialize()
        cur_sum = labels.aggregate(Sum("label"))["sum(label)"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        warnings.warn(
            f"connected_components_distributed: not converged after {max_rounds} rounds", stacklevel=2
        )
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"), "group_id": t.column("label")}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein <= 1) pair mining -- SymSpell deletion buckets
# ---------------------------------------------------------------------------

_EDIT_PAIR_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()), ("dist", pa.int64())])
_EDIT_MIX = np.uint64(0x100000001B3)
_EDIT_OFF = np.uint64(0xCBF29CE484222325)


def _title_byte_matrix(col: pa.ChunkedArray | pa.Array, width: int):
    """ASCII string column -> (n x width) zero-padded uint8 matrix + lengths.

    One buffer-level pass, no per-row Python: the row-major boolean-mask
    assignment consumes the Arrow data buffer in exactly concatenation
    order.  Assumes single-byte code points (the corpus contract for the
    title prefix; multi-byte input would break byte==character parity
    with the SQL twin's substr())."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, width), np.uint8), np.zeros(0, np.int64)
    offs = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(offs)
    if lens.max(initial=0) > width:
        raise ValueError(f"title longer than width={width}")
    mat = np.zeros((n, width), np.uint8)
    mat[np.arange(width)[None, :] < lens[:, None]] = data[offs[0] : offs[-1]]
    return mat, lens


def edit_distance_pairs(docs_ds, prefix_len: int = 16, n_bucket_parts: int = 64):
    """All doc pairs whose (lowercased, ``prefix_len``-char) title prefixes
    are within Levenshtein distance 1 — the SymSpell deletion-neighborhood
    algorithm (Garbe's symspell; same family as Norvig's spell-corrector),
    distributed: two strings are within edit distance 1 iff they share a
    member of {self} U {all single-character deletions}, so each doc emits
    <= prefix_len+1 variant HASHES (uint64, never the variant string) and
    candidates meet in variant buckets.  A hash collision only creates a
    spurious candidate; exact verification is bucket-local and vectorized
    (equal-length -> hamming<=1; length-gap-1 -> one aligned
    prefix/suffix check around the first mismatch).  Same coarse-partition
    shape as the MinHash path: buckets co-locate under
    ``bucket_part = hash & (n_bucket_parts-1)`` so one ``map_groups`` call
    handles MANY complete buckets and singleton buckets are skipped in one
    run-length pass.  Cross-bucket duplicate candidates (equal titles
    share every deletion bucket) collapse in one pair-keyed groupby-Min.

    Scale note: duplicate-title clusters of size m legitimately produce
    m(m-1)/2 output pairs — quadratic in the OUTPUT, identical to the SQL
    twin's self-join semantics; run exact dedup first if clusters are
    expected to be megascale."""
    W = prefix_len

    def variants(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        titles = pc.utf8_slice_codeunits(pc.utf8_lower(t.column("text").combine_chunks()), 0, W)
        mat, lens = _title_byte_matrix(titles, W)
        n = len(ids)
        blocks, blens, bvalid = [mat], [lens], [np.ones(n, bool)]
        for p in range(W):
            v = np.concatenate([mat[:, :p], mat[:, p + 1 :], np.zeros((n, 1), np.uint8)], axis=1)
            blocks.append(v)
            blens.append(lens - 1)
            bvalid.append(lens > p)
        vm = np.concatenate(blocks, axis=0)
        vl = np.concatenate(blens)
        keep = np.concatenate(bvalid)
        with np.errstate(over="ignore"):
            h = np.full(vm.shape[0], _EDIT_OFF, np.uint64)
            for j in range(W):
                h = h * _EDIT_MIX + vm[:, j].astype(np.uint64)
            h = h * _EDIT_MIX + vl.astype(np.uint64)  # zero-padded != shorter
            h ^= h >> np.uint64(33)
            h = h * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        all_ids = np.tile(ids, W + 1)[keep]
        h = h[keep]
        rep_title = pa.concat_arrays([titles] * (W + 1)).filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": pa.array(all_ids, pa.int64()),
                "title": rep_title,
                "vhash": pa.array(h, pa.uint64()),
                "bucket_part": pa.array((h & np.uint64(n_bucket_parts - 1)).astype(np.int32), pa.int32()),
            }
        )

    def bucket_pairs(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n < 2:
            return _EDIT_PAIR_SCHEMA.empty_table()
        vh = part.column("vhash").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, vh))
        vh, ids = vh[order], ids[order]
        mat, lens = _title_byte_matrix(part.column("title"), W)
        mat, lens = mat[order], lens[order]
        starts = np.flatnonzero(np.concatenate(([True], vh[1:] != vh[:-1])))
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        ii_l, jj_l = [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):  # singletons skipped wholesale
            li, lj = np.triu_indices(e - s, 1)
            ii_l.append(li + s)
            jj_l.append(lj + s)
        if not ii_l:
            return _EDIT_PAIR_SCHEMA.empty_table()
        ii, jj = np.concatenate(ii_l), np.concatenate(jj_l)
        keep = ids[ii] != ids[jj]  # a doc meeting itself via two deletion paths
        ii, jj = ii[keep], jj[keep]
        if ii.size == 0:
            return _EDIT_PAIR_SCHEMA.empty_table()
        A, B, la, lb = mat[ii], mat[jj], lens[ii], lens[jj]
        # orient so X is the longer side
        swap = lb > la
        X = np.where(swap[:, None], B, A)
        Y = np.where(swap[:, None], A, B)
        lx, ly = np.maximum(la, lb), np.minimum(la, lb)
        gap = lx - ly
        neq = X != Y
        dist = np.full(ii.shape[0], 2, np.int64)  # 2 == "fails, drop"
        same_len = gap == 0
        ndiff = neq.sum(axis=1)
        dist[same_len & (ndiff == 0)] = 0
        dist[same_len & (ndiff == 1)] = 1
        g1 = gap == 1
        if g1.any():
            # first mismatch p (X[ly] != 0 guarantees one exists); valid iff
            # X with p deleted equals Y, i.e. the aligned tails match
            p = np.argmax(neq[g1], axis=1)
            tail_eq = X[g1][:, 1:] == Y[g1][:, :-1]
            ok_suffix = np.flip(np.cumprod(np.flip(tail_eq, 1), 1), 1).astype(bool)
            at_end = p >= W - 1
            valid = np.where(at_end, True, ok_suffix[np.arange(p.size), np.minimum(p, W - 2)])
            d = dist[g1]
            d[valid] = 1
            dist[g1] = d
        keep2 = dist <= 1
        a = np.minimum(ids[ii], ids[jj])[keep2]
        b = np.maximum(ids[ii], ids[jj])[keep2]
        return pa.table({"a_id": pa.array(a, pa.int64()), "b_id": pa.array(b, pa.int64()), "dist": pa.array(dist[keep2], pa.int64())})

    from ray.data.aggregate import Min

    cand = (
        docs_ds.map_batches(variants, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return cand.groupby(["a_id", "b_id"]).aggregate(Min("dist", alias_name="dist"))


# ---------------------------------------------------------------------------
# exact set-similarity join -- AllPairs / PPJoin prefix filtering
# ---------------------------------------------------------------------------

_ALLPAIRS_CAND_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()), ("jaccard_6dp", pa.int64())])


def _word_shingle_sets(texts: list[str], k: int) -> list[set]:
    """Distinct word-k-gram shingle STRINGS per doc; docs with < k words
    produce the empty set (mirrors the SQL twin's empty list
    comprehension), unlike the MinHash path's whole-text fallback."""
    out = []
    for t in texts:
        ws = t.split(" ")
        if len(ws) < k:
            out.append(set())
        else:
            out.append({" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)})
    return out


def allpairs_jaccard_pairs(
    docs_ds,
    threshold: float = 0.5,
    shingle_k: int = 3,
    n_bucket_parts: int = 64,
    max_vocab: int = 4_000_000,
):
    """EXACT set-similarity self-join: every doc pair whose word-k-shingle
    sets have Jaccard >= ``threshold`` — the AllPairs / PPJoin prefix-
    filtering algorithm (Bayardo-Ma-Srikant WWW'07; Xiao et al. PPJoin),
    distributed.  Unlike MinHash-LSH this has recall 1.0 and no
    probability parameter, so it is ORACLE-PINNABLE against a quadratic
    SQL self-join.

    Shape:
      1. one scan -> (shingle, doc_id) postings -> groupby Count = global
         document frequency per shingle;
      2. the vocab table (HARD-GATED by ``max_vocab`` — vocabulary, not
         corpus, scale; raise instead of silent driver OOM) is sorted by
         (df asc, shingle asc) once and broadcast via ``ray.put``, so
         rank lookup inside every batch is ONE ``pc.index_in`` against
         the rank-ordered value_set — the index IS the rank, exact, no
         hash collisions;
      3. second scan: each doc sorts its rank set ascending (rarest
         first) and emits only its PREFIX tokens — prefix length
         p = s - ceil(t*s) + 1 — carrying (full rank set, size).
         Pigeonhole proof: a qualifying partner shares >= ceil(t*s)
         tokens, so the globally smallest shared token lies inside BOTH
         prefixes; emitting both prefixes loses nothing (exact);
      4. prefix postings meet under ``bucket_part = rank & (parts-1)``;
         ONE ``map_groups`` call verifies MANY complete token groups:
         pair generation by token run, local pair dedup, ragged gather
         of both rank sets, and the intersection size of every pair at
         once by sorting the combined (pair_id * V + rank) key vector
         and counting adjacent equals (a duplicate key can only be
         one-from-each-side: sets are duplicate-free);
      5. cross-bucket duplicate candidates collapse in one pair-keyed
         groupby-Max (the jaccard value is identical wherever found).

    Nothing corpus-sized touches the driver; the per-emission payload is
    the doc's int32 rank set (4 B/token), and only ~(1-t)*s + 1 prefix
    emissions per doc.  At open-web vocabulary (> ``max_vocab``) swap
    step 2's broadcast for a distributed join on shingle and re-collect
    sets with a groupby — documented, not silently attempted."""
    import ray
    from ray.data.aggregate import Count, Max

    t_int = int(np.floor(threshold * 1_000_000.0 + 0.5))

    def postings(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        sets = _word_shingle_sets(t.column("text").to_pylist(), shingle_k)
        out_ids, out_sh = [], []
        for i, s in zip(ids, sets):
            out_ids.extend([i] * len(s))
            out_sh.extend(s)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()), "shingle": pa.array(out_sh, pa.string())})

    df_tbl = (
        docs_ds.map_batches(postings, batch_format="pyarrow").groupby("shingle").aggregate(Count(alias_name="df"))
    )
    n_vocab = df_tbl.count()
    if n_vocab == 0:
        import ray.data as rd

        return rd.from_arrow(_ALLPAIRS_CAND_SCHEMA.empty_table())
    if n_vocab > max_vocab:
        raise ValueError(
            f"allpairs_jaccard_pairs: {n_vocab} distinct shingles exceeds max_vocab={max_vocab}; "
            "use the distributed-join rank assignment (join postings on shingle) instead of broadcast"
        )
    # vocab-sized (gated), NOT corpus-sized: the one legal driver materialization
    vocab = df_tbl.sort(["df", "shingle"]).to_pandas()
    rank_order = pa.array(vocab["shingle"].to_numpy(), pa.string())
    vocab_ref = ray.put(rank_order)
    V = np.uint64(len(vocab))
    mask = np.uint64(n_bucket_parts - 1)

    def prefix_rows(t: pa.Table) -> pa.Table:
        order = ray.get(vocab_ref)
        ids = np.asarray(t.column("doc_id").to_numpy(zero_copy_only=False), np.int64)
        sets = _word_shingle_sets(t.column("text").to_pylist(), shingle_k)
        sizes = np.array([len(s) for s in sets], np.int64)
        flat = [sh for s in sets for sh in s]
        if not flat:
            return pa.schema(
                [("tok", pa.int64()), ("doc_id", pa.int64()), ("set", pa.list_(pa.int32())), ("sz", pa.int32()), ("bucket_part", pa.int32())]
            ).empty_table()
        ranks_flat = pc.index_in(pa.array(flat, pa.string()), value_set=order).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(sizes)))
        # sort each doc's ranks ascending: one global argsort over (doc, rank)
        doc_of = np.repeat(np.arange(len(ids)), sizes)
        o = np.lexsort((ranks_flat, doc_of))
        ranks_flat = ranks_flat[o]
        # prefix length; ceil errs toward LONGER prefix (extra candidates, never lost ones)
        need = np.ceil(threshold * sizes - 1e-12)
        plen = np.clip(sizes - need.astype(np.int64) + 1, 0, sizes)
        plen[sizes == 0] = 0
        # ragged take of each doc's first plen ranks
        pid_doc = np.repeat(np.arange(len(ids)), plen)
        pos = np.arange(plen.sum()) - np.repeat(np.concatenate(([0], np.cumsum(plen)))[:-1], plen)
        toks = ranks_flat[offs[pid_doc] + pos]
        set_col = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(ranks_flat, pa.int32()))
        return pa.table(
            {
                "tok": pa.array(toks, pa.int64()),
                "doc_id": pa.array(ids[pid_doc], pa.int64()),
                "set": set_col.take(pa.array(pid_doc, pa.int64())),
                "sz": pa.array(sizes[pid_doc], pa.int32()),
                "bucket_part": pa.array((toks.astype(np.uint64) & mask).astype(np.int32), pa.int32()),
            }
        )

    def bucket_pairs(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n < 2:
            return _ALLPAIRS_CAND_SCHEMA.empty_table()
        tok = part.column("tok").to_numpy(zero_copy_only=False)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, tok))
        tok, ids = tok[o], ids[o]
        starts = np.flatnonzero(np.concatenate(([True], tok[1:] != tok[:-1])))
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        ii_l, jj_l = [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            li, lj = np.triu_indices(e - s, 1)
            ii_l.append(li + s)
            jj_l.append(lj + s)
        if not ii_l:
            return _ALLPAIRS_CAND_SCHEMA.empty_table()
        ii, jj = np.concatenate(ii_l), np.concatenate(jj_l)
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        keep = a != b
        ii, jj, a, b = ii[keep], jj[keep], a[keep], b[keep]
        if ii.size == 0:
            return _ALLPAIRS_CAND_SCHEMA.empty_table()
        # local pair dedup (same pair via several shared prefix tokens)
        po = np.lexsort((b, a))
        a, b, ii, jj = a[po], b[po], ii[po], jj[po]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        a, b, ii, jj = a[first], b[first], ii[first], jj[first]
        npairs = a.size
        # ragged gather of both sides' rank sets
        lst = part.column("set").combine_chunks()
        loffs = np.frombuffer(lst.buffers()[1], np.int32)[lst.offset : lst.offset + n + 1].astype(np.int64)
        lvals = np.asarray(lst.values)  # logical child view (handles child offset)
        loffs_s, lens_s = loffs[o], np.diff(loffs)[o]
        szs = part.column("sz").to_numpy(zero_copy_only=False).astype(np.int64)[o]
        if npairs * int(V) >= 2**62:
            raise ValueError("allpairs bucket too large for combined-key intersection; raise n_bucket_parts")

        def ragged(rows):
            ln = lens_s[rows]
            pid = np.repeat(np.arange(rows.size, dtype=np.uint64), ln)
            pos = np.arange(ln.sum()) - np.repeat(np.concatenate(([0], np.cumsum(ln)))[:-1], ln)
            vals = lvals[np.repeat(loffs_s[rows], ln) + pos].astype(np.uint64)
            return pid * V + vals

        keys = np.concatenate([ragged(ii), ragged(jj)])
        keys.sort()
        dup = keys[1:] == keys[:-1]
        c = np.bincount((keys[1:][dup] // V).astype(np.int64), minlength=npairs).astype(np.int64)
        sa, sb = szs[ii], szs[jj]
        jacc6 = np.sign(c) * np.floor(np.abs(c * 1_000_000.0 / (sa + sb - c)) + 0.5)
        jacc6 = jacc6.astype(np.int64)
        keep2 = jacc6 >= t_int
        return pa.table(
            {
                "a_id": pa.array(a[keep2], pa.int64()),
                "b_id": pa.array(b[keep2], pa.int64()),
                "jaccard_6dp": pa.array(jacc6[keep2], pa.int64()),
            }
        )

    cand = (
        docs_ds.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return cand.groupby(["a_id", "b_id"]).aggregate(Max("jaccard_6dp", alias_name="jaccard_6dp"))


def semantic_dedup_keep(
    emb_ds,
    centroids,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_rows: int = 100_000,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-bucketed
    embedding near-duplicate removal — the SCALE path for semantic dedup.

    Assign every vector to its nearest frozen centroid (argmax dot — a
    stateless vectorized pass), shuffle ONCE by cluster id, then resolve
    exact pairwise cosine inside each cluster: a row is a duplicate iff
    an earlier row (lower id) in the SAME cluster has cosine >= threshold;
    kept rows are returned as (id, cluster).  The all-pairs search is
    bounded to cluster-local blocks — at corpus scale k grows with the
    data so per-cluster row counts stay bounded (the documented
    partitioning assumption), enforced here by ``max_cluster_rows``
    (raise k / re-train the quantizer rather than letting one group go
    quadratic).  Deterministic end-to-end (frozen centroids, exact
    arithmetic), so the whole keep-set is oracle-pinnable."""
    from .similarity import _as_matrix, _l2_normalize

    C = np.asarray(centroids, np.float64)
    _empty = pa.table({id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    emb_col: pa.array([], pa.list_(pa.float32())),
                }
            )
        lab = (_as_matrix(t.column(emb_col)) @ C.T).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "cluster": pa.array(lab, pa.int64()),
                emb_col: t.column(emb_col),
            }
        )

    def per_cluster(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty
        if n > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup: cluster of {n} rows exceeds max_cluster_rows={max_cluster_rows}; "
                "increase k (re-train the coarse quantizer) so clusters stay bounded"
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _l2_normalize(_as_matrix(t.column(emb_col)))
        sims = mat @ mat.T
        dup = ((sims >= threshold) & (ids[None, :] < ids[:, None])).any(axis=1)
        keep = ~dup
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "cluster": pa.array(
                    t.column("cluster").to_numpy(zero_copy_only=False)[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        emb_ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pyarrow")
    )
