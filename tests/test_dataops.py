"""Training-data operator tests: dedup (planted duplicates), similarity
(recall vs brute force), text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    """120 docs: 100 unique + 10 exact dups + 10 near-dups (1-word edits)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    # vocabulary large enough that word SETS are distinctive (simhash
    # operates on token sets; a 10-word vocab collides by construction)
    words = [f"w{i:03d}" for i in range(200)]
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(100)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for j in range(10):  # exact dups of docs 0..9
        rows.append({"doc_id": 100 + j, "text": texts[j]})
    for j in range(10):  # near dups of docs 10..19: one word changed
        w = texts[10 + j].split()
        w[5] = "OMEGA"
        rows.append({"doc_id": 110 + j, "text": " ".join(w)})
    return rd.from_items(rows), texts


class TestExactDedup:
    def test_planted_exact_dups(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import exact_dedup

        ds, texts = planted_docs
        out = exact_dedup(ds).to_pandas()
        assert len(out) == 110  # 120 docs, 10 exact dup pairs collapse
        dups = out[out["n_dups"] > 1]
        assert len(dups) == 10
        assert set(dups["keep_id"]) == set(range(10))  # first wins


class TestMinHash:
    def test_signature_properties(self):
        from goto_eater_crawler_ray.functions.dedup import MinHasher

        mh = MinHasher(n_perm=64)
        s1 = mh.signature("the quick brown fox jumps over the lazy dog")
        s2 = mh.signature("the quick brown fox jumps over the lazy dog")
        assert (s1 == s2).all()  # deterministic
        s3 = mh.signature("a completely different sentence about nothing at all")
        assert (s1 == s3).mean() < 0.2

    def test_near_dup_estimate_tracks_jaccard(self):
        from goto_eater_crawler_ray.functions.dedup import MinHasher, _shingle_hashes

        mh = MinHasher(n_perm=128)
        a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
        b = a.replace("w10", "XX")
        est = (mh.signature(a) == mh.signature(b)).mean()
        sa, sb = set(_shingle_hashes(a)), set(_shingle_hashes(b))
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(est - true_j) < 0.15

    def test_lsh_finds_planted_pairs(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import minhash_lsh_pairs

        ds, _ = planted_docs
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4).to_pandas()
        found = set(zip(pairs["doc_a"], pairs["doc_b"]))
        # all 10 exact-dup pairs MUST be found (identical signatures)
        for j in range(10):
            assert (j, 100 + j) in found, f"exact dup pair ({j},{100+j}) missed"
        # most near-dup pairs should be found (high jaccard)
        near_found = sum((10 + j, 110 + j) in found for j in range(10))
        assert near_found >= 7, f"only {near_found}/10 near-dup pairs found"


class TestSimHash:
    def test_exact_dups_collide(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import simhash_dup_groups

        ds, _ = planted_docs
        groups = simhash_dup_groups(ds).to_pandas()
        # the 10 exact dup pairs collide; near dups may or may not
        assert len(groups) >= 10
        assert (groups["n_docs"] >= 2).all()

    def test_near_pairs_pigeonhole(self, ray_session):
        """Planted bit-flip neighbors: pairs within the hamming radius are
        ALL found (pigeonhole banding is exact, not probabilistic, for
        hamming <= n_pieces - 1), and the reported distance is exact."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import SimHasher, simhash_near_pairs

        rng = np.random.default_rng(5)
        words = [f"w{i:03d}" for i in range(300)]
        texts = [" ".join(rng.choice(words, size=25)) for _ in range(60)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        for j in range(10):  # exact dups: hamming 0
            rows.append({"doc_id": 100 + j, "text": texts[j]})
        ds = rd.from_items(rows)
        pairs = simhash_near_pairs(ds, max_hamming=3).to_pandas()
        found = dict(zip(zip(pairs["doc_a"], pairs["doc_b"]), pairs["hamming"]))
        for j in range(10):
            assert found.get((j, 100 + j)) == 0, f"exact dup ({j},{100+j}) missed"
        # verify every reported distance against a direct computation
        hasher = SimHasher()
        sh = {r["doc_id"]: hasher.simhash(r["text"]) for r in rows}
        for (a, b), h in found.items():
            assert bin(sh[a] ^ sh[b]).count("1") == h

    def test_near_pairs_radius_guard(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import simhash_near_pairs

        ds = rd.from_items([{"doc_id": 1, "text": "a"}])
        with pytest.raises(ValueError, match="pigeonhole"):
            simhash_near_pairs(ds, max_hamming=4, n_pieces=4)

    def test_hamming_near_pairs_exact_vs_brute_force(self, ray_session):
        """hamming_near_pairs over raw (doc_id, fingerprint) input: exactly
        the brute-force pair set, with exact distances — the property the
        fingerprint_hamming_pairs SQL oracle pins at driver time."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import hamming_near_pairs

        rng = np.random.default_rng(11)
        fps = rng.integers(0, 2**63, size=120, dtype=np.uint64)
        for j in range(8):  # planted near-dups: flip <= 3 bits
            fps[60 + j] = fps[j] ^ np.uint64(sum(1 << b for b in rng.choice(64, size=j % 4, replace=False)))
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(120), pa.int64()), "simhash": pa.array(fps, pa.uint64())}))
        got = hamming_near_pairs(ds, max_hamming=20, n_pieces=32).to_pandas()
        got_set = {(a, b): h for a, b, h in zip(got["doc_a"], got["doc_b"], got["hamming"])}
        want = {}
        for i in range(120):
            x = fps[i] ^ fps[i + 1 :]
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            for off in np.flatnonzero(ham <= 20):
                want[(i, i + 1 + int(off))] = int(ham[off])
        assert got_set == want


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        base = rng.standard_normal((50, 16)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(50)]
        # vec 50..54 = near-copies of 0..4
        for j in range(5):
            v = base[j] + rng.standard_normal(16).astype(np.float32) * 0.01
            rows.append({"vec_id": 50 + j, "embedding": v.tolist()})
        return rd.from_items(rows)

    def test_brute_force_finds_planted_neighbors(self, emb_ds):
        from goto_eater_crawler_ray.functions.similarity import brute_force_topk

        out = brute_force_topk(emb_ds, query_ids=[0, 1, 2, 3, 4], k=3).to_pandas()
        for j in range(5):
            top1 = out[(out["query_id"] == j) & (out["rank"] == 1)]
            assert top1["neighbor_id"].iloc[0] == 50 + j
            assert top1["score"].iloc[0] > 0.99

    def test_lsh_cosine_pairs_unbounded_default(self, emb_ds):
        """id_limit=None routes through multi-table sign-LSH bucketing:
        no corpus broadcast; in-bucket cos is exact so there are no false
        positives, and planted near-copies (cos≈0.9999) are recalled."""
        from goto_eater_crawler_ray.functions.similarity import cosine_near_dup_pairs

        exact = cosine_near_dup_pairs(emb_ds, threshold=0.95, id_limit=100).to_pandas()
        approx = cosine_near_dup_pairs(emb_ds, threshold=0.95).to_pandas()
        exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
        approx_pairs = set(zip(approx["vec_a"], approx["vec_b"]))
        assert approx_pairs <= exact_pairs  # verification is exact cosine
        planted = {(j, 50 + j) for j in range(5)}
        assert len(planted & approx_pairs) >= 4, approx_pairs

    def test_ivf_recall_vs_brute_force(self, emb_ds):
        from goto_eater_crawler_ray.functions.similarity import brute_force_topk, ivf_ann_topk

        bf = brute_force_topk(emb_ds, query_ids=[0, 1, 2, 3, 4], k=1).to_pandas()
        ivf = ivf_ann_topk(emb_ds, query_ids=[0, 1, 2, 3, 4], k=1, n_centroids=8, n_probe=3).to_pandas()
        bf_top = dict(zip(bf["query_id"], bf["neighbor_id"]))
        ivf_top = dict(zip(ivf["query_id"], ivf["neighbor_id"]))
        # a near-copy (cos≈0.9999) shares its query's nearest centroid, so
        # the trained quantizer recalls planted top-1s reliably
        recall = sum(ivf_top.get(q) == n for q, n in bf_top.items()) / len(bf_top)
        assert recall >= 0.8, f"IVF top-1 recall {recall}"

    def test_ivf_centroids_shape(self, emb_ds):
        from goto_eater_crawler_ray.functions.similarity import ivf_train_centroids

        cent = ivf_train_centroids(emb_ds, n_centroids=8)
        assert cent.shape == (8, 16)
        assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)

    def test_lsh_recall_vs_brute_force(self, emb_ds):
        from goto_eater_crawler_ray.functions.similarity import brute_force_topk, lsh_ann_topk

        bf = brute_force_topk(emb_ds, query_ids=[0, 1, 2, 3, 4], k=1).to_pandas()
        ann = lsh_ann_topk(emb_ds, query_ids=[0, 1, 2, 3, 4], dim=16, k=1, n_planes=4).to_pandas()
        bf_top = dict(zip(bf["query_id"], bf["neighbor_id"]))
        ann_top = dict(zip(ann["query_id"], ann["neighbor_id"]))
        recall = sum(ann_top.get(q) == n for q, n in bf_top.items()) / len(bf_top)
        # near-copies land in the same sign-LSH bucket with high probability
        assert recall >= 0.6, f"LSH top-1 recall {recall}"

    def test_cosine_near_dup_pairs(self, emb_ds):
        from goto_eater_crawler_ray.functions.similarity import cosine_near_dup_pairs

        pairs = cosine_near_dup_pairs(emb_ds, threshold=0.95).to_pandas()
        found = set(zip(pairs["vec_a"], pairs["vec_b"]))
        for j in range(5):
            assert (j, 50 + j) in found


class TestText:
    def test_token_counts(self, ray_session):
        from goto_eater_crawler_ray.functions.text import token_count_batch

        t = pa.table({"doc_id": [1], "text": ["hello world 42!"]})
        out = token_count_batch(t).to_pylist()[0]
        assert out["ws_tokens"] == 3
        assert out["re_tokens"] == 4  # hello, world, 42, !

    def test_quality_ratios(self):
        from goto_eater_crawler_ray.functions.text import quality_score_batch

        t = pa.table({"doc_id": [1], "text": ["the cat, the hat"]})
        out = quality_score_batch(t).to_pylist()[0]
        assert out["n_tokens"] == 4
        assert out["stop_ratio"] == 0.5  # 2 'the' / 4 tokens
        assert out["punct_ratio"] > 0

    def test_langid_deterministic(self, ray_session):
        from goto_eater_crawler_ray.functions.text import LangId

        t = pa.table({"doc_id": [1, 2], "text": ["some text here", "another document text"]})
        a = LangId()(t).to_pylist()
        b = LangId()(t).to_pylist()
        assert a == b

    def test_langid_real_signals(self):
        from goto_eater_crawler_ray.functions.text import LangId

        t = pa.table(
            {
                "doc_id": list(range(8)),
                "text": [
                    "the quick brown fox is on the hill and it was there",
                    "der Hund ist auf der Straße und er war bei dem Haus",
                    "le chat est sur la table et il était avec son ami dans une maison",
                    "el perro es de la casa y él era como su amigo en una calle",
                    "これは日本語のテキストです",  # kana -> ja
                    "中文文本没有假名",  # CJK without kana -> zh
                    "한국어 텍스트입니다",  # hangul -> ko
                    "",  # empty -> falls through to latin vote, no crash
                ],
            }
        )
        out = LangId()(t).to_pylist()
        preds = [r["lang_pred"] for r in out]
        assert preds[:7] == ["en", "de", "fr", "es", "ja", "zh", "ko"]

    def test_langid_empty_tail_segment(self):
        # reduceat bounds==len(cps) guard: last doc empty
        from goto_eater_crawler_ray.functions.text import LangId

        t = pa.table({"doc_id": [1, 2], "text": ["日本語かな", ""]})
        preds = [r["lang_pred"] for r in LangId()(t).to_pylist()]
        assert preds[0] == "ja"


class TestMultimodal:
    def test_strict_decode_raises(self):
        from goto_eater_crawler_ray.functions.multimodal import DecodeImage

        t = pa.table({"doc_id": [1], "media_bytes": [b"xxx"]})
        with pytest.raises(NotImplementedError):
            DecodeImage(strict=True)(t)

    def test_non_image_bytes_route_to_fake_even_with_codec(self):
        # magic-byte sniff: text bytes must NEVER reach the Pillow path —
        # with a codec installed they'd raise UnidentifiedImageError
        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, _looks_like_image

        assert not _looks_like_image(b"some document text cast to bytes")
        assert _looks_like_image(b"\x89PNG\r\n\x1a\nrest")
        assert _looks_like_image(b"\xff\xd8\xff\xe0jpeg")
        dec = DecodeImage()
        out = dec(pa.table({"doc_id": [1], "media_bytes": [b"some document text cast to bytes"]}))
        assert out.column("mode")[0].as_py() == "RGB"  # deterministic fake, codec or not

    def test_fake_decode_deterministic(self):
        from goto_eater_crawler_ray.functions.multimodal import DecodeImage, ExtractFeatures, FrameSampler

        t = pa.table({"doc_id": [1, 2], "media_bytes": [b"abc", b"defgh" * 200]})
        d1, d2 = DecodeImage()(t).to_pylist(), DecodeImage()(t).to_pylist()
        assert d1 == d2
        f = ExtractFeatures(dim=8)(t).to_pylist()
        assert len(f[0]["features"]) == 8
        frames = FrameSampler(frame_bytes=100, every_n=2)(t).to_pylist()
        assert len(frames) > 1
        assert frames[0]["doc_id"] == 1


class TestQueriesSmoke:
    """Spot-check a few queries() end-to-end at sf0.001 (full oracle parity
    is driven by tools/check_parity.py at sf0.01)."""

    def test_entry_contract(self, ray_session):
        import __ray_entry__ as e

        res = e.entry()
        assert res.count() > 0
        assert set(e.oracle_sql()) <= set(e.queries())

    def test_exact_dedup_query(self, ray_session, sf_dir):
        from goto_eater_crawler_ray.pipelines.queries import q_exact_dedup

        out = q_exact_dedup(sf_dir).to_pandas()
        assert len(out) > 0
        assert {"content_hash", "keep_id", "n_dups"} == set(out.columns)


class TestConnectedComponents:
    def test_chain_and_star(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import connected_components

        # components: chain {1,2,3,4}, star {10,11,12}, pair {20,21}
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)]
        ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])
        out = connected_components(ds)
        groups = dict(zip(out["doc_id"], out["group_id"]))
        assert groups[1] == groups[2] == groups[3] == groups[4] == 1
        assert groups[10] == groups[11] == groups[12] == 10
        assert groups[20] == groups[21] == 20

    def test_lsh_pipeline_to_groups(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import connected_components, minhash_lsh_pairs

        ds, _ = planted_docs
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4)
        out = connected_components(pairs)
        groups = dict(zip(out["doc_id"], out["group_id"]))
        for j in range(10):  # exact dups grouped with their originals
            assert groups.get(100 + j) == groups.get(j)

    def test_distributed_matches_driver(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import (
            connected_components,
            connected_components_distributed,
        )

        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)]
        ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])
        drv = connected_components(ds).reset_index(drop=True)
        dist = (
            connected_components_distributed(ds, num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert drv.equals(dist.astype(drv.dtypes.to_dict()))

    def test_distributed_long_chain_pointer_jumping(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import connected_components_distributed

        # chain of 16 nodes: plain propagation needs ~16 rounds; pointer
        # jumping converges in O(log d) — max_rounds=5 proves the jump works
        # (each round is several dataset executions, so keep the chain short)
        ds = rd.from_items([{"doc_a": i, "doc_b": i + 1} for i in range(15)])
        out = connected_components_distributed(ds, max_rounds=5, num_partitions=2).to_pandas()
        assert (out["group_id"] == 0).all()
        assert len(out) == 16

    def test_driver_guard_hard_errors(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import connected_components

        ds = rd.from_items([{"doc_a": i, "doc_b": i + 100} for i in range(8)])
        with pytest.raises(ValueError, match="max_driver_edges"):
            connected_components(ds, max_driver_edges=3)

    def test_lsh_10x_corpus_fully_distributed(self, ray_session):
        """10x planted corpus through the end-to-end distributed path
        (minhash -> bucket-local verify -> aggregate dedup -> distributed
        CC): no stage materializes anything corpus-sized on the driver."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import (
            connected_components_distributed,
            minhash_lsh_pairs,
        )

        rng = np.random.default_rng(13)
        words = [f"w{i:03d}" for i in range(400)]
        texts = [" ".join(rng.choice(words, size=30)) for _ in range(1000)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        for j in range(100):  # exact dups of docs 0..99
            rows.append({"doc_id": 1000 + j, "text": texts[j]})
        ds = rd.from_items(rows)
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4)
        out = connected_components_distributed(pairs, num_partitions=8).to_pandas()
        groups = dict(zip(out["doc_id"], out["group_id"]))
        for j in range(100):
            assert groups.get(1000 + j) == groups.get(j, -1) == j


class TestRollingWindow:
    def test_rolling_mean_segments_and_ties(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import rolling_mean_per_key

        rows = [
            # user 1: values 1,2,4 -> windows: 1 | 1.5 | 7/3
            {"user_id": 1, "ts": 1, "event_id": 10, "value": 1.0},
            {"user_id": 1, "ts": 2, "event_id": 11, "value": 2.0},
            {"user_id": 1, "ts": 3, "event_id": 12, "value": 4.0},
            # user 2: single row, window resets at the segment boundary
            {"user_id": 2, "ts": 1, "event_id": 20, "value": 9.0},
            # user 3: mean hits exactly x.5 at scale -> half-AWAY (DuckDB), not half-even
            {"user_id": 3, "ts": 1, "event_id": 30, "value": 0.01},
            {"user_id": 3, "ts": 2, "event_id": 31, "value": 0.02},
        ]
        ds = rd.from_items(rows)
        out = rolling_mean_per_key(ds, "user_id", ["ts", "event_id"], "value", window=3, n_key_parts=4).to_pandas()
        got = dict(zip(out["event_id"], out["mov_avg_c"]))
        assert got[10] == 100 and got[11] == 150 and got[12] == round(7 / 3 * 100)
        assert got[20] == 900  # segment reset: window never crosses users
        assert got[31] == 2  # (0.01+0.02)/2*100 = 1.5 -> 2 (half-away), not 1

    def test_top_n_per_key_prune_and_ties(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import top_n_per_key

        rows = [
            # key 1: four rows, tie at value 9.0 broken by id asc
            {"k": 1, "v": 9.0, "id": 104},
            {"k": 1, "v": 9.0, "id": 101},
            {"k": 1, "v": 5.0, "id": 102},
            {"k": 1, "v": 7.0, "id": 103},
            # key 2: fewer rows than n
            {"k": 2, "v": 1.0, "id": 200},
        ]
        # two single-row-ish blocks so the local prune runs per batch and
        # the global merge must still find the true top-2
        ds = rd.from_items(rows).repartition(3)
        out = top_n_per_key(ds, "k", "v", n=2, tiebreak_col="id", n_key_parts=4).to_pandas()
        got = {(r.k, r.rn): r.id for r in out.itertuples()}
        assert got[(1, 1)] == 101 and got[(1, 2)] == 104  # tie -> id asc
        assert got[(2, 1)] == 200
        assert len(out) == 3


class TestHistogramQuantiles:
    def test_accuracy_vs_numpy(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.quantiles import bin_to_value, histogram_quantiles

        rng = np.random.default_rng(7)
        vals = rng.lognormal(mean=2.0, sigma=0.7, size=20_000)
        ds = rd.from_items([{"value": float(v)} for v in vals]).repartition(8)
        out = histogram_quantiles(ds, "value", pcts=[50, 90, 99], n_bins=1024)
        lo, hi = vals.min(), vals.max()
        width = (hi - lo) / 1024
        for row in out.itertuples():
            est = bin_to_value(row.bin, lo, hi, 1024)
            true = np.percentile(vals, row.pct)
            assert abs(est - true) <= width, (row.pct, est, true)
        assert out["lo_c"].iloc[0] == round(lo * 100)

    def test_constant_column(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.quantiles import histogram_quantiles

        ds = rd.from_items([{"value": 5.0}] * 100)
        out = histogram_quantiles(ds, "value", pcts=[50, 99])
        # zero-width range: everything lands in bin 0
        assert (out["bin"] == 0).all()
        assert (out["lo_c"] == 500).all() and (out["hi_c"] == 500).all()


class TestHLL:
    def test_accuracy(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import approx_distinct

        n = 20_000
        ds = rd.from_items([{"v": i % 5000} for i in range(n)])
        est = approx_distinct(ds, "v")
        assert abs(est - 5000) / 5000 < 0.05, est

    def test_merge_equals_union(self):
        from goto_eater_crawler_ray.functions.text import HLL, _hll_hashes

        a, b, u = HLL(), HLL(), HLL()
        a.add_hashes(_hll_hashes(range(0, 3000)))
        b.add_hashes(_hll_hashes(range(1500, 4500)))
        u.add_hashes(_hll_hashes(range(0, 4500)))
        a.merge(b)
        assert a.estimate() == pytest.approx(u.estimate(), rel=1e-9)

    def test_roundtrip(self):
        from goto_eater_crawler_ray.functions.text import HLL

        h = HLL()
        import numpy as np

        h.add_hashes(np.arange(1000, dtype=np.uint64) * 2654435761)
        h2 = HLL.from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()


class TestExactVerify:
    def test_minhash_verify_exact(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import minhash_lsh_pairs

        ds, _ = planted_docs
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4, verify_exact=True).to_pandas()
        assert "true_jaccard" in pairs.columns
        found = set(zip(pairs["doc_a"], pairs["doc_b"]))
        for j in range(10):  # exact dups have true_jaccard 1.0
            assert (j, 100 + j) in found
        exact_rows = pairs[(pairs["doc_a"] < 10) & (pairs["doc_b"] >= 100)]
        assert (exact_rows["true_jaccard"] == 1.0).all()


class TestSampling:
    """Deterministic sampling/split operators (functions/sampling.py):
    membership must be a pure function of the key — stable across runs,
    widths, and partitionings (the property SQL_DOC_SAMPLE hash-checks
    against DuckDB's md5_number_upper at driver time)."""

    def _docs(self, n=300):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n), pa.int64()),
                    "lang": pa.array(["en" if i % 3 else "zh" for i in range(n)], pa.string()),
                }
            )
        )

    def test_hash_sample_deterministic_and_repartition_stable(self, ray_session):
        from goto_eater_crawler_ray.functions.sampling import hash_sample, md5_buckets

        ds = self._docs()
        got1 = sorted(hash_sample(ds, "doc_id", pct=20).to_pandas()["doc_id"])
        got2 = sorted(hash_sample(ds.repartition(7), "doc_id", pct=20).to_pandas()["doc_id"])
        assert got1 == got2  # membership independent of partitioning
        # membership == the advertised bucket function, exactly
        b = md5_buckets(list(range(300)))
        assert got1 == sorted(np.flatnonzero(b < 20))
        # md5 bucket matches DuckDB's md5_number_upper % 100 (oracle contract)
        import duckdb

        db = [r[0] for r in duckdb.sql(
            "SELECT md5_number_upper(CAST(UNNEST(range(300)) AS VARCHAR)) % 100"
        ).fetchall()]
        assert db == list(b)

    def test_hash_split_disjoint_exhaustive(self, ray_session):
        from goto_eater_crawler_ray.functions.sampling import hash_split

        df = hash_split(self._docs(), "doc_id", [("train", 80), ("val", 10), ("test", 10)]).to_pandas()
        assert len(df) == 300  # exhaustive, one label each
        counts = df["split"].value_counts()
        assert set(counts.index) == {"train", "val", "test"}
        assert counts["train"] > counts["val"]  # ~80/10/10
        with pytest.raises(ValueError, match="sum to mod"):
            hash_split(self._docs(), "doc_id", [("a", 50), ("b", 40)])

    def test_stratified_rates(self, ray_session):
        from goto_eater_crawler_ray.functions.sampling import stratified_sample

        df = stratified_sample(self._docs(), "doc_id", "lang", rates={"zh": 100}, default_pct=0).to_pandas()
        assert set(df["lang"]) == {"zh"}  # en default 0, zh keeps all
        assert len(df) == 100

    def test_temperature_thresholds_math(self):
        from goto_eater_crawler_ray.functions.sampling import temperature_thresholds

        # tau=0.5 quota: target * sqrt(n_g) / sum(sqrt); skew 900 vs 100
        thr = temperature_thresholds({"en": 900, "zh": 100}, target=200)
        # quotas 150 / 50 -> rates 1/6 and 1/2: the low-resource group
        # keeps a ~3x higher RATE (the rebalancing property)
        assert thr["en"] == (1_000_000 * 200 * 30_000_000) // (40_000_000 * 900)  # 166_666
        assert thr["zh"] == 500_000
        # rate caps at 1 (no replication) when quota exceeds group size
        assert temperature_thresholds({"en": 3, "zh": 1000}, target=500)["en"] == 1_000_000
        assert temperature_thresholds({}, target=10) == {}

    def test_temperature_thresholds_properties(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from goto_eater_crawler_ray.functions.sampling import temperature_thresholds

        @settings(max_examples=50, deadline=None)
        @given(
            st.dictionaries(st.sampled_from("abcdefgh"), st.integers(0, 10**6), max_size=8),
            st.integers(1, 10**5),
        )
        def check(counts, target):
            thr = temperature_thresholds(counts, target)
            live = {g: n for g, n in counts.items() if n > 0}
            assert set(thr) == set(live)
            mod = 1_000_000
            for g, t in thr.items():
                assert 0 <= t <= mod
            # expected sample size sum(n_g * thr_g / mod) never exceeds the
            # target (floor thresholds under-shoot; the rate-1 cap only
            # REDUCES a group's expected take below its quota)
            assert sum(live[g] * thr[g] / mod for g in live) <= target + 1e-6
            # rebalancing direction: smaller groups never get a lower rate
            for g in live:
                for h in live:
                    if live[g] < live[h]:
                        assert thr[g] >= thr[h]

        check()

    def test_temperature_sample_membership_deterministic(self, ray_session):
        from goto_eater_crawler_ray.functions.sampling import temperature_sample

        a = temperature_sample(self._docs(), "doc_id", "lang", target=100).to_pandas()
        b = temperature_sample(self._docs(n=300).repartition(7), "doc_id", "lang", target=100).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # width/partition independent
        # skewed corpus (200 en / 100 zh): zh keep-rate must exceed en's
        rates = a.groupby("lang").size() / pd.Series({"en": 200, "zh": 100})
        assert rates["zh"] > rates["en"]


class TestTfIdf:
    def test_matches_local_exact(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import tfidf_terms

        texts = ["a b b c", "b c c d", "a a a", "  ", "d"]
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        got = tfidf_terms(ds).to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
        # local exact
        from collections import Counter

        tf = {(i, w): c for i, t in enumerate(texts) for w, c in Counter(t.split()).items()}
        df = Counter(w for (_, w) in tf)
        assert len(got) == len(tf)
        for _, r in got.iterrows():
            assert tf[(r["doc_id"], r["term"])] == r["tf"]
            assert df[r["term"]] == r["df"]


class TestKMeans:
    def test_assignment_is_nearest_centroid_and_deterministic(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.similarity import (
            _as_matrix,
            _l2_normalize,
            ivf_train_centroids,
            kmeans_clusters,
        )

        rng = np.random.default_rng(7)
        # three well-separated blobs
        centers = np.eye(3)
        X = np.concatenate([c + 0.05 * rng.standard_normal((40, 3)) for c in centers])
        t = pa.table({"vec_id": pa.array(np.arange(120), pa.int64()), "embedding": pa.array(X.tolist())})
        ds = rd.from_arrow(t)
        out1 = kmeans_clusters(ds, n_clusters=3).to_pandas().sort_values("vec_id")
        out2 = kmeans_clusters(ds, n_clusters=3).to_pandas().sort_values("vec_id")
        assert (out1["cluster"].to_numpy() == out2["cluster"].to_numpy()).all()  # deterministic
        # blob coherence: each blob lands in ONE cluster, blobs in distinct clusters
        labs = out1["cluster"].to_numpy()
        blobs = [set(labs[i * 40 : (i + 1) * 40]) for i in range(3)]
        assert all(len(b) == 1 for b in blobs)
        assert len(set().union(*blobs)) == 3
        # assignment == argmax cosine against the trained centroids
        cent = ivf_train_centroids(ds, n_centroids=3)
        want = (_l2_normalize(X) @ cent.T).argmax(axis=1)
        assert (labs == want).all()


class TestRepetitionStats:
    def test_known_values(self, ray_session):
        from goto_eater_crawler_ray.functions.text import repetition_stats_batch

        t = pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "a b a b a",          # 5 words, 2 unique, top_tf a=3, top bigram "a b"=2
                    "  x  ",              # 1 word after trim/split
                    "p q r p q r p q",    # 8 words, 3 unique, top_tf p=3, bigram "p q"=3
                ],
            }
        )
        out = repetition_stats_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[0].tolist() == [5, 2, 3, 2]
        assert out.loc[1].tolist() == [1, 1, 1, 0]  # no bigram in a 1-word doc
        assert out.loc[2].tolist() == [8, 3, 3, 3]

    def test_batch_isolation(self, ray_session):
        # bigrams must not cross document boundaries within a batch
        from goto_eater_crawler_ray.functions.text import repetition_stats_batch

        t = pa.table({"doc_id": [0, 1], "text": ["m n", "n m n m"]})
        out = repetition_stats_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[0, "top_bigram_tf"] == 1   # "m n" once
        assert out.loc[1, "top_bigram_tf"] == 2   # "n m" twice ("m n" once)


class TestBM25:
    def test_matches_local_reference(self, ray_session):
        import math

        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import bm25_topk

        rng = np.random.default_rng(11)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        texts = [" ".join(rng.choice(words, size=int(rng.integers(5, 40)))) for _ in range(80)]
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        terms = ["alpha", "zeta"]
        got = bm25_topk(ds, terms, k=5).to_pandas()

        # naive single-machine BM25 with the same constants
        toks = [t.split() for t in texts]
        N = len(toks)
        avgdl = sum(len(w) for w in toks) / N
        df = {q: sum(1 for w in toks if q in w) for q in terms}
        idf = {q: math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1.0) for q in terms}
        scores = []
        for i, w in enumerate(toks):
            s = 0.0
            for q in terms:
                tf = w.count(q)
                s += (idf[q] * tf) * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (len(w) / avgdl)))
            scores.append((i, round(s * 1_000_000)))
        want = sorted([x for x in scores if x[1] > 0], key=lambda x: (-x[1], x[0]))[:5]
        assert list(zip(got["doc_id"], got["score"])) == want

    def test_absent_term_scores_zero(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import bm25_topk

        ds = rd.from_items([{"doc_id": i, "text": "just plain filler text"} for i in range(10)])
        assert bm25_topk(ds, ["nonexistent"], k=5).count() == 0


class TestNearDedupFilter:
    def test_planted_dups_removed(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_near_dedup_filter

        rng = np.random.default_rng(3)
        words = [f"w{i:03d}" for i in range(200)]
        texts = [" ".join(rng.choice(words, size=30)) for _ in range(50)]
        rows = {"doc_id": list(range(50)) + [100, 101], "text": texts + [texts[0], texts[1]],
                "lang": ["en"] * 52, "source": ["t"] * 52, "n_chars": [len(t) for t in texts] + [len(texts[0]), len(texts[1])]}
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
        out = q_near_dedup_filter(str(tmp_path)).to_pandas()
        # the exact copies (ids 100, 101) lose to their lower-id originals
        assert 100 not in set(out["doc_id"]) and 101 not in set(out["doc_id"])
        assert {0, 1}.issubset(set(out["doc_id"]))
        assert len(out) == 50


class TestLagDelta:
    def test_deltas_and_segment_boundaries(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import lag_delta_per_key

        rows = [
            {"k": 1, "o": 10, "v": 100},
            {"k": 1, "o": 20, "v": 150},
            {"k": 1, "o": 30, "v": 130},
            {"k": 2, "o": 5, "v": 7},
            {"k": 2, "o": 6, "v": 9},
        ]
        out = (
            lag_delta_per_key(rd.from_items(rows), key_col="k", order_cols=["o"], value_col="v", out_col="d")
            .to_pandas()
            .sort_values(["k", "o"])
        )
        assert out["d"].tolist() == [-1, 50, -20, -1, 2]  # first row per key -> -1


class TestPrefixSum:
    def test_matches_numpy_cumsum_shuffled_input(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.scan import prefix_sum

        rng = np.random.default_rng(5)
        n = 3000
        vals = rng.integers(1, 50, size=n)
        perm = rng.permutation(n)  # arrive in arbitrary order
        ds = rd.from_items([{"k": int(k), "v": int(vals[k])} for k in perm]).repartition(7)
        out = prefix_sum(ds, "k", "v", out_col="off", n_parts=16).to_pandas().sort_values("k")
        want = np.concatenate(([0], np.cumsum(vals)[:-1]))
        assert (out["off"].to_numpy() == want).all()

    def test_sparse_keys(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.scan import prefix_sum

        rows = [{"k": k, "v": 10} for k in [0, 5, 1000, 100000]]
        out = prefix_sum(rd.from_items(rows), "k", "v", n_parts=8).to_pandas().sort_values("k")
        assert out["offset"].tolist() == [0, 10, 20, 30]

    def test_pack_sequences_boundaries(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.scan import pack_sequences

        rows = [{"k": i, "t": 100} for i in range(10)]  # 100 tokens each, seq_len 256
        out = pack_sequences(rd.from_items(rows), "k", "t", seq_len=256).to_pandas().sort_values("k")
        # offsets 0,100,...,900 -> seq 0,0,0,1,1,1,2,2,3,3
        assert out["seq_id"].tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 3, 3]


class TestLangIdOracleTwin:
    def test_sql_twin_matches_all_script_branches(self, ray_session, tmp_path):
        """The driver corpus is all-latin; prove the DuckDB twin equals
        LangId on every branch (kana/cjk/hangul/cyrillic/arabic + all
        four latin votes + tie cases)."""
        import duckdb
        import pyarrow.parquet as pq

        import ray.data as rd

        from goto_eater_crawler_ray.pipelines.queries import SQL_LANGID
        from goto_eater_crawler_ray.functions.text import LangId

        texts = [
            "これはテストです",          # kana -> ja
            "汉字文本",                  # cjk only -> zh
            "한국어 텍스트",             # hangul -> ko
            "русский текст",             # cyrillic -> ru
            "نص عربي",                   # arabic -> ar
            "the cat was on the mat and it is his",   # en
            "der hund ist bei der tür und er war für sie",  # de
            "le chat est sur la table avec son ami dans une",  # fr
            "él era para los perros y es su casa en las del",  # es
            "zzz qqq xxx",               # no stopwords anywhere -> tie -> en
            "die la",                    # de/fr/es tie at 1 vs en 0 -> de (earlier)
            "漢字とかな混在 kana カタカナ",  # kana beats cjk
        ]
        tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        pq.write_table(tbl, tmp_path / "documents.parquet")

        got = (
            rd.read_parquet(str(tmp_path / "documents.parquet"))
            .map_batches(LangId, batch_format="pyarrow", concurrency=1)
            .to_pandas()
            .sort_values("doc_id")
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
        exp = con.sql(SQL_LANGID).df().sort_values("doc_id")
        assert got["lang_pred"].tolist() == exp["lang_pred"].tolist()
        assert got["lang_pred"].tolist()[:9] == ["ja", "zh", "ko", "ru", "ar", "en", "de", "fr", "es"]


class TestGroupedQuantiles:
    def test_accuracy_vs_numpy_per_group(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.quantiles import bin_to_value, grouped_histogram_quantiles

        rng = np.random.default_rng(9)
        rows = []
        gvals = {"a": rng.normal(10, 2, 4000), "b": rng.exponential(5, 3000)}
        for g, vs in gvals.items():
            rows += [{"g": g, "v": float(v)} for v in vs]
        out = grouped_histogram_quantiles(rd.from_items(rows).repartition(8), "g", "v", pcts=[50, 99], n_bins=256).to_pandas()
        assert len(out) == 4
        for _, r in out.iterrows():
            vs = gvals[r["g"]]
            lo, hi = vs.min(), vs.max()
            est = bin_to_value(r["bin"], lo, hi, n_bins=256)
            want = np.percentile(vs, r["pct"])
            assert abs(est - want) <= (hi - lo) / 256 * 2 + 1e-9, (r["g"], r["pct"])

    def test_constant_group(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.quantiles import grouped_histogram_quantiles

        rows = [{"g": "c", "v": 7.0}] * 50 + [{"g": "d", "v": float(i)} for i in range(100)]
        out = grouped_histogram_quantiles(rd.from_items(rows), "g", "v", pcts=[50], n_bins=64).to_pandas()
        const = out[out["g"] == "c"].iloc[0]
        assert const["bin"] == 0 and const["lo_c"] == 700 and const["hi_c"] == 700


class TestTopNgrams:
    def test_matches_local_count(self, ray_session):
        import collections

        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import top_ngrams

        rng = np.random.default_rng(13)
        words = ["a", "b", "c", "d"]
        texts = [" ".join(rng.choice(words, size=20)) for _ in range(60)]
        got = top_ngrams(rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)]).repartition(5), n_top=10).to_pandas()
        cnt = collections.Counter()
        for t in texts:
            w = t.split()
            cnt.update(f"{x} {y}" for x, y in zip(w, w[1:]))
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(got["bigram"], got["c"])) == want


class TestDecontaminate:
    def test_planted_leak(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.functions.sampling import md5_buckets
        from goto_eater_crawler_ray.pipelines.queries import q_decontaminate

        # find ids landing in the train (<80) and test (>=90) hash buckets
        ids = np.arange(0, 400)
        buckets = md5_buckets(ids)
        train_ids = ids[buckets < 80][:6].tolist()
        test_ids = ids[buckets >= 90][:3].tolist()
        assert len(train_ids) == 6 and len(test_ids) == 3

        rng = np.random.default_rng(17)
        vocab = [f"tok{i}" for i in range(500)]  # big vocab: no accidental 4-gram collisions

        def fresh_doc():
            return " ".join(rng.choice(vocab, size=12, replace=False))

        texts = {i: fresh_doc() for i in train_ids + test_ids}
        # plant: test doc 0 embeds a 4-gram from train doc 0; test doc 1
        # embeds TWO distinct train 4-grams; test doc 2 stays clean
        leak_a = " ".join(texts[train_ids[0]].split()[2:6])
        leak_b = " ".join(texts[train_ids[1]].split()[0:4])
        texts[test_ids[0]] = fresh_doc() + " " + leak_a
        texts[test_ids[1]] = leak_a + " " + fresh_doc() + " " + leak_b
        rows = {"doc_id": list(texts), "text": [texts[i] for i in texts]}
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")

        out = q_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
        assert set(out.index) == {test_ids[0], test_ids[1]}
        assert out.loc[test_ids[0], "n_shared"] == 1
        assert out.loc[test_ids[1], "n_shared"] == 2


class TestPageRank:
    @staticmethod
    def _local(edges, n_iter=10, d=0.85):
        nodes = sorted({u for e in edges for u in e})
        idx = {n: i for i, n in enumerate(nodes)}
        N = len(nodes)
        out = np.zeros(N)
        for s, _ in edges:
            out[idx[s]] += 1
        r = np.full(N, 1.0 / N)
        for _ in range(n_iter):
            dang = r[out == 0].sum()
            base = (1 - d) / N + d * dang / N
            s = np.zeros(N)
            for u, v in edges:
                s[idx[v]] += r[idx[u]] / out[idx[u]]
            r = base + d * s
        return {n: r[idx[n]] for n in nodes}

    def test_cycle_is_uniform(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank

        edges = [(i, (i + 1) % 6) for i in range(6)]
        out = pagerank(rd.from_items([{"src": s, "dst": t} for s, t in edges]), n_iter=2).to_pandas()
        assert np.allclose(out["rank"], 1 / 6, atol=1e-12)

    def test_matches_local_power_iteration_with_dangling(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank

        rng = np.random.default_rng(23)
        edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, size=(150, 2)) if a != b})
        # make node 40 a pure sink (dangling) with several in-links
        edges += [(i, 40) for i in range(5)]
        # 3 iterations keep the suite fast while still exercising the full
        # formula (join, contribution sum, dangling redistribution) thrice
        out = pagerank(rd.from_items([{"src": s, "dst": t} for s, t in edges]), n_iter=3).to_pandas()
        want = self._local(edges, n_iter=3)
        got = dict(zip(out["node"], out["rank"]))
        assert set(got) == set(want)
        for n in want:
            assert abs(got[n] - want[n]) < 1e-9, n
        assert abs(sum(got.values()) - 1.0) < 1e-9  # ranks stay a distribution

    def test_distributed_path_matches_local_fast_path(self, ray_session):
        # max_local_edges=0 forces the dataset-native loop; it must agree
        # with the gated numpy path (and the reference power iteration)
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank

        rng = np.random.default_rng(7)
        edges = list({(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2)) if a != b})
        edges += [(i, 30) for i in range(4)]  # dangling sink
        ds = rd.from_items([{"src": s, "dst": t} for s, t in edges])
        dist = pagerank(ds, n_iter=3, max_local_edges=0).to_pandas()
        want = self._local(edges, n_iter=3)
        got = dict(zip(dist["node"], dist["rank"]))
        assert set(got) == set(want)
        for n in want:
            assert abs(got[n] - want[n]) < 1e-9, n


class TestDocChunks:
    def test_overlap_and_boundaries(self, ray_session, tmp_path):
        # 60 words -> windows [0:50] and [25:60]; 10 words -> one short
        # window; empty/whitespace doc -> no chunks
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_chunks

        words60 = " ".join(f"w{i}" for i in range(60))
        words10 = " ".join(f"v{i}" for i in range(10))
        pq.write_table(
            pa.table({"doc_id": [1, 2, 3], "text": [words60, words10, "   "]}),
            tmp_path / "documents.parquet",
        )
        out = q_doc_chunks(str(tmp_path)).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        assert list(out["doc_id"]) == [1, 1, 2]
        assert list(out["n_tokens"]) == [50, 35, 10]
        assert out.loc[0, "chunk_text"].split() == [f"w{i}" for i in range(50)]
        assert out.loc[1, "chunk_text"].split() == [f"w{i}" for i in range(25, 60)]  # overlap [25:50] repeated
        assert out.loc[2, "chunk_text"].split() == [f"v{i}" for i in range(10)]


class TestEmbeddingQuantize:
    def test_codes_span_0_255_and_roundtrip_error_bounded(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_embedding_quantize

        rng = np.random.default_rng(11)
        emb = rng.normal(size=(20, 4)).astype(np.float32)
        emb[:, 3] = 7.0  # constant dim -> code 0 everywhere (span == 0 guard)
        pq.write_table(
            pa.table({"vec_id": pa.array(range(20), pa.int64()), "embedding": pa.array(list(emb), pa.list_(pa.float32()))}),
            tmp_path / "embeddings.parquet",
        )
        out = q_embedding_quantize(str(tmp_path)).to_pandas()
        assert len(out) == 80
        for d in range(3):
            col = out[out["dim"] == d]["q"]
            assert col.min() == 0 and col.max() == 255  # min/max vectors hit the rails
        assert (out[out["dim"] == 3]["q"] == 0).all()
        # dequantized values reconstruct within half a step
        m = emb[:, :3].astype(np.float64)
        mn, mx = m.min(axis=0), m.max(axis=0)
        q = out[out["dim"] < 3].sort_values(["vec_id", "dim"])["q"].to_numpy().reshape(20, 3)
        deq = mn + q * (mx - mn) / 255.0
        assert np.abs(deq - m).max() <= (mx - mn).max() / 255.0 / 2 + 1e-12


class TestEventsHopping:
    def test_each_event_lands_in_three_windows(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_hopping

        ts = pa.array([1_000_000 * s for s in (0, 100, 299, 300, 899)], pa.timestamp("us"))
        pq.write_table(
            pa.table({"ts": ts, "event_type": pa.array(["a", "a", "b", "a", "b"])}),
            tmp_path / "events.parquet",
        )
        out = q_events_hopping(str(tmp_path)).to_pandas()
        assert out["n_events"].sum() == 15  # 5 events x 3 windows each
        # window [0, 900) sees every event whose ts < 900
        w0 = out[(out["window_start"] == 0)].set_index("event_type")["n_events"]
        assert w0["a"] == 3 and w0["b"] == 2


class TestWeightedTopk:
    def test_deterministic_and_weight_biased(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.sampling import weighted_topk

        # ids 0..99 weight 1, ids 100..109 weight 10000 — the heavy ids
        # must dominate the sample, and two runs must agree exactly
        rows = [{"id": i, "w": 1} for i in range(100)] + [{"id": 100 + i, "w": 10_000} for i in range(10)]
        out1 = weighted_topk(rd.from_items(rows), "id", "w", k=20).to_pandas()
        out2 = weighted_topk(rd.from_items(rows), "id", "w", k=20).to_pandas()
        assert out1.equals(out2)
        assert len(out1) == 20
        assert sum(out1["id"] >= 100) == 10  # every heavy id sampled
        # priorities actually sorted descending with id tiebreak
        assert list(out1["priority_9dp"]) == sorted(out1["priority_9dp"], reverse=True)

    def test_zero_weight_never_sampled(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.sampling import weighted_topk

        rows = [{"id": i, "w": (0 if i % 2 else 1)} for i in range(40)]
        out = weighted_topk(rd.from_items(rows), "id", "w", k=40).to_pandas()
        assert (out["id"] % 2 == 0).all() and len(out) == 20


class TestDocRedact:
    def test_counts_and_replacement(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_redact

        pq.write_table(
            pa.table(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "the customer met a supplier and another customer",
                        "customers are not redacted (no word boundary match)",
                        "plain text",
                    ],
                }
            ),
            tmp_path / "documents.parquet",
        )
        out = q_doc_redact(str(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_redacted"] == 3
        assert out.loc[1, "redacted_text"] == "the [REDACTED] met a [REDACTED] and another [REDACTED]"
        assert out.loc[2, "n_redacted"] == 0  # 'customers' != \bcustomer\b
        assert out.loc[3, "redacted_text"] == "plain text"


class TestEventsBucketize:
    def test_uniform_values_split_into_equal_quartiles(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_bucketize

        n = 4000
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(n), pa.int64()),
                    "value": pa.array([float(i % 1000) for i in range(n)], pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        out = q_events_bucketize(str(tmp_path)).to_pandas()
        counts = out["bucket"].value_counts()
        assert set(counts.index) == {0, 1, 2, 3}
        # equi-depth: each quartile within a couple of bins of n/4
        assert all(abs(c - n / 4) <= n / 100 for c in counts)
        # monotone: larger values never land in smaller buckets
        merged = out.assign(value=[float(i % 1000) for i in range(n)]).sort_values("value")
        assert merged["bucket"].is_monotonic_increasing


class TestPercentRank:
    def test_matches_pandas_with_ties_and_single_row_key(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import percent_rank_per_key

        rng = np.random.default_rng(5)
        vals = np.round(rng.uniform(0, 10, 300), 1)  # coarse grid -> many exact ties
        keys = rng.choice(["a", "b", "c"], 300).tolist() + ["solo"]
        vals = np.append(vals, 5.0)
        rows = [{"id": i, "k": keys[i], "v": float(vals[i])} for i in range(301)]
        out = (
            percent_rank_per_key(rd.from_items(rows), "k", "v", "id", n_bins=8, n_parts=4)
            .to_pandas()
            .set_index("id")
        )
        df = pd.DataFrame(rows)
        # pandas min-rank percent: (rank_min - 1) / (n - 1), 0 for n == 1
        def want(g):
            r = g["v"].rank(method="min")
            n = len(g)
            p = (r - 1) / (n - 1) if n > 1 else r * 0.0
            return pd.Series((np.sign(p * 1e6) * np.floor(np.abs(p * 1e6) + 0.5)).astype(np.int64).to_numpy(), index=g["id"])

        expect = pd.concat([want(g) for _, g in df.groupby("k")])
        assert len(out) == 301
        for i, exp in expect.items():
            assert out.loc[i, "pct_rank_6dp"] == exp, i
        assert out.loc[300, "pct_rank_6dp"] == 0  # single-row key -> 0


class TestReviewRegressions:
    def test_near_dedup_filter_clean_corpus_is_noop(self, ray_session, tmp_path):
        # zero near-dup pairs must be a no-op, not an empty-schema join crash
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_near_dedup_filter

        rng = np.random.default_rng(31)
        words = [f"w{i:03d}" for i in range(300)]
        texts = [" ".join(rng.choice(words, size=25, replace=False)) for _ in range(40)]
        rows = {"doc_id": list(range(40)), "text": texts, "lang": ["en"] * 40}
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
        out = q_near_dedup_filter(str(tmp_path)).to_pandas()
        assert len(out) == 40 and set(out["doc_id"]) == set(range(40))

    def test_grouped_quantiles_constant_group_matches_sql_twin(self, ray_session, tmp_path):
        # the width==0 special case must agree between Python and the twin
        import duckdb
        import pyarrow.parquet as pq

        import ray.data as rd

        from goto_eater_crawler_ray.pipelines.queries import SQL_EVENTS_QUANTILES_BY_TYPE
        from goto_eater_crawler_ray.functions.quantiles import grouped_histogram_quantiles

        rows = {"event_type": ["c"] * 30 + ["v"] * 40, "value": [7.0] * 30 + [float(i) for i in range(40)]}
        pq.write_table(pa.table(rows), tmp_path / "events.parquet")
        got = (
            grouped_histogram_quantiles(
                rd.read_parquet(str(tmp_path / "events.parquet")), "event_type", "value", pcts=[50, 90, 99], n_bins=256
            )
            .to_pandas()
            .sort_values(["event_type", "pct"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
        exp = con.sql(SQL_EVENTS_QUANTILES_BY_TYPE).df().sort_values(["event_type", "pct"]).reset_index(drop=True)
        assert got[["event_type", "pct", "bin", "lo_c", "hi_c"]].astype(str).equals(
            exp[["event_type", "pct", "bin", "lo_c", "hi_c"]].astype(str)
        )
        assert (got[got["event_type"] == "c"]["bin"] == 0).all()

    def test_prefix_sum_empty_input(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.scan import prefix_sum

        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
        assert prefix_sum(empty, "k", "v").count() == 0


class TestCompressRatio:
    def test_repetitive_compresses_more_and_deterministic(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_compress_ratio

        rng = np.random.default_rng(41)
        repetitive = "spam ham " * 200
        random_text = " ".join(f"{rng.integers(0, 1 << 60):x}" for _ in range(200))
        rows = {"doc_id": [0, 1], "text": [repetitive, random_text]}
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
        a = q_doc_compress_ratio(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
        b = q_doc_compress_ratio(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
        assert a["compress_ratio_4dp"].tolist() == b["compress_ratio_4dp"].tolist()  # deterministic
        assert a.loc[0, "compress_ratio_4dp"] < 1000   # boilerplate: <10% of raw size
        assert a.loc[1, "compress_ratio_4dp"] > 5000   # high-entropy: poorly compressible


class TestIntervalJoin:
    def _run(self, events, windows):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import broadcast_interval_join_agg

        ev = rd.from_arrow(
            pa.table(
                {
                    "ts": pa.array([e[0] for e in events], pa.int64()),
                    "value": pa.array([e[1] for e in events], pa.float64()),
                }
            )
        )
        win = pa.table(
            {
                "window_id": pa.array([w[0] for w in windows], pa.int64()),
                "start": pa.array([w[1] for w in windows], pa.int64()),
                "end": pa.array([w[2] for w in windows], pa.int64()),
            }
        )
        df = broadcast_interval_join_agg(ev, win, ts_col="ts", value_col="value").to_pandas()
        return df.set_index("window_id").sort_index()

    def test_boundaries_overlap_and_variable_widths(self, ray_session):
        # windows: [10,20) [15,40) [30,31)  — overlapping + variable width
        windows = [(1, 10, 20), (2, 15, 40), (3, 30, 31)]
        # ts=10 start-inclusive; ts=20 end-exclusive for w1 but inside w2;
        # ts=17 matches BOTH w1 and w2; ts=30 matches w2 and w3; ts=99 none
        events = [(10, 1.0), (20, 2.0), (17, 4.0), (30, 8.0), (99, 16.0)]
        out = self._run(events, windows)
        assert out.loc[1, "n_events"] == 2 and out.loc[1, "sum_value"] == 5.0  # ts 10,17
        assert out.loc[2, "n_events"] == 3 and out.loc[2, "sum_value"] == 14.0  # ts 20,17,30
        assert out.loc[3, "n_events"] == 1 and out.loc[3, "sum_value"] == 8.0

    def test_empty_window_dropped_and_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(3)
        events = [(int(rng.integers(0, 1000)), float(i)) for i in range(300)]
        windows = [(i, int(s), int(s) + int(w)) for i, (s, w) in enumerate(zip(rng.integers(0, 1000, 20), rng.integers(1, 120, 20)))]
        out = self._run(events, windows)
        for wid, s, e in windows:
            hits = [(t, v) for t, v in events if s <= t < e]
            if not hits:
                assert wid not in out.index  # inner-join: empty windows dropped
            else:
                assert out.loc[wid, "n_events"] == len(hits)
                assert out.loc[wid, "sum_value"] == pytest.approx(sum(v for _, v in hits))

    def test_max_windows_gate(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import broadcast_interval_join_agg

        ev = rd.from_arrow(pa.table({"ts": pa.array([1], pa.int64()), "value": pa.array([1.0])}))
        win = pa.table(
            {
                "window_id": pa.array(range(10), pa.int64()),
                "start": pa.array(range(10), pa.int64()),
                "end": pa.array(range(1, 11), pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="max_windows"):
            broadcast_interval_join_agg(ev, win, ts_col="ts", value_col="value", max_windows=5)


class TestSpanMediaResolve:
    def test_refs_resolve_with_correct_lengths(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_span_media_resolve

        # doc 7: 120 words -> 12 spans -> image spans at offsets 4 and 9
        # doc 8: 30 words -> 3 spans -> no image span
        # doc 9: multibyte text, 50 words -> image span at offset 4
        rows = {
            "doc_id": [7, 8, 9],
            "text": [" ".join(f"w{i}" for i in range(120)), " ".join(f"v{i}" for i in range(30)), " ".join("日本語" for _ in range(50))],
        }
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
        df = q_span_media_resolve(str(tmp_path)).to_pandas().sort_values(["doc_id", "offset"]).reset_index(drop=True)
        assert list(zip(df["doc_id"], df["offset"])) == [("7", 4), ("7", 9), ("9", 4)]
        assert df["media_ref"].tolist() == ["media://7/4", "media://7/9", "media://9/4"]
        # media_len = utf8 byte length of the referenced doc's blob
        assert df.loc[0, "media_len"] == len(rows["text"][0].encode())
        assert df.loc[2, "media_len"] == len(rows["text"][2].encode())  # 3 bytes/char survives


class TestHeavyHitters:
    def _corpus(self):
        # Zipf-ish: token f{i} appears ~600/(i+1) times, shuffled across 80 docs
        rng = np.random.default_rng(11)
        toks = []
        for i in range(400):
            toks += [f"f{i:03d}"] * (600 // (i + 1))
        toks = np.array(toks)
        rng.shuffle(toks)
        docs = [" ".join(chunk) for chunk in np.array_split(toks, 80)]
        exact = pd.Series(toks).value_counts()
        return docs, exact

    def _exact_topk(self, exact, k):
        df = exact.rename_axis("token").reset_index(name="c")
        return df.sort_values(["c", "token"], ascending=[False, True]).head(k).reset_index(drop=True)

    def test_sketch_path_matches_exact(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import heavy_hitter_topk

        docs, exact = self._corpus()
        ds = rd.from_items([{"text": d} for d in docs])
        # capacity 50 << 400 distinct per batch -> real truncation + slack
        out = heavy_hitter_topk(ds, k=10, capacity=50).to_pandas().reset_index(drop=True)
        want = self._exact_topk(exact, 10)
        assert out["token"].tolist() == want["token"].tolist()
        assert out["c"].tolist() == want["c"].tolist()

    def test_fallback_when_sketch_too_loose(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import heavy_hitter_topk

        docs, exact = self._corpus()
        ds = rd.from_items([{"text": d} for d in docs])
        # capacity 3 -> slack dwarfs the k-th count -> exact fallback fires;
        # result must STILL be exact
        out = heavy_hitter_topk(ds, k=10, capacity=3, max_candidates=10_000)
        df = out.to_pandas().reset_index(drop=True)
        want = self._exact_topk(exact, 10)
        assert df["token"].tolist() == want["token"].tolist()
        assert df["c"].tolist() == want["c"].tolist()


class TestEmbeddingStats:
    def test_grouped_centroids_exact_and_partition_stable(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.similarity import grouped_centroids

        rng = np.random.default_rng(5)
        emb = rng.normal(size=(60, 4)).astype(np.float32)
        labels = np.arange(60) % 3
        rows = [{"embedding": emb[i].tolist(), "label": int(labels[i])} for i in range(60)]
        out = grouped_centroids(rd.from_items(rows)).to_pandas()
        out2 = grouped_centroids(rd.from_items(rows).repartition(7)).to_pandas()
        for lab in range(3):
            want = np.round(emb[labels == lab].astype(np.float64).mean(axis=0) * 10_000).astype(np.int64)
            got = out[out["label"] == lab].sort_values("dim")["centroid_4dp"].to_numpy()
            assert np.array_equal(got, want)
        a = out.sort_values(["label", "dim"]).reset_index(drop=True)
        b = out2.sort_values(["label", "dim"]).reset_index(drop=True)
        assert a.equals(b)  # block layout must not change the result

    def test_pca_matches_numpy_subspace(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.similarity import pca_project

        rng = np.random.default_rng(9)
        # anisotropic cloud: variance 9 along a known direction, 1 elsewhere
        d = 8
        direction = rng.normal(size=d)
        direction /= np.linalg.norm(direction)
        coords = rng.normal(size=(300, d))
        emb = coords + 2.0 * np.outer(coords[:, 0], direction)
        rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(300)]
        out = pca_project(rd.from_items(rows)).to_pandas().sort_values("vec_id")
        centered = emb - emb.mean(axis=0)
        _, vecs = np.linalg.eigh(np.cov(centered.T, bias=True))
        want = centered @ vecs[:, -1]
        got = out["pc1_proj_4dp"].to_numpy() / 10_000.0
        corr = np.corrcoef(got, want)[0, 1]
        assert abs(corr) > 0.9999  # same principal axis (sign may differ)


class TestNewOpsEmptyInputs:
    def test_interval_join_empty_sides(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import broadcast_interval_join_agg

        ev = rd.from_arrow(pa.table({"ts": pa.array([1, 2], pa.int64()), "value": pa.array([1.0, 2.0])}))
        no_windows = pa.table(
            {"window_id": pa.array([], pa.int64()), "start": pa.array([], pa.int64()), "end": pa.array([], pa.int64())}
        )
        assert broadcast_interval_join_agg(ev, no_windows, ts_col="ts", value_col="value").count() == 0
        no_events = rd.from_arrow(pa.table({"ts": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}))
        win = pa.table(
            {"window_id": pa.array([1], pa.int64()), "start": pa.array([0], pa.int64()), "end": pa.array([10], pa.int64())}
        )
        assert broadcast_interval_join_agg(no_events, win, ts_col="ts", value_col="value").count() == 0

    def test_centroids_and_pca_empty(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.similarity import grouped_centroids, pca_project

        empty = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                    "label": pa.array([], pa.int32()),
                }
            )
        )
        assert grouped_centroids(empty).count() == 0
        out = pca_project(empty)
        assert out.count() == 0  # Dataset on the empty path too
        assert [f.name for f in out.schema().base_schema] == ["vec_id", "pc1_proj_4dp"]

    def test_heavy_hitters_empty_corpus(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import heavy_hitter_topk

        empty = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
        out = heavy_hitter_topk(empty, k=5, num_partitions=2)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) == 0

    def test_heavy_hitters_all_truncated_falls_back(self, ray_session):
        """Review repro: capacity below every batch's token tail -> the
        sketch carries nothing but sentinels; must fall back to exact."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import heavy_hitter_topk

        # 6 docs x 10 distinct tokens, each token once per doc (count 6 each)
        docs = [" ".join(f"t{i}" for i in range(10)) for _ in range(6)]
        ds = rd.from_items([{"text": d} for d in docs])
        out = heavy_hitter_topk(ds, k=5, capacity=3, num_partitions=2)
        df = out.to_pandas()
        assert len(df) == 5 and (df["c"] == 6).all()
        assert df["token"].tolist() == ["t0", "t1", "t2", "t3", "t4"]  # count tie -> token asc

    def test_heavy_hitters_fewer_than_k_candidates_falls_back(self, ray_session):
        """Review repro: one dominant token survives the sketch but k-1
        singletons are all truncated -> len(out) < k must trigger exact."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import heavy_hitter_topk

        text = " ".join(["big"] * 25) + " " + " ".join(f"s{i}" for i in range(40))
        ds = rd.from_items([{"text": text}])
        out = heavy_hitter_topk(ds, k=5, capacity=3, num_partitions=2)
        df = out.to_pandas()
        assert len(df) == 5
        assert df["token"].iloc[0] == "big" and df["c"].iloc[0] == 25
        assert df["token"].iloc[1:].tolist() == ["s0", "s1", "s10", "s11"] and (df["c"].iloc[1:] == 1).all()


class TestDocSpansReference:
    def test_nested_spans_match_python_reference_and_roundtrip(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_spans, q_doc_spans_flat

        texts = {
            1: "",                                    # empty doc -> 0 spans
            2: "   \t  ",                             # whitespace-only -> 0 spans
            3: " ".join(f"w{i}" for i in range(10)),  # exactly one full span
            4: "  a   b  ",                           # ragged whitespace
            5: " ".join(f"w{i}" for i in range(51)),  # 6 spans, 6th has 1 word
            6: " ".join("日本語" for _ in range(12)),   # multibyte
        }
        pq.write_table(
            pa.table({"doc_id": list(texts), "text": list(texts.values())}), tmp_path / "documents.parquet"
        )
        nested = {r["doc_id"]: r["spans"] for r in q_doc_spans(str(tmp_path)).take_all()}
        for did, text in texts.items():
            words = text.split()
            want = []
            for i in range((len(words) + 9) // 10):
                is_img = i % 5 == 4
                want.append(
                    {
                        "kind": "image" if is_img else "text",
                        "text": " ".join(words[i * 10 : i * 10 + 10]),
                        "media_ref": f"media://{did}/{i}" if is_img else "",
                        "offset": i,
                    }
                )
            assert nested[str(did)] == want, f"doc {did}"
        # flat projection is exactly the flattened nested form (round-trip)
        flat = q_doc_spans_flat(str(tmp_path)).to_pandas()
        rebuilt = {
            did: [dict(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in zip(g["kind"], g["text"], g["media_ref"], g["offset"])]
            for did, g in flat.sort_values(["doc_id", "offset"]).groupby("doc_id")
        }
        for did in texts:
            assert rebuilt.get(str(did), []) == nested[str(did)]


class TestEventsRollup:
    def test_levels_are_consistent(self, ray_session, sf_dir):
        from goto_eater_crawler_ray.pipelines.queries import q_events_rollup

        df = q_events_rollup(sf_dir).to_pandas()
        fine = df[df["lvl"] == 0]
        by_type = df[df["lvl"] == 1]
        grand = df[df["lvl"] == 3]
        assert len(grand) == 1
        assert grand["n_events"].iloc[0] == fine["n_events"].sum() == by_type["n_events"].sum()
        for et, g in fine.groupby("event_type"):
            assert by_type.loc[by_type["event_type"] == et, "n_events"].iloc[0] == g["n_events"].sum()


class TestDupPassages:
    def test_planted_shared_passage(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_dup_passages

        passage = " ".join(f"p{i}" for i in range(10))  # 10 words -> 3 shared 8-grams
        docs = [
            {"doc_id": 0, "text": "alpha beta " + passage + " gamma"},
            {"doc_id": 1, "text": passage + " delta epsilon"},
            {"doc_id": 2, "text": " ".join(f"u{i}" for i in range(20))},  # unique words
            # within-doc repeat of the passage: bumps n_occ, not n_docs
            {"doc_id": 3, "text": passage + " zzz " + passage},
        ]
        pq.write_table(pa.table({"doc_id": [d["doc_id"] for d in docs], "text": [d["text"] for d in docs]}), tmp_path / "documents.parquet")
        df = q_dup_passages(str(tmp_path)).to_pandas().set_index("gram")
        core = " ".join(f"p{i}" for i in range(8))
        assert df.loc[core, "n_docs"] == 3
        assert df.loc[core, "n_occ"] == 4  # doc3 contains it twice
        # every surviving gram appears in >= 2 distinct docs
        assert (df["n_docs"] >= 2).all()
        # doc2's unique-vocab grams never surface
        assert not any(g.startswith("u0 ") for g in df.index)


class TestUsersModalType:
    def test_tie_breaks_to_smallest_type_and_tiny_input(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_users_modal_type

        # user 1: view x2, click x1 -> view; user 2: tie click/view -> click
        rows = [(1, "view"), (1, "view"), (1, "click"), (2, "click"), (2, "view")]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_users_modal_type(str(tmp_path)).to_pandas().set_index("user_id")
        assert df.loc[1, "modal_type"] == "view" and df.loc[1, "n"] == 2
        assert df.loc[2, "modal_type"] == "click" and df.loc[2, "n"] == 1
        assert len(df) == 2


class TestUsersIntersect:
    def test_only_both_sided_users_survive(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_users_intersect

        rows = [(1, "view"), (1, "purchase"), (2, "view"), (3, "purchase"), (4, "click"), (5, "view"), (5, "view")]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_users_intersect(str(tmp_path)).to_pandas()
        assert sorted(df["user_id"]) == [1]


class TestEventsCorr:
    def test_known_correlation_and_degenerate_drop(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_corr

        # type "lin": value == hour exactly -> corr = +1.0 (1_000_000 scaled)
        # type "anti": value == -hour -> corr = -1.0
        # type "flat": constant value -> zero variance -> dropped
        # type "solo": single row -> n < 2 -> dropped
        rows = []
        for h in range(6):
            rows.append((pd.Timestamp(f"2024-01-01 {h:02d}:00"), "lin", float(h)))
            rows.append((pd.Timestamp(f"2024-01-01 {h:02d}:30"), "anti", float(-h)))
            rows.append((pd.Timestamp(f"2024-01-01 {h:02d}:15"), "flat", 7.0))
        rows.append((pd.Timestamp("2024-01-01 03:00"), "solo", 1.0))
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([r[0] for r in rows]),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_events_corr(str(tmp_path)).to_pandas().set_index("event_type")
        assert df.loc["lin", "corr_6dp"] == 1_000_000
        assert df.loc["anti", "corr_6dp"] == -1_000_000
        assert "flat" not in df.index and "solo" not in df.index
        assert len(df) == 2


class TestEventsRegression:
    def test_exact_line_and_degenerate_drop(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_regression

        # "lin": value = 2*hour + 3 -> slope 2.0 (2_000_000), intercept 300 centi * 1e4
        # "one": single row -> dropped; "const": constant hour -> den == 0 -> dropped
        rows = []
        for h in range(5):
            rows.append((pd.Timestamp(f"2024-01-01 {h:02d}:00"), "lin", 2.0 * h + 3.0))
            rows.append((pd.Timestamp("2024-01-01 07:00"), "const", float(h)))
        rows.append((pd.Timestamp("2024-01-01 03:00"), "one", 9.0))
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array([r[0] for r in rows]),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_events_regression(str(tmp_path)).to_pandas().set_index("event_type")
        # y is in centi-units: slope = 200 centi/hour -> 200e6 at 6dp; intercept 300 centi -> 3_000_000 at 4dp
        assert df.loc["lin", "slope_6dp"] == 200_000_000
        assert df.loc["lin", "intercept_4dp"] == 3_000_000
        assert list(df.index) == ["lin"]


class TestOrdersShippingPriority:
    def test_top10_order_and_filters(self, ray_session, sf_dir):
        import duckdb

        from goto_eater_crawler_ray.pipelines.queries import SQL_ORDERS_SHIPPING_PRIORITY, q_orders_shipping_priority

        got = q_orders_shipping_priority(sf_dir).to_pandas()
        con = duckdb.connect()
        for t in ("lineitem", "orders", "customer"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        want = con.execute(SQL_ORDERS_SHIPPING_PRIORITY).df()
        assert len(got) == len(want) <= 10
        assert list(got["o_orderkey"]) == list(want["o_orderkey"])
        assert list(got["revenue_c"]) == list(want["revenue_c"])


class TestPromoRevenueShare:
    def test_tiny_known_share(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_promo_revenue_share

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
                }
            ),
            tmp_path / "part.parquet",
        )
        ship = [pd.Timestamp("1997-03-10"), pd.Timestamp("1997-03-20"), pd.Timestamp("1996-01-01")]
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 2, 1], pa.int64()),
                    "l_shipdate": pa.array(ship),
                    "l_extendedprice": pa.array([100.0, 300.0, 999.0], pa.float64()),
                    "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        df = q_promo_revenue_share(str(tmp_path)).to_pandas().set_index("ship_month")
        # out-of-window 1996 row excluded; March 1997: promo 10000c of 40000c = 25%
        assert list(df.index) == [199703]
        assert df.loc[199703, "promo_rev_c"] == 10_000
        assert df.loc[199703, "total_rev_c"] == 40_000
        assert df.loc[199703, "promo_share_6dp"] == 250_000


class TestUserRetention:
    def test_cohort_offsets(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_user_retention

        # user 1 active weeks w, w+1, w+3 (two events in w -> dedup); user 2 only w+1
        base = pd.Timestamp("2024-01-04")  # Thursday; epoch-week bucketing, not ISO
        rows = [
            (1, base),
            (1, base + pd.Timedelta(hours=2)),
            (1, base + pd.Timedelta(weeks=1)),
            (1, base + pd.Timedelta(weeks=3)),
            (2, base + pd.Timedelta(weeks=1)),
        ]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows]),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_user_retention(str(tmp_path)).to_pandas()
        m = {(r.cohort_week, r.week_offset): r.n_users for r in df.itertuples()}
        w1 = min(c for c, _ in m)
        assert m[(w1, 0)] == 1 and m[(w1, 1)] == 1 and m[(w1, 3)] == 1
        w2 = w1 + 1
        assert m[(w2, 0)] == 1
        assert df["n_users"].sum() == 4  # (user,week) distinct pairs


class TestEventsTransitions:
    def test_pairs_and_tie_break(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_transitions

        t0 = pd.Timestamp("2024-01-01 00:00:00")
        # user 1: a -> b -> b (b->b via event_id tie-break at equal ts)
        # user 2: c alone (no pair); boundary between users never pairs
        rows = [
            (1, t0, 10, "a"),
            (1, t0 + pd.Timedelta(minutes=1), 11, "b"),
            (1, t0 + pd.Timedelta(minutes=1), 12, "b"),
            (2, t0, 20, "c"),
        ]
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows]),
                    "event_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                }
            ),
            tmp_path / "events.parquet",
        )
        df = q_events_transitions(str(tmp_path)).to_pandas()
        m = {(r.from_type, r.to_type): r.n for r in df.itertuples()}
        assert m == {("a", "b"): 1, ("b", "b"): 1}


class TestEventsCube:
    def test_all_four_grouping_sets_consistent(self, ray_session, sf_dir):
        from goto_eater_crawler_ray.pipelines.queries import q_events_cube

        df = q_events_cube(sf_dir).to_pandas()
        fine = df[df["lvl"] == 0]
        by_type = df[df["lvl"] == 1]
        by_hour = df[df["lvl"] == 2]
        grand = df[df["lvl"] == 3]
        assert len(grand) == 1
        total = fine["n_events"].sum()
        assert grand["n_events"].iloc[0] == total == by_type["n_events"].sum() == by_hour["n_events"].sum()
        assert grand["sum_value"].iloc[0] == fine["sum_value"].sum() == by_hour["sum_value"].sum()
        for h, g in fine.groupby("hour_epoch"):
            assert by_hour.loc[by_hour["hour_epoch"] == h, "sum_value"].iloc[0] == g["sum_value"].sum()

    def test_tiny_input_two_keys(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_cube

        ts = pa.array([pd.Timestamp("2024-01-01 00:10"), pd.Timestamp("2024-01-01 00:40"), pd.Timestamp("2024-01-01 01:10")])
        pq.write_table(
            pa.table({"ts": ts, "event_type": ["a", "a", "b"], "value": [1.0, 2.0, 4.0]}),
            tmp_path / "events.parquet",
        )
        df = q_events_cube(str(tmp_path)).to_pandas()
        # fine = {(a,h0), (b,h1)} -> 2 fine + 2 by_type + 2 by_hour + 1 grand
        assert len(df) == 7
        assert df.loc[df["lvl"] == 3, "sum_value"].iloc[0] == 700
        a_total = df[(df["lvl"] == 1) & (df["event_type"] == "a")]["sum_value"].iloc[0]
        assert a_total == 300


class TestDocShuffle:
    def test_permutation_and_partition_stability(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_shuffle

        n = 300
        pq.write_table(pa.table({"doc_id": list(range(n)), "text": ["x"] * n}), tmp_path / "documents.parquet")
        df = q_doc_shuffle(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert sorted(df["shuffle_pos"]) == list(range(n))  # exact permutation
        assert df["shuffle_pos"].tolist() != list(range(n))  # actually shuffled
        again = q_doc_shuffle(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert df["shuffle_pos"].tolist() == again["shuffle_pos"].tolist()  # deterministic


class TestBloomJoin:
    def test_probe_keeps_all_matches_and_prunes_most_nonmatches(self, ray_session):
        import ray
        import ray.data as rd

        from goto_eater_crawler_ray.functions.bloomjoin import bloom_filter_probe, build_bloom

        build_keys = list(range(0, 2000, 20))  # 100 keys
        build = rd.from_arrow(pa.table({"k": pa.array(build_keys, pa.int64())}))
        probe = rd.from_arrow(pa.table({"k": pa.array(range(2000), pa.int64()), "v": pa.array(range(2000), pa.int64())}))
        bloom_ref = ray.put(build_bloom(build, "k"))
        kept = bloom_filter_probe(probe, "k", bloom_ref).to_pandas()
        # NO false negatives: every true match survives
        assert set(build_keys) <= set(kept["k"])
        # false-positive rate bounded: prunes the overwhelming majority
        assert len(kept) < 100 + 0.05 * 2000
        # values ride through untouched
        assert (kept["k"] == kept["v"]).all()

    def test_build_side_gate(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.bloomjoin import build_bloom

        big = rd.from_arrow(pa.table({"k": pa.array(range(100), pa.int64())}))
        with pytest.raises(ValueError, match="max_build_rows"):
            build_bloom(big, "k", max_build_rows=50)


class TestFunnelStages:
    def test_strict_ordering_semantics(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import funnel_stages

        rows = []
        # user 1: full ordered funnel -> stage 3
        rows += [(1, 10, "view"), (1, 20, "click"), (1, 30, "purchase")]
        # user 2: click BEFORE view -> stage 1 (click doesn't follow view)
        rows += [(2, 10, "click"), (2, 20, "view")]
        # user 3: click at the SAME ts as first view -> strict > fails -> stage 1
        rows += [(3, 10, "view"), (3, 10, "click")]
        # user 4: no view at all -> stage 0
        rows += [(4, 10, "purchase"), (4, 20, "click")]
        # user 5: later second view doesn't reset; purchase before click -> stage 2
        rows += [(5, 10, "view"), (5, 15, "purchase"), (5, 20, "click"), (5, 5, "purchase"), (5, 40, "view")]
        # user 6: purchase between view and click counts only if after first click
        rows += [(6, 10, "view"), (6, 20, "click"), (6, 25, "purchase"), (6, 15, "purchase")]
        ds = rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )
        out = funnel_stages(ds, "user_id", "ts", "event_type", ["view", "click", "purchase"]).to_pandas()
        got = dict(zip(out["user_id"], out["funnel_stage"]))
        assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2, 6: 3}


class TestMd5FamilyDedup:
    """The md5-family variants run the identical LSH machinery as the crc32
    production default (only the shingle hash differs), so the planted-dup
    recall contract must hold under both families; the md5 family is the
    one the DuckDB oracle twins replay (queries.minhash_pairs_md5 et al.)."""

    def test_md5_lsh_finds_planted_pairs(self, planted_docs):
        from goto_eater_crawler_ray.functions.dedup import minhash_lsh_pairs

        ds, _ = planted_docs
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4, hash_family="md5").to_pandas()
        found = set(zip(pairs["doc_a"], pairs["doc_b"]))
        for j in range(10):
            assert (j, 100 + j) in found, f"exact dup pair ({j},{100+j}) missed under md5 family"
        near_found = sum((10 + j, 110 + j) in found for j in range(10))
        assert near_found >= 7, f"only {near_found}/10 near-dup pairs found under md5 family"

    def test_md5_signature_matches_duckdb_hash(self):
        """The md5 shingle hash IS DuckDB's md5_number_upper (first 8 md5
        bytes, little-endian) — the contract every *_md5 oracle rests on."""
        import duckdb

        from goto_eater_crawler_ray.functions.dedup import _shingle_hashes

        text = "alpha beta gamma delta"
        py = _shingle_hashes(text, k=3, family="md5")
        con = duckdb.connect()
        sql = con.sql(
            "SELECT md5_number_upper('alpha beta gamma'), md5_number_upper('beta gamma delta')"
        ).fetchone()
        assert [int(v) for v in py] == [int(sql[0]), int(sql[1])]


class TestHLLRegisters:
    def test_register_state_batching_independent(self, ray_session):
        """The merged register table is a pure function of the value SET —
        identical across block counts (max is associative/commutative).
        This is what makes `hll_registers` a stable oracle row set."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import hll_sketch

        vals = pa.table({"v": pa.array(np.arange(0, 5000, dtype=np.int64) % 1700, pa.int64())})
        one = hll_sketch(rd.from_arrow(vals).repartition(1), "v")
        many = hll_sketch(rd.from_arrow(vals).repartition(16), "v")
        assert np.array_equal(one.registers, many.registers)
        assert one.estimate() == many.estimate()


class TestFrozenPca:
    def test_projection_matches_numpy_affine(self, ray_session, tmp_path):
        """q_pca_project_frozen is the pure affine map x.PC1 - C0 against
        the frozen literals — verify against a direct numpy evaluation on
        a synthetic embeddings table (any d=64 data; the model is frozen,
        not refit)."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines._pca_frozen import C0, PC1
        from goto_eater_crawler_ray.pipelines.queries import q_pca_project_frozen

        rng = np.random.default_rng(11)
        emb = rng.normal(size=(40, 64))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = q_pca_project_frozen(str(tmp_path)).to_pandas().sort_values("vec_id")
        m = (emb @ np.asarray(PC1) - C0) * 10_000.0
        want = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
        assert np.array_equal(out["pc1_proj_4dp"].to_numpy(), want)


class TestGatedComponents:
    def test_gated_matches_distributed_and_forced_path(self, planted_docs):
        """connected_components_gated returns the same (doc_id, group_id)
        rows whichever side of the gate executes (max_local_edges=0 forces
        the distributed path)."""
        from goto_eater_crawler_ray.functions.dedup import (
            connected_components_gated,
            minhash_lsh_pairs,
        )

        ds, _ = planted_docs
        pairs = minhash_lsh_pairs(ds, n_perm=64, n_bands=16, threshold=0.4).materialize()
        fast = connected_components_gated(pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        dist = (
            connected_components_gated(pairs, max_local_edges=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fast.equals(dist)
        assert len(fast) > 0


class TestSampleTopkPerGroup:
    def test_partition_stable_and_matches_reference(self, ray_session):
        """Membership is a pure function of (key, id): identical output at
        1 and 16 input blocks, and equal to a direct pandas evaluation of
        the same md5-priority window."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.sampling import md5_u64, sample_topk_per_group

        rng = np.random.default_rng(23)
        ids = np.arange(400, dtype=np.int64)
        keys = rng.choice(["a", "b", "c"], size=400)
        t = pa.table({"k": pa.array(keys), "id": pa.array(ids, pa.int64())})
        ref = (
            pd.DataFrame({"k": keys, "id": ids, "h": md5_u64(ids)})
            .sort_values(["k", "h", "id"])
            .groupby("k")
            .head(3)
        )
        ref["rk"] = ref.groupby("k").cumcount() + 1
        ref = ref[["k", "id", "rk"]].reset_index(drop=True)
        for parts in (1, 16):
            out = (
                sample_topk_per_group(rd.from_arrow(t).repartition(parts), "k", "id", k=3)
                .to_pandas()
                .sort_values(["k", "rk"])
                .reset_index(drop=True)
            )
            assert out.rename(columns={"k": "k", "id": "id"}).equals(ref), parts

    def test_group_smaller_than_k_keeps_all(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.sampling import sample_topk_per_group

        t = pa.table({"k": pa.array(["x", "x", "y"]), "id": pa.array([1, 2, 3], pa.int64())})
        out = sample_topk_per_group(rd.from_arrow(t), "k", "id", k=5).to_pandas()
        assert len(out) == 3 and set(out[out["k"] == "x"]["rk"]) == {1, 2}


class TestSpanReassemble:
    def test_order_placeholders_and_partition_stability(self, ray_session, tmp_path):
        """Rendered docs join spans in offset order with media placeholders;
        for a short pure-text doc the render reproduces the
        whitespace-normalized text; output is identical across widths."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_span_reassemble

        texts = {
            0: "  alpha   beta\tgamma  ",  # 3 words -> one text span
            1: " ".join(f"w{i}" for i in range(45)),  # 5 spans -> offset 4 is an image
        }
        t = pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_span_reassemble(str(tmp_path)).to_pandas().set_index("doc_id")["rendered"]
        assert out["0"] == "alpha beta gamma"
        words = texts[1].split()
        want = " ".join(words[:40]) + " <media://1/4>"
        assert out["1"] == want


class TestBigramPmi:
    def test_matches_hand_computation(self, ray_session):
        """Tiny corpus where counts are hand-checkable: PMI ordering and
        the scaled-int values match a direct formula evaluation."""
        import math

        import ray.data as rd

        from goto_eater_crawler_ray.functions.text import bigram_pmi

        # bigrams: ab=5, ba=5, cc=3, bc=1, ac=1 (N=15); unigrams a=b=c=6
        docs = ["a b a b a b c", "b a b a b a c", "c c c c"]
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(docs, pa.string())})
        )
        out = bigram_pmi(ds, min_count=3, n_top=10).to_pandas()
        n_total = 15
        rows = {(r.w1, r.w2): (r.c12, r.pmi_6dp) for r in out.itertuples()}
        uni = {"a": 6, "b": 6, "c": 6}
        assert rows[("a", "b")][0] == 5 and rows[("b", "a")][0] == 5 and rows[("c", "c")][0] == 3
        assert ("b", "c") not in rows  # below min_count
        for (w1, w2), (c12, pmi_i) in rows.items():
            pmi = math.log((n_total * c12) / (uni[w1] * uni[w2]))
            want = int(math.copysign(math.floor(abs(pmi) * 1e6 + 0.5), pmi))
            assert pmi_i == want, (w1, w2)


class TestEventsClip:
    def test_clip_matches_sketch_reference(self, ray_session, tmp_path):
        """Full-equality check against a numpy re-derivation of the same
        fixed-bin-histogram cuts: outliers clamp to the p05/p95 bin edges,
        values between the cuts pass through the same 4-dp rounding."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_clip

        rng = np.random.default_rng(5)
        v = np.concatenate([rng.uniform(10, 20, 960), np.full(20, -1e4), np.full(20, 1e4)])
        t = pa.table({"event_id": pa.array(np.arange(len(v)), pa.int64()), "value": pa.array(v, pa.float64())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_clip(str(tmp_path)).to_pandas().set_index("event_id").sort_index()["clipped_4dp"].to_numpy()

        # reference: same sketch, same single float expression for the cuts
        n, n_bins = len(v), 1024
        lo, hi = v.min(), v.max()
        width = (hi - lo) / n_bins
        b = np.minimum(np.floor((v - lo) / width), n_bins - 1).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        cum = np.cumsum(counts)
        cuts = []
        for pct in (5, 95):
            rank = (pct * n + 99) // 100
            cuts.append(lo + float(bins[np.searchsorted(cum, rank, side="left")]) * width)
        clipped = np.minimum(np.maximum(v, cuts[0]), cuts[1])
        m = clipped * 1e4
        want = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
        assert np.array_equal(out, want)
        # and the clamp actually fired on the planted outliers
        assert out[960] > -1e8 and out[-1] < 1e8

    def test_constant_column_noop(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_clip

        t = pa.table({"event_id": pa.array([0, 1], pa.int64()), "value": pa.array([7.5, 7.5], pa.float64())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_clip(str(tmp_path)).to_pandas()
        assert set(out["clipped_4dp"]) == {75000}


class TestLatestPerKey:
    def test_latest_row_per_composite_key(self, ray_session, tmp_path):
        """CDC compaction: the survivor per (user, type) is the max-(ts,id)
        row, verified against a pandas groupby-idxmax reference."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_dedup_latest

        rng = np.random.default_rng(11)
        n = 2000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    np.datetime64("2024-01-01") + rng.integers(0, 10**6, n).astype("timedelta64[s]")
                ),
                "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
                "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
                "value": pa.array(rng.uniform(-5, 5, n), pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = (
            q_events_dedup_latest(str(tmp_path))
            .to_pandas()
            .sort_values(["user_id", "event_type"])
            .reset_index(drop=True)
        )
        df = t.to_pandas().sort_values(["ts", "event_id"])
        want = df.groupby(["user_id", "event_type"], as_index=False).last()
        assert len(got) == len(want)
        assert np.array_equal(got["event_id"].to_numpy(), want["event_id"].to_numpy())
        m = want["value"].to_numpy() * 100.0
        assert np.array_equal(got["value_c"].to_numpy(), (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64))


class TestCumsumPerKey:
    def test_running_total_matches_pandas(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_cumsum

        rng = np.random.default_rng(12)
        n = 3000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(
                    np.datetime64("2024-01-01") + rng.integers(0, 10**5, n).astype("timedelta64[s]")
                ),
                "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
                "value": pa.array(rng.uniform(-9, 9, n), pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_cumsum(str(tmp_path)).to_pandas().sort_values(["user_id", "ts", "event_id"])
        df = t.to_pandas()
        m = df["value"].to_numpy() * 100.0
        df["v"] = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
        df = df.sort_values(["user_id", "ts", "event_id"])
        want = df.groupby("user_id")["v"].cumsum().to_numpy()
        assert np.array_equal(got["running_c"].to_numpy(), want)


class TestNtilePerKey:
    def test_ntile_sizes_and_order(self, ray_session, tmp_path):
        """SQL NTILE contract: per key, tiles 1..k; the first n%k tiles
        hold n//k+1 rows, the rest n//k; tile is monotone in (value, id)."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_ntile

        rng = np.random.default_rng(13)
        n = 1003  # deliberately not divisible by 4
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "event_type": pa.array(rng.choice(["x", "y"], n)),
                # heavy ties: only 7 distinct values, exercising the tie-break
                "value": pa.array(rng.integers(0, 7, n).astype(np.float64), pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_ntile(str(tmp_path)).to_pandas()
        df = t.to_pandas().merge(got, on=["event_id", "event_type"])
        for key, g in df.groupby("event_type"):
            g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
            nn, k = len(g), 4
            q, r = divmod(nn, k)
            sizes = g.groupby("tile").size()
            assert list(sizes.index) == [1, 2, 3, 4]
            for tile, size in sizes.items():
                assert size == q + (1 if tile <= r else 0), (key, tile)
            assert (np.diff(g["tile"].to_numpy()) >= 0).all()  # monotone in sort order


class TestPurchaseErrorFull:
    def test_full_outer_keeps_one_sided_users(self, ray_session, tmp_path):
        """Users with only purchases and users with only errors both
        survive, with the missing side coalesced to zero."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_purchase_error_full

        t = pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
                "event_type": pa.array(["purchase", "error", "purchase", "error", "error", "view"]),
                "value": pa.array([10.005, 2.0, 3.5, 1.25, 0.75, 9.9], pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_purchase_error_full(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
        assert sorted(got.index) == [1, 2, 3]  # user 4 (view only) on neither side
        assert got.loc[2, "n_purchase"] == 1 and got.loc[2, "n_error"] == 0 and got.loc[2, "v_error_c"] == 0
        assert got.loc[3, "n_purchase"] == 0 and got.loc[3, "v_purchase_c"] == 0 and got.loc[3, "n_error"] == 2
        assert got.loc[3, "v_error_c"] == 125 + 75
        assert got.loc[1, "v_purchase_c"] == 1001  # round(10.005*100) half-away = 1001
        assert got.loc[1, "v_error_c"] == 200


class TestSparseCosinePairs:
    def test_identical_and_partial_overlap(self, ray_session, tmp_path):
        """Identical docs score exactly 1e6; a known partial bigram
        overlap matches the closed-form cosine; disjoint docs are absent."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_sparse_cosine_pairs

        # df cap at 4 docs is max(2, 4//10) = 2: only bigrams shared by
        # exactly two docs contribute to dots (norms stay full-vector)
        texts = [
            "a b c d",  # doc0: bigrams {a b, b c, c d}, each df=2
            "a b c d",  # doc1: identical to doc0
            "p q r s",  # doc2: bigrams {p q, q r, r s}
            "p q x y",  # doc3: shares only "p q" (df=2) with doc2
        ]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
        pq.write_table(t, tmp_path / "documents.parquet")
        got = q_sparse_cosine_pairs(str(tmp_path)).to_pandas()
        sims = {(r.doc1, r.doc2): r.cos_6dp for r in got.itertuples()}
        assert sims[(0, 1)] == 1_000_000  # identical docs: every gram survives the cap
        # dot=1 shared bigram, norms sqrt(3)*sqrt(3): cos = 1/3
        want = int(np.floor(1e6 * 1.0 / (np.sqrt(3.0) * np.sqrt(3.0)) + 0.5))
        assert sims[(2, 3)] == want
        assert (0, 2) not in sims and (1, 3) not in sims  # disjoint docs never pair


class TestEventsMinmax:
    def test_scaling_and_degenerate_group_drop(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_minmax

        t = pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "event_type": pa.array(["a", "a", "a", "c", "c", "a"]),
                "value": pa.array([0.0, 5.0, 10.0, 7.0, 7.0, 2.5], pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_minmax(str(tmp_path)).to_pandas().set_index("event_id")["mm_6dp"]
        assert sorted(got.index) == [0, 1, 2, 5]  # constant group 'c' dropped
        assert got[0] == 0 and got[1] == 500_000 and got[2] == 1_000_000 and got[5] == 250_000


class TestEventsDenseRank:
    def test_matches_pandas_dense_rank(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_dense_rank

        rng = np.random.default_rng(17)
        n = 4000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "event_type": pa.array(rng.choice(["x", "y", "z"], n)),
                # only 11 distinct values: heavy tie collapse
                "value": pa.array(rng.integers(0, 11, n).astype(np.float64), pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_dense_rank(str(tmp_path)).to_pandas().set_index("event_id")["drank"].sort_index()
        df = t.to_pandas()
        want = df.groupby("event_type")["value"].rank(method="dense").astype(np.int64)
        assert np.array_equal(got.to_numpy(), want.to_numpy())


class TestRevenueByNation:
    def test_chain_join_hand_computed(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_revenue_by_nation

        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                    "l_extendedprice": pa.array([100.0, 50.0, 200.0, 80.0], pa.float64()),
                    "l_discount": pa.array([0.1, 0.0, 0.25, 0.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 10, 20], pa.int64()),
                    # order 3 falls OUTSIDE the 1996-1998 window
                    "o_orderdate": pa.array(
                        [np.datetime64("1996-06-01", "us"), np.datetime64("1997-01-01", "us"), np.datetime64("1999-01-01", "us")]
                    ),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([10, 20], pa.int64()),
                    "c_nationkey": pa.array([0, 1], pa.int64()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1], pa.int64()),
                    "n_name": pa.array(["ALPHA", "BETA"]),
                }
            ),
            tmp_path / "nation.parquet",
        )
        got = q_revenue_by_nation(str(tmp_path)).to_pandas().set_index("nation_name")
        # cust 10: order1 (90+50)=140.00 -> 14000c, order2 150.00 -> 15000c
        assert got.loc["ALPHA", "revenue_c"] == 29000 and got.loc["ALPHA", "n_custs"] == 1
        assert "BETA" not in got.index  # its only order is outside the window


class TestOrdersPriorityShare:
    def test_shares_sum_and_values(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_orders_priority_share

        t = pa.table(
            {
                "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH", "3-LOW"]),
                "o_totalprice": pa.array([10.0, 30.0, 40.0, 20.0], pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        got = q_orders_priority_share(str(tmp_path)).set_index("o_orderpriority")
        assert got.loc["1-URGENT", "revenue_c"] == 4000 and got.loc["1-URGENT", "share_6dp"] == 400_000
        assert got.loc["2-HIGH", "share_6dp"] == 400_000 and got.loc["3-LOW", "share_6dp"] == 200_000
        assert got["share_6dp"].sum() == 1_000_000


class TestEventsFirstLast:
    def test_endpoints_match_pandas(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_first_last

        rng = np.random.default_rng(19)
        n = 2500
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(np.datetime64("2024-01-01") + rng.integers(0, 10**6, n).astype("timedelta64[s]")),
                "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
                "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_first_last(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
        df = t.to_pandas().sort_values(["ts", "event_id"])
        first = df.groupby("user_id").first()
        last = df.groupby("user_id").last()
        assert list(got["first_type"]) == list(first["event_type"])
        assert list(got["last_type"]) == list(last["event_type"])
        assert list(got["first_ts"]) == list(first["ts"])
        assert list(got["last_ts"]) == list(last["ts"])


class TestEventsExactQuartiles:
    def test_matches_numpy_order_stats(self, ray_session, tmp_path):
        """Exact lower order statistics at ranks floor((n-1)q/4)+1 — with
        heavy ties and a non-divisible n, vs a plain numpy sort."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_exact_quartiles

        rng = np.random.default_rng(23)
        n = 1007
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "event_type": pa.array(rng.choice(["u", "w"], n)),
                "value": pa.array(np.round(rng.uniform(0, 3, n), 1), pa.float64()),  # many ties
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = q_events_exact_quartiles(str(tmp_path)).to_pandas()
        df = t.to_pandas()
        for key, g in df.groupby("event_type"):
            sv = np.sort(g["value"].to_numpy())
            nn = len(sv)
            for q in (1, 2, 3):
                want = sv[((nn - 1) * q) // 4]  # 0-based
                row = got[(got.event_type == key) & (got.quarter == q)]
                assert len(row) == 1
                assert row["value_4dp"].iloc[0] == int(np.floor(want * 10_000 + 0.5)), (key, q)


class TestEventsMadOutliers:
    def test_planted_outliers_flagged_robustly(self, ray_session, tmp_path):
        """A tight cluster plus extreme outliers: MAD flags exactly the
        planted points (a z-score would be dragged by them); flags match
        a numpy exact-median reference."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_mad_outliers

        rng = np.random.default_rng(29)
        base = rng.uniform(9.5, 10.5, 500)
        out = np.array([100.0, -80.0, 55.0])
        v = np.concatenate([base, out])
        n = len(v)
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "event_type": pa.array(["k"] * n),
                "value": pa.array(v, pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        got = set(q_events_mad_outliers(str(tmp_path)).to_pandas()["event_id"])

        sv = np.sort(v)
        med = sv[(n - 1) * 2 // 4]
        dv = np.abs(v - med)
        mad = np.sort(dv)[(n - 1) * 2 // 4]
        want = set(np.flatnonzero(dv > 3 * mad))
        assert got == want
        assert {500, 501, 502} <= got  # all planted outliers flagged


class TestEditDistancePairs:
    def test_matches_bruteforce_levenshtein(self, ray_session):
        """Planted titles exercising every verify branch (exact dup,
        substitution, deletion, insertion, transposition=2 rejected,
        prefix-truncation aliasing); output equals a brute-force
        O(n^2) Levenshtein<=1 reference over the 16-char prefixes."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import edit_distance_pairs

        titles = [
            "alpha beta gamma delta",   # 0
            "alpha beta gamma delta",   # 1 exact dup of 0 (prefix)
            "alpha beta gammX delta",   # 2 substitution inside prefix
            "alpha beta gamm delta",    # 3 deletion inside prefix
            "Xalpha beta gamma",        # 4 insertion at front
            "alpha beta gamam delta",   # 5 transposition -> dist 2, rejected
            "zzz totally different",    # 6
            "zz totally different",     # 7 deletion at front vs 6
            "short",                    # 8 short string (< prefix_len)
            "shoRt",                    # 9 case-folded exact dup of 8
            "sho",                      # 10 dist 2 from 8, rejected
        ]
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(titles)])
        out = edit_distance_pairs(ds, prefix_len=16).to_pandas()
        got = {(a, b): d for a, b, d in zip(out["a_id"], out["b_id"], out["dist"])}

        def lev(a, b):
            m, n = len(a), len(b)
            prev = list(range(n + 1))
            for i in range(1, m + 1):
                cur = [i] + [0] * n
                for j in range(1, n + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
                prev = cur
            return prev[n]

        prefixes = [t.lower()[:16] for t in titles]
        want = {}
        for i in range(len(titles)):
            for j in range(i + 1, len(titles)):
                d = lev(prefixes[i], prefixes[j])
                if d <= 1:
                    want[(i, j)] = d
        assert got == want
        assert (0, 1) in got and got[(0, 1)] == 0
        assert got[(0, 2)] == 1 and got[(0, 3)] == 1
        assert (0, 5) not in got and (8, 10) not in got
        assert got[(8, 9)] == 0

    def test_empty_and_singleton(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import edit_distance_pairs

        ds = rd.from_items([{"doc_id": 1, "text": "only one doc"}])
        assert edit_distance_pairs(ds).count() == 0


class TestEventsEntropy:
    def test_matches_direct_entropy(self, ray_session, tmp_path):
        """Planted hour distributions: uniform type -> ln(n_hours);
        single-hour type -> 0; mixed type matches scipy-free direct
        computation."""
        import math

        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_entropy

        rows_ts, rows_et = [], []
        # 'uni': one event in each of 24 hours
        for h in range(24):
            rows_ts.append(h * 3600 * 1_000_000)
            rows_et.append("uni")
        # 'burst': 50 events all at hour 3
        for _ in range(50):
            rows_ts.append((3 * 3600 + 7) * 1_000_000)
            rows_et.append("burst")
        # 'mix': 10 at hour 0, 5 at hour 1, 1 at hour 2
        for h, c in [(0, 10), (1, 5), (2, 1)]:
            for _ in range(c):
                rows_ts.append((h * 3600 + 11) * 1_000_000)
                rows_et.append("mix")
        t = pa.table({"ts": pa.array(rows_ts, pa.timestamp("us")), "event_type": pa.array(rows_et)})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_entropy(str(tmp_path)).to_pandas().set_index("event_type")
        assert out.loc["uni", "entropy_6dp"] == round(math.log(24) * 1_000_000)
        assert out.loc["burst", "entropy_6dp"] == 0
        n = 16
        h = math.log(n) - (10 * math.log(10) + 5 * math.log(5) + 1 * math.log(1)) / n
        assert out.loc["mix", "entropy_6dp"] == round(h * 1_000_000)
        assert out.loc["mix", "n_events"] == 16


class TestAllpairsJaccard:
    def test_exact_vs_bruteforce(self, ray_session):
        """Random docs + planted near-dups at several overlap levels; the
        distributed AllPairs output equals a brute-force O(n^2) shingle-set
        jaccard over ALL pairs (recall 1.0 — prefix filter loses nothing)."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import allpairs_jaccard_pairs

        rng = np.random.default_rng(11)
        words = [f"w{i:03d}" for i in range(60)]
        texts = [" ".join(rng.choice(words, size=25)) for _ in range(40)]
        # planted: exact dup, 1-word edit, half-replaced, short doc (<3 words)
        w = texts[0].split(); w[3] = "ZZZ"
        texts += [texts[0], " ".join(w), " ".join(texts[1].split()[:12] + list(rng.choice(words, 13))), "one two"]
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        out = allpairs_jaccard_pairs(ds, threshold=0.5, shingle_k=3).to_pandas()
        got = {(a, b): j for a, b, j in zip(out["a_id"], out["b_id"], out["jaccard_6dp"])}

        def shset(t):
            ws = t.split(" ")
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else set()

        sets = [shset(t) for t in texts]
        want = {}
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                if not sets[i] or not sets[j]:
                    continue
                c = len(sets[i] & sets[j])
                if c == 0:
                    continue
                j6 = int(np.floor(c * 1_000_000.0 / (len(sets[i]) + len(sets[j]) - c) + 0.5))
                if j6 >= 500_000:
                    want[(i, j)] = j6
        assert got == want
        assert got[(0, 40)] == 1_000_000  # exact dup
        assert (0, 41) in got  # 1-word edit survives threshold 0.5

    def test_empty_vocab(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import allpairs_jaccard_pairs

        ds = rd.from_items([{"doc_id": 1, "text": "a b"}, {"doc_id": 2, "text": "c"}])
        assert allpairs_jaccard_pairs(ds).count() == 0

    def test_vocab_gate(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.dedup import allpairs_jaccard_pairs

        ds = rd.from_items([{"doc_id": i, "text": f"a{i} b{i} c{i} d{i}"} for i in range(10)])
        with pytest.raises(ValueError, match="max_vocab"):
            allpairs_jaccard_pairs(ds, max_vocab=3).count()


class TestRollingMedian:
    def test_matches_numpy_reference(self, ray_session):
        """Random per-key series; med_x2_c equals twice the interpolated
        median of each trailing-5 frame over centi-scaled ints."""
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import rolling_median_per_key

        rng = np.random.default_rng(13)
        n = 400
        rows = {
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": np.arange(n, dtype=np.int64),
            "value": np.round(rng.uniform(-50, 50, n), 3),
        }
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = (
            rolling_median_per_key(ds, "user_id", ["ts"], "value", window=5)
            .to_pandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        df = pd.DataFrame(rows).sort_values(["user_id", "ts"]).reset_index(drop=True)
        vc = np.sign(df["value"]) * np.floor(np.abs(df["value"] * 100) + 0.5)
        want = []
        for _, g in df.assign(vc=vc.astype(np.int64)).groupby("user_id", sort=True):
            v = g["vc"].to_numpy()
            for i in range(len(v)):
                w = np.sort(v[max(0, i - 4) : i + 1])
                k = len(w)
                want.append(int(w[(k - 1) // 2] + w[k // 2]))
        assert out["med_x2_c"].tolist() == want

    def test_odd_frame_is_twice_middle(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.window import rolling_median_per_key

        ds = rd.from_items([{"user_id": 1, "ts": i, "value": float(v)} for i, v in enumerate([5, 1, 9, 3, 7])])
        out = rolling_median_per_key(ds, "user_id", ["ts"], "value", window=5).to_pandas().sort_values("ts")
        # frames: [5] [5,1] [5,1,9] [5,1,9,3] [5,1,9,3,7] -> med 5, 3, 5, 4, 5
        assert out["med_x2_c"].tolist() == [1000, 600, 1000, 800, 1000]


class TestNewVsReturning:
    def test_planted_lifecycle(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_new_vs_returning

        day = 86400 * 1_000_000
        rows = []
        # user 1: days 0,1,2; user 2: day 1 twice (dedup), day 2; user 3: day 2 only
        for u, d in [(1, 0), (1, 1), (1, 2), (2, 1), (2, 1), (2, 2), (3, 2)]:
            rows.append({"ts": d * day + len(rows) * 1000, "user_id": u})
        t = pa.table(
            {
                "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_new_vs_returning(str(tmp_path)).to_pandas().set_index("day").sort_index()
        assert out.loc[0].tolist() == [1, 0]  # user1 new
        assert out.loc[1].tolist() == [1, 1]  # user2 new, user1 returning
        assert out.loc[2].tolist() == [1, 2]  # user3 new, users 1+2 returning


class TestGapFill:
    def test_zero_filled_dense_grid(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_gap_fill

        hr = 3600 * 1_000_000
        ts, et = [], []
        for h, typ, c in [(0, "a", 2), (3, "a", 1), (1, "b", 1)]:
            for _ in range(c):
                ts.append(h * hr + 5)
                et.append(typ)
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "event_type": pa.array(et)})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_gap_fill(str(tmp_path)).to_pandas()
        assert len(out) == 8  # 2 types x hours 0..3
        g = out.set_index(["event_type", "hour_epoch"])["n_events"]
        assert g[("a", 0)] == 2 and g[("a", 1)] == 0 and g[("a", 2)] == 0 and g[("a", 3)] == 1
        assert g[("b", 1)] == 1 and g[("b", 0)] == 0 and g[("b", 3)] == 0


class TestSlidingDistinctUsers:
    def test_window_expansion_dedups_users(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_sliding_distinct_users

        hr = 3600 * 1_000_000
        # user 1 active hours 0,1,2 (counts ONCE per window); user 2 hour 2; user 3 hour 5
        data = [(0, 1), (1, 1), (2, 1), (2, 2), (5, 3)]
        t = pa.table(
            {
                "ts": pa.array([h * hr + 9 for h, _ in data], pa.timestamp("us")),
                "user_id": pa.array([u for _, u in data], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_sliding_distinct_users(str(tmp_path)).to_pandas().set_index("hour_epoch")["n_users"]
        # hours present: 0,1,2,5
        assert out[0] == 1        # window {h-2..0}: user1
        assert out[1] == 1        # user1 in hours 0,1 -> once
        assert out[2] == 2        # user1 (0,1,2 dedup) + user2
        assert out[5] == 1        # only user3 (hours 3,4 empty)
        assert set(out.index) == {0, 1, 2, 5}


class TestCooccurTopk:
    def test_planted_cooccurrence(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_cooccur_topk

        texts = ["x y z", "x y", "x y w", "z w", "x x y"]  # (x,y) co-occurs 4x
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_cooccur_topk(str(tmp_path)).to_pandas()
        assert out.iloc[0][["tok_a", "tok_b"]].tolist() == ["x", "y"]
        assert out.iloc[0]["n_docs"] == 4
        got = {(a, b): n for a, b, n in zip(out["tok_a"], out["tok_b"], out["n_docs"])}
        assert got[("x", "z")] == 1 and got[("w", "x")] == 1 and got[("w", "z")] == 1
        assert ("x", "x") not in got  # distinct tokens: no self-pair


class TestUserPaths:
    def test_paths_ordered_and_counted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_user_paths

        rows = [
            (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
            (2, 5, "a"), (2, 6, "b"), (2, 7, "c"),
            (3, 1, "b"), (3, 2, "a"),
        ]
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_user_paths(str(tmp_path)).to_pandas()
        got = dict(zip(out["path"], out["n_users"]))
        assert got == {"a>b>c": 2, "b>a": 1}
        assert out.iloc[0]["path"] == "a>b>c"  # sorted by count desc


class TestSupplierVariety:
    def test_distinct_suppliers_per_brand_size(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_supplier_variety

        # parts 1,2 share brand/size; suppliers overlap across parts
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], pa.int64()),
                    "p_brand": pa.array(["B1", "B1", "B2"]),
                    "p_size": pa.array([5, 5, 9], pa.int64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        li = [(1, 100), (1, 100), (1, 200), (2, 100), (2, 300), (3, 100)]
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([a for a, _ in li], pa.int64()),
                    "l_suppkey": pa.array([b for _, b in li], pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = q_supplier_variety(str(tmp_path)).to_pandas().set_index(["p_brand", "p_size"])["supplier_cnt"]
        assert out[("B1", 5)] == 3  # suppliers 100,200,300 (100 deduped across parts 1,2)
        assert out[("B2", 9)] == 1


class TestEventsMutualInfo:
    def test_independent_and_dependent(self, ray_session, tmp_path):
        import math

        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_mutual_info

        hr = 3600 * 1_000_000
        # perfectly dependent: type a only hour 0, type b only hour 1, 10 each
        ts = [0 * hr + i for i in range(10)] + [1 * hr + i for i in range(10)]
        et = ["a"] * 10 + ["b"] * 10
        pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us")), "event_type": pa.array(et)}), tmp_path / "events.parquet")
        out = q_events_mutual_info(str(tmp_path)).to_pandas()
        assert out["mi_6dp"][0] == round(math.log(2) * 1_000_000)  # I = H = ln 2
        assert out["n_events"][0] == 20

    def test_independent_is_zero(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_mutual_info

        hr = 3600 * 1_000_000
        ts, et = [], []
        for h in (0, 1):
            for t_ in ("a", "b"):
                for i in range(5):  # uniform grid -> independent
                    ts.append(h * hr + len(ts))
                    et.append(t_)
        pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us")), "event_type": pa.array(et)}), tmp_path / "events.parquet")
        out = q_events_mutual_info(str(tmp_path)).to_pandas()
        assert out["mi_6dp"][0] == 0


class TestOrdersLarge:
    def test_having_threshold_and_join(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_orders_large

        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                    "l_quantity": pa.array([100.0, 80.0, 30.0, 150.0, 40.0, 201.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([10, 20, 10], pa.int64()),
                    "o_totalprice": pa.array([1000.5, 2000.25, 3000.0], pa.float64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([10, 20], pa.int64()), "c_name": pa.array(["alice", "bob"])}),
            tmp_path / "customer.parquet",
        )
        out = q_orders_large(str(tmp_path)).to_pandas().sort_values("l_orderkey").reset_index(drop=True)
        # order1: 210 > 200 in; order2: 190 out; order3: 201 in
        assert out["l_orderkey"].tolist() == [1, 3]
        assert out["sum_qty"].tolist() == [210, 201]
        assert out["c_name"].tolist() == ["alice", "alice"]
        assert out["totalprice_c"].tolist() == [100050, 300000]


class TestPartsAboveBrandAvg:
    def test_exact_boundary_excluded(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_parts_above_brand_avg

        # brand A: prices 10, 20, 30 (avg 20: only 30 is above; 20 == avg excluded)
        # brand B: single part (price == avg -> excluded)
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "p_brand": pa.array(["A", "A", "A", "B"]),
                    "p_retailprice": pa.array([10.0, 20.0, 30.0, 7.5], pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        out = q_parts_above_brand_avg(str(tmp_path)).to_pandas()
        assert out["p_partkey"].tolist() == [3]
        assert out["price_c"].tolist() == [3000]


class TestCumulativeDistinctUsers:
    def test_running_total_equals_distinct_prefix(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_cumulative_distinct_users

        day = 86400 * 1_000_000
        pairs = [(0, 1), (0, 2), (1, 1), (1, 3), (3, 4), (3, 1), (3, 5)]
        t = pa.table(
            {
                "ts": pa.array([d * day + i for i, (d, _) in enumerate(pairs)], pa.timestamp("us")),
                "user_id": pa.array([u for _, u in pairs], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_cumulative_distinct_users(str(tmp_path)).to_pandas()
        assert out["day"].tolist() == [0, 1, 3]
        assert out["cum_users"].tolist() == [2, 3, 5]


class TestDisjunctiveJoinRevenue:
    def test_or_of_ands_clause_logic(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_disjunctive_join_revenue

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], pa.int64()),
                    "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#12"]),
                    "p_size": pa.array([5, 20, 40], pa.int64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        li = [
            (1, 10.0, 100.0, 0.1),   # c1: brand12 size5 qty10 -> in, rev 90
            (1, 25.0, 50.0, 0.0),    # qty 25 > 20 -> out
            (2, 10.0, 200.0, 0.5),   # c2: brand23 size20 qty10 -> in, rev 100
            (2, 2.0, 99.0, 0.0),     # qty 2 < 5 -> out
            (3, 10.0, 77.0, 0.0),    # brand12 but size 40 -> out
        ]
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([r[0] for r in li], pa.int64()),
                    "l_quantity": pa.array([r[1] for r in li], pa.float64()),
                    "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
                    "l_discount": pa.array([r[3] for r in li], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = q_disjunctive_join_revenue(str(tmp_path))
        assert out["n_lines"].tolist() == [2]
        assert out["revenue_c"].tolist() == [9000 + 10000]


class TestTimeToConvert:
    def test_conversion_lag_buckets(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_time_to_convert

        hr = 3600 * 1_000_000
        rows = [
            (1, 0, "view"), (1, 1 * hr + 5, "purchase"),        # 1h bucket
            (2, 0, "view"), (2, 0, "purchase"),                 # 0h bucket (same instant ok)
            (3, 5 * hr, "purchase"), (3, 6 * hr, "view"),       # purchase BEFORE view -> excluded
            (4, 0, "view"),                                     # never purchased -> excluded
            (5, 2 * hr, "purchase"),                            # never viewed -> excluded
            (6, 0, "view"), (6, hr - 1, "purchase"),            # 0h bucket (59:59.999)
        ]
        t = pa.table(
            {
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_time_to_convert(str(tmp_path)).to_pandas().set_index("hours_bucket")["n_users"]
        assert out.to_dict() == {0: 2, 1: 1}


class TestEventsBurst:
    def test_range_window_handles_gaps(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_burst

        mn = 60 * 1_000_000
        # type a: 3 events min 0, 2 events min 9 (same window: 5), 4 events min 100 (isolated)
        ts, et = [], []
        for m, c in [(0, 3), (9, 2), (100, 4)]:
            for i in range(c):
                ts.append(m * mn + i)
                et.append("a")
        # type b: 1 event per minute 0..9 -> window sum 10
        for m in range(10):
            ts.append(m * mn)
            et.append("b")
        pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us")), "event_type": pa.array(et)}), tmp_path / "events.parquet")
        out = q_events_burst(str(tmp_path)).to_pandas().set_index("event_type")["max_10min"]
        assert out["a"] == 5   # minutes 0+9 in one trailing window; min 100 isolated (4)
        assert out["b"] == 10


class TestTopTokensPerLang:
    def test_count_desc_token_asc(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_top_tokens_per_lang

        docs = [
            ("en", "a a b b c"), ("en", "a b z"),
            ("fr", "x y"), ("fr", "y"),
        ]
        t = pa.table(
            {
                "lang": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_top_tokens_per_lang(str(tmp_path)).to_pandas()
        en = out[out["lang"] == "en"].sort_values("rn")
        assert en["tok"].tolist() == ["a", "b", "c"]  # a=3, b=3 (tie: a first), c=1... 
        assert en["n"].tolist() == [3, 3, 1]
        fr = out[out["lang"] == "fr"].sort_values("rn")
        assert fr["tok"].tolist() == ["y", "x"]
        assert fr["n"].tolist() == [2, 1]


class TestOrdersExistsLateShip:
    def test_exists_collapses_to_max(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_orders_exists_late_ship

        day = 86400 * 1_000_000
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_orderdate": pa.array([10 * day, 10 * day, 10 * day], pa.timestamp("us")),
                    "o_orderpriority": pa.array(["HIGH", "HIGH", "LOW"]),
                }
            ),
            tmp_path / "orders.parquet",
        )
        li = [(1, 9), (1, 11), (2, 10), (2, 8), (3, 15)]  # order1 late, order2 never late (== not >), order3 late
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([a for a, _ in li], pa.int64()),
                    "l_shipdate": pa.array([d * day for _, d in li], pa.timestamp("us")),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = q_orders_exists_late_ship(str(tmp_path)).to_pandas().set_index("o_orderpriority")["n_orders"]
        assert out.to_dict() == {"HIGH": 1, "LOW": 1}


class TestDocLengthDeciles:
    def test_histogram_only_ntile_matches_rowlevel(self, ray_session, tmp_path):
        """Heavy ties straddling tile boundaries: the histogram-only tile
        stats equal a row-level NTILE reference."""
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_length_deciles

        rng = np.random.default_rng(5)
        n_chars = rng.integers(10, 14, 47)  # only 4 distinct values, 47 rows
        t = pa.table({"doc_id": pa.array(range(47), pa.int64()), "n_chars": pa.array(n_chars, pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_doc_length_deciles(str(tmp_path)).set_index("decile")

        v = np.sort(n_chars)
        q, r = divmod(47, 10)
        sizes = [q + 1 if i <= r else q for i in range(1, 11)]
        pos = 0
        for tile, sz in zip(range(1, 11), sizes):
            seg = v[pos : pos + sz]
            pos += sz
            assert out.loc[tile, "n_docs"] == sz
            assert out.loc[tile, "sum_chars"] == seg.sum()
            assert out.loc[tile, "min_chars"] == seg.min()
            assert out.loc[tile, "max_chars"] == seg.max()

    def test_fewer_rows_than_tiles(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_length_deciles

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "n_chars": pa.array([5, 7, 7], pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_doc_length_deciles(str(tmp_path))
        assert out["decile"].tolist() == [1, 2, 3]  # only 3 non-empty tiles
        assert out["n_docs"].tolist() == [1, 1, 1]
        assert out["min_chars"].tolist() == [5, 7, 7]


class TestEventsDayOverDay:
    def test_lag_over_present_days(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_day_over_day

        day = 86400 * 1_000_000
        ts, et = [], []
        for d, c in [(0, 10), (1, 15), (3, 6)]:  # day 2 missing: LAG is day 1
            for i in range(c):
                ts.append(d * day + i)
                et.append("a")
        pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us")), "event_type": pa.array(et)}), tmp_path / "events.parquet")
        out = q_events_day_over_day(str(tmp_path)).to_pandas().sort_values("day")
        assert out["day"].tolist() == [1, 3]  # first day has no prev
        assert out["chg_6dp"].tolist() == [500000, -600000]  # +50%, -60%

class TestEventsHistogram:
    def test_equi_width_bins_and_top_edge(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_histogram

        vals = [0.0, 0.5, 5.0, 10.0, 10.0, 9.99]  # lo=0 hi=10, width 0.5/bin
        t = pa.table({"event_type": pa.array(["a"] * 6), "value": pa.array(vals, pa.float64())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_histogram(str(tmp_path)).to_pandas().set_index("bin")["n_events"]
        # width 0.5: 0.0->bin0, 0.5->bin1, 5.0->bin10, 9.99->bin19, 10.0 (top edge) clamps to 19
        assert out[0] == 1 and out[1] == 1 and out[10] == 1
        assert out[19] == 3
        assert out.sum() == 6

    def test_reference_binning(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_histogram

        rng = np.random.default_rng(3)
        vals = rng.uniform(-5, 7, 300)
        et = rng.choice(["a", "b"], 300)
        t = pa.table({"event_type": pa.array(et), "value": pa.array(vals, pa.float64())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = q_events_histogram(str(tmp_path)).to_pandas()
        lo, hi = vals.min(), vals.max()
        b = np.minimum(np.floor((vals - lo) * 20.0 / (hi - lo)), 19).astype(int)
        want = pd.DataFrame({"event_type": et, "bin": b}).groupby(["event_type", "bin"]).size()
        got = out.set_index(["event_type", "bin"])["n_events"].sort_index()
        assert got.to_dict() == want.to_dict()


class TestCustOrderDistribution:
    def test_distribution_with_zero_bucket(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_cust_order_distribution

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "c_name": pa.array([f"c{i}" for i in range(5)]),
                    "c_nationkey": pa.array([0] * 5, pa.int32()),
                    "c_acctbal": pa.array([0.0] * 5, pa.float64()),
                    "c_mktsegment": pa.array(["X"] * 5),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
                    "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = q_cust_order_distribution(str(tmp_path)).to_pandas().set_index("c_count")["custdist"]
        # cust1: 3 orders, cust2/3: 1 each, cust4/5: zero
        assert out.to_dict() == {3: 1, 1: 2, 0: 2}

    def test_no_zero_bucket_when_all_active(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_cust_order_distribution

        pq.write_table(pa.table({"c_custkey": pa.array([1, 2], pa.int64())}), tmp_path / "customer.parquet")
        pq.write_table(
            pa.table({"o_orderkey": pa.array([10, 11], pa.int64()), "o_custkey": pa.array([1, 2], pa.int64())}),
            tmp_path / "orders.parquet",
        )
        out = q_cust_order_distribution(str(tmp_path)).to_pandas()
        assert out.set_index("c_count")["custdist"].to_dict() == {1: 2}


class TestSmallQtyRevenue:
    def test_correlated_avg_cross_multiply(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_small_qty_revenue

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_brand": pa.array(["Brand#2", "Brand#3"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        # part1 (Brand#2): qtys 1,10,10,10 -> avg 7.75, 0.2*avg = 1.55;
        # only the qty-1 row qualifies (5*100*4=2000 < 3100). part2 rows
        # would qualify but the brand filter excludes them.
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
                    "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 1.0], pa.float64()),
                    "l_extendedprice": pa.array([100.0, 5.0, 5.0, 5.0, 999.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = q_small_qty_revenue(str(tmp_path)).to_pandas()
        assert out["revenue_c"].tolist() == [10000]

    def test_boundary_excluded(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_small_qty_revenue

        pq.write_table(
            pa.table({"p_partkey": pa.array([1], pa.int64()), "p_brand": pa.array(["Brand#2"])}),
            tmp_path / "part.parquet",
        )
        # qtys 1,4: avg 2.5, 0.2*avg = 0.5 exactly == qty... no: qty 1 > 0.5.
        # constant qtys: avg == qty, 0.2*avg < qty -> nothing qualifies
        pq.write_table(
            pa.table(
                {
                    "l_partkey": pa.array([1, 1], pa.int64()),
                    "l_quantity": pa.array([5.0, 5.0], pa.float64()),
                    "l_extendedprice": pa.array([10.0, 10.0], pa.float64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = q_small_qty_revenue(str(tmp_path)).to_pandas()
        assert out["revenue_c"].tolist() == [0]


class TestOnlyLateSupplier:
    def test_exists_not_exists_collapse(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_only_late_supplier

        base = pd.Timestamp("2020-01-01")
        late = base + pd.Timedelta(days=61)
        ontime = base + pd.Timedelta(days=60)  # boundary: NOT late (strict >)
        # order 1: supp 1 late, supp 2 on time -> supp 1 qualifies
        # order 2: supp 1 late, supp 2 late   -> nobody (two late suppliers)
        # order 3: supp 1 late, sole supplier -> nobody (EXISTS other fails)
        # order 4: supp 2 late, supp 3 on time -> supp 2 qualifies
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
                "l_suppkey": [1, 2, 1, 2, 1, 2, 3],
                "l_shipdate": [late, ontime, late, late, late, late, ontime],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "o_orderdate": pa.array([base] * 4, pa.timestamp("us")),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1, 2, 3], pa.int64()), "s_name": pa.array(["s1", "s2", "s3"])}),
            tmp_path / "supplier.parquet",
        )
        out = q_only_late_supplier(str(tmp_path)).sort_values("s_suppkey")
        assert out.set_index("s_suppkey")["numwait"].to_dict() == {1: 1, 2: 1}
        assert out.set_index("s_suppkey")["s_name"].to_dict() == {1: "s1", 2: "s2"}

    def test_empty_when_nobody_qualifies(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_only_late_supplier

        base = pd.Timestamp("2020-01-01")
        ontime = base + pd.Timedelta(days=10)
        li = pd.DataFrame({"l_orderkey": [1, 1], "l_suppkey": [1, 2], "l_shipdate": [ontime, ontime]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        pq.write_table(
            pa.table({"o_orderkey": pa.array([1], pa.int64()), "o_orderdate": pa.array([base], pa.timestamp("us"))}),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1, 2], pa.int64()), "s_name": pa.array(["s1", "s2"])}),
            tmp_path / "supplier.parquet",
        )
        out = q_only_late_supplier(str(tmp_path))
        assert out.num_rows == 0
        assert out.column_names == ["s_suppkey", "s_name", "numwait"]


class TestRichInactiveCusts:
    def test_scalar_threshold_and_anti_join(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_rich_inactive_custs

        # positive balances: 100, 300, 200 -> avg 200; strict >: only c2 (300).
        # c4 (200) sits exactly on the average -> excluded (cross-multiply strict).
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "c_nationkey": pa.array([7, 8, 9, 9], pa.int32()),
                    "c_acctbal": pa.array([100.0, 300.0, -50.0, 200.0], pa.float64()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        # c2 has only a LOW order -> passes NOT EXISTS(urgent); c4 has an urgent one
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11], pa.int64()),
                    "o_custkey": pa.array([2, 4], pa.int64()),
                    "o_orderpriority": pa.array(["5-LOW", "1-URGENT"]),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = q_rich_inactive_custs(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [{"c_nationkey": 8, "numcust": 1, "totacctbal_c": 30000}]


def _write_nation_region(tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 7], pa.int64()),
                "n_name": pa.array(["N0", "N1", "N7"]),
                "n_regionkey": pa.array([0, 2, 2], pa.int32()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table({"r_regionkey": pa.array([0, 2], pa.int64()), "r_name": pa.array(["AFRICA", "ASIA"])}),
        tmp_path / "region.parquet",
    )


class TestNationPairVolume:
    def test_chain_and_same_nation_excluded(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_nation_pair_volume

        _write_nation_region(tmp_path)
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1, 2], pa.int64()), "s_nationkey": pa.array([0, 1], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([5, 6], pa.int64()), "c_nationkey": pa.array([1, 0], pa.int32())}),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11], pa.int64()),
                    "o_custkey": pa.array([5, 6], pa.int64()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        in_win = pd.Timestamp("1996-06-01")
        out_win = pd.Timestamp("1999-06-01")
        # (supp0 -> cust@N1): 100 + 50; (supp1 -> cust@N1) SAME nation -> excluded;
        # out-of-window row excluded
        li = pd.DataFrame(
            {
                "l_orderkey": [10, 10, 10, 10],
                "l_suppkey": [1, 1, 2, 1],
                "l_extendedprice": [100.0, 50.0, 77.0, 999.0],
                "l_discount": [0.0, 0.0, 0.0, 0.0],
                "l_shipdate": [in_win, in_win, in_win, out_win],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_nation_pair_volume(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [
            {"supp_nation": "N0", "cust_nation": "N1", "l_year": 1996, "revenue_c": 15000}
        ]


class TestNationMarketShare:
    def test_ppm_share(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_nation_market_share

        _write_nation_region(tmp_path)
        # supplier 1 in the SHARE nation (7), supplier 2 not; cust 5 in ASIA, cust 6 in AFRICA
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1, 2], pa.int64()), "s_nationkey": pa.array([7, 0], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([5, 6], pa.int64()), "c_nationkey": pa.array([1, 0], pa.int32())}),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11], pa.int64()),
                    "o_custkey": pa.array([5, 6], pa.int64()),
                    "o_orderdate": pa.array([pd.Timestamp("1996-03-01")] * 2, pa.timestamp("us")),
                }
            ),
            tmp_path / "orders.parquet",
        )
        # ASIA order 10: share-nation rev 100 of 300 total -> 333333 ppm;
        # AFRICA order 11 ignored entirely
        li = pd.DataFrame(
            {
                "l_orderkey": [10, 10, 11],
                "l_suppkey": [1, 2, 1],
                "l_extendedprice": [100.0, 200.0, 500.0],
                "l_discount": [0.0, 0.0, 0.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_nation_market_share(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [{"o_year": 1996, "share_ppm": 333333}]


class TestPartProfitByNation:
    def test_name_filter_and_attribution(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_part_profit_by_nation

        _write_nation_region(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["hot gear", "red widget"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1], pa.int64()), "s_nationkey": pa.array([1], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10], pa.int64()),
                    "o_orderdate": pa.array([pd.Timestamp("1997-02-01")], pa.timestamp("us")),
                }
            ),
            tmp_path / "orders.parquet",
        )
        li = pd.DataFrame(
            {
                "l_orderkey": [10, 10],
                "l_partkey": [1, 2],  # only the 'gear' part counts
                "l_suppkey": [1, 1],
                "l_extendedprice": [40.0, 999.0],
                "l_discount": [0.5, 0.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_part_profit_by_nation(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [{"nation": "N1", "o_year": 1997, "profit_c": 2000}]


class TestReturnedItemCustomers:
    def test_flag_window_and_decorate(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_returned_item_customers

        _write_nation_region(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([5, 6], pa.int64()),
                    "c_name": pa.array(["cA", "cB"]),
                    "c_nationkey": pa.array([1, 0], pa.int32()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11], pa.int64()),
                    "o_custkey": pa.array([5, 6], pa.int64()),
                    # order 11 is outside 1996Q1 -> dropped
                    "o_orderdate": pa.array(
                        [pd.Timestamp("1996-02-01"), pd.Timestamp("1996-05-01")], pa.timestamp("us")
                    ),
                }
            ),
            tmp_path / "orders.parquet",
        )
        li = pd.DataFrame(
            {
                "l_orderkey": [10, 10, 11],
                "l_extendedprice": [100.0, 60.0, 500.0],
                "l_discount": [0.0, 0.5, 0.0],
                "l_returnflag": ["R", "R", "R"],
            }
        )
        li.loc[1, "l_returnflag"] = "N"  # non-returned line dropped
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_returned_item_customers(str(tmp_path))
        assert out.to_dict("records") == [
            {"c_custkey": 5, "revenue_c": 10000, "c_name": "cA", "nation_name": "N1"}
        ]


class TestLatePriorityCounts:
    def test_class_and_priority_bands(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_late_priority_counts

        base = pd.Timestamp("2020-01-01")
        late = base + pd.Timedelta(days=61)
        ontime = base + pd.Timedelta(days=60)  # boundary: NOT late
        # order 1: one late line, URGENT -> late/high; order 2: ontime, LOW -> ontime/low
        # order 3: ontime, 2-HIGH -> ontime/high
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 3],
                "l_shipdate": [ontime, late, ontime, ontime],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_orderdate": pa.array([base] * 3, pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "2-HIGH"]),
                }
            ),
            tmp_path / "orders.parquet",
        )
        out = q_late_priority_counts(str(tmp_path)).to_pandas().set_index("lateness")
        assert out.loc["late"].to_dict() == {"high_orders": 1, "low_orders": 0}
        assert out.loc["ontime"].to_dict() == {"high_orders": 1, "low_orders": 1}


class TestTopSupplierRevenue:
    def test_tie_safe_max(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_top_supplier_revenue

        pq.write_table(
            pa.table(
                {"s_suppkey": pa.array([1, 2, 3], pa.int64()), "s_name": pa.array(["s1", "s2", "s3"])}
            ),
            tmp_path / "supplier.parquet",
        )
        in_win = pd.Timestamp("1996-02-01")
        out_win = pd.Timestamp("1997-02-01")
        # supp1: 100, supp2: 60+40=100 (TIE), supp3: 999 but out of window
        li = pd.DataFrame(
            {
                "l_suppkey": [1, 2, 2, 3],
                "l_extendedprice": [100.0, 60.0, 40.0, 999.0],
                "l_discount": [0.0, 0.0, 0.0, 0.0],
                "l_shipdate": [in_win, in_win, in_win, out_win],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_top_supplier_revenue(str(tmp_path))
        assert out.to_dict("records") == [
            {"s_suppkey": 1, "s_name": "s1", "total_revenue_c": 10000},
            {"s_suppkey": 2, "s_name": "s2", "total_revenue_c": 10000},
        ]

    def test_empty_window(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_top_supplier_revenue

        pq.write_table(
            pa.table({"s_suppkey": pa.array([1], pa.int64()), "s_name": pa.array(["s1"])}),
            tmp_path / "supplier.parquet",
        )
        li = pd.DataFrame(
            {
                "l_suppkey": [1],
                "l_extendedprice": [10.0],
                "l_discount": [0.0],
                "l_shipdate": [pd.Timestamp("1999-01-01")],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_top_supplier_revenue(str(tmp_path))
        assert out.num_rows == 0
        assert out.column_names == ["s_suppkey", "s_name", "total_revenue_c"]


class TestHardNegatives:
    def test_same_label_excluded(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.functions.similarity import brute_force_topk
        import ray.data as rd

        # query 0 (label 0): vec 1 is identical (label 0 -> excluded),
        # vec 2 is orthogonal-ish but label 1 -> the only candidate
        emb = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())),
                "label": pa.array([0, 0, 1], pa.int32()),
            }
        )
        pq.write_table(emb, tmp_path / "embeddings.parquet")
        ds = rd.read_parquet(str(tmp_path / "embeddings.parquet"))
        out = brute_force_topk(ds, query_ids=[0], k=3, exclude_same_label=True).to_pandas()
        assert out["neighbor_id"].tolist() == [2]
        assert out["rank"].tolist() == [1]
        # without the constraint the identical same-label vector wins
        base = brute_force_topk(ds, query_ids=[0], k=1).to_pandas()
        assert base["neighbor_id"].tolist() == [1]


class TestVocabGrowth:
    def test_first_appearance_cumsum(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_vocab_growth

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                # doc0 introduces {a,b}; doc1 nothing new; doc2 {c};
                # doc3 nothing new (whitespace-only tokens ignored)
                "text": pa.array(["a b a", "b  a", "c a", " b c "]),
            }
        )
        pq.write_table(docs, tmp_path / "documents.parquet")
        out = q_vocab_growth(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [
            {"first_doc": 0, "vocab_size": 2},
            {"first_doc": 2, "vocab_size": 3},
        ]


class TestEventsUnpivot:
    def test_roundtrip_equals_group_counts(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_unpivot

        ev = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "event_type": pa.array(["click", "click", "view", "error"]),
            }
        )
        pq.write_table(ev, tmp_path / "events.parquet")
        out = q_events_unpivot(str(tmp_path)).to_pandas().sort_values(["user_id", "event_type"])
        # zero cells dropped; melt equals the long groupby counts
        assert out.to_dict("records") == [
            {"user_id": 1, "event_type": "click", "n": 2},
            {"user_id": 1, "event_type": "view", "n": 1},
            {"user_id": 2, "event_type": "error", "n": 1},
        ]


class TestSourceChecksum:
    def test_order_and_partition_independent(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_source_checksum

        docs = pa.table(
            {
                "doc_id": pa.array([3, 1, 2], pa.int64()),
                "n_chars": pa.array([30, 10, 20], pa.int64()),
                "source": pa.array(["a", "a", "b"]),
            }
        )
        pq.write_table(docs, tmp_path / "documents.parquet")
        out1 = q_source_checksum(str(tmp_path)).to_pandas().set_index("source")
        # same rows, different on-disk order -> identical checksums
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "n_chars": pa.array([10, 20, 30], pa.int64()),
                    "source": pa.array(["a", "b", "a"]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out2 = q_source_checksum(str(tmp_path)).to_pandas().set_index("source")
        assert out1["checksum"].to_dict() == out2["checksum"].to_dict()
        assert out1["n_docs"].to_dict() == {"a": 2, "b": 1}
        # a one-character content change flips the source's checksum
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "n_chars": pa.array([11, 20, 30], pa.int64()),
                    "source": pa.array(["a", "b", "a"]),
                }
            ),
            tmp_path / "documents.parquet",
        )
        out3 = q_source_checksum(str(tmp_path)).to_pandas().set_index("source")
        assert out3.loc["a", "checksum"] != out1.loc["a", "checksum"]
        assert out3.loc["b", "checksum"] == out1.loc["b", "checksum"]


class TestEventsAnomalyDays:
    def test_exact_integer_threshold(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_anomaly_days

        # 9 quiet days of 10 events + one day of 100: only the spike is
        # > mean + 2*sd (mean=19, sd~28.5 -> threshold ~76)
        days = []
        for d in range(9):
            days += [pd.Timestamp("2020-01-01") + pd.Timedelta(days=d, hours=h % 24) for h in range(10)]
        days += [pd.Timestamp("2020-01-10") + pd.Timedelta(hours=h % 24) for h in range(100)]
        pq.write_table(
            pa.table({"ts": pa.array(days, pa.timestamp("us"))}), tmp_path / "events.parquet"
        )
        out = q_events_anomaly_days(str(tmp_path)).to_pandas()
        spike_day = int(pd.Timestamp("2020-01-10").timestamp() // 86400)
        assert out.to_dict("records") == [{"day": spike_day, "n_events": 100}]

    def test_uniform_has_no_anomaly(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_events_anomaly_days

        days = [pd.Timestamp("2020-01-01") + pd.Timedelta(days=d) for d in range(5)]
        pq.write_table(pa.table({"ts": pa.array(days, pa.timestamp("us"))}), tmp_path / "events.parquet")
        out = q_events_anomaly_days(str(tmp_path))
        assert out.num_rows == 0


class TestMinCostSupplier:
    def test_min_cost_with_tie_and_region_filter(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_min_cost_supplier

        _write_nation_region(tmp_path)  # N0->AFRICA, N1/N7->ASIA... no EUROPE yet
        # extend: nation 1 mapped to EUROPE for this test
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1], pa.int64()),
                    "n_name": pa.array(["N0", "N1"]),
                    "n_regionkey": pa.array([0, 3], pa.int32()),
                }
            ),
            tmp_path / "nation.parquet",
        )
        pq.write_table(
            pa.table({"r_regionkey": pa.array([0, 3], pa.int64()), "r_name": pa.array(["AFRICA", "EUROPE"])}),
            tmp_path / "region.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["hot gear", "hot gear"]),
                    "p_size": pa.array([15, 7], pa.int32()),  # part 2 wrong size
                }
            ),
            tmp_path / "part.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                    "s_name": pa.array(["s1", "s2", "s3"]),
                    "s_nationkey": pa.array([1, 1, 0], pa.int32()),  # s3 not EUROPE
                    "s_acctbal": pa.array([50.0, 90.0, 10.0], pa.float64()),
                }
            ),
            tmp_path / "supplier.parquet",
        )
        # part 1: s1 min price 100 (TIE with s2), s3 cheaper (50) but non-EU
        li = pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 1, 2],
                "l_suppkey": [1, 1, 2, 3, 1],
                "l_extendedprice": [100.0, 120.0, 100.0, 50.0, 5.0],
                "l_quantity": [1.0] * 5,
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_min_cost_supplier(str(tmp_path))
        # both tie-winners, ordered by balance desc
        assert out.to_dict("records") == [
            {"p_partkey": 1, "s_suppkey": 2, "cost_c": 10000, "s_name": "s2", "bal_c": 9000, "nation_name": "N1"},
            {"p_partkey": 1, "s_suppkey": 1, "cost_c": 10000, "s_name": "s1", "bal_c": 5000, "nation_name": "N1"},
        ]


class TestImportantStock:
    def test_threshold_cross_multiply(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_important_stock

        pq.write_table(
            pa.table({"s_suppkey": pa.array([1, 2], pa.int64()), "s_nationkey": pa.array([7, 0], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        # nation-7 pairs: part1 value 100*10=1000c*... part1: price 1.0 qty 10 -> 100c*10=1000
        # part2: price 1.0 qty 1 -> 100; total 1100; threshold value*10000>1100
        # both pass (1000*10000 and 100*10000 > 1100) — verify ordering too;
        # supplier 2's pair ignored
        li = pd.DataFrame(
            {
                "l_partkey": [1, 2, 3],
                "l_suppkey": [1, 1, 2],
                "l_extendedprice": [1.0, 1.0, 9.0],
                "l_quantity": [10.0, 1.0, 9.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_important_stock(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [
            {"p_partkey": 1, "value_c": 1000},
            {"p_partkey": 2, "value_c": 100},
        ]


class TestDominantSuppliers:
    def test_volume_share_threshold(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_dominant_suppliers

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["hot gear", "red widget"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                    "s_name": pa.array(["s1", "s2", "s3"]),
                    "s_nationkey": pa.array([7, 7, 0], pa.int32()),
                }
            ),
            tmp_path / "supplier.parquet",
        )
        # gear part 1 volumes: s1=50, s2=5, s3=45 (total 100).
        # >10% passes: s1 (50) and s3 (45) — but s3 isn't nation 7.
        # s2 (5%) fails. widget part 2 excluded by the name filter.
        li = pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 2],
                "l_suppkey": [1, 2, 3, 2],
                "l_extendedprice": [1.0] * 4,
                "l_quantity": [50.0, 5.0, 45.0, 99.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_dominant_suppliers(str(tmp_path))
        assert out.to_dict("records") == [{"s_suppkey": 1, "s_name": "s1", "n_parts_dominated": 1}]

    def test_empty_when_no_qualifier(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_dominant_suppliers

        pq.write_table(
            pa.table({"p_partkey": pa.array([1], pa.int64()), "p_name": pa.array(["hot gear"])}),
            tmp_path / "part.parquet",
        )
        pq.write_table(
            pa.table(
                {"s_suppkey": pa.array([1], pa.int64()), "s_name": pa.array(["s1"]), "s_nationkey": pa.array([0], pa.int32())}
            ),
            tmp_path / "supplier.parquet",
        )
        li = pd.DataFrame({"l_partkey": [1], "l_suppkey": [1], "l_extendedprice": [1.0], "l_quantity": [1.0]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_dominant_suppliers(str(tmp_path))
        assert out.num_rows == 0
        assert out.column_names == ["s_suppkey", "s_name", "n_parts_dominated"]


class TestDocFluency:
    def test_smoothed_bigram_terms(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_fluency

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                # corpus bigrams: (a,b) x3, (b,a) x1; contexts a:3 b:1; V=3 (a,b,z)
                "text": pa.array(["a b a b", "a b", "z"]),
            }
        )
        pq.write_table(docs, tmp_path / "documents.parquet")
        out = q_doc_fluency(str(tmp_path)).to_pandas().set_index("doc_id")["fluency_ppm"]
        # doc0 terms: (a,b)=round(1e6*4/6)=666667, (b,a)=round(1e6*2/4)=500000,
        # (a,b)=666667 -> mean round(1833334/3)=611111
        # doc1: single (a,b) term -> 666667; doc2: no bigram -> excluded
        assert out.to_dict() == {0: 611111, 1: 666667}


class TestTopCustomersEmpty:
    def test_empty_orders_keeps_schema(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_top_customers

        pq.write_table(
            pa.table({"o_custkey": pa.array([], pa.int64()), "o_totalprice": pa.array([], pa.float64())}),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1], pa.int64()),
                    "c_name": pa.array(["c1"]),
                    "c_nationkey": pa.array([0], pa.int32()),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table({"n_nationkey": pa.array([0], pa.int64()), "n_name": pa.array(["N0"])}),
            tmp_path / "nation.parquet",
        )
        out = q_top_customers(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == ["o_custkey", "total_spent", "n_orders", "c_name", "nation_name"]


class TestSortedPage:
    def test_offset_slice_of_global_order(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_sorted_page

        # 150 docs, n_chars descending by construction: page 2 is doc_ids 100..149
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(150)), pa.int64()),
                "lang": pa.array(["en"] * 150),
                "n_chars": pa.array([1000 - i for i in range(150)], pa.int64()),
            }
        )
        pq.write_table(docs, tmp_path / "documents.parquet")
        out = q_sorted_page(str(tmp_path))
        assert out["doc_id"].tolist() == list(range(100, 150))
        assert out["n_chars"].iloc[0] == 900


class TestSupplierPagerank:
    def test_matches_local_integer_iteration(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_supplier_pagerank

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3], pa.int64()),
                    "p_name": pa.array(["hot gear", "cold gear", "red widget"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        # gear part 1 <-> supps {1,2}; gear part 2 <-> supp {1}; widget ignored
        li = pd.DataFrame({"l_partkey": [1, 1, 2, 3], "l_suppkey": [1, 2, 1, 9]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_supplier_pagerank(str(tmp_path)).to_pandas()

        # local reference: same integer update rule over the same graph
        edges = [(2, 3), (3, 2), (2, 5), (5, 2), (4, 3), (3, 4)]
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        out_deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
        r = {n: 1_000_000_000 for n in nodes}
        for _ in range(5):
            s = {n: 0 for n in nodes}
            for a, b in edges:
                s[b] += int(np.floor(abs(0.85 * r[a] / out_deg[a]) + 0.5))
            r = {n: 150_000_000 + s[n] for n in nodes}
        want = sorted(
            (((n - 1) // 2, r[n]) for n in nodes if n % 2 == 1), key=lambda kv: (-kv[1], kv[0])
        )
        assert list(zip(out["s_suppkey"], out["rank_nano"])) == want
        # supplier 1 serves both gear parts -> outranks supplier 2
        assert out.iloc[0]["s_suppkey"] == 1

    def test_dangling_graph_rejected(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank_exact

        edges = rd.from_arrow(
            pa.table({"src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())})
        )
        with pytest.raises(ValueError, match="dangling-free"):
            pagerank_exact(edges)

    def test_distributed_path_bit_identical_to_local(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank_exact

        rng = np.random.default_rng(11)
        src = rng.integers(0, 30, 120).astype(np.int64)
        dst = rng.integers(0, 30, 120).astype(np.int64)
        keep = src != dst
        # bidirectional -> dangling-free
        edges = pa.table(
            {
                "src": pa.array(np.concatenate([src[keep], dst[keep]]), pa.int64()),
                "dst": pa.array(np.concatenate([dst[keep], src[keep]]), pa.int64()),
            }
        )
        local = pagerank_exact(rd.from_arrow(edges)).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            pagerank_exact(rd.from_arrow(edges), max_local_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        # EXACT claim: integer arithmetic makes both paths bit-identical
        assert local.to_dict("records") == dist.to_dict("records")


class TestSupplierReach:
    def test_hop_histogram(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_supplier_reach

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["hot gear", "cold gear"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        # chain: supp1(N7, seed) - part1 - supp2 - part2 - supp3... need
        # shared parts: part1 <-> {supp1, supp2}; part2 <-> {supp2, supp3}
        li = pd.DataFrame({"l_partkey": [1, 1, 2, 2], "l_suppkey": [1, 2, 2, 3]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        pq.write_table(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                    "s_nationkey": pa.array([7, 0, 0], pa.int32()),
                }
            ),
            tmp_path / "supplier.parquet",
        )
        out = q_supplier_reach(str(tmp_path)).to_pandas().set_index("d")["n_nodes"].to_dict()
        # d0: supp1; d1: part1; d2: supp2; d3: part2 (supp3 is 4 hops away)
        assert out == {0: 1, 1: 1, 2: 1, 3: 1}

    def test_distributed_path_bit_identical_to_local(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import bfs_hops

        rng = np.random.default_rng(5)
        src = rng.integers(0, 25, 80).astype(np.int64)
        dst = rng.integers(0, 25, 80).astype(np.int64)
        keep = src != dst
        edges = pa.table({"src": pa.array(src[keep], pa.int64()), "dst": pa.array(dst[keep], pa.int64())})
        seeds = pa.table({"node": pa.array([0, 7], pa.int64())})
        local = bfs_hops(rd.from_arrow(edges), rd.from_arrow(seeds)).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            bfs_hops(rd.from_arrow(edges), rd.from_arrow(seeds), max_local_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert local.to_dict("records") == dist.to_dict("records")


class TestSupplierHits:
    def test_matches_local_integer_iteration(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_supplier_hits

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["hot gear", "cold gear"]),
                }
            ),
            tmp_path / "part.parquet",
        )
        # supp1 serves both gear parts, supp2 only part1
        li = pd.DataFrame({"l_partkey": [1, 1, 2], "l_suppkey": [1, 2, 1]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_supplier_hits(str(tmp_path)).to_pandas()

        edges = [(2, 3), (3, 2), (2, 5), (5, 2), (4, 3), (3, 4)]
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        hub = {n: 1_000_000_000 for n in nodes}
        for _ in range(4):
            a_raw = {n: 0 for n in nodes}
            for s_, d_ in edges:
                a_raw[d_] += hub[s_]
            h_raw = {n: 0 for n in nodes}
            for s_, d_ in edges:
                h_raw[s_] += a_raw[d_]
            am, hm = max(a_raw.values()), max(h_raw.values())
            auth = {n: int(np.floor(abs(1e9 * a_raw[n] / am) + 0.5)) for n in nodes}
            hub = {n: int(np.floor(abs(1e9 * h_raw[n] / hm) + 0.5)) for n in nodes}
        want = sorted((((n - 1) // 2, auth[n]) for n in nodes if n % 2 == 1), key=lambda kv: (-kv[1], kv[0]))
        assert list(zip(out["s_suppkey"], out["auth_nano"])) == want
        # supp1 (both parts) is the stronger authority
        assert out.iloc[0]["s_suppkey"] == 1 and out.iloc[0]["auth_nano"] == 1_000_000_000

    def test_distributed_path_bit_identical_to_local(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import hits_exact

        rng = np.random.default_rng(3)
        src = rng.integers(0, 20, 60).astype(np.int64)
        dst = rng.integers(0, 20, 60).astype(np.int64)
        keep = src != dst
        edges = pa.table(
            {
                "src": pa.array(np.concatenate([src[keep], dst[keep]]), pa.int64()),
                "dst": pa.array(np.concatenate([dst[keep], src[keep]]), pa.int64()),
            }
        )
        local = hits_exact(rd.from_arrow(edges)).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            hits_exact(rd.from_arrow(edges), max_local_edges=0).to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert local.to_dict("records") == dist.to_dict("records")


class TestReviewRegressionsLate:
    def test_pagerank_exact_asymmetric_dangling_free(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import pagerank_exact

        # every node has outdeg >= 1 but node 3 has NO in-edges: the
        # distributed loop must keep it (and its contributions) alive
        edges = pa.table({"src": pa.array([3, 1, 2], pa.int64()), "dst": pa.array([1, 2, 1], pa.int64())})
        local = pagerank_exact(rd.from_arrow(edges)).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            pagerank_exact(rd.from_arrow(edges), max_local_edges=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert local.to_dict("records") == dist.to_dict("records")
        assert set(local["node"]) == {1, 2, 3}

    def test_hits_rejects_asymmetric_graph(self, ray_session):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.graph import hits_exact

        edges = pa.table({"src": pa.array([1, 2, 1], pa.int64()), "dst": pa.array([2, 1, 3], pa.int64())})
        with pytest.raises(ValueError, match="in- and out-edges"):
            hits_exact(rd.from_arrow(edges))  # local path
        with pytest.raises(ValueError, match="in- and out-edges"):
            hits_exact(rd.from_arrow(edges), max_local_edges=0)  # distributed path

    def test_market_share_empty_window(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_nation_market_share

        _write_nation_region(tmp_path)
        pq.write_table(
            pa.table({"s_suppkey": pa.array([1], pa.int64()), "s_nationkey": pa.array([7], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([5], pa.int64()), "c_nationkey": pa.array([1], pa.int32())}),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10], pa.int64()),
                    "o_custkey": pa.array([5], pa.int64()),
                    "o_orderdate": pa.array([pd.Timestamp("1999-01-01")], pa.timestamp("us")),  # outside window
                }
            ),
            tmp_path / "orders.parquet",
        )
        li = pd.DataFrame({"l_orderkey": [10], "l_suppkey": [1], "l_extendedprice": [1.0], "l_discount": [0.0]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_nation_market_share(str(tmp_path))
        assert out.num_rows == 0
        assert out.column_names == ["o_year", "share_ppm"]

    def test_important_stock_no_nation_pairs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_important_stock

        pq.write_table(
            pa.table({"s_suppkey": pa.array([1], pa.int64()), "s_nationkey": pa.array([0], pa.int32())}),
            tmp_path / "supplier.parquet",
        )
        li = pd.DataFrame({"l_partkey": [1], "l_suppkey": [1], "l_extendedprice": [1.0], "l_quantity": [1.0]})
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), tmp_path / "lineitem.parquet")
        out = q_important_stock(str(tmp_path))
        assert out.num_rows == 0
        assert out.column_names == ["p_partkey", "value_c"]


class TestGopherRules:
    def _score(self, texts):
        from goto_eater_crawler_ray.functions.text import gopher_rules_batch

        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())})
        return gopher_rules_batch(t).to_pandas().set_index("doc_id")

    def test_each_rule_gates_independently(self):
        passing = " ".join((["alpha", "table", "merge", "scan"] * 8)[:30] + ["the", "a"])  # 32 words, all len<=5
        out = self._score(
            [
                passing,  # 0: passes every rule
                "the a " + " ".join(["scan"] * 10),  # 1: only 12 words -> word-count fail
                passing + " extraordinary",  # 2: a 13-char word -> max-word-len fail
                " ".join((["alpha", "table", "merge", "scan"] * 8)[:32]),  # 3: no stopwords
                "the a " + " ".join(["ab"] * 30),  # 4: mean word len 2.0 -> band fail
            ]
        )
        assert out.loc[0, "gopher_pass"] == 1
        assert list(out["gopher_pass"]) == [1, 0, 0, 0, 0]
        assert out.loc[2, "max_word_len"] == 13
        assert out.loc[3, "n_stop"] == 0

    def test_zero_word_doc_guards(self):
        out = self._score(["   ", ""])
        assert list(out["n_words"]) == [0, 0]
        assert list(out["mean_word_len"]) == [0.0, 0.0]
        assert list(out["max_word_len"]) == [0, 0]
        assert list(out["gopher_pass"]) == [0, 0]

    def test_empty_batch_keeps_schema(self):
        from goto_eater_crawler_ray.functions.text import gopher_rules_batch

        t = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        out = gopher_rules_batch(t)
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "n_words", "mean_word_len", "max_word_len", "n_stop", "gopher_pass"]


class TestSemanticDedup:
    def _emb_ds(self, ids, mat):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
                }
            )
        )

    def test_planted_duplicate_drops_later_id(self, ray_session):
        from goto_eater_crawler_ray.functions.dedup import semantic_dedup_keep
        from goto_eater_crawler_ray.pipelines._kmeans_frozen import CENTROIDS

        rng = np.random.default_rng(11)
        base = rng.standard_normal((4, 64))
        mat = np.vstack([base, base[1]])  # vec 4 duplicates vec 1 exactly (cos=1, same cluster)
        kept = semantic_dedup_keep(self._emb_ds([0, 1, 2, 3, 4], mat), CENTROIDS, threshold=0.95).to_pandas()
        assert sorted(kept["vec_id"]) == [0, 1, 2, 3]  # the later copy (4) is the duplicate

    def test_low_threshold_keeps_cluster_first_only(self, ray_session):
        from goto_eater_crawler_ray.functions.dedup import semantic_dedup_keep
        from goto_eater_crawler_ray.pipelines._kmeans_frozen import CENTROIDS

        rng = np.random.default_rng(5)
        mat = rng.standard_normal((12, 64))
        kept = semantic_dedup_keep(self._emb_ds(list(range(12)), mat), CENTROIDS, threshold=-1.0).to_pandas()
        # threshold=-1 makes EVERY within-cluster pair a dup: exactly the
        # lowest id of each nonempty cluster survives
        C = np.asarray(CENTROIDS)
        lab = (mat @ C.T).argmax(1)
        expect = sorted(min(np.where(lab == c)[0]) for c in np.unique(lab))
        assert sorted(kept["vec_id"]) == expect

    def test_cluster_cap_raises(self, ray_session):
        from goto_eater_crawler_ray.functions.dedup import semantic_dedup_keep
        from goto_eater_crawler_ray.pipelines._kmeans_frozen import CENTROIDS

        mat = np.tile(np.random.default_rng(3).standard_normal(64), (5, 1))  # one 5-row cluster
        ds = semantic_dedup_keep(self._emb_ds(list(range(5)), mat), CENTROIDS, max_cluster_rows=3)
        with pytest.raises(Exception, match="max_cluster_rows"):
            ds.take_all()


class TestDsirImportance:
    def _docs_ds(self, texts, langs=None):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs or ["en"] * len(texts), pa.string()),
                }
            )
        )

    def test_gram_buckets_unigrams_and_bigrams(self):
        from goto_eater_crawler_ray.functions.importance import gram_buckets_batch
        from goto_eater_crawler_ray.functions.sampling import md5_u64

        t = pa.table({"text": pa.array(["a b c", "x", "  ", ""], pa.string())})
        parents, buckets = gram_buckets_batch(t, n_buckets=256)
        # doc 0: 3 unigrams + 2 bigrams; doc 1: 1 unigram; docs 2-3: none
        assert list(parents) == [0, 0, 0, 1, 0, 0]
        expect = (md5_u64(np.array(["a", "b", "c", "x", "a b", "b c"])) % np.uint64(256)).astype(np.int64)
        assert list(buckets) == list(expect)

    def test_gram_buckets_empty_batch(self):
        from goto_eater_crawler_ray.functions.importance import gram_buckets_batch

        parents, buckets = gram_buckets_batch(pa.table({"text": pa.array([], pa.string())}))
        assert len(parents) == 0 and len(buckets) == 0

    def test_weights_formula_and_overflow_guard(self):
        from goto_eater_crawler_ray.functions.importance import dsir_weights

        n_t = np.array([3, 0], np.int64)
        n_r = np.array([3, 5], np.int64)
        # B=2, T=3, R=8: w_0 = round(1e6*ln((4*10)/(4*5))), w_1 = round(1e6*ln((1*10)/(6*5)))
        w = dsir_weights(n_t, n_r)
        assert w[0] == round(np.log(40 / 20) * 1e6)
        assert w[1] == round(np.log(10 / 30) * 1e6)
        with pytest.raises(AssertionError, match="2\\^53"):
            dsir_weights(np.array([1 << 53], np.int64), np.array([1], np.int64))

    def test_distribution_and_score_end_to_end(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import (
            dsir_score,
            dsir_weights,
            gram_distribution,
        )

        texts = ["alpha beta alpha", "gamma delta", "alpha beta", "   "]
        langs = ["en", "fr", "en", "en"]
        ds = self._docs_ds(texts, langs)
        n_t, n_r = gram_distribution(ds, target_langs=("en",))
        # raw grams: doc0 3u+2b, doc1 2u+1b, doc2 2u+1b; target = docs 0,2,3
        assert int(n_r.sum()) == 11 and int(n_t.sum()) == 8
        w = dsir_weights(n_t, n_r)
        got = dsir_score(self._docs_ds(texts, langs), w).to_pandas().set_index("doc_id")["dsir_score"]
        # every doc gets a row; the gram-less doc scores exactly 0
        assert len(got) == 4 and got.loc[3] == 0
        # target-only grams carry positive weight, off-target negative:
        # the en docs outscore the fr doc
        assert got.loc[0] > got.loc[1] and got.loc[2] > got.loc[1]

    def test_score_batchsize_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import dsir_score, dsir_weights, gram_distribution

        rng = np.random.default_rng(7)
        vocab = ["tok%d" % i for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 30))) for _ in range(60)]
        langs = [("en" if i % 3 else "de") for i in range(60)]
        ds = self._docs_ds(texts, langs)
        w = dsir_weights(*gram_distribution(ds, target_langs=("en",)))
        a = dsir_score(self._docs_ds(texts, langs).repartition(1), w).to_pandas()
        b = dsir_score(self._docs_ds(texts, langs).repartition(13), w).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True), b.sort_values("doc_id").reset_index(drop=True)
        )

    def test_gumbel_matches_duckdb_expression(self):
        import duckdb

        from goto_eater_crawler_ray.functions.importance import gumbel_micro

        ids = np.arange(500, dtype=np.int64)
        got = gumbel_micro(ids)
        want = duckdb.sql(
            "SELECT CAST(round(-ln(-ln((md5_number_upper(CAST(i AS VARCHAR)) % 1000000 + 0.5) / 1000000.0)) * 1000000) AS BIGINT) AS g "
            "FROM (SELECT unnest(range(500)) AS i) ORDER BY i"
        ).df()["g"].to_numpy()
        assert (got == want).all()

    def test_resample_topk_and_small_corpus(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import (
            dsir_resample,
            dsir_weights,
            gram_distribution,
            dsir_score,
            gumbel_micro,
        )

        texts = ["alpha beta", "gamma delta", "alpha gamma", "beta beta beta"]
        ds = self._docs_ds(texts)
        w = dsir_weights(*gram_distribution(ds, target_langs=("en",)))
        out = dsir_resample(self._docs_ds(texts), w, k=2).to_pandas()
        scores = dsir_score(self._docs_ds(texts), w).to_pandas().set_index("doc_id")["dsir_score"]
        keys = scores + gumbel_micro(scores.index.to_numpy())
        expect = keys.sort_values(ascending=False).index[:2].tolist()
        assert out["doc_id"].tolist() == expect
        # k beyond the corpus returns everything
        assert len(dsir_resample(self._docs_ds(texts), w, k=99).to_pandas()) == 4


class TestNaiveBayes:
    def _docs_ds(self, texts, langs):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            )
        )

    def test_train_matches_local_counts(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import gram_buckets_batch, nb_train

        texts = ["alpha beta alpha", "gamma delta", "alpha beta", "gamma gamma epsilon"]
        langs = ["en", "fr", "en", "fr"]
        labels, w, bias = nb_train(self._docs_ds(texts, langs), label_col="lang", n_buckets=16)
        assert labels == ["en", "fr"]
        # local reference: dense per-class bucket counts over the same grams
        counts = np.zeros((2, 16), np.int64)
        for i, (txt, lang) in enumerate(zip(texts, langs)):
            parents, buckets = gram_buckets_batch(pa.table({"text": pa.array([txt], pa.string())}), 16)
            np.add.at(counts[labels.index(lang)], buckets, 1)
        totals = counts.sum(axis=1)
        want_w = np.sign(x := np.log((counts + 1) / (totals + 16)[:, None]) * 1e6) * np.floor(np.abs(x) + 0.5)
        assert (w == want_w.astype(np.int64)).all()
        want_bias = np.round(np.log(np.array([2, 2]) / 4.0) * 1e6)
        assert (bias == want_bias.astype(np.int64)).all()

    def test_predict_self_consistency_and_prior_fallback(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import nb_predict, nb_train

        # separable vocab: the classifier must recover the training labels
        texts = ["aa bb aa", "aa bb", "xx yy", "yy xx xx", "  "]
        langs = ["en", "en", "en", "fr", "fr"]
        labels, w, bias = nb_train(self._docs_ds(texts, langs))
        out = nb_predict(self._docs_ds(texts, langs), labels, w, bias, emit_score=True).to_pandas()
        got = out.set_index("doc_id")["pred"]
        assert got.loc[0] == "en" and got.loc[1] == "en" and got.loc[3] == "fr"
        # the gram-less doc falls back to the prior argmax (en: 3 docs vs 2)
        assert got.loc[4] == "en"
        assert out["nb_score"].dtype == np.int64

    def test_predict_batchsize_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import nb_predict, nb_train

        rng = np.random.default_rng(11)
        vocab = ["tok%d" % i for i in range(30)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 20))) for _ in range(50)]
        langs = [("en" if i % 3 else "de") for i in range(50)]
        labels, w, bias = nb_train(self._docs_ds(texts, langs))
        a = nb_predict(self._docs_ds(texts, langs).repartition(1), labels, w, bias, emit_score=True).to_pandas()
        b = nb_predict(self._docs_ds(texts, langs).repartition(13), labels, w, bias, emit_score=True).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True), b.sort_values("doc_id").reset_index(drop=True)
        )

    def test_tie_goes_to_lexicographically_smallest(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import nb_predict, nb_train

        # perfectly symmetric corpus: every class score ties on the shared vocab
        texts = ["zz", "zz"]
        langs = ["b", "a"]
        labels, w, bias = nb_train(self._docs_ds(texts, langs))
        out = nb_predict(self._docs_ds(texts, langs), labels, w, bias).to_pandas()
        assert (out["pred"] == "a").all()


class TestLmPerplexity:
    def _docs_ds(self, texts, langs=None):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs or ["en"] * len(texts), pa.string()),
                }
            )
        )

    def _local_reference(self, texts, n_buckets=16):
        """Pure-Python bigram LM over hashed buckets — the spec."""
        from goto_eater_crawler_ray.functions.importance import _round_half_away
        from goto_eater_crawler_ray.functions.sampling import md5_u64

        def buckets_of(txt):
            toks = [w for w in txt.strip().split() if w]
            if not toks:
                return []
            return list((md5_u64(np.array(toks)) % np.uint64(n_buckets)).astype(np.int64))

        seqs = [buckets_of(t) for t in texts]
        c1 = np.zeros(n_buckets, np.int64)
        c2 = np.zeros((n_buckets, n_buckets), np.int64)
        for s in seqs:
            for b in s:
                c1[b] += 1
            for u, v in zip(s, s[1:]):
                c2[u, v] += 1
        n = int(c1.sum())
        ctx = c2.sum(axis=1)
        nll1 = _round_half_away(np.log((n + n_buckets) / (c1 + 1.0)) * 1e6)
        nll2 = _round_half_away(np.log((ctx + n_buckets)[:, None] / (c2 + 1.0)) * 1e6)
        rows = []
        for s in seqs:
            tot = int(nll1[s[0]]) + sum(int(nll2[u, v]) for u, v in zip(s, s[1:])) if s else 0
            avg = int(_round_half_away(np.float64(tot) / len(s))) if s else 0
            rows.append((len(s), tot, avg))
        return c1, c2, n, rows

    def test_train_matches_local_counts(self, ray_session):
        from goto_eater_crawler_ray.functions.lm import lm_train

        texts = ["alpha beta alpha beta", "gamma delta", "alpha", "   ", ""]
        c1, c2, n = lm_train(self._docs_ds(texts), n_buckets=16)
        want_c1, want_c2, want_n, _ = self._local_reference(texts)
        assert n == want_n == 7
        assert (c1 == want_c1).all() and (c2 == want_c2).all()

    def test_doc_nll_matches_local_reference(self, ray_session):
        from goto_eater_crawler_ray.functions.lm import lm_doc_nll, lm_nll_weights, lm_train

        rng = np.random.default_rng(5)
        vocab = ["tok%d" % i for i in range(30)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 25))) for _ in range(40)] + ["", "  ", "solo"]
        nll1, nll2 = lm_nll_weights(*lm_train(self._docs_ds(texts), n_buckets=16))
        _, _, _, want = self._local_reference(texts)
        got = lm_doc_nll(self._docs_ds(texts), nll1, nll2).to_pandas().sort_values("doc_id")
        assert list(got["n_toks"]) == [r[0] for r in want]
        assert list(got["nll_micro"]) == [r[1] for r in want]
        assert list(got["avg_nll_micro"]) == [r[2] for r in want]
        # weights are NLLs of add-one probabilities: always positive ints
        assert (nll1 > 0).all() and (nll2 > 0).all()

    def test_doc_nll_batchsize_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.lm import lm_doc_nll, lm_nll_weights, lm_train

        rng = np.random.default_rng(9)
        vocab = ["w%d" % i for i in range(20)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 15))) for _ in range(50)]
        nll1, nll2 = lm_nll_weights(*lm_train(self._docs_ds(texts)))
        a = lm_doc_nll(self._docs_ds(texts).repartition(1), nll1, nll2).to_pandas()
        b = lm_doc_nll(self._docs_ds(texts).repartition(13), nll1, nll2).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True), b.sort_values("doc_id").reset_index(drop=True)
        )

    def test_ccnet_buckets_tertile_split(self, ray_session):
        from goto_eater_crawler_ray.functions.lm import ccnet_buckets, lm_doc_nll, lm_nll_weights, lm_train

        rng = np.random.default_rng(3)
        vocab = ["w%d" % i for i in range(25)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 20))) for _ in range(60)]
        langs = [("en" if i % 2 else "fr") for i in range(60)]
        ds = self._docs_ds(texts, langs)
        nll1, nll2 = lm_nll_weights(*lm_train(ds))
        out = ccnet_buckets(lm_doc_nll(ds, nll1, nll2, carry_cols=("lang",))).to_pandas()
        assert len(out) == 60 and set(out["bucket"]) <= {"head", "middle", "tail"}
        for lang, grp in out.groupby("lang"):
            n = len(grp)
            vals = np.sort(grp["avg_nll_micro"].to_numpy())
            t1 = vals[(n - 1) * 1 // 3]
            t2 = vals[(n - 1) * 2 // 3]
            want = np.where(
                grp["avg_nll_micro"] <= t1, "head", np.where(grp["avg_nll_micro"] <= t2, "middle", "tail")
            )
            assert (grp["bucket"].to_numpy() == want).all()
            # head is never empty and (with distinct values) ≈ a third
            assert (grp["bucket"] == "head").sum() >= 1

    def test_ccnet_buckets_degenerate_single_doc_lang(self, ray_session):
        from goto_eater_crawler_ray.functions.lm import ccnet_buckets, lm_doc_nll, lm_nll_weights, lm_train

        ds = self._docs_ds(["only one doc", "a b", "b a"], langs=["ja", "en", "en"])
        nll1, nll2 = lm_nll_weights(*lm_train(ds))
        out = ccnet_buckets(lm_doc_nll(ds, nll1, nll2, carry_cols=("lang",))).to_pandas()
        # a single-doc language: both tertile ranks hit the one value -> head
        assert out.set_index("doc_id").loc[0, "bucket"] == "head"


class TestWinnowing:
    def _docs_ds(self, texts):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def _local_winnow(self, txt, k=4, w=8):
        """Pure-Python reference: rightmost min of each window."""
        from goto_eater_crawler_ray.functions.sampling import md5_u64
        from goto_eater_crawler_ray.functions.winnow import FP_MOD

        toks = [x for x in txt.strip().split() if x]
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not grams:
            return set()
        h = [int(v) for v in (md5_u64(np.array(grams)) % FP_MOD).astype(np.int64)]
        m = len(h)
        sel = set()
        for j in range(max(m - w + 1, 1)):
            win = h[j : j + w]
            mn = min(win)
            pos = j + max(i for i, v in enumerate(win) if v == mn)
            sel.add((pos + 1, h[pos]))
        return sel

    def test_matches_local_reference(self, ray_session):
        from goto_eater_crawler_ray.functions.winnow import winnow_fingerprints

        rng = np.random.default_rng(13)
        vocab = ["w%d" % i for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 60))) for _ in range(30)] + ["", "a b c", "a b c d"]
        out = winnow_fingerprints(self._docs_ds(texts)).to_pandas()
        for d, grp in out.groupby("doc_id"):
            got = set(zip(grp["pos"], grp["fp"]))
            assert got == self._local_winnow(texts[d]), d
        # docs with < k tokens select nothing; docs with exactly k select their one gram
        assert 31 not in set(out["doc_id"]) and 30 not in set(out["doc_id"])
        assert (out[out["doc_id"] == 32]["pos"] == 1).all() and len(out[out["doc_id"] == 32]) == 1

    def test_shared_substring_guarantee_and_density(self, ray_session):
        from goto_eater_crawler_ray.functions.winnow import K, W, winnow_fingerprints

        rng = np.random.default_rng(29)
        vocab = ["t%d" % i for i in range(500)]
        shared = " ".join(rng.choice(vocab, size=W + K - 1))  # exactly w+k-1 words
        a = " ".join(rng.choice(vocab, size=80)) + " " + shared + " " + " ".join(rng.choice(vocab, size=80))
        b = " ".join(rng.choice(vocab, size=50)) + " " + shared
        out = winnow_fingerprints(self._docs_ds([a, b])).to_pandas()
        fa = set(out[out["doc_id"] == 0]["fp"])
        fb = set(out[out["doc_id"] == 1]["fp"])
        # the winnowing guarantee: a shared >= w+k-1 word substring
        # always shares at least one selected fingerprint
        assert fa & fb
        # density: expected ~2/(w+1) of k-grams selected (loose bounds)
        n_kgrams = len(a.split()) - K + 1
        assert len(out[out["doc_id"] == 0]) <= n_kgrams // 2
        assert len(out[out["doc_id"] == 0]) >= n_kgrams // (2 * W)

    def test_batchsize_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.winnow import winnow_fingerprints

        rng = np.random.default_rng(31)
        vocab = ["v%d" % i for i in range(60)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40))) for _ in range(50)]
        a = winnow_fingerprints(self._docs_ds(texts).repartition(1)).to_pandas()
        b = winnow_fingerprints(self._docs_ds(texts).repartition(11)).to_pandas()
        key = ["doc_id", "pos", "fp"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
        )

    def test_dup_pairs_plants_and_threshold(self, ray_session):
        from goto_eater_crawler_ray.functions.winnow import winnow_dup_pairs

        rng = np.random.default_rng(37)
        vocab = ["u%d" % i for i in range(300)]
        plant = " ".join(rng.choice(vocab, size=40))
        texts = [
            plant + " " + " ".join(rng.choice(vocab, size=30)),      # 0: shares plant
            " ".join(rng.choice(vocab, size=30)) + " " + plant,      # 1: shares plant
            " ".join(rng.choice(vocab, size=60)),                    # 2: unrelated
        ]
        out = winnow_dup_pairs(self._docs_ds(texts), min_shared=2).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        assert all(p == (0, 1) for p in pairs)
        assert int(out.set_index(["doc_a", "doc_b"]).loc[(0, 1), "n_shared"]) >= 2


class TestCdcChunking:
    def _docs_ds(self, texts):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def _local_chunks(self, txt, divisor=16):
        from goto_eater_crawler_ray.functions.cdc import FP_MOD
        from goto_eater_crawler_ray.functions.sampling import md5_u64

        toks = [x for x in txt.strip().split() if x]
        if not toks:
            return []
        closes = (md5_u64(np.array(toks)) % np.uint64(divisor) == 0).tolist()
        closes[-1] = True
        out, cur = [], []
        for w, c in zip(toks, closes):
            cur.append(w)
            if c:
                s = " ".join(cur)
                out.append((len(cur), int(md5_u64(np.array([s]))[0] % FP_MOD)))
                cur = []
        return out

    def test_matches_local_reference(self, ray_session):
        from goto_eater_crawler_ray.functions.cdc import cdc_chunks

        rng = np.random.default_rng(41)
        vocab = ["c%d" % i for i in range(80)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 120))) for _ in range(25)] + ["", "  ", "one"]
        out = cdc_chunks(self._docs_ds(texts)).to_pandas()
        for d, grp in out.groupby("doc_id"):
            grp = grp.sort_values("chunk_idx")
            got = list(zip(grp["n_toks"], grp["chunk_hash"]))
            assert got == self._local_chunks(texts[d]), d
            assert list(grp["chunk_idx"]) == list(range(1, len(grp) + 1))
        # token-less docs emit no chunks
        assert not (set(out["doc_id"]) & {25, 26})

    def test_shift_invariance_shared_chunks(self, ray_session):
        """The CDC property fixed-size blocking lacks: prepending a
        prefix leaves the shared suffix's interior chunks identical."""
        from goto_eater_crawler_ray.functions.cdc import cdc_chunks

        rng = np.random.default_rng(43)
        vocab = ["s%d" % i for i in range(200)]
        shared = " ".join(rng.choice(vocab, size=300))
        prefixed = " ".join(rng.choice(vocab, size=37)) + " " + shared
        out = cdc_chunks(self._docs_ds([shared, prefixed])).to_pandas()
        a = set(out[out["doc_id"] == 0]["chunk_hash"])
        b = set(out[out["doc_id"] == 1]["chunk_hash"])
        # all of doc 0's chunks except possibly its first reappear in doc 1
        assert len(a & b) >= len(a) - 1 >= 5

    def test_dedup_stats_accounting(self, ray_session):
        from goto_eater_crawler_ray.functions.cdc import cdc_chunks, cdc_dedup_stats

        rng = np.random.default_rng(47)
        vocab = ["d%d" % i for i in range(150)]
        block = " ".join(rng.choice(vocab, size=200))
        texts = [block, block, " ".join(rng.choice(vocab, size=100))]
        stats = cdc_dedup_stats(self._docs_ds(texts)).to_pandas().iloc[0]
        chunks = cdc_chunks(self._docs_ds(texts)).to_pandas()
        assert stats["n_chunks"] == len(chunks)
        assert stats["n_distinct"] == chunks["chunk_hash"].nunique()
        assert stats["n_toks_total"] == chunks["n_toks"].sum()
        # the duplicated doc's tokens are all saved
        want_saved = chunks["n_toks"].sum() - chunks.groupby("chunk_hash")["n_toks"].min().sum()
        assert stats["n_toks_saved"] == want_saved >= 200

    def test_batchsize_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.cdc import cdc_chunks

        rng = np.random.default_rng(53)
        vocab = ["e%d" % i for i in range(50)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 80))) for _ in range(40)]
        key = ["doc_id", "chunk_idx"]
        a = cdc_chunks(self._docs_ds(texts).repartition(1)).to_pandas().sort_values(key).reset_index(drop=True)
        b = cdc_chunks(self._docs_ds(texts).repartition(9)).to_pandas().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestSourceOverlap:
    def test_planted_overlap_and_jaccard(self, ray_session, tmp_path):
        from goto_eater_crawler_ray.pipelines.queries import q_source_overlap

        rng = np.random.default_rng(59)
        vocab = ["o%d" % i for i in range(400)]
        shared = " ".join(rng.choice(vocab, size=30))  # 23 shared 8-grams
        rows = []
        for i in range(6):
            rows.append((i, shared + " " + " ".join(rng.choice(vocab, size=40)), "en", "sA"))
        for i in range(6, 12):
            rows.append((i, " ".join(rng.choice(vocab, size=40)) + " " + shared, "en", "sB"))
        for i in range(12, 18):
            rows.append((i, " ".join(rng.choice(vocab, size=60)), "en", "sC"))
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_source_overlap(str(tmp_path)).to_pandas().set_index(["source_a", "source_b"])
        # the planted block guarantees sA-sB overlap of >= the 23 interior grams
        assert int(out.loc[("sA", "sB"), "n_shared"]) >= 23
        # exact jaccard arithmetic
        import duckdb

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
        from goto_eater_crawler_ray.pipelines.queries import SQL_SOURCE_OVERLAP

        want = con.sql(SQL_SOURCE_OVERLAP).df().set_index(["source_a", "source_b"]).sort_index()
        got = out.sort_index()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestProductQuantization:
    def _emb_ds(self, X):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(X)), pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float32())),
                }
            )
        )

    def test_encode_matches_local_argmin_and_batch_invariant(self, ray_session):
        from goto_eater_crawler_ray.functions.similarity import pq_encode, pq_train_codebooks

        rng = np.random.default_rng(61)
        X = rng.standard_normal((120, 16)).astype(np.float32)
        B = pq_train_codebooks(self._emb_ds(X), m=4, k=8, sample_limit=120, iters=5, seed=1)
        assert B.shape == (4, 8, 4)
        out = pq_encode(self._emb_ds(X), B).to_pandas()
        assert len(out) == 120 * 4
        # local reference argmin on true squared distance
        Xd = X.astype(np.float64)
        for s in range(4):
            sub = Xd[:, s * 4 : (s + 1) * 4]
            want = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(-1).argmin(1)
            got = out[out["subspace"] == s].sort_values("vec_id")["code"].to_numpy()
            assert (got == want).all(), s
        b = pq_encode(self._emb_ds(X).repartition(7), B).to_pandas()
        key = ["vec_id", "subspace"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
        )

    def test_quantization_beats_random_codes(self, ray_session):
        from goto_eater_crawler_ray.functions.similarity import pq_encode, pq_train_codebooks

        rng = np.random.default_rng(67)
        X = rng.standard_normal((300, 16)).astype(np.float32)
        B = pq_train_codebooks(self._emb_ds(X), m=4, k=8, sample_limit=300, iters=8, seed=2)
        codes = (
            pq_encode(self._emb_ds(X), B).to_pandas().pivot(index="vec_id", columns="subspace", values="code").to_numpy()
        )
        Xd = X.astype(np.float64)
        recon = np.concatenate([B[s][codes[:, s]] for s in range(4)], axis=1)
        err = ((Xd - recon) ** 2).sum()
        rand_codes = rng.integers(0, 8, size=codes.shape)
        rand_recon = np.concatenate([B[s][rand_codes[:, s]] for s in range(4)], axis=1)
        assert err < 0.5 * ((Xd - rand_recon) ** 2).sum()

    def test_adc_topk_orders_by_quantized_distance(self, ray_session):
        from goto_eater_crawler_ray.functions.importance import _round_half_away
        from goto_eater_crawler_ray.functions.similarity import pq_adc_topk, pq_encode, pq_train_codebooks

        rng = np.random.default_rng(71)
        X = rng.standard_normal((200, 16)).astype(np.float32)
        B = pq_train_codebooks(self._emb_ds(X), m=4, k=8, sample_limit=200, iters=5, seed=3)
        q = X[0].astype(np.float64).reshape(4, 4)
        cc = (B**2).sum(-1)
        lut = _round_half_away(1e6 * ((q[:, None, :] - B) ** 2).sum(-1)).astype(np.int64)
        got = pq_adc_topk(self._emb_ds(X), B, cc, lut, k_top=10).to_pandas()
        codes = (
            pq_encode(self._emb_ds(X), B).to_pandas().pivot(index="vec_id", columns="subspace", values="code").to_numpy()
        )
        adc = sum(lut[s][codes[:, s]] for s in range(4))
        order = np.lexsort((np.arange(200), adc))[:10]
        assert list(got["vec_id"]) == list(order)
        assert list(got["adc_micro"]) == [int(adc[i]) for i in order]
        # the query's own vector should quantize to distance ~0 and rank first
        assert got.iloc[0]["vec_id"] == 0


class TestSourceKl:
    def test_drifted_source_scores_highest(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_source_kl

        rng = np.random.default_rng(73)
        common = ["k%d" % i for i in range(50)]
        rows = []
        i = 0
        for src in ("sA", "sB"):  # two sources drawn from the same vocab
            for _ in range(8):
                rows.append((i, " ".join(rng.choice(common, size=40)), "en", src))
                i += 1
        drift = ["z%d" % i for i in range(50)]  # disjoint vocab -> max drift
        for _ in range(8):
            rows.append((i, " ".join(rng.choice(drift, size=40)), "en", "sDrift"))
            i += 1
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_source_kl(str(tmp_path)).to_pandas().set_index("source")
        assert out.loc["sDrift", "kl_micro"] > out.loc["sA", "kl_micro"]
        assert out.loc["sDrift", "kl_micro"] > out.loc["sB", "kl_micro"]
        # n_grams accounting: 40 unigrams + 39 bigrams per doc, 8 docs
        assert (out["n_grams"] == 8 * 79).all()
        # KL >= 0 up to rounding of each term
        assert (out["kl_micro"] > -256).all()


class TestZipfFit:
    def test_planted_power_law_slope(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_zipf_fit

        # plant an exact Zipf corpus: token ti appears floor(6000/i) times
        words = []
        for i in range(1, 151):
            words += ["t%03d" % i] * (6000 // i)
        rng = np.random.default_rng(79)
        rng.shuffle(words)
        texts = [" ".join(words[j : j + 500]) for j in range(0, len(words), 500)]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_zipf_fit(str(tmp_path)).to_pandas().iloc[0]
        assert out["n_top"] == 100
        # count ~ 6000/rank  =>  slope ~ -1 (floor() flattens it slightly)
        assert -1_050_000 < out["slope_micro"] < -950_000
        # intercept ~ ln(6000) * 1e6 ~ 8.70e6
        assert 8_400_000 < out["intercept_micro"] < 9_000_000

    def test_uniform_corpus_slope_zero(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_zipf_fit

        words = ["u%03d" % i for i in range(120)] * 50  # every token 50x
        texts = [" ".join(words[j : j + 300]) for j in range(0, len(words), 300)]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_zipf_fit(str(tmp_path)).to_pandas().iloc[0]
        assert out["slope_micro"] == 0  # flat counts: boilerplate-flood signature


class TestEmbeddingOutliers:
    def test_planted_mislabel_surfaces_first(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_embedding_outliers

        rng = np.random.default_rng(83)
        # two tight clusters around opposite unit directions
        a = rng.normal(0, 0.05, size=(30, 8)) + np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float64)
        b = rng.normal(0, 0.05, size=(30, 8)) + np.array([-1, 0, 0, 0, 0, 0, 0, 0], np.float64)
        X = np.vstack([a, b]).astype(np.float32)
        labels = np.array([0] * 30 + [1] * 30, np.int64)
        labels[7] = 1  # plant a mislabel: an 'a'-cluster vector tagged label 1
        t = pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = q_embedding_outliers(str(tmp_path)).to_pandas()
        # 10 per label
        assert (out.groupby("label").size() == 10).all()
        worst1 = out[out["label"] == 1].sort_values(["cos_4dp", "vec_id"]).iloc[0]
        assert worst1["vec_id"] == 7  # the planted mislabel is label 1's worst fit
        assert worst1["cos_4dp"] < 0


class TestDocNovelty:
    def test_planted_duplicate_and_unique_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_novelty

        rng = np.random.default_rng(89)
        vocab = ["n%d" % i for i in range(400)]
        unique_doc = " ".join(rng.choice(vocab, size=50))
        dup_block = " ".join(rng.choice(vocab, size=50))
        texts = [
            unique_doc,            # 0: all grams unique -> novelty 1e6
            dup_block,             # 1: identical to 2 -> novelty 0
            dup_block,             # 2
            "a b c",               # 3: < 8 tokens -> no grams
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_doc_novelty(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
        assert len(out) == 4
        assert out.loc[0, "n_grams"] == 43 and out.loc[0, "novelty_micro"] == 1_000_000
        assert out.loc[1, "novelty_micro"] == 0 and out.loc[2, "novelty_micro"] == 0
        assert out.loc[3, "n_grams"] == 0 and out.loc[3, "novelty_micro"] == 0

    def test_batchsize_invariant(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_novelty

        rng = np.random.default_rng(97)
        vocab = ["m%d" % i for i in range(60)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 40))) for _ in range(40)]
        t = pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 40, pa.string()),
                "source": pa.array(["s"] * 40, pa.string()),
            }
        )
        import os

        os.makedirs(str(tmp_path / "one"), exist_ok=True)
        os.makedirs(str(tmp_path / "many"), exist_ok=True)
        pq.write_table(t, str(tmp_path / "one" / "documents.parquet"))
        # many tiny row groups -> many read blocks, same single file name
        pq.write_table(t, str(tmp_path / "many" / "documents.parquet"), row_group_size=5)
        a = q_doc_novelty(str(tmp_path / "one")).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = q_doc_novelty(str(tmp_path / "many")).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestDocTokenEntropy:
    def test_uniform_vs_repetitive_and_edge_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_token_entropy

        texts = [
            "a b c d e f g h",      # 0: all distinct -> H = ln(8)
            "x x x x x x x x",      # 1: one token -> H = 0
            "a a b b",              # 2: H = ln(2)
            "",                     # 3: token-less -> 0
            "solo",                 # 4: single token -> ln(1) = 0
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["s"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_doc_token_entropy(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "entropy_micro"] == round(np.log(8) * 1e6)
        assert out.loc[1, "entropy_micro"] == round(1e6 * np.log(8) - round(1e6 * 8 * np.log(8)) / 8)
        assert abs(out.loc[2, "entropy_micro"] - np.log(2) * 1e6) <= 1
        assert out.loc[3, "entropy_micro"] == 0 and out.loc[3, "n_toks"] == 0
        assert out.loc[4, "entropy_micro"] == 0 and out.loc[4, "n_toks"] == 1
        # the repetitive doc scores (near) zero, far below the diverse doc
        assert out.loc[1, "entropy_micro"] < 10 < out.loc[0, "entropy_micro"]


class TestDocClean:
    def test_lower_collapse_trim(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_doc_clean

        texts = ["  Hello   WORLD \t x ", "already clean", "", "   "]
        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["s"] * 4, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = q_doc_clean(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "clean_text"] == "hello world x"
        assert out.loc[0, "n_chars_removed"] == len(texts[0]) - len("hello world x")
        assert out.loc[1, "clean_text"] == "already clean" and out.loc[1, "n_chars_removed"] == 0
        assert out.loc[2, "clean_text"] == "" and out.loc[3, "clean_text"] == ""


class TestCuratePipeline:
    def test_composition_semantics(self, ray_session):
        from goto_eater_crawler_ray.pipelines.queries import q_curate_pipeline, q_gopher_filter

        sf = "/root/testdata/sf0.001"
        out = q_curate_pipeline(sf).to_pandas()
        passed = set(q_gopher_filter(sf).to_pandas()["doc_id"])
        # every curated doc passed the gate, no tail bucket, no dup ids
        assert set(out["doc_id"]) <= passed
        assert set(out["bucket"]) <= {"head", "middle"}
        assert out["doc_id"].is_unique
        # the tail third was dropped: curated < gate survivors
        assert 0 < len(out) < len(passed)


class TestCurateExport:
    def test_manifest_matches_pipeline(self, ray_session):
        from goto_eater_crawler_ray.pipelines.queries import q_curate_export, q_curate_pipeline

        sf = "/root/testdata/sf0.001"
        manifest = q_curate_export(sf).to_pandas().set_index(["lang", "bucket"])["n_docs"]
        want = q_curate_pipeline(sf).to_pandas().groupby(["lang", "bucket"]).size()
        assert manifest.sort_index().to_dict() == want.sort_index().to_dict()
        # scratch dir is cleaned up
        import glob

        assert not glob.glob("/tmp/curate_export_*")


class TestDsirAuc:
    def test_separable_and_random_labels(self, ray_session):
        from goto_eater_crawler_ray.pipelines.queries import q_dsir_auc

        out = q_dsir_auc("/root/testdata/sf0.001").to_pandas().iloc[0]
        # DSIR scores en-vs-rest on a corpus with real en docs: better
        # than chance, bounded by 1
        assert out["n_pos"] > 0 and out["n_neg"] > 0
        assert 500_000 < out["auc_micro"] <= 1_000_000

    def test_exact_against_sklearn_style_reference(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_dsir_auc, q_dsir_score

        # local tie-aware rank-sum reference over the same scores
        sf = "/root/testdata/sf0.001"
        sc = q_dsir_score(sf).to_pandas()
        import duckdb

        lang = duckdb.sql(f"SELECT doc_id, lang FROM read_parquet('{sf}/documents.parquet')").df()
        df = sc.merge(lang, on="doc_id")
        s = df["dsir_score"].to_numpy()
        y = (df["lang"] == "en").to_numpy()
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty(len(s), np.float64)
        sorted_s = s[order]
        i = 0
        pos = 1
        while i < len(s):
            j = i
            while j < len(s) and sorted_s[j] == sorted_s[i]:
                j += 1
            ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
            pos += j - i
            i = j
        npos, nneg = int(y.sum()), int((~y).sum())
        want = (ranks[y].sum() - npos * (npos + 1) / 2) / (npos * nneg)
        got = q_dsir_auc(sf).to_pandas().iloc[0]
        assert abs(got["auc_micro"] - round(want * 1e6)) <= 1


class TestUserStreaks:
    def test_planted_streaks(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from goto_eater_crawler_ray.pipelines.queries import q_user_streaks

        day = 86_400_000_000
        rows = []
        # user 1: days 0,1,2, 5,6, 9 -> streaks [3,2,1]
        for d in (0, 1, 2, 5, 6, 9):
            rows.append((len(rows), d * day + 123, 1, "view", 1.0, "{}"))
        # user 2: one day, three events -> one streak of 1
        for _ in range(3):
            rows.append((len(rows), 4 * day + 50, 2, "view", 1.0, "{}"))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = q_user_streaks(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
        assert out.loc[1].to_dict() == {"n_streaks": 3, "longest_streak": 3, "n_active_days": 6}
        assert out.loc[2].to_dict() == {"n_streaks": 1, "longest_streak": 1, "n_active_days": 1}


class TestDocLengthGini:
    def _write(self, tmp_path, lengths):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(range(len(lengths)), pa.int64()),
                "text": pa.array(["x" * int(n) for n in lengths], pa.string()),
                "lang": pa.array(["en"] * len(lengths), pa.string()),
                "source": pa.array(["s"] * len(lengths), pa.string()),
                "n_chars": pa.array([int(n) for n in lengths], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_uniform_zero_and_concentrated_high(self, ray_session, tmp_path):
        import os

        from goto_eater_crawler_ray.pipelines.queries import q_doc_length_gini

        d1 = tmp_path / "u"
        os.makedirs(d1)
        out = q_doc_length_gini(self._write(d1, [100] * 40)).to_pandas().iloc[0]
        assert out["gini_micro"] == 0 and out["n_docs"] == 40 and out["total_chars"] == 4000
        d2 = tmp_path / "c"
        os.makedirs(d2)
        # one giant + 39 tiny: near-max inequality
        out2 = q_doc_length_gini(self._write(d2, [1] * 39 + [10_000])).to_pandas().iloc[0]
        assert out2["gini_micro"] > 900_000

    def test_matches_local_reference_with_ties(self, ray_session, tmp_path):
        from goto_eater_crawler_ray.pipelines.queries import q_doc_length_gini

        rng = np.random.default_rng(101)
        lens = rng.integers(1, 50, size=100).tolist()  # heavy ties
        got = q_doc_length_gini(self._write(tmp_path, lens)).to_pandas().iloc[0]
        x = np.sort(np.array(lens, np.float64))
        n = len(x)
        want = (2 * (np.arange(1, n + 1) * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        assert abs(got["gini_micro"] - round(want * 1e6)) <= 1


class TestEventsAutocorr:
    def _write(self, tmp_path, hours_counts):
        import pyarrow.parquet as pq

        rows = []
        for h, c in hours_counts:
            for i in range(c):
                rows.append((len(rows), h * 3_600_000_000 + i, 1, "view", 1.0, "{}"))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_alternating_negative_smooth_positive(self, ray_session, tmp_path):
        import os

        from goto_eater_crawler_ray.pipelines.queries import q_events_autocorr

        d1 = tmp_path / "alt"
        os.makedirs(d1)
        alt = [(h, 10 if h % 2 else 1) for h in range(24)]
        out = q_events_autocorr(self._write(d1, alt)).to_pandas().iloc[0]
        assert out["n_hours"] == 24 and out["r1_micro"] < -800_000
        d2 = tmp_path / "smooth"
        os.makedirs(d2)
        smooth = [(h, 10 + h) for h in range(24)]  # monotone ramp
        out2 = q_events_autocorr(self._write(d2, smooth)).to_pandas().iloc[0]
        assert out2["r1_micro"] > 700_000

    def test_gap_hours_count_zero(self, ray_session, tmp_path):
        from goto_eater_crawler_ray.pipelines.queries import q_events_autocorr

        # hours 0 and 5 only: grid length 6 with four zero hours
        out = q_events_autocorr(self._write(tmp_path, [(0, 4), (5, 4)])).to_pandas().iloc[0]
        assert out["n_hours"] == 6


class TestLangidConfusion:
    def test_diagonal_dominates_and_totals(self, ray_session):
        from goto_eater_crawler_ray.pipelines.queries import q_langid_confusion

        sf = "/root/testdata/sf0.001"
        out = q_langid_confusion(sf).to_pandas()
        import duckdb

        n_docs = int(duckdb.sql(f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')").df().iloc[0, 0])
        assert out["n_docs"].sum() == n_docs  # every doc lands in exactly one cell
        # the synthetic corpus uses the same latin vocabulary for every
        # label, so the matrix correctly reveals the labels are not
        # linguistic: every true lang collapses onto the 'en' prediction
        assert set(out["lang"]) == {"en", "de", "fr", "es", "zh"}
        assert (out["lang_pred"] == "en").all()
        assert int(out.set_index("lang").loc["en", "n_docs"]) > 0
