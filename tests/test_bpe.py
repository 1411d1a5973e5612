"""BPE tokenizer training: distributed trainer vs the independent local
reference (the oracle-pin contract), plus the vectorized-merge edge cases
(overlapping runs, alternating chains, single-char words, empty corpus)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_ray.functions.bpe import END_OF_WORD, bpe_encode_local, bpe_train, bpe_train_local


def _as_tuples(t: pa.Table):
    return list(
        zip(
            t.column("pair_left").to_pylist(),
            t.column("pair_right").to_pylist(),
            t.column("merged").to_pylist(),
            t.column("pair_count").to_pylist(),
        )
    )


def _train_ds(texts, k, n_parts=3, **kw):
    import ray.data as rd

    kw.setdefault("max_local_vocab", 0)  # force the distributed merge loop
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    return bpe_train(ds.repartition(n_parts) if n_parts else ds, k, **kw)


class TestLocalReference:
    def test_textbook_example(self):
        # Sennrich's canonical low/lower/newest/widest flavor: 'es' family
        texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
        merges = bpe_train_local(texts, 3)
        assert merges[0] == ("e", "s", "es", 9)  # newest*6 + widest*3
        assert merges[1] == ("es", "t", "est", 9)
        assert merges[2] == ("est", END_OF_WORD, "est" + END_OF_WORD, 9)

    def test_overlapping_run_is_left_greedy(self):
        # 'aaaa' -> [aa, aa], 'aaa' -> [aa, a]: within-run overlap keeps
        # the leftmost occurrence, exactly the sequential scan
        merges = bpe_train_local(["aaaa aaaa aaa"], 2)
        a, b, m, c = merges[0]
        assert (a, b, m) == ("a", "a", "aa")
        assert c == 3 * 2 + 2  # counting sees every adjacent position
        # but APPLICATION is left-greedy: aaaa->[aa,aa], aaa->[aa,a], so
        # round 2's (aa,aa) count is 2 (only the aaaa words), not 4
        assert merges[1][:2] in {("aa", "aa"), ("aa", END_OF_WORD)}
        counts2 = {m2[:2]: m2[3] for m2 in merges[1:]}
        assert counts2.get(("aa", "aa"), 2) == 2

    def test_tie_breaks_lexicographic(self):
        # 'ab': pairs (a,b) and (b,</w>) both occur once -> the
        # lexicographically smaller LEFT symbol wins
        merges = bpe_train_local(["ab"], 1)
        assert merges[0][:2] == ("a", "b")
        # ...and </w> ('<' = 0x3c) sorts before lowercase letters
        merges = bpe_train_local(["ab ba"], 1)
        assert merges[0][:2] == ("a", END_OF_WORD)

    def test_stops_when_no_pairs(self):
        # single-char words have one (char, </w>) pair each; after those
        # merge there is nothing left
        merges = bpe_train_local(["a a a"], 5)
        assert merges == [("a", END_OF_WORD, "a" + END_OF_WORD, 3)]


class TestDistributedEquivalence:
    CORPORA = [
        ["the cat sat on the mat", "the cats sat", "a cat a mat a hat"],
        ["aaaa aaa aa a", "abab ababab ab", "xyx yxy xy"],
        ["low low lower newest newest widest", ""],
    ]

    @pytest.mark.parametrize("texts", CORPORA)
    def test_matches_local_reference(self, ray_session, texts):
        assert _as_tuples(_train_ds(texts, 10)) == bpe_train_local(texts, 10)

    def test_gated_local_path_equivalence(self, ray_session):
        # the small-vocab driver fast path must be bit-identical to the
        # forced distributed merge loop (the pagerank_exact gate contract)
        texts = self.CORPORA[0] + self.CORPORA[1]
        fast = _train_ds(texts, 10, max_local_vocab=200_000)
        forced = _train_ds(texts, 10, max_local_vocab=0)
        assert fast.equals(forced)

    def test_width_independent(self, ray_session):
        texts = ["the quick brown fox jumps over the lazy dog"] * 7 + ["pack my box with five dozen jugs"]
        assert _as_tuples(_train_ds(texts, 8, n_parts=1)) == _as_tuples(_train_ds(texts, 8, n_parts=6))

    def test_empty_corpus(self, ray_session):
        t = _train_ds([], 5, n_parts=0)
        assert t.num_rows == 0
        assert t.column_names == ["rank", "pair_left", "pair_right", "merged", "pair_count"]

    def test_whitespace_only_corpus(self, ray_session):
        assert _train_ds(["   ", "\t\n"], 5).num_rows == 0

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(["aa", "aaa", "ab", "aba", "bab", "x", "xyxy", "cat"]), max_size=8).map(" ".join),
            max_size=15,
        )
    )
    def test_random_corpora_match_reference(self, ray_session, texts):
        assert _as_tuples(_train_ds(texts, 6)) == bpe_train_local(texts, 6)


class TestEncode:
    def _counts_ds(self, texts, merges):
        import ray.data as rd

        from goto_eater_crawler_ray.functions.bpe import bpe_token_counts

        ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})).repartition(3)
        t = bpe_token_counts(ds, [(a, b) for a, b, *_ in merges]).sort("token").take_all()
        return {r["token"]: r["n"] for r in t}

    @pytest.mark.parametrize("texts", TestDistributedEquivalence.CORPORA)
    def test_matches_local_reference(self, ray_session, texts):
        merges = bpe_train_local(texts, 6)
        assert self._counts_ds(texts, merges) == bpe_encode_local(texts, merges)

    def test_zero_merges_is_char_counts(self, ray_session):
        texts = ["ab ba a"]
        got = self._counts_ds(texts, [])
        assert got == {"a": 3, "b": 2, END_OF_WORD: 3}

    def test_unicode_corpus(self, ray_session):
        # exercises the non-ASCII fallback in the encode kernel (the
        # ASCII np.frombuffer fast path raises UnicodeEncodeError)
        texts = ["すし らーめん すし", "らー すし", "cafe すし"]
        merges = bpe_train_local(texts, 4)
        assert self._counts_ds(texts, merges) == bpe_encode_local(texts, merges)
        assert _as_tuples(_train_ds(texts, 4)) == merges

    def test_token_total_preserves_symbol_mass(self, ray_session):
        # merging never creates or drops words: sum over tokens of
        # (token's symbol count * n) == initial symbol count
        texts = ["the cat sat", "a cat sat on a mat"]
        merges = bpe_train_local(texts, 5)
        got = self._counts_ds(texts, merges)
        ref = bpe_encode_local(texts, [])
        n_init = sum(ref.values())
        n_got = sum(n * _n_syms(tok) for tok, n in got.items())
        assert n_got == n_init


def _n_syms(tok: str) -> int:
    # count base symbols in a merged token: chars + </w> as one symbol
    body = tok.replace(END_OF_WORD, "\x00")
    return len(body)


class TestQueryContract:
    def test_bpe_merges_matches_frozen_pin(self, ray_session, sf_dir):
        # the driver-visible contract: the distributed trainer reproduces
        # the independently-computed frozen merge table for the gate corpus
        from goto_eater_crawler_ray.pipelines.queries import BPE_PINS, q_bpe_merges

        t = q_bpe_merges(sf_dir)
        got = [
            (r, a, b, m, c)
            for r, a, b, m, c in zip(
                t.column("rank").to_pylist(),
                t.column("pair_left").to_pylist(),
                t.column("pair_right").to_pylist(),
                t.column("merged").to_pylist(),
                t.column("pair_count").to_pylist(),
            )
        ]
        assert got == BPE_PINS[153156]
