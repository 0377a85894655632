"""Corpus-construction operators: contamination check, token-window
chunking + chunk dedup, deterministic stratified sampling.

Every expectation here is hand-computed from the fixture — no
golden-file regeneration, no tolerance windows."""

from __future__ import annotations

import hashlib

import pytest

from logparser_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


class TestWordNgrams:
    def test_basic_trigrams(self, spark):
        df = _docs(spark, [(1, "a b c d", "en", "s")])
        [row] = corpus.word_ngrams(df, 3).collect()
        assert sorted(row["ngrams"]) == ["a b c", "b c d"]

    def test_short_doc_yields_empty(self, spark):
        df = _docs(spark, [(1, "a b", "en", "s"), (2, "", "en", "s")])
        got = {r["doc_id"]: r["ngrams"]
               for r in corpus.word_ngrams(df, 3).collect()}
        assert got == {1: [], 2: []}

    def test_distinct_dedupes_within_doc(self, spark):
        df = _docs(spark, [(1, "x y x y x y", "en", "s")])
        [row] = corpus.word_ngrams(df, 2).collect()
        assert sorted(row["ngrams"]) == ["x y", "y x"]
        [row] = corpus.word_ngrams(df, 2, distinct=False).collect()
        assert len(row["ngrams"]) == 5

    def test_multiple_spaces_collapse(self, spark):
        df = _docs(spark, [(1, "a  b   c", "en", "s")])
        [row] = corpus.word_ngrams(df, 2).collect()
        assert sorted(row["ngrams"]) == ["a b", "b c"]


class TestContamination:
    def test_exact_fractions(self, spark):
        # bench holds exactly {a b c}; doc 1 has 3 distinct 2-grams of
        # which 1 ("a b" -> no wait, n=3) ... use n=3:
        # doc 1 "a b c d e": 3-grams {a b c, b c d, c d e}, 1 hit.
        docs = _docs(spark, [
            (1, "a b c d e", "en", "s"),
            (2, "x y z w", "en", "s"),
            (3, "a b c", "en", "s"),
            (4, "a b", "en", "s"),
        ])
        bench = _docs(spark, [(100, "a b c", "en", "s")])
        got = {
            r["doc_id"]: r.asDict()
            for r in corpus.contamination_check(
                docs, bench, n=3, threshold_ppm=500_000
            ).collect()
        }
        assert got[1]["n_ngrams"] == 3 and got[1]["n_contaminated"] == 1
        # 1/3 half-up at 6 decimals = 0.333333
        assert got[1]["contamination_frac"] == pytest.approx(0.333333)
        assert got[1]["is_contaminated"] is False
        assert got[2]["n_contaminated"] == 0
        assert got[3]["n_contaminated"] == 1
        assert got[3]["is_contaminated"] is True  # 1/1 >= 0.5
        # doc 4 too short for any 3-gram: defined as NOT contaminated
        assert got[4]["n_ngrams"] == 0
        assert got[4]["is_contaminated"] is False
        assert got[4]["contamination_frac"] == 0.0

    def test_threshold_is_integer_exact(self, spark):
        # 1 hit of 2 n-grams vs threshold 500000 ppm: 1*1e6 >= 5e5*2
        # must be True (>=, not >) — a float 0.5 comparison could tie
        # either way.
        docs = _docs(spark, [(1, "a b c d", "en", "s")])
        bench = _docs(spark, [(9, "a b c", "en", "s")])
        [row] = corpus.contamination_check(
            docs, bench, n=3, threshold_ppm=500_000
        ).collect()
        assert row["n_ngrams"] == 2 and row["n_contaminated"] == 1
        assert row["is_contaminated"] is True


class TestChunking:
    def test_window_stride_boundaries(self, spark):
        # 10 words, window 4, stride 3 -> starts 1,4,7,10:
        # [w1..w4], [w4..w7], [w7..w10], [w10] (short tail kept)
        words = [f"w{i}" for i in range(1, 11)]
        df = _docs(spark, [(7, " ".join(words), "en", "s")])
        rows = sorted(
            corpus.chunk_documents(df, window=4, stride=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_text"] for r in rows] == [
            "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10",
        ]
        assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
        assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]

    def test_empty_doc_emits_no_chunks(self, spark):
        df = _docs(spark, [(1, "", "en", "s"), (2, "a", "en", "s")])
        rows = corpus.chunk_documents(df, window=4, stride=3).collect()
        assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(2, "a")]

    def test_invalid_params_raise(self, spark):
        df = _docs(spark, [(1, "a", "en", "s")])
        with pytest.raises(ValueError):
            corpus.chunk_documents(df, window=0, stride=3)
        with pytest.raises(ValueError):
            corpus.chunk_documents(df, window=4, stride=0)

    def test_chunk_dedup_keep_first(self, spark):
        # identical chunk text appears in docs 3 and 1 — keeper must be
        # the min (doc_id, chunk_id) pair, i.e. doc 1.
        df = _docs(spark, [
            (3, "a b c", "en", "s"),
            (1, "a b c", "en", "s"),
            (2, "x y", "en", "s"),
        ])
        chunks = corpus.chunk_documents(df, window=8, stride=6)
        got = {r["chunk_md5"]: r.asDict()
               for r in corpus.chunk_dedup(chunks).collect()}
        abc = hashlib.md5(b"a b c").hexdigest()
        xy = hashlib.md5(b"x y").hexdigest()
        assert set(got) == {abc, xy}
        assert got[abc]["keep_doc_id"] == 1
        assert got[abc]["keep_chunk_id"] == 0
        assert got[abc]["n_copies"] == 2
        assert got[abc]["n_tokens"] == 3
        assert got[xy]["n_copies"] == 1

    def test_chunk_dedup_distinguishes_chunk_positions(self, spark):
        # same doc, overlapping windows that happen to repeat text:
        # "p q p q" window 2 stride 2 -> chunks "p q", "p q" — one
        # group, keeper chunk_id 0, 2 copies.
        df = _docs(spark, [(5, "p q p q", "en", "s")])
        chunks = corpus.chunk_documents(df, window=2, stride=2)
        [row] = corpus.chunk_dedup(chunks).collect()
        assert (row["keep_doc_id"], row["keep_chunk_id"],
                row["n_copies"]) == (5, 0, 2)


class TestPacking:
    def _bucket(self, doc_id: int, n: int) -> int:
        h = hashlib.md5(f"salt42|{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % n

    def test_matches_sequential_concat_split(self, spark):
        # 12 docs with varying word counts; recompute the packing with
        # a plain sequential walk per bucket and compare exactly.
        rows = [(i, " ".join(f"t{j}" for j in range(3 + (i * 5) % 17)),
                 "en", "s") for i in range(12)]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        )
        chunks = corpus.chunk_documents(df, window=8, stride=6)
        got = {
            (r["doc_id"], r["chunk_id"]): r.asDict()
            for r in corpus.pack_chunks(
                chunks, budget_tokens=10, n_buckets=4
            ).collect()
        }
        # sequential reference: concat chunks per bucket in (doc, ord)
        # order, cut every 10 tokens
        by_bucket: dict = {}
        for r in sorted(
            chunks.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])
        ):
            b = self._bucket(r["doc_id"], 4)
            by_bucket.setdefault(b, []).append(r)
        n_checked = 0
        for b, rs in by_bucket.items():
            pos = 0
            for r in rs:
                last = pos + r["n_tokens"] - 1
                shard = last // 10
                g = got[(r["doc_id"], r["chunk_id"])]
                assert g["bucket"] == b
                assert g["shard_id"] == shard
                assert g["offset"] == max(pos - shard * 10, 0)
                assert g["straddles"] == int(pos < shard * 10)
                pos += r["n_tokens"]
                n_checked += 1
        assert n_checked == len(got) > 0
        # some chunk must actually straddle for the fixture to bite
        assert any(g["straddles"] == 1 for g in got.values())

    def test_invalid_params_raise(self, spark):
        df = _docs(spark, [(1, "a b", "en", "s")])
        chunks = corpus.chunk_documents(df)
        with pytest.raises(ValueError):
            corpus.pack_chunks(chunks, budget_tokens=0)
        with pytest.raises(ValueError):
            corpus.pack_chunks(chunks, n_buckets=0)


class TestSampling:
    def _bucket(self, doc_id: int) -> int:
        h = hashlib.md5(f"salt42|{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 1_000_000

    def test_bucket_matches_reference_md5(self, spark):
        df = _docs(spark, [(i, "t", "en", "s") for i in range(50)])
        got = {r["doc_id"]: r["bucket"]
               for r in corpus.sample_stratified(
                   df, rates_ppm={}, default_ppm=1_000_000
               ).collect()}
        assert len(got) == 50  # rate 1e6 keeps everything
        for i in range(50):
            assert got[i] == self._bucket(i)

    def test_selection_is_rate_cut(self, spark):
        df = _docs(spark, [
            (i, "t", "en" if i % 2 == 0 else "zz", "s") for i in range(200)
        ])
        rows = corpus.sample_stratified(
            df, rates_ppm={"en": 620_000}, default_ppm=120_000
        ).collect()
        expect = {
            i for i in range(200)
            if self._bucket(i) < (620_000 if i % 2 == 0 else 120_000)
        }
        assert {r["doc_id"] for r in rows} == expect
        for r in rows:
            assert r["rate_ppm"] == (620_000 if r["doc_id"] % 2 == 0
                                     else 120_000)

    def test_rerun_identical(self, spark):
        df = _docs(spark, [(i, "t", "en", "s") for i in range(100)])
        a = {r["doc_id"] for r in corpus.sample_stratified(df).collect()}
        b = {r["doc_id"] for r in corpus.sample_stratified(df).collect()}
        assert a == b

    def test_domain_mix_accounting(self, spark):
        df = _docs(spark, [
            (i, "t", "en" if i < 60 else "de", "s") for i in range(100)
        ])
        got = {r["lang"]: r.asDict()
               for r in corpus.domain_mix(df).collect()}
        en_sel = sum(1 for i in range(60)
                     if self._bucket(i) < 620_000)
        de_sel = sum(1 for i in range(60, 100)
                     if self._bucket(i) < 370_000)
        assert got["en"]["n_total"] == 60
        assert got["en"]["n_sampled"] == en_sel
        assert got["de"]["n_sampled"] == de_sel
        # achieved_ppm is integer half-up of n_sampled/n_total * 1e6
        assert got["en"]["achieved_ppm"] == (
            (2_000_000 * en_sel + 60) // 120
        )


class TestParagraphDedup:
    def _clean(self, spark, rows, **kw):
        df = _docs(spark, [(i, t, "en", "s") for i, t in rows])
        return {
            r["doc_id"]: r.asDict()
            for r in corpus.paragraph_dedup(df, **kw).collect()
        }

    def test_threshold_boundary(self, spark):
        # "dup" appears exactly 3 times, "pair" exactly 2, uniques once
        rows = [
            (0, "dup\n\nu0\n\npair"),
            (1, "dup\n\nu1\n\npair"),
            (2, "dup\n\nu2"),
        ]
        # min_dup=3: only "dup" dies
        got = self._clean(spark, rows, min_dup=3)
        assert got[0]["cleaned"] == "u0\n\npair"
        assert got[2] == {"doc_id": 2, "cleaned": "u2", "n_paras": 2,
                          "n_kept": 1, "n_removed": 1}
        # min_dup=2: "pair" dies too
        got = self._clean(spark, rows, min_dup=2)
        assert got[0]["cleaned"] == "u0"
        assert got[1]["cleaned"] == "u1"
        # min_dup=4: nothing dies, docs round-trip byte-identical
        got = self._clean(spark, rows, min_dup=4)
        assert all(got[i]["cleaned"] == rows[i][1] for i in range(3))
        assert all(got[i]["n_removed"] == 0 for i in range(3))

    def test_fully_boilerplate_doc_survives_as_row(self, spark):
        rows = [(0, "x\n\nx"), (1, "x"), (2, "solo")]
        got = self._clean(spark, rows, min_dup=2)
        # doc 0 and 1: every paragraph duplicated -> empty cleaned text
        assert got[0] == {"doc_id": 0, "cleaned": "", "n_paras": 2,
                          "n_kept": 0, "n_removed": 2}
        assert got[1]["cleaned"] == ""
        assert got[2]["cleaned"] == "solo"

    def test_order_preserved_with_interleaved_removals(self, spark):
        rows = [
            (0, "B\n\na\n\nB\n\nb\n\nB\n\nc"),
            (1, "B"),
        ]
        got = self._clean(spark, rows, min_dup=2)
        assert got[0]["cleaned"] == "a\n\nb\n\nc"
        assert got[0]["n_paras"] == 6 and got[0]["n_kept"] == 3

    def test_custom_separator_is_literal_not_regex(self, spark):
        # '||' would be a regex alternation if unescaped -> split on
        # every char; the operator must treat sep literally
        rows = [(0, "a||b"), (1, "a||c")]
        got = self._clean(spark, rows, min_dup=2, sep="||")
        assert got[0]["cleaned"] == "b"
        assert got[1]["cleaned"] == "c"
        assert got[0]["n_paras"] == 2


class TestDuplicateSpans:
    """Exact substring-span dedup: spans known by construction."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def _spans(self, spark, rows, k=5):
        out = corpus.duplicate_spans(self._docs(spark, rows), k=k)
        return sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in out.collect()
        )

    def _strip(self, spark, rows, k=5):
        out = corpus.strip_duplicate_spans(self._docs(spark, rows), k=k)
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    ROWS = [
        (0, "a b c d e x1 x2"),
        (1, "p q a b c d e r"),
        (2, "a b c d e a b c d e"),
        (3, "short text"),
        (4, "m n o p q z1 z2 z3 m n o p q"),
    ]

    def test_spans_by_construction(self, spark):
        # "a b c d e": first occurrence (0,0) kept; (1,2), (2,0), (2,5)
        # marked — doc 2's two hits merge into one 0..9 span.
        # "m n o p q": same-doc repeat, (4,8) marked.
        assert self._spans(spark, self.ROWS) == [
            (1, 2, 6, 5),
            (2, 0, 9, 10),
            (4, 8, 12, 5),
        ]

    def test_strip_reassembles_in_order(self, spark):
        got = self._strip(spark, self.ROWS)
        assert got[0]["cleaned"] == "a b c d e x1 x2"
        assert got[0]["n_removed"] == 0
        assert got[1]["cleaned"] == "p q r"
        assert (got[1]["n_tokens"], got[1]["n_removed"]) == (8, 5)
        assert got[2]["cleaned"] == ""
        assert (got[2]["n_tokens"], got[2]["n_removed"]) == (10, 10)
        assert got[3]["cleaned"] == "short text"
        assert got[4]["cleaned"] == "m n o p q z1 z2 z3"
        assert got[4]["n_removed"] == 5

    def test_doc_shorter_than_k_yields_no_windows(self, spark):
        rows = [(0, "a b"), (1, "a b")]  # identical but < k tokens
        assert self._spans(spark, rows) == []
        got = self._strip(spark, rows)
        assert got[0]["cleaned"] == "a b" and got[0]["n_removed"] == 0

    def test_first_occurrence_tiebreak_is_min_doc_then_pos(self, spark):
        # same window in doc 5 pos 3 and doc 7 pos 0: doc 5 keeps it
        rows = [
            (7, "k l m n o t1 t2"),
            (5, "u v w k l m n o"),
        ]
        assert self._spans(spark, rows) == [(7, 0, 4, 5)]

    def test_overlapping_distinct_windows_merge(self, spark):
        # doc 1 repeats a 6-token phrase: two overlapping duplicated
        # 5-windows (pos 0 and pos 1) merge into one 0..5 span
        rows = [
            (0, "a b c d e f tail0"),
            (1, "a b c d e f tail1"),
        ]
        assert self._spans(spark, rows) == [(1, 0, 5, 6)]

    def test_adjacent_but_separate_spans_stay_separate(self, spark):
        # two duplicated phrases in doc 1 separated by a unique token:
        # positions 0..4 and 6..10 — NOT merged across the gap
        rows = [
            (0, "a b c d e q r s t u extra words here"),
            (1, "a b c d e GAP1 q r s t u"),
        ]
        assert self._spans(spark, rows) == [
            (1, 0, 4, 5), (1, 6, 10, 5),
        ]

    def test_whitespace_runs_ignored_like_words(self, spark):
        # double spaces produce empty tokens that _words drops; the
        # two docs still match token-for-token
        rows = [
            (0, "a  b c d  e tail0"),
            (1, "a b  c d e tail1"),
        ]
        assert self._spans(spark, rows) == [(1, 0, 4, 5)]


class TestBigramScore:
    """Integer-exact bigram LM scoring vs a naive reference."""

    def _score(self, spark, texts):
        from logparser_spark.operators import textstats

        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        out = textstats.bigram_doc_score(docs).collect()
        return {r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
                for r in out}

    @staticmethod
    def _naive(texts):
        import collections

        toks = [[w for w in t.split(" ") if w] for t in texts]
        bgs = [list(zip(ws, ws[1:])) for ws in toks]
        c12 = collections.Counter(b for bs in bgs for b in bs)
        c1 = collections.Counter(b[0] for bs in bgs for b in bs)
        V = len({w for ws in toks for w in ws})
        out = {}
        for i, bs in enumerate(bgs):
            if not bs:
                out[i] = (0, 0)
                continue
            sp = sum(
                (1_000_000 * (c12[b] + 1)) // (c1[b[0]] + V)
                for b in bs
            )
            out[i] = (len(bs), sp // len(bs))
        return out

    def test_matches_naive_reference(self, spark):
        texts = [
            "the cat sat on the mat",
            "the cat ate",
            "mat the cat",
            "solo",          # 1 token -> 0 bigrams
            "",              # empty
            "the the the the",
        ]
        assert self._score(spark, texts) == self._naive(texts)

    def test_repetitive_doc_scores_higher_than_rare(self, spark):
        texts = ["a b a b a b a b", "q z x w v u t s"]
        got = self._score(spark, texts)
        assert got[0][1] > got[1][1]


class TestFixMojibake:
    def _fix(self, spark, texts):
        from logparser_spark.operators import textstats

        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        out = textstats.fix_mojibake(docs).collect()
        return {r["doc_id"]: (r["fixed"], r["was_fixed"]) for r in out}

    def test_repairs_double_encoded_and_keeps_clean(self, spark):
        clean = ["café crème", "naïve façade", "plain ascii",
                 "日本語テキスト", ""]
        broken = [c.encode("utf-8").decode("latin-1")
                  for c in clean[:2]]
        got = self._fix(spark, clean + broken)
        for i, c in enumerate(clean):
            assert got[i] == (c, False), (i, got[i])
        assert got[5] == ("café crème", True)
        assert got[6] == ("naïve façade", True)

    def test_invalid_recovered_bytes_pass_through(self, spark):
        # 'Ã' followed by a NON-continuation byte: signature matches
        # but the recovered bytes are not valid UTF-8 -> untouched
        s = "Ã!abc"
        got = self._fix(spark, [s])
        assert got[0] == (s, False)

    def test_supplementary_and_emoji_mojibake(self, spark):
        orig = "snow ☃ and \U0001F600 end"  # 3- and 4-byte UTF-8
        broken = orig.encode("utf-8").decode("latin-1")
        got = self._fix(spark, [broken])
        assert got[0] == (orig, True)

    def test_text_with_non_latin1_chars_never_touched(self, spark):
        # contains the signature substring AND chars > U+00FF: cannot
        # have come from a Latin-1 misread
        s = "Ã© plus Ā macron"
        got = self._fix(spark, [s])
        assert got[0] == (s, False)
