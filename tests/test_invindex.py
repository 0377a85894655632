"""Inverted-index correctness: hand-computed postings, conjunctive
AND semantics with deterministic ranking, overlapping-repeat phrase
counts, and the md5 term-bucket layout (driver/executor bucket parity
+ file-listing-asserted partition pruning)."""

import re

from pyspark.sql import functions as F

from logparser_spark.operators import invindex


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a  c a"),        # double space: empty token dropped
            (2, "b c b"),
            (3, "a a a a"),
            (4, "c"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_postings_hand_computed(spark):
    idx = {
        (r["term"], r["doc_id"]): (r["tf"], r["positions"])
        for r in invindex.build_inverted_index(_docs(spark)).collect()
    }
    assert idx[("a", 1)] == (3, [0, 2, 4])
    assert idx[("b", 1)] == (1, [1])
    assert idx[("c", 1)] == (1, [3])
    assert idx[("b", 2)] == (2, [0, 2])
    assert idx[("a", 3)] == (4, [0, 1, 2, 3])
    assert idx[("c", 4)] == (1, [0])
    assert not any(d == 5 for _t, d in idx)  # empty doc: no postings


def test_term_search_and_semantics(spark):
    idx = invindex.build_inverted_index(_docs(spark))
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in invindex.term_search(idx, ["a", "b"]).collect()]
    # only docs 1 (a:3 + b:1 = 4) and 2... doc 2 has no 'a' -> AND drops
    assert got == [(1, 1, 4)]
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in invindex.term_search(idx, ["b", "c"]).collect()]
    # doc 1: b1+c1=2; doc 2: b2+c1=3 -> doc 2 ranks first
    assert got == [(1, 2, 3), (2, 1, 2)]
    # k truncates after the deterministic order
    got = invindex.term_search(idx, ["b", "c"], k=1).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [(1, 2)]


def test_phrase_search_overlapping_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y x x"), (2, "x y x y"), (3, "y y")],
        "doc_id long, text string",
    )
    idx = invindex.build_inverted_index(docs)
    got = {r["doc_id"]: r["n_occurrences"]
           for r in invindex.phrase_search(idx, "x", "x").collect()}
    assert got == {1: 3}   # positions 0-1, 1-2, 4-5
    got = {r["doc_id"]: r["n_occurrences"]
           for r in invindex.phrase_search(idx, "x", "y").collect()}
    assert got == {1: 1, 2: 2}
    assert invindex.phrase_search(idx, "y", "x").count() == 2


def test_bucket_parity_and_pruning(spark, tmp_path):
    """Driver-side _term_buckets_py must equal the Catalyst
    term_bucket for every term (else pruning would silently miss
    postings); the pruned read touches only the query terms' bucket
    directories."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20))) for i in range(4)],
        "doc_id long, text string",
    )
    idx = invindex.build_inverted_index(docs)

    spark_buckets = {
        r["term"]: r["b"]
        for r in idx.select(
            "term", invindex.term_bucket(F.col("term"), 16).alias("b")
        ).distinct().collect()
    }
    for term, b in spark_buckets.items():
        assert invindex._term_buckets_py([term], 16) == [b], term

    path = str(tmp_path / "inv")
    invindex.write_index_partitioned(idx, path, n_buckets=16)
    terms = ["w3", "w11"]
    pruned = invindex.read_postings_pruned(spark, path, terms,
                                           n_buckets=16)
    assert {r["term"] for r in pruned.collect()} == set(terms)
    files = {
        r[0] for r in pruned.select(F.input_file_name())
        .distinct().collect()
    }
    touched = {int(re.search(r"__b=(\d+)/", f).group(1)) for f in files}
    assert touched == set(invindex._term_buckets_py(terms, 16))
    n_dirs = spark.read.parquet(path).select("__b").distinct().count()
    assert n_dirs > len(touched)
