"""Content-defined chunking: boundary rule differential vs pure
Python, and the insertion-robustness property fixed-window chunking
lacks."""

from __future__ import annotations

import hashlib


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cdc_py(text: str, k=8, divisor=16):
    if not text:
        return []
    cuts = [
        i + k - 1
        for i in range(1, max(len(text) - k + 1, 0) + 1)
        if _h64(text[i - 1:i - 1 + k]) % divisor == 0
        and 0 < i + k - 1 < len(text)
    ]
    cuts.append(len(text))
    chunks, prev = [], 0
    for c in cuts:
        chunks.append(text[prev:c])
        prev = c
    return chunks


def test_cdc_chunks_match_python(spark):
    from logparser_spark.operators.corpus import cdc_chunks

    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "short"),
        (3, ""),
        (4, "x" * 100),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got: dict = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    for i, t in texts:
        expected = list(enumerate(_cdc_py(t)))
        assert sorted(got.get(i, [])) == expected, i
    # reassembly invariant: chunks concatenate back to the text
    for i, t in texts:
        assert "".join(c for _, c in sorted(got.get(i, []))) == t


def test_cdc_survives_insertion_fixed_window_does_not(spark):
    from logparser_spark.operators.corpus import (
        cdc_duplicate_chunks,
        chunk_documents,
    )
    from pyspark.sql import functions as F

    # a word-salad base with 24 verified boundary positions (a periodic
    # string can have ZERO grams hashing to 0 mod 16 — found the hard
    # way — so the fixture text is pinned, not generated)
    base = (
        "hotel juliet delta mike papa echo charlie charlie alpha mike "
        "romeo juliet bravo hotel quebec romeo lima india foxtrot delta "
        "india golf alpha india india golf foxtrot juliet juliet lima "
        "charlie tango kilo mike quebec hotel foxtrot hotel papa india "
        "charlie romeo juliet alpha juliet sierra juliet quebec golf "
        "november november tango juliet november oscar foxtrot hotel "
        "juliet india bravo "
    )
    assert len(_cdc_py(base)) >= 4
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED-PREFIX " + base)], ["doc_id", "text"]
    )
    dup = cdc_duplicate_chunks(df, min_copies=2, min_len=4).collect()
    cross = [r for r in dup if r.n_docs == 2]
    assert cross, "CDC found no cross-document duplicate chunks"
    # fixed-window chunking on the same pair: zero shared chunks
    # (every window shifted by the prefix insertion)
    fx = chunk_documents(df, window=8, stride=8)
    shared = (
        fx.groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where("nd = 2")
        .count()
    )
    assert shared == 0
    # and CDC chunks still reassemble both documents exactly
    from logparser_spark.operators.corpus import cdc_chunks

    parts: dict = {}
    for r in cdc_chunks(df).collect():
        parts.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
    assert "".join(c for _, c in sorted(parts[1])) == base
    assert "".join(c for _, c in sorted(parts[2])) == (
        "INSERTED-PREFIX " + base
    )


def test_cdc_duplicate_report_counts(spark):
    from logparser_spark.operators.corpus import cdc_duplicate_chunks

    t = "one two three four five six seven eight nine ten " * 4
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, "unrelated " * 20)], ["doc_id", "text"]
    )
    rows = cdc_duplicate_chunks(df, min_copies=2, min_len=4).collect()
    assert rows
    for r in rows:
        assert r.n_copies >= 2
        assert r.canonical_doc == min(
            d for d in (1, 2, 3)
        ) or r.canonical_doc in (1, 3)
        # canonical is the smallest (doc, idx): never doc 2 when doc 1
        # has the same chunk
        assert r.canonical_doc != 2 or r.n_docs == 1
