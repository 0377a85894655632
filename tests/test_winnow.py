"""Winnowing fingerprints vs an INDEPENDENT per-window python
reference (min + rightmost tie-break), the paper's coverage guarantee
(any shared normalized substring of length >= w + k - 1 shares at
least one fingerprint), and the overlap report's df-filter /
threshold semantics."""

import hashlib

from logparser_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap,
)

K, W = 5, 4


def ref_fingerprints(text, k=K, w=W):
    norm = "".join(c for c in text.lower() if c.isalnum()
                   and ord(c) < 128)
    grams = [norm[i:i + k] for i in range(len(norm) - k + 1)]
    if not grams:
        return set()
    hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
    out = set()
    for j in range(max(len(hs) - w + 1, 1)):
        window = hs[j:j + w]
        m = min(window)
        ri = max(i for i, h in enumerate(window) if h == m)
        out.add((m, j + ri + 1))
    return out


def _got(spark, texts, k=K, w=W):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        out.setdefault(r["doc_id"], set()).add(
            (r["fingerprint"], r["pos"])
        )
    return out


def test_matches_reference_incl_edges(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "the QUICK-brown fox!!! jumps over a lazy dog",
        "completely different words entirely unrelated",
        "ab",            # fewer chars than k: no grams, no rows
        "abcdefg",       # fewer grams than w: ONE window over all
        "",
        "aaaaaaaaaaaa",  # all-equal hashes: rightmost tie-break
        "Mixed CASE   with\tpunct!? and 123 numbers",
    ]
    got = _got(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == ref_fingerprints(t), (i, t)
    assert 3 not in got and 5 not in got
    assert len(got[4]) == 1


def test_coverage_guarantee_shared_substring(spark):
    """Winnowing theorem: a shared substring of >= w + k - 1 = 8
    normalized chars guarantees >= 1 shared fingerprint — for EVERY
    alignment, so plant the shared run at several offsets."""
    shared = "zqxjkvbwpm"  # 10 > 8 chars, unusual so no accidents
    texts = [f"{'left' * i} {shared} {'right' * (5 - i)}"
             for i in range(5)]
    got = _got(spark, texts)
    fps = [
        {h for h, _p in got[i]} for i in range(5)
    ]
    for i in range(5):
        for j in range(i + 1, 5):
            assert fps[i] & fps[j], (i, j)


def test_overlap_report_df_filter_and_threshold(spark):
    # docs 0/1 share a long run; 'commonword' appears in ALL docs and
    # must be killed by max_df before it pairs everything
    texts = [
        "commonword the quick brown fox jumps over the lazy dog",
        "commonword quick brown fox jumps over the lazy cat",
        "commonword something else entirely here",
        "commonword another unrelated document body",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fps = winnow_fingerprints(df)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_overlap(fps, max_df=2, min_shared=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    # the common fingerprint is in 4 docs > max_df=2, so unrelated
    # docs never pair through it
    assert all(a == 0 and b == 1 for a, b in pairs)

    # with min_shared raised past the real overlap, nothing survives
    hi = winnow_overlap(fps, max_df=2, min_shared=10_000).collect()
    assert hi == []
