"""BPE correctness against an INDEPENDENT tuple-walk reference (the
textbook per-word symbol-list algorithm): training argmax + tie-break,
apply-order dependence, the marked-representation regression (a bare
space-joined form false-matches symbol boundaries), adjacent
non-overlapping merges, boundary blocking, and reserved-char
stripping."""

import collections
import re

import pytest

from logparser_spark.operators import bpe


def naive_train(texts, n_merges):
    freq = collections.Counter(
        w for t in texts
        for w in re.split(r"\s+", re.sub(r"[#|]", "", t)) if w
    )
    words = {tuple(w): f for w, f in freq.items()}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a \
                        and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def naive_apply(text, merges):
    out_words = []
    for w in re.split(r"\s+", re.sub(r"[#|]", "", text)):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a \
                        and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out_words.append(" ".join(syms))
    return " | ".join(out_words)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )


def _apply(spark, texts, merges):
    out = bpe.bpe_apply_tokens(_docs(spark, texts), merges).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_train_matches_naive_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the rat ate the oat",
        "that hat is the best hat",
    ]
    got = bpe.bpe_train(_docs(spark, texts), n_merges=6)
    assert got == naive_train(texts, 6)


def test_train_tie_break_lexicographic(spark):
    # 'ab' and 'cd' pair counts tie at 3 — ('a','b') must win
    texts = ["ab ab ab cd cd cd"]
    got = bpe.bpe_train(_docs(spark, texts), n_merges=2)
    assert got[0] == ("a", "b", 3)
    assert got[1] == ("c", "d", 3)


def test_train_stops_when_no_pairs_left(spark):
    # single-char words only: zero adjacent pairs anywhere
    got = bpe.bpe_train(_docs(spark, ["a b c", "a c"]), n_merges=3)
    assert got == []


def test_apply_matches_naive_on_every_doc(spark):
    merges = [("t", "h"), ("th", "e"), ("a", "t"), ("c", "at")]
    texts = [
        "the cat that sat",
        "   theater   cats  ",
        "a",
        "",
        "catcat thethe",
    ]
    got = _apply(spark, texts, merges)
    for i, t in enumerate(texts):
        expect = naive_apply(t, merges)
        assert got[i]["bpe_text"] == expect, (i, t)
        assert got[i]["n_tokens"] == sum(
            1 for tok in expect.split(" ") if tok and tok != "|"
        )


def test_marked_representation_blocks_boundary_false_match(spark):
    # after (t,h) -> 'th', the word 'sth' is (s, th); a bare
    # space-joined form contains 's t' and would falsely merge (s,t).
    merges = [("t", "h"), ("s", "t")]
    got = _apply(spark, ["sth stone"], merges)
    assert got[0]["bpe_text"] == naive_apply("sth stone", merges)
    # 'sth' -> 's th' (NOT 'st h'); 'stone' -> 'st o n e'
    assert got[0]["bpe_text"] == "s th | st o n e"


def test_adjacent_merges_are_non_overlapping_left_greedy(spark):
    got = _apply(spark, ["abab aaab aaaa"], [("a", "b"), ("a", "a")])
    # abab -> ab ab; aaab -> aa (a b->ab? walk: (a,b) pass: a a ab;
    # then (a,a): aa ab); aaaa -> aa aa
    assert got[0]["bpe_text"] == "ab ab | aa ab | aa aa"


def test_merges_never_cross_word_boundaries(spark):
    got = _apply(spark, ["a b ab"], [("a", "b")])
    assert got[0]["bpe_text"] == "a | b | ab"
    assert got[0]["n_tokens"] == 3 and got[0]["n_words"] == 3


def test_reserved_marker_chars_are_stripped(spark):
    got = _apply(spark, ["a#b |x| c"], [("a", "b")])
    # '#' and '|' vanish before symbolization: words 'ab', 'x', 'c'
    assert got[0]["bpe_text"] == "ab | x | c"


def test_multichar_compound_merge_chain(spark):
    merges = [("r", "o"), ("ro", "w"), ("row", "s")]
    got = _apply(spark, ["rows row rowing"], merges)
    assert got[0]["bpe_text"] == naive_apply("rows row rowing", merges)
    assert got[0]["bpe_text"].split(" | ")[0] == "rows"


def test_train_frame_schema_and_steps(spark):
    df = bpe.bpe_train_frame(_docs(spark, ["aa aa ab"]), n_merges=2)
    rows = sorted(df.collect(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == [1, 2]
    assert [
        (r["left"], r["right"], r["pair_count"]) for r in rows
    ] == naive_train(["aa aa ab"], 2)


def test_checkpoint_never_changes_results(spark):
    """The lineage checkpoint is a wall-clock-shape change only: a
    checkpoint cadence that fires mid-train (every 7 of 30 rounds)
    must learn bit-identical rules to the naive reference AND to an
    uncheckpointed run."""
    texts = [
        "the cat sat on the mat with another cat",
        "that theater that the rats rated",
        "oat boat coat moat stoat throat",
    ]
    docs = _docs(spark, texts)
    ref = naive_train(texts, 30)
    got_ck = bpe.bpe_train(docs, n_merges=30, checkpoint_every=7)
    got_no = bpe.bpe_train(docs, n_merges=30, checkpoint_every=0)
    assert got_ck == ref
    assert got_no == ref


def test_train_200_merges_flat_per_round_time(spark):
    """Lineage contract (VERDICT r03 item 4): 200 merge rounds must
    run at FLAT per-round wall time. Without the periodic
    localCheckpoint each round re-analyzes a plan one replace
    projection deeper, and late rounds blow up superlinearly; with
    checkpoint_every=16 the plan depth is bounded, so the median of
    the last 40 rounds stays within a small factor of the first 40."""
    import hashlib
    import statistics

    # 240 distinct 12-char words over a-z → thousands of distinct
    # adjacent pairs, far more than 200 merge rounds consume
    words = [
        hashlib.md5(f"w{i}".encode()).hexdigest()[:12]
        .translate(str.maketrans("0123456789", "qwzxcvbnmk"))
        for i in range(240)
    ]
    docs = _docs(spark, [" ".join(words[i::8]) for i in range(8)])

    times = []
    merges = bpe.bpe_train(
        docs, n_merges=200, checkpoint_every=16,
        on_round=lambda r, s: times.append(s),
    )
    assert len(merges) == 200 and len(times) == 200
    head = statistics.median(times[:40])
    tail = statistics.median(times[-40:])
    # uncheckpointed, tail/head exceeds 10x by round 200; bounded
    # lineage keeps the round cost constant (generous 3x for CI noise)
    assert tail < 3.0 * head, (head, tail)
