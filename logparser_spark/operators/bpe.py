"""Byte-pair encoding over the corpus, both halves real and
Catalyst-only (zero Python in either hot path):

``bpe_train`` — the classic merge-rule learner (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): start
from characters, repeatedly merge the corpus-wide most-frequent
adjacent symbol pair. It operates on the DISTINCT-WORD frequency
table (the standard preaggregation: Zipf puts distinct words orders of
magnitude below corpus tokens, so every round is an aggregate over a
small table, not a corpus pass), with one 1-row ``collect`` per round
(the argmax pair — O(n_merges) driver data total, same budget as
``aggregate.py``'s O(1) collects).

``bpe_apply_tokens`` — applies an ordered merge list to every document
as a chain of literal ``replace`` expressions inside whole-stage
codegen. The representation is the MARKED symbol stream: every symbol
renders as ``#sym␣`` (``#the ``), so the merge pattern ``#a #b ``
can only ever match two WHOLE adjacent symbols — a bare
space-separated form would false-match symbol boundaries (``s th``
contains ``s t``), and a shared-delimiter form breaks adjacent
non-overlapping merges; the per-symbol prefix marker has neither
problem. ``#`` and the word-boundary ``|`` are reserved (stripped
from input text first; the boundary symbol ``#| `` blocks cross-word
merges). A DuckDB oracle states the identical chain, so tokenization
is bit-checkable cross-engine.

Semantics notes (documented contract): symbols are Unicode
codepoints; no end-of-word marker is appended (merges therefore do
not distinguish word-final symbols — the GPT-2 ``</w>``/byte-level
refinements layer on top of the same merge machinery); ties in the
pair argmax break to the lexicographically smallest (left, right).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

BOUNDARY = "|"
MARK = "#"


def _marked_stream(text_col):
    """text → marked symbol stream: 'the cat' → '#t #h #e #| #c #a #t '
    (trailing space kept — every merge pattern ends in one)."""
    from pyspark.sql import functions as F

    clean = F.regexp_replace(F.col(text_col), r"[#|]", "")
    one_sep = F.regexp_replace(clean, r"\s+", BOUNDARY)
    one_sep = F.regexp_replace(one_sep, r"^\|+|\|+$", "")
    return F.regexp_replace(one_sep, "(.)", f"{MARK}$1 ")


def apply_merges(col, merges: Sequence[Tuple[str, str]]):
    """Chain one literal ``replace`` per merge rule over a marked
    stream — the BPE apply step as a codegen expression."""
    from pyspark.sql import functions as F

    for a, b in merges:
        col = F.replace(
            col, F.lit(f"{MARK}{a} {MARK}{b} "), F.lit(f"{MARK}{a}{b} ")
        )
    return col


def bpe_apply_tokens(docs, merges: Sequence[Tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id"):
    """Tokenize every document with an ordered BPE merge list.

    Output: ``(id_col, bpe_text, n_tokens, n_words)`` — ``bpe_text``
    is the space-joined token stream with ``|`` word boundaries (the
    full tokenization, so an oracle hash-checks every token boundary,
    not just counts); ``n_tokens`` counts real tokens (boundaries
    excluded).

    Scale shape: map-only — no shuffle, no UDF, no explode; the merge
    chain is ``len(merges)`` string replaces inside one codegen stage,
    the same cost model as a C tokenizer pass over the bytes."""
    from pyspark.sql import functions as F

    s = apply_merges(_marked_stream(text_col), merges)
    toks = F.split(s, " ")
    n_words = F.size(F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    ))
    return docs.select(
        F.col(id_col),
        F.trim(F.replace(s, F.lit(MARK), F.lit(""))).alias("bpe_text"),
        F.size(F.filter(
            toks,
            lambda t: (F.length(t) > 1) & (t != F.lit(MARK + BOUNDARY)),
        )).cast("long").alias("n_tokens"),
        n_words.cast("long").alias("n_words"),
    )


def word_freq_table(docs, text_col: str = "text"):
    """(word, freq) over the corpus — the one corpus-sized shuffle of
    BPE training; every merge round afterwards touches only this."""
    from pyspark.sql import functions as F

    return (
        docs.select(
            F.explode(F.filter(
                F.split(
                    F.regexp_replace(F.col(text_col), r"[#|]", ""),
                    r"\s+",
                ),
                lambda t: F.length(t) > 0,
            )).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def bpe_train(docs, n_merges: int = 8, text_col: str = "text",
              checkpoint_every: int = 16,
              on_round=None) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` merge rules; returns
    ``[(left, right, pair_count), ...]`` in training order.

    Each round: split the (already partially merged) marked words into
    symbols, explode adjacent pairs weighted by word frequency, take
    the corpus argmax (ties → lexicographically smallest pair), and
    fold the winner back into the word table with one ``replace``.
    The working table stays (distinct words × freq); the per-round
    ``collect`` is exactly one row.

    Lineage contract: each round wraps the word table in one more
    ``replace`` projection, so an unbounded loop would hand Catalyst a
    plan ``n_merges`` projections deep — at a realistic vocabulary
    (10k–32k merges) per-round ANALYSIS cost grows superlinearly and
    dominates the job. Every ``checkpoint_every`` rounds the working
    table is therefore materialized with an eager ``localCheckpoint``
    (executor-local blocks — the table is the distinct-word freq
    table, orders of magnitude below the corpus, so the materialized
    copy is small; on a shared cluster where executor loss mid-train
    matters, set a checkpoint dir and swap in reliable
    ``checkpoint()``), truncating the plan to ≤ ``checkpoint_every``
    projections regardless of ``n_merges``. The checkpoint changes
    wall-clock shape only, never results.

    ``on_round(round_idx, seconds)``, if given, is called after every
    merge round with its wall time (instrumentation hook — the
    flat-per-round-time pytest uses it)."""
    import time

    from pyspark.sql import functions as F

    words = word_freq_table(docs, text_col).select(
        F.regexp_replace("word", "(.)", f"{MARK}$1 ").alias("s"),
        "freq",
    ).persist()
    words.count()

    merges: List[Tuple[str, str, int]] = []
    work = words
    for _round in range(n_merges):
        _t0 = time.monotonic()
        toks = F.filter(F.split(F.col("s"), " "),
                        lambda t: F.length(t) > 0)
        pairs = work.select(
            F.col("freq"),
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size(toks) - 2),
                        lambda i: F.struct(
                            F.get(toks, i).alias("a"),
                            F.get(toks, i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a_sym = top[0]["a"][len(MARK):]
        b_sym = top[0]["b"][len(MARK):]
        merges.append((a_sym, b_sym, int(top[0]["cnt"])))
        work = work.select(
            F.replace(
                F.col("s"),
                F.lit(f"{MARK}{a_sym} {MARK}{b_sym} "),
                F.lit(f"{MARK}{a_sym}{b_sym} "),
            ).alias("s"),
            "freq",
        )
        if checkpoint_every and (_round + 1) % checkpoint_every == 0:
            work = work.localCheckpoint(eager=True)
        if on_round is not None:
            on_round(_round, time.monotonic() - _t0)
    words.unpersist()
    return merges


def bpe_train_frame(docs, n_merges: int = 8, text_col: str = "text"):
    """``bpe_train`` as a DataFrame: one row per learned rule,
    ``(step, left, right, pair_count)`` with 1-based steps."""
    spark = docs.sparkSession
    merges = bpe_train(docs, n_merges=n_merges, text_col=text_col)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "step int, left string, right string, pair_count long",
    )
