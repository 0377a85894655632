"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting. All pure Catalyst expressions (no UDFs) built
from portable SQL functions so the DuckDB oracle reproduces every value.

The language-ID is the classic marker-word heuristic (count per-language
stopword hits via the length-difference-of-replace trick, argmax); the
quality score mirrors common C4/Gopher-style cheap filters (length,
word-length, punctuation/stopword ratios).
"""

from __future__ import annotations

# (lang, markers) — ASCII marker words with surrounding spaces
LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " et ", " les "]),
    ("es", [" el ", " y ", " los "]),
]

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in"]

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _count_occurrences(col, needle: str):
    """Occurrences of ``needle`` via the portable length/replace trick."""
    from pyspark.sql import functions as F

    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def marker_counts(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc marker-word hit counts, one column per language
    (``hits_en``, ``hits_de``, ...). Text is lowercased and space-padded
    so edge tokens match."""
    from pyspark.sql import functions as F

    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    cols = [F.col(id_col)]
    for lang, markers in LANG_MARKERS:
        total = None
        for m in markers:
            c = _count_occurrences(padded, m)
            total = c if total is None else total + c
        cols.append(total.alias(f"hits_{lang}"))
    return df.select(*cols)


def language_id(df, text_col: str = "text", id_col: str = "doc_id"):
    """Argmax language over marker counts; 'und' when no marker hits.
    Ties break by LANG_MARKERS order (first wins)."""
    from pyspark.sql import functions as F

    mc = marker_counts(df, text_col, id_col)
    # CASE chain: first language whose count equals greatest(...) wins
    greatest = F.greatest(*[F.col(f"hits_{l}") for l, _ in LANG_MARKERS])
    pred = F.when(greatest <= 0, F.lit("und"))
    for lang, _ in LANG_MARKERS:
        pred = pred.when(F.col(f"hits_{lang}") == greatest, F.lit(lang))
    return mc.select(id_col, pred.alias("pred_lang"))


def token_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace tokens + BPE-ish regex tokens + char count."""
    from pyspark.sql import functions as F

    ws = F.size(
        F.filter(
            F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
        )
    ).cast("long")
    rx = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0))
    ).cast("long")
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        ws.alias("ws_tokens"),
        rx.alias("rx_tokens"),
    )


def quality_score(df, text_col: str = "text", id_col: str = "doc_id"):
    """Cheap quality heuristics + a composite score in [0, 100]:

    - length band (50..5000 chars),
    - mean word length band (2..12),
    - stopword ratio >= 5%,
    - alpha ratio >= 70%.
    """
    from pyspark.sql import functions as F

    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    words = F.size(F.filter(F.split(t, " "), lambda w: F.length(w) > 0))
    mean_wlen = F.when(words > 0,
                       F.length(F.replace(t, F.lit(" "), F.lit(""))) / words
                       ).otherwise(F.lit(0.0))
    stop_hits = None
    for w in STOPWORDS_EN:
        c = _count_occurrences(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    stop_ratio = F.when(words > 0, stop_hits / words).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))

    score = (
        F.when((n_chars >= 50) & (n_chars <= 5000), 25).otherwise(0)
        + F.when((mean_wlen >= 2) & (mean_wlen <= 12), 25).otherwise(0)
        + F.when(stop_ratio >= 0.05, 25).otherwise(0)
        + F.when(alpha_ratio >= 0.70, 25).otherwise(0)
    )
    # the REPORTED ratios round half-up to 6 decimals in INTEGER space
    # (x DIV y on int64): these are small-denominator rationals, and
    # double ROUND ties break half-up in Spark but half-even in DuckDB.
    # The score thresholds above stay on the raw double ratio — IEEE
    # division is bit-identical across engines, only ROUND is not.
    base = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        words.cast("long").alias("n_words"),
        F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("long")
        .alias("__nsp"),
        stop_hits.cast("long").alias("__stop"),
        alpha.cast("long").alias("__alpha"),
        score.cast("long").alias("quality_score"),
    )

    def r6(num: str, den: str):
        return F.when(
            F.col(den) > 0,
            F.expr(f"(2000000 * {num} + {den}) div (2 * {den})")
            / F.lit(1_000_000.0),
        ).otherwise(F.lit(0.0))

    return base.select(
        id_col, "n_chars", "n_words",
        r6("__nsp", "n_words").alias("mean_word_len"),
        r6("__stop", "n_words").alias("stopword_ratio"),
        r6("__alpha", "n_chars").alias("alpha_ratio"),
        "quality_score",
    )


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition filters, word / 2-gram level, as PURE
    per-row Catalyst array expressions — no explode, no shuffle, so the
    operator scales embarrassingly (one codegen'd projection over the
    scan at any row count).

    Outputs per document:

    - ``n_words`` / ``n_distinct_words``
    - ``dup_word_frac``: 1 - distinct/total (0 when empty)
    - ``top_word_frac``: occurrences of the most frequent word / total
    - ``top_2gram_frac``: occurrences of the most frequent adjacent
      2-gram / total 2-grams

    The max-frequency scans are O(distinct x total) per document —
    bounded by the document length, deliberately NOT a groupBy: at
    10^12 rows a per-doc quadratic over <=10^3 words stays in the
    codegen'd row pipeline while an explode+groupBy would shuffle
    ~10^15 word rows. Ratios round half-up in integer space (the same
    Spark/DuckDB ROUND-tie contract as quality_score).
    """
    from pyspark.sql import functions as F

    words = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    base = df.select(
        F.col(id_col),
        words.alias("__w"),
        F.zip_with(
            F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ).alias("__g"),
    )

    def top_freq(col):
        return F.array_max(
            F.transform(
                F.array_distinct(col),
                lambda w: F.size(F.filter(col, lambda x: x == w)),
            )
        )

    counted = base.select(
        id_col,
        F.size("__w").cast("long").alias("n_words"),
        F.size(F.array_distinct("__w")).cast("long")
        .alias("n_distinct_words"),
        F.coalesce(top_freq(F.col("__w")), F.lit(0)).cast("long")
        .alias("__topw"),
        F.size("__g").cast("long").alias("__ng"),
        F.coalesce(top_freq(F.col("__g")), F.lit(0)).cast("long")
        .alias("__topg"),
    )

    def r6(num, den):
        return F.when(
            F.col(den) > 0,
            F.expr(f"(2000000 * {num} + {den}) div (2 * {den})")
            / F.lit(1_000_000.0),
        ).otherwise(F.lit(0.0))

    return counted.select(
        id_col, "n_words", "n_distinct_words",
        r6("(n_words - n_distinct_words)", "n_words")
        .alias("dup_word_frac"),
        r6("__topw", "n_words").alias("top_word_frac"),
        r6("__topg", "__ng").alias("top_2gram_frac"),
    )


# deterministic PII feed: arithmetic in doc_id so a SQL oracle predicts
# the exact pre-scrub text AND the post-scrub text
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RX = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_SSN_RX = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def with_pii(df, text_col: str = "text", id_col: str = "doc_id"):
    """Test feed: plant deterministic PII (one email, one IPv4, one
    SSN-shaped id, all arithmetic in doc_id) into each document, where
    a crawl would carry real leaked PII. Catalyst concat — no Python."""
    from pyspark.sql import functions as F

    i = F.col(id_col)
    return df.withColumn(
        text_col,
        F.concat(
            F.col(text_col),
            F.lit(" contact user"), i.cast("string"),
            F.lit("@example.com from 10."), (i % 256).cast("string"),
            F.lit(".0."), (i % 250).cast("string"),
            F.lit(" ssn "),
            F.lpad((i % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"), F.lpad((i % 90 + 10).cast("string"), 2, "0"),
            F.lit("-"), F.lpad((i % 9000 + 1000).cast("string"), 4, "0"),
        ),
    )


def pii_scrub(df, text_col: str = "text", id_col: str = "doc_id"):
    """Redact emails / IPv4s / SSN-shaped ids with typed placeholders
    and count each redaction — pure Catalyst ``regexp_replace`` +
    ``regexp_count`` (RE2-compatible patterns, no lookarounds, so the
    same regexes run identically on Spark's Java engine and DuckDB's
    RE2). Per-row, shuffle-free; the standard scrub pass a crawl
    pipeline runs before training-data export."""
    from pyspark.sql import functions as F

    t = F.col(text_col)
    n_email = F.size(
        F.regexp_extract_all(t, F.lit(PII_EMAIL_RX), F.lit(0))
    )
    n_ip = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RX), F.lit(0)))
    n_ssn = F.size(F.regexp_extract_all(t, F.lit(PII_SSN_RX), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RX, "<EMAIL>"),
            PII_SSN_RX, "<SSN>",
        ),
        PII_IPV4_RX, "<IP>",
    )
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4"),
        n_ssn.cast("long").alias("n_ssn"),
    )


def unigram_doc_score(df, text_col: str = "text", id_col: str = "doc_id",
                      model_df=None):
    """CCNet-style language-model quality scoring with a corpus unigram
    model, kept integer-exact so any SQL engine reproduces it bit for
    bit: score_ppm = half-up((10^6 * sum of each token's corpus count)
    / (n_tokens * corpus_total)) — the document's average unigram
    probability in parts-per-million. High = boilerplate-ish common
    tokens, low = rare-token noise; pipelines threshold both tails.

    Two-pass shape: (1) build the unigram table (one word-keyed
    aggregate — at web scale the vocabulary is ~10^7 rows, broadcastable
    once built, while the corpus is 10^12); pass ``model_df`` to reuse a
    prebuilt/persisted model instead. (2) explode each doc's tokens,
    broadcast-join the model, and re-aggregate per doc with map-side
    partials. The only full-corpus shuffles are the model build and the
    per-doc count — no sort, no global state.

    Output: ``(doc_id, n_tokens, sum_freq, score_ppm)``; empty docs
    score 0 with ``n_tokens = 0``.
    """
    from pyspark.sql import functions as F

    words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "),
                     lambda t: F.length(t) > 0)
        ).alias("word"),
    )
    if model_df is None:
        model_df = words.groupBy("word").agg(
            F.count("*").alias("word_count")
        ).persist()
    # one O(1) scalar job over the (vocabulary-sized) model — embedded
    # as a literal rather than crossJoined, which would plan a
    # BroadcastNestedLoopJoin (forbidden by the plan-shape invariants
    # even at 1 row)
    total = model_df.agg(F.sum("word_count")).collect()[0][0] or 0
    if total == 0:  # empty corpus: everything scores 0 tokens
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("sum_freq"),
            F.lit(0).cast("long").alias("score_ppm"),
        )
    per_doc = (
        # LEFT join: when a prebuilt model_df is reused across corpus
        # snapshots, out-of-vocabulary tokens must still count toward
        # n_tokens and contribute ZERO frequency (pulling the average
        # down, as a rare token should) — an inner join would silently
        # drop them and inflate the score
        words.join(F.broadcast(model_df), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce("word_count", F.lit(0)))
            .cast("long").alias("sum_freq"),
        )
    )
    base = df.select(F.col(id_col)).join(per_doc, id_col, "left")
    return base.select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("sum_freq", F.lit(0)).alias("sum_freq"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            # DECIMAL(38,0): 2e6 * sum_freq overflows int64 once
            # sum_freq > ~4.6e12 (routine at 10^12-token corpora)
            F.expr(
                "(2000000 * CAST(sum_freq AS DECIMAL(38,0))"
                f" + CAST(n_tokens AS DECIMAL(38,0)) * {int(total)}) "
                "div (2 * CAST(n_tokens AS DECIMAL(38,0)) "
                f"* {int(total)})"
            ),
        ).otherwise(F.lit(0)).cast("long").alias("score_ppm"),
    )


def tfidf_top_terms(df, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", model_df=None):
    """Top-``k`` TF-IDF terms per document with an integer-exact IDF,
    so any SQL engine reproduces the ranking bit for bit:
    ``idf_ppm = (N_docs * 10^6) div doc_freq`` (integer division) and
    ``score = tf * idf_ppm`` — monotone in the real tf·log-idf for a
    fixed corpus, with no float log to diverge across engines.

    Output: ``(doc_id, rank, term, tf, doc_freq, score)``, ranks
    ``1..k`` ordered by (score desc, term asc) — the term tiebreak
    makes the cut deterministic.

    Scale shape: tf is one (doc, term) aggregate with map-side
    partials; doc_freq is a second aggregate over the (already
    distinct) tf table — vocabulary-sized (~10^7 rows at web scale),
    so it broadcast-joins back onto tf; pass ``model_df`` (a
    ``(word, doc_freq)`` frame) to reuse a persisted vocabulary
    instead of rebuilding it. The top-k window shuffles on doc_id —
    same key as tf, so AQE coalesces it onto the existing exchange.
    N_docs is an O(1) scalar job embedded as a literal (a 1-row
    crossJoin would plan a BroadcastNestedLoopJoin, forbidden by the
    plan-shape invariants).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_docs = int(df.count())
    words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "),
                     lambda t: F.length(t) > 0)
        ).alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    if model_df is None:
        model_df = tf.groupBy("term").agg(
            F.count("*").cast("long").alias("doc_freq")
        )
    scored = tf.join(F.broadcast(model_df), "term").select(
        id_col, "term", "tf", "doc_freq",
        (F.col("tf") * F.expr(f"(CAST({n_docs} AS BIGINT) * 1000000) "
                              "div doc_freq"))
        .cast("long").alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("int").alias("rank"),
                "term", "tf", "doc_freq", "score")
    )


# C0 controls except \t \n \r, plus DEL — the bytes a crawl's broken
# encodings leave behind. Same RE2-compatible class on Spark and DuckDB.
CONTROL_CHAR_RX = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(df, text_col: str = "text", id_col: str = "doc_id"):
    """Crawl-text normalization: Unicode NFC composition (the one step
    Catalyst has no builtin for — a vectorized Arrow pandas_udf over
    ``Series.str.normalize``, never per-row Python), then pure-Catalyst
    control-character stripping, space/tab-run collapsing, and trim.
    NFC runs FIRST so a stray control byte can't be sitting between a
    base char and its combining mark when composition happens.

    Output: ``(id_col, norm_text, changed)`` — ``changed`` flags rows
    the normalization actually touched (the usual audit metric:
    fraction of corpus with mojibake/controls).

    Scale shape: map-only projection, one Python stage (the same
    boundary budget as the parse kernel); everything else stays in
    whole-stage codegen. DuckDB reproduces it exactly via
    ``nfc_normalize`` + the same RE2 patterns.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    def _nfc_impl(s):
        return s.str.normalize("NFC")

    # annotations set explicitly: pandas is imported function-locally,
    # so a `s: pd.Series` hint would be an unresolvable string here
    _nfc_impl.__annotations__ = {"s": pd.Series, "return": pd.Series}
    nfc = F.pandas_udf(_nfc_impl, "string")

    t = nfc(F.col(text_col))
    t = F.regexp_replace(t, CONTROL_CHAR_RX, "")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.trim(t)
    return df.select(
        F.col(id_col),
        t.alias("norm_text"),
        (t != F.col(text_col)).alias("changed"),
    )


def domain_quality_blocklist(df, source_col: str = "source",
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             min_score: int = 75, min_docs: int = 5,
                             min_ok_ppm: int = 600_000):
    """Domain-level quality filtering (the RefinedWeb/C4 move of
    dropping whole hosts, not just pages): aggregate the per-document
    :func:`quality_score` verdict per ``source_col`` and block any
    domain with enough evidence (``n_docs >= min_docs``) whose share
    of quality documents falls below ``min_ok_ppm``. Small domains are
    never blocked — insufficient evidence is not a verdict.

    Output: ``(source, n_docs, n_ok, ok_ppm, blocked)`` with
    ``ok_ppm = 10^6 * n_ok div n_docs`` (pinned truncating division).

    Scale shape: the per-doc score is one codegen projection over the
    scan; one narrow id-keyed join attaches the domain, then ONE
    domain-keyed agg (two counters, map-side combined). Domains are
    bounded (~10^8 hosts at web scale), so the output is broadcastable
    back as the actual blocklist join."""
    from pyspark.sql import functions as F

    q = quality_score(df, text_col, id_col).select(
        id_col, "quality_score"
    )
    j = df.select(id_col, source_col).join(q, id_col)
    agg = j.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            (F.col("quality_score") >= min_score).cast("long")
        ).cast("long").alias("n_ok"),
    )
    return agg.select(
        source_col,
        "n_docs",
        "n_ok",
        F.expr("(1000000L * n_ok) div n_docs").alias("ok_ppm"),
        (
            (F.col("n_docs") >= min_docs)
            & (F.expr("(1000000L * n_ok) div n_docs") < min_ok_ppm)
        ).alias("blocked"),
    )


def filter_verdict(df, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 5, max_words: int = 100_000,
                   min_quality: int = 75, max_dup_ppm: int = 400_000,
                   allowed_langs: tuple = ("en",)):
    """C4/FineWeb-style corpus filter chain — the keep/drop decision a
    training-data pipeline applies to every crawled page — as ONE
    codegen'd projection over the scan (no joins between the signal
    operators, which would re-scan the text column per signal; the
    expressions below are the same building blocks `language_id` /
    `quality_score` / `repetition_stats` use, composed in a single
    SELECT because at 10^12 rows the text scan IS the budget).

    Rules, evaluated per document:

    - ``lang``: marker-argmax language must be in ``allowed_langs``
    - ``length``: word count in [min_words, max_words]
    - ``quality``: the composite quality_score >= min_quality (raw
      IEEE-double ratios at the thresholds — bit-identical across
      engines, no ROUND involved)
    - ``repetition``: duplicate-word fraction <= max_dup_ppm, tested
      as the INTEGER inequality (n_words - n_distinct) * 10^6 <=
      max_dup_ppm * n_words — no division, no rounding contract at all

    Output: ``(doc_id, pred_lang, n_words, quality_score, keep,
    reasons)`` where ``reasons`` comma-joins the FAILED rule names in
    fixed (lang, length, quality, repetition) order — '' when kept.
    """
    from pyspark.sql import functions as F

    t = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))

    # language argmax (same markers/tiebreak as language_id)
    hits = {}
    for lang, markers in LANG_MARKERS:
        total = None
        for m in markers:
            c = _count_occurrences(padded, m)
            total = c if total is None else total + c
        hits[lang] = total
    greatest = F.greatest(*hits.values())
    pred = F.when(greatest <= 0, F.lit("und"))
    for lang, _ in LANG_MARKERS:
        pred = pred.when(hits[lang] == greatest, F.lit(lang))

    # quality signals (same expressions as quality_score)
    n_chars = F.length(t).cast("double")
    word_arr = F.filter(F.split(t, " "), lambda w: F.length(w) > 0)
    words = F.size(word_arr)
    n_distinct = F.size(F.array_distinct(word_arr))
    mean_wlen = F.when(
        words > 0,
        F.length(F.replace(t, F.lit(" "), F.lit(""))) / words,
    ).otherwise(F.lit(0.0))
    stop_hits = None
    for w in STOPWORDS_EN:
        c = _count_occurrences(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    stop_ratio = F.when(words > 0, stop_hits / words).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_chars >= 50) & (n_chars <= 5000), 25).otherwise(0)
        + F.when((mean_wlen >= 2) & (mean_wlen <= 12), 25).otherwise(0)
        + F.when(stop_ratio >= 0.05, 25).otherwise(0)
        + F.when(alpha_ratio >= 0.70, 25).otherwise(0)
    ).cast("long")

    lang_ok = pred.isin(*allowed_langs)
    len_ok = (words >= min_words) & (words <= max_words)
    q_ok = score >= min_quality
    rep_ok = (
        (words.cast("long") - n_distinct.cast("long")) * 1_000_000
        <= F.lit(max_dup_ppm) * words.cast("long")
    )
    reasons = F.concat_ws(
        ",",
        F.when(~lang_ok, F.lit("lang")),
        F.when(~len_ok, F.lit("length")),
        F.when(~q_ok, F.lit("quality")),
        F.when(~rep_ok, F.lit("repetition")),
    )
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        words.cast("long").alias("n_words"),
        score.alias("quality_score"),
        (lang_ok & len_ok & q_ok & rep_ok).alias("keep"),
        reasons.alias("reasons"),
    )


def bigram_doc_score(df, text_col: str = "text", id_col: str = "doc_id",
                     model_df=None, hist_df=None, vocab_size=None):
    """CCNet-style LM quality scoring, one rung above
    :func:`unigram_doc_score`: an add-1-smoothed CONDITIONAL bigram
    model, kept integer-exact so any SQL engine reproduces it bit for
    bit. Per within-document adjacent word pair (w1, w2):

        p_ppm = (10^6 * (c12 + 1)) div (c1 + V)

    where ``c12`` = corpus count of the bigram, ``c1`` = corpus count
    of bigrams starting with ``w1`` (the history mass), ``V`` =
    distinct unigram vocabulary size; the document score is
    ``sum(p_ppm) div n_bigrams`` (integer division throughout — the
    ``div``s are exact 64-bit ops, never IEEE doubles, which is what
    makes the score engine-portable where a float log-perplexity would
    drift in the last ulp).

    Two-pass shape mirroring the unigram scorer: (1) one bigram-keyed
    aggregate builds the model (at web scale ~10^8-row, still far
    below the corpus; pass ``model_df``/``hist_df``/``vocab_size`` to
    reuse a persisted model), plus one O(1) scalar job for ``V``;
    (2) explode each doc's bigrams, broadcast-join model + history,
    re-aggregate per doc with map-side partials. OOV bigrams keep
    contributing (c12 = 0, and an unseen history costs 10^6 div V) —
    unseen text scores LOW, as a filter needs.

    Output: ``(doc_id, n_bigrams, score_ppm)``; docs with fewer than
    two tokens score 0 with ``n_bigrams = 0``.
    """
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda t: F.length(t) > 0)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.get(toks, i).alias("w1"),
                F.get(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = df.select(
        F.col(id_col), F.explode(pairs).alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    if model_df is None:
        model_df = bg.groupBy("w1", "w2").agg(
            F.count("*").cast("long").alias("c12")
        ).persist()
    if hist_df is None:
        hist_df = model_df.groupBy("w1").agg(
            F.sum("c12").cast("long").alias("c1")
        )
    if vocab_size is None:
        vocab_size = (
            df.select(F.explode(toks).alias("w")).distinct().count()
        )
    if vocab_size == 0:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(0).cast("long").alias("score_ppm"),
        )

    p_ppm = F.expr(
        f"(1000000 * (coalesce(c12, 0) + 1)) div "
        f"(coalesce(c1, 0) + {int(vocab_size)})"
    )
    per_doc = (
        bg.join(F.broadcast(model_df), ["w1", "w2"], "left")
        .join(F.broadcast(hist_df), ["w1"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(p_ppm).cast("long").alias("sum_p"),
        )
    )
    base = df.select(F.col(id_col)).join(per_doc, id_col, "left")
    return base.select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long")
        .alias("n_bigrams"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.expr("sum_p div n_bigrams"),
        ).otherwise(F.lit(0)).cast("long").alias("score_ppm"),
    )


def fix_mojibake(df, text_col: str = "text", id_col: str = "doc_id"):
    """Repair the classic double-encoding mojibake (UTF-8 bytes read
    back as Latin-1: 'café' shipped as 'cafÃ©') — a standard crawl
    cleanup — as a PURE Catalyst expression: re-encode the text to
    ISO-8859-1 (recovering the original UTF-8 bytes) and decode as
    UTF-8. The repair applies only when ALL of:

    1. the text carries a mojibake signature: some char in the UTF-8
       LEAD-byte range (U+00C2–U+00F4 — the Latin-1 views of lead
       bytes, 'Ã'/'Â'/'â'/'ð'...) immediately followed by one in the
       continuation range (U+0080–U+00BF);
    2. the text survives a Latin-1 round-trip unchanged (characters
       above U+00FF can't have come from a Latin-1 misread); and
    3. the re-decode produces no U+FFFD (the recovered bytes really
       are valid UTF-8).

    Anything else passes through untouched — genuine accented Latin-1
    text fails (1) and (3), already-clean Unicode fails (2).

    All three gates are PURE REGEX over the text (condition 3 is the
    UTF-8 DFA written as character classes over the byte-valued
    chars), so the ANSI-strict ``decode`` — which throws on malformed
    input rather than substituting U+FFFD — only ever executes inside
    the CASE branch where validity is already proven.

    Output: ``(id_col, fixed, was_fixed)``. Map-only, no UDF/shuffle —
    the encode/decode pair runs inside whole-stage codegen."""
    from pyspark.sql import functions as F

    # the UTF-8 well-formedness DFA (RFC 3629 table) over chars whose
    # codepoints ARE the recovered byte values
    utf8_valid = (
        "^(?:[\\x00-\\x7F]"
        "|[\\xC2-\\xDF][\\x80-\\xBF]"
        "|\\xE0[\\xA0-\\xBF][\\x80-\\xBF]"
        "|[\\xE1-\\xEC][\\x80-\\xBF]{2}"
        "|\\xED[\\x80-\\x9F][\\x80-\\xBF]"
        "|[\\xEE-\\xEF][\\x80-\\xBF]{2}"
        "|\\xF0[\\x90-\\xBF][\\x80-\\xBF]{2}"
        "|[\\xF1-\\xF3][\\x80-\\xBF]{3}"
        "|\\xF4[\\x80-\\x8F][\\x80-\\xBF]{3}"
        ")*$"
    )
    s = F.col(text_col)
    valid = (
        s.rlike("[\\xC2-\\xF4][\\x80-\\xBF]")  # mojibake signature
        & s.rlike("^[\\x00-\\xFF]*$")  # could have come from Latin-1
        & s.rlike(utf8_valid)          # recovered bytes are UTF-8
    )
    fixed = F.when(
        valid, F.decode(F.encode(s, "ISO-8859-1"), "UTF-8")
    ).otherwise(s)
    return df.select(
        F.col(id_col),
        fixed.alias("fixed"),
        (valid & (fixed != s)).alias("was_fixed"),
    )


MOJIBAKE_BASES = ["café crème", "naïve façade", "señor año",
                  "über größe"]


def synth_mojibake(df, id_col: str = "doc_id", out_col: str = "text2",
                   keep_cols=None):
    """Deterministic mojibake synthesizer: base(i) =
    MOJIBAKE_BASES[i % 4] + ' doc ' + i; every third id ships CLEAN
    (the no-fix path — real accents that must survive untouched), the
    rest ship double-encoded (UTF-8 bytes re-read as Latin-1). An
    oracle predicts the repaired text by construction."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    keep = keep_cols if keep_cols is not None else [id_col]

    def synth(i: int) -> str:
        base = f"{MOJIBAKE_BASES[i % 4]} doc {i}"
        if i % 3 == 0:
            return base
        return base.encode("utf-8").decode("latin-1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [synth(int(i)) for i in pdf[id_col]]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    ) + f", {out_col} string"
    return df.select(*keep).mapInPandas(fn, schema)


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_quality(df, text_col: str = "text", id_col: str = "doc_id"):
    """The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training
    Gopher", Table A1 — the filter battery most open LLM corpora
    reuse), computed integer-exactly so a SQL oracle can re-derive
    every metric AND every verdict bit-for-bit:

    1. word count in [50, 100 000]
    2. mean word length in [3, 10] chars
    3. symbol-to-word ratio ('#' chars + '...' runs) ≤ 0.1
    4. ≤ 90 % of lines start with a bullet ('•', '-', '*')
    5. ≤ 30 % of lines end with an ellipsis ('...' or '…')
    6. ≥ 80 % of words contain ≥ 1 alphabetic character
    7. ≥ 2 DISTINCT Gopher stop words present
       (the/be/to/of/and/that/have/with)

    Ratios are parts-per-million integers (numerator * 10^6 div
    denominator — floor division, every engine agrees); a doc with
    zero words fails rules 1/2/3/6 by definition (ppm columns NULL).

    Output: ``(doc_id, n_words, mean_word_len_ppm, symbol_ratio_ppm,
    bullet_line_ppm, ellipsis_line_ppm, alpha_word_ppm,
    n_stop_distinct, r1..r7 booleans, passes)``.

    Scale shape: single map-only projection, pure Catalyst codegen —
    no shuffle, no UDF, no explode; the per-sink quality gate this
    feeds (``filter_verdict`` chain) stays one scan at any corpus
    size."""
    from pyspark.sql import functions as F

    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda t: F.length(F.trim(t)) > 0,
    )
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    n_hash = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    ).cast("long")
    n_ellipsis_runs = (
        (F.length(text_col)
         - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit(""))))
        / 3
    ).cast("long")
    n_bullet = F.size(F.filter(
        lines,
        lambda t: F.trim(t).rlike("^[•\\-*]"),
    )).cast("long")
    n_ell_end = F.size(F.filter(
        lines,
        lambda t: F.trim(t).rlike("(\\.\\.\\.|…)$"),
    )).cast("long")
    n_alpha = F.size(F.filter(
        words, lambda t: t.rlike("[A-Za-z]")
    )).cast("long")
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
    )).cast("long")

    d = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_lines.alias("__n_lines"),
        sum_word_len.alias("__swl"),
        (n_hash + n_ellipsis_runs).alias("__nsym"),
        n_bullet.alias("__nbul"),
        n_ell_end.alias("__nell"),
        n_alpha.alias("__nalpha"),
        n_stop.alias("n_stop_distinct"),
    ).select(
        id_col,
        "n_words",
        F.when(F.col("n_words") > 0,
               F.expr("(__swl * 1000000) div n_words"))
        .cast("long").alias("mean_word_len_ppm"),
        F.when(F.col("n_words") > 0,
               F.expr("(__nsym * 1000000) div n_words"))
        .cast("long").alias("symbol_ratio_ppm"),
        F.when(F.col("__n_lines") > 0,
               F.expr("(__nbul * 1000000) div __n_lines"))
        .cast("long").alias("bullet_line_ppm"),
        F.when(F.col("__n_lines") > 0,
               F.expr("(__nell * 1000000) div __n_lines"))
        .cast("long").alias("ellipsis_line_ppm"),
        F.when(F.col("n_words") > 0,
               F.expr("(__nalpha * 1000000) div n_words"))
        .cast("long").alias("alpha_word_ppm"),
        "n_stop_distinct",
    )
    r1 = F.col("n_words").between(50, 100_000)
    r2 = F.col("mean_word_len_ppm").between(3_000_000, 10_000_000)
    r3 = F.col("symbol_ratio_ppm") <= 100_000
    r4 = F.coalesce(F.col("bullet_line_ppm") <= 900_000, F.lit(True))
    r5 = F.coalesce(F.col("ellipsis_line_ppm") <= 300_000, F.lit(True))
    r6 = F.col("alpha_word_ppm") >= 800_000
    r7 = F.col("n_stop_distinct") >= 2
    flags = [
        F.coalesce(r, F.lit(False)).alias(f"r{i}")
        for i, r in enumerate([r1, r2, r3, r4, r5, r6, r7], start=1)
    ]
    out = d.select(id_col, "n_words", "mean_word_len_ppm",
                   "symbol_ratio_ppm", "bullet_line_ppm",
                   "ellipsis_line_ppm", "alpha_word_ppm",
                   "n_stop_distinct", *flags)
    passes = F.col("r1")
    for i in range(2, 8):
        passes = passes & F.col(f"r{i}")
    return out.withColumn("passes", passes)


def tag_keywords(df, keywords, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Multi-keyword tagging — blocklist / topic / contamination-term
    matching: which of ``keywords`` occur in each document (as whole
    words). ONE regex alternation anchored with word boundaries does
    the whole dictionary in a single scan: RE2 compiles alternations
    to a DFA, so this is the Aho-Corasick use case without leaving
    codegen (per-keyword ``contains`` would rescan the text
    len(keywords) times). Matching is case-sensitive byte equality;
    lower both sides upstream for folding.

    Output: ``(doc_id, tags, n_tags)`` — ``tags`` the sorted distinct
    matched keywords. Map-only, no shuffle, no UDF.

    Dictionary contract: keywords are regex-escaped (literal match)
    and the pattern is a codegen literal — fine to ~10^4 terms; a
    10^6-term dictionary wants the broadcast-join token form
    (``contamination_check``'s shape) instead."""
    import re as _re

    from pyspark.sql import functions as F

    if not keywords:
        raise ValueError("keywords must be non-empty")
    pat = r"\b(" + "|".join(
        _re.escape(k) for k in sorted(set(keywords))
    ) + r")\b"
    tags = F.array_sort(F.array_distinct(
        F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(1))
    ))
    return df.select(
        F.col(id_col),
        tags.alias("tags"),
        F.size(tags).cast("long").alias("n_tags"),
    )


def collocations(df, min_count: int = 3, text_col: str = "text",
                 id_col: str = "doc_id"):
    """PMI-style collocation mining: adjacent word pairs whose observed
    count exceeds what their marginals predict — the classic corpus-
    analysis signal for multi-word expressions ("new york", "et al"),
    and a cheap phrase-vocabulary builder for tokenizer training.

    Association score, kept integer-exact so any SQL engine reproduces
    it bit for bit: ``lift_ppm = half-up(10^6 · c_xy · M / (cL_x ·
    cR_y))`` where ``c_xy`` is the bigram count, ``M`` the corpus bigram
    total, ``cL_x`` the count of ``x`` as a LEFT bigram member and
    ``cR_y`` of ``y`` as RIGHT (positional marginals — exactly the
    bigram-table row/column sums, so the lift is a true observed/expected
    ratio under positional independence). lift_ppm > 10^6 means
    attraction; PMI = log2(lift) is monotone in it, so thresholds and
    rankings carry over without cross-engine float logs. Products go
    through DECIMAL(38,0): 10^6 · c_xy · M overflows int64 once
    M > ~9·10^6 — guaranteed at any real corpus size.

    Output: ``(w1, w2, n_pair, lift_ppm)`` for pairs with ``n_pair ≥
    min_count`` — a set, not a top-k, so no cross-engine tie-break
    hazard. Scale shape: the bigram explode is linear in corpus tokens;
    ONE (w1,w2)-keyed aggregate (map-side combined) builds the table;
    the marginals are two re-aggregates of THAT table (vocabulary-sized,
    not corpus-sized) broadcast back onto it. One corpus-sized shuffle
    total; no windows, no sort.
    """
    from pyspark.sql import functions as F

    # one explode; the filter keeps token positions identical to the
    # other word-level operators (split on single space, drop empties)
    bigrams = df.select(
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: F.length(t) > 0).alias("__w")
    ).select(
        F.explode(
            F.expr(
                "CASE WHEN size(__w) >= 2 THEN "
                "transform(sequence(1, size(__w) - 1), "
                "i -> struct(element_at(__w, i) AS w1, "
                "element_at(__w, i + 1) AS w2)) "
                "ELSE array() END"
            )
        ).alias("__b")
    ).select("__b.w1", "__b.w2")

    pair_tab = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    ).persist()
    left_m = pair_tab.groupBy("w1").agg(
        F.sum("n_pair").cast("long").alias("c_left"))
    right_m = pair_tab.groupBy("w2").agg(
        F.sum("n_pair").cast("long").alias("c_right"))
    total = pair_tab.agg(F.sum("n_pair")).collect()[0][0] or 0
    if total == 0:
        return pair_tab.select(
            "w1", "w2", "n_pair",
            F.lit(0).cast("long").alias("lift_ppm"),
        ).filter(F.lit(False))
    out = (
        pair_tab.filter(F.col("n_pair") >= int(min_count))
        .join(F.broadcast(left_m), "w1")
        .join(F.broadcast(right_m), "w2")
    )
    lift = F.expr(
        f"(2000000 * CAST(n_pair AS DECIMAL(38,0)) * {int(total)}"
        " + CAST(c_left AS DECIMAL(38,0)) * c_right) "
        "div (2 * CAST(c_left AS DECIMAL(38,0)) * c_right)"
    ).cast("long")
    return out.select("w1", "w2", "n_pair", lift.alias("lift_ppm"))


def luhn_cc_scrub(df, text_col: str = "text", id_col: str = "doc_id",
                  mask: str = "[CC]"):
    """Checksum-validated credit-card scrubbing — the PII pass regex
    alone cannot do: a 13-19 digit run (spaces/dashes allowed) is only
    masked when it PASSES the Luhn check, so order ids and phone-number
    runs survive while real PANs are removed. This is the standard
    precision upgrade over ``pii_scrub``'s pattern-only rules.

    Pure Catalyst higher-order functions, no UDF: candidates from ONE
    ``regexp_extract_all`` (the pattern avoids lookarounds so RE2-based
    engines replay it exactly), the Luhn sum as an ``aggregate`` fold
    over digit positions (double every second digit from the right,
    subtract 9 on overflow), and the scrub as an ``aggregate`` fold of
    literal ``replace`` calls over the validated candidates — map-only,
    one projection, no shuffle.

    Output: ``(id_col, n_cc_candidates, n_cc_valid, scrubbed)``.
    """
    from pyspark.sql import functions as F

    luhn_digit = (
        "CASE WHEN (length(s.dg) - i) % 2 = 1 THEN "
        "CASE WHEN 2 * cast(substring(s.dg, i, 1) AS INT) > 9 "
        "THEN 2 * cast(substring(s.dg, i, 1) AS INT) - 9 "
        "ELSE 2 * cast(substring(s.dg, i, 1) AS INT) END "
        "ELSE cast(substring(s.dg, i, 1) AS INT) END"
    )
    cands = F.expr(
        rf"transform(regexp_extract_all({text_col},"
        r" '\\d(?:[ -]?\\d){12,18}', 0),"
        r" c -> struct(c AS c, translate(c, ' -', '') AS dg))"
    )
    valid = (
        "filter(__cs, s -> aggregate(sequence(1, length(s.dg)), 0, "
        f"(acc, i) -> acc + {luhn_digit}) % 10 = 0)"
    )
    return df.select(
        F.col(id_col),
        F.col(text_col),
        cands.alias("__cs"),
    ).select(
        id_col,
        F.expr("size(__cs)").cast("long").alias("n_cc_candidates"),
        F.expr(f"size({valid})").cast("long").alias("n_cc_valid"),
        F.expr(
            f"aggregate(transform({valid}, s -> s.c), {text_col}, "
            f"(acc, c) -> replace(acc, c, '{mask}'))"
        ).alias("scrubbed"),
    )


def unigram_drift(df_a, df_b, min_delta_ppm: int = 1000,
                  text_col: str = "text"):
    """Distribution-drift report between two corpus snapshots — the
    monitoring primitive for incremental crawls: per word, its
    frequency in parts-per-million of each snapshot's token mass and
    the absolute delta, keeping words whose delta reaches
    ``min_delta_ppm``. A recrawl whose boilerplate/template mix shifted
    (or whose extraction broke) lights up here before any model does.

    Integer-exact: ppm = count·10⁶ div total (trunc — the pinned
    cross-engine division), deltas on those integers; words absent
    from one side carry ppm 0 (full-outer vocabulary join). DECIMAL
    products: count·10⁶ overflows int64 past ~9·10¹² tokens.

    Scale shape: one word-keyed aggregate per snapshot (map-side
    combined), one vocabulary-sized full-outer join — corpus rows never
    join anything. Output: ``(word, cnt_a, cnt_b, ppm_a, ppm_b,
    delta_ppm)``.
    """
    from pyspark.sql import functions as F

    def counts(df, side):
        words = df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "),
                         lambda t: F.length(t) > 0)
            ).alias("word")
        )
        return words.groupBy("word").agg(
            F.count("*").cast("long").alias(f"cnt_{side}")
        )

    ca, cb = counts(df_a, "a"), counts(df_b, "b")
    tot_a = ca.agg(F.sum("cnt_a")).collect()[0][0] or 1
    tot_b = cb.agg(F.sum("cnt_b")).collect()[0][0] or 1
    j = ca.join(cb, "word", "full_outer").select(
        "word",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
    )
    ppm_a = F.expr(
        f"(CAST(cnt_a AS DECIMAL(38,0)) * 1000000) div {int(tot_a)}"
    ).cast("long")
    ppm_b = F.expr(
        f"(CAST(cnt_b AS DECIMAL(38,0)) * 1000000) div {int(tot_b)}"
    ).cast("long")
    out = j.select(
        "word", "cnt_a", "cnt_b",
        ppm_a.alias("ppm_a"), ppm_b.alias("ppm_b"),
    ).withColumn("delta_ppm", F.abs(F.col("ppm_a") - F.col("ppm_b")))
    return out.where(F.col("delta_ppm") >= int(min_delta_ppm))
