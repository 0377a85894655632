"""Training-data pipeline ops: dedup / similarity / textstats /
multimodal. Invariant-style tests (the exact value parity with DuckDB is
covered by tools/check_oracle.py and the driver's correctness gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_identity_and_dups(spark, docs):
    from logparser_spark.operators import dedup

    base = dedup.exact_dedup(docs)
    n_docs = docs.count()
    assert base.agg(F.sum("n_copies")).collect()[0][0] == n_docs

    # duplicate the table -> every group doubles, canonical ids unchanged
    doubled = docs.unionAll(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    d2 = dedup.exact_dedup(doubled)
    assert d2.count() == base.count()
    assert d2.filter(F.col("n_copies") < 2).count() == 0
    # canonical = min id = the original ids
    assert d2.filter(F.col("canonical_id") >= 10_000).count() == 0


def test_exact_dedup_key_is_full_digest(spark):
    """Truncated-hash grouping merges distinct texts; the full-128-bit
    key must keep them separate. A true 60-bit md5-prefix collision needs
    ~2^30 work to mine, so the test demonstrates the failure mode at a
    searchable width (16-bit prefix) and asserts exact_dedup's key is
    immune to ANY prefix truncation."""
    import hashlib

    from logparser_spark.operators import dedup

    # mine two distinct texts whose md5s agree on the first 4 hex chars
    seen: dict[str, str] = {}
    pair = None
    i = 0
    while pair is None:
        t = f"collide-{i}"
        p = hashlib.md5(t.encode()).hexdigest()[:4]
        if p in seen and seen[p] != t:
            pair = (seen[p], t)
        seen[p] = t
        i += 1
    a, b = pair
    assert hashlib.md5(a.encode()).hexdigest()[:4] == \
        hashlib.md5(b.encode()).hexdigest()[:4]

    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id LONG, text STRING"
    )
    # old failure mode: grouping on a truncated digest merges the two
    trunc = (
        df.groupBy(F.substring(F.md5("text"), 1, 4).alias("k"))
        .count()
    )
    assert trunc.count() == 1  # the planted collision really collides
    # exact_dedup keys on the full md5 -> they stay separate
    out = dedup.exact_dedup(df).collect()
    assert len(out) == 2
    assert all(r["n_copies"] == 1 for r in out)
    # the (md5_hi, md5_lo) BIGINT pair covers ALL 128 digest bits:
    # un-biasing and recombining the two longs reconstructs the exact
    # md5 integer of each text (so no prefix/suffix bits are dropped by
    # the fixed-width shuffle key)
    texts = {0: a, 1: b}
    for r in out:
        full = ((r["md5_hi"] + 2**63) << 64) | (r["md5_lo"] + 2**63)
        expect = int(
            hashlib.md5(texts[r["canonical_id"]].encode()).hexdigest(), 16
        )
        assert full == expect


def test_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """A degenerate bucket (many identical-signature docs) must not emit
    O(b²) candidate pairs: buckets over max_bucket are dropped before
    the pair join, while normal near-dup pairs still surface."""
    from logparser_spark.operators import dedup

    boiler = [(i, "the same boilerplate body " * 4) for i in range(60)]
    near = [
        (1000, "a genuinely unique document about spark partitioning"),
        (1001, "a genuinely unique document about spark partitioning!"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id LONG, text STRING")

    capped = dedup.lsh_candidate_pairs(df, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the 60-doc degenerate cluster (1770 pairs uncapped) is dropped...
    assert not any(a < 60 and b < 60 for a, b in got)
    # ...while the planted near-dup pair survives
    assert (1000, 1001) in got

    uncapped = dedup.lsh_candidate_pairs(df, max_bucket=None)
    n_unc = uncapped.filter(
        (F.col("id_a") < 60) & (F.col("id_b") < 60)
    ).count()
    assert n_unc == 60 * 59 // 2  # the blow-up the cap prevents


def test_lsh_finds_planted_near_dup(spark, docs):
    from logparser_spark.operators import dedup

    # plant a near-duplicate of doc 0 (append a word)
    d0 = docs.filter(F.col("doc_id") == 0)
    planted = d0.select(
        F.lit(99_999).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    aug = docs.select("doc_id", "text", "lang", "source", "n_chars").unionAll(planted)
    pairs = dedup.lsh_candidate_pairs(aug)
    hit = pairs.filter(
        (F.col("id_a") == 0) & (F.col("id_b") == 99_999)
    ).count()
    assert hit == 1
    jac = dedup.ngram_jaccard_pairs(aug, pairs)
    row = jac.filter(
        (F.col("id_a") == 0) & (F.col("id_b") == 99_999)
    ).collect()[0]
    assert row["jaccard"] > 0.9


def test_simhash_near_dup_low_hamming(spark, docs):
    from logparser_spark.operators import dedup

    d0 = docs.filter(F.col("doc_id") == 0)
    planted = d0.select(
        F.lit(99_999).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    aug = docs.select("doc_id", "text").unionAll(planted)
    sh = dedup.simhash(aug)
    vals = {r["doc_id"]: r["simhash"] for r in
            sh.filter(F.col("doc_id").isin([0, 99_999])).collect()}
    ham = bin(vals[0] ^ vals[99_999]).count("1")
    assert ham <= 6  # near-identical docs -> few differing bits


def test_cosine_topk_self_first_and_ann_subset(spark, emb):
    from logparser_spark.operators import similarity

    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = similarity.cosine_topk(emb, q, k=10).collect()
    assert exact[0]["vec_id"] == 0 and abs(exact[0]["cos_sim"] - 1.0) < 1e-6
    # descending similarity
    sims = [r["cos_sim"] for r in exact]
    assert sims == sorted(sims, reverse=True)

    ann = similarity.cosine_topk_ann(emb, q, k=10).collect()
    assert ann[0]["vec_id"] == 0
    # ANN results are a subset of the candidate-restricted exact ranking:
    # every ANN sim must appear in the full table with the same value
    exact_all = {
        r["vec_id"]: r["cos_sim"]
        for r in similarity.cosine_topk(emb, q, k=500).collect()
    }
    for r in ann:
        assert abs(exact_all[r["vec_id"]] - r["cos_sim"]) < 1e-9


def test_embedding_near_dup_matches_bruteforce(spark, emb):
    """embedding_near_dup_pairs == brute-force pairs restricted to the
    Hamming<=1 sign-bucket candidate set (the documented recall trade),
    on a 100-vector sample."""
    import math

    from logparser_spark.operators import similarity

    sub = emb.filter(F.col("vec_id") < 100)
    tau = 0.2
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(sub, tau=tau).collect()
    }

    rows = {r["vec_id"]: list(r["embedding"]) for r in sub.collect()}

    def bucket(v):
        return sum(1 << j for j in range(8) if v[j] >= 0)

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(d / (na * nb), 6)

    want = {}
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(bucket(rows[a]) ^ bucket(rows[b])).count("1") <= 1:
                c = cos(rows[a], rows[b])
                if c >= tau:
                    want[(a, b)] = c
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, k


def test_ann_bucketed_writer_prunes_partitions(spark, emb, tmp_path):
    """write_embeddings_bucketed + cosine_topk_ann_pruned: the scan must
    touch only the hamming+1 candidate bucket DIRECTORIES (real
    partition pruning), and the result must equal the filter-scan ANN."""
    import re

    from logparser_spark.operators import similarity

    path = str(tmp_path / "emb_bucketed")
    similarity.write_embeddings_bucketed(emb, path)

    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    allowed = set(similarity.query_buckets(q))

    pruned = similarity.cosine_topk_ann_pruned(spark, path, q, k=10)
    base = similarity.cosine_topk_ann(emb, q, k=10)
    assert [tuple(r) for r in pruned.collect()] == [
        tuple(r) for r in base.collect()
    ]

    # the candidate scan's file listing stays inside the allowed buckets
    df = spark.read.parquet(path)
    cand = df.filter(F.col("sign_bucket").isin(list(allowed)))
    files = {
        r[0] for r in cand.select(F.input_file_name()).distinct().collect()
    }
    assert files
    touched = {
        int(re.search(r"sign_bucket=(\d+)", f).group(1)) for f in files
    }
    assert touched <= allowed
    # ...and the full table really has more buckets than we scanned
    all_buckets = {r[0] for r in df.select("sign_bucket").distinct().collect()}
    assert len(all_buckets) > len(touched)


def test_language_id_markers(spark):
    from logparser_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze und der vogel"),
            (3, "le chat et les chiens et le loup"),
            (4, "xyzzy plugh"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r["pred_lang"]
           for r in textstats.language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_bounds(spark, docs):
    from logparser_spark.operators import textstats

    qs = textstats.quality_score(docs)
    bad = qs.filter(
        (F.col("quality_score") < 0) | (F.col("quality_score") > 100)
        | (F.col("alpha_ratio") < 0) | (F.col("alpha_ratio") > 1)
    ).count()
    assert bad == 0


def test_token_stats_consistency(spark, docs):
    from logparser_spark.operators import textstats

    ts = textstats.token_stats(docs)
    assert ts.filter(F.col("ws_tokens") > F.col("n_chars")).count() == 0
    assert ts.filter(F.col("rx_tokens") <= 0).count() == 0


def test_image_dims_header_parsers():
    """Real struct-based header decode for every supported format."""
    import struct as st

    from logparser_spark.operators.multimodal import image_dims, make_png

    # PNG: synthesized valid file round-trips its dims
    assert image_dims(make_png(321, 123)) == ("png", 321, 123)
    # GIF: little-endian logical-screen dims
    gif = b"GIF89a" + st.pack("<HH", 640, 350) + b"\x00" * 4
    assert image_dims(gif) == ("gif", 640, 350)
    # JPEG: APP0 segment then SOF0 (dims live in the SOF, height first)
    jpg = (b"\xff\xd8"
           + b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
           + b"\xff\xc0" + st.pack(">H", 11) + b"\x08"
           + st.pack(">HH", 480, 640) + b"\x03")
    assert image_dims(jpg) == ("jpeg", 640, 480)
    # progressive JPEG (SOF2) and a DHT (0xC4) that must be skipped
    jpg2 = (b"\xff\xd8"
            + b"\xff\xc4" + st.pack(">H", 4) + b"\x00\x00"
            + b"\xff\xc2" + st.pack(">H", 11) + b"\x08"
            + st.pack(">HH", 10, 20) + b"\x01")
    assert image_dims(jpg2) == ("jpeg", 20, 10)
    # BMP: negative height means top-down, report abs
    bmp = (b"BM" + b"\x00" * 16 + st.pack("<ii", 800, -600) + b"\x00" * 8)
    assert image_dims(bmp) == ("bmp", 800, 600)
    # non-images -> None
    assert image_dims(b"") is None
    assert image_dims(b"<html><body>hi</body></html>") is None
    assert image_dims(b"\x89PNG\r\n\x1a\nXXXXIDAT") is None  # no IHDR


def test_image_metadata_real_decode(spark):
    from logparser_spark.operators import multimodal
    from logparser_spark.sources.pages import build_pages_from_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    meta = multimodal.image_metadata(
        multimodal.synth_png(docs), binary_col="img"
    ).collect()
    assert len(meta) == 20
    for r in meta:
        assert r["format"] == "png" and r["n_bytes"] == 45
        assert r["width"] == (r["doc_id"] % 640) + 1
        assert r["height"] == (r["doc_id"] % 480) + 1

    # non-image payloads (html bytes) -> null metadata, no crash
    pages = build_pages_from_documents(spark, SF_DIR).limit(5)
    for r in multimodal.image_metadata(pages).collect():
        assert r["format"] is None and r["width"] is None

    # WAV/FLAC/MP3 headers decode for REAL; sample decode stays stubbed
    wav = multimodal.make_wav(44100, 2_000, channels=2, bits=16)
    assert multimodal.audio_dims(wav) == ("wav", 44100, 2, 16, 2_000)
    assert multimodal.audio_dims(b"ID3\x03mp3data") is None

    flac = multimodal.make_flac(48000, 123_456, channels=2, bits=24)
    assert multimodal.audio_dims(flac) == ("flac", 48000, 2, 24, 123_456)
    # unknown total-samples (0) reads as null, not 0
    assert multimodal.audio_dims(
        multimodal.make_flac(8000, 0)
    ) == ("flac", 8000, 1, 16, None)

    # MP3: 4 CBR MPEG1 LayerIII frames = 4*1152 samples; ID3v2 skipped;
    # stereo + MPEG2 (576 spf) variants exercise both table branches
    mp3 = multimodal.make_mp3(44100, n_frames=4, channels=1)
    assert multimodal.audio_dims(mp3) == ("mp3", 44100, 1, None, 4 * 1152)
    mp3s = multimodal.make_mp3(32000, n_frames=2, channels=2, id3=True)
    assert multimodal.audio_dims(mp3s) == ("mp3", 32000, 2, None, 2 * 1152)
    # truncated garbage after a valid sync byte -> rejected
    assert multimodal.audio_dims(b"\xff\xfb") is None

    wdf = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(flac)), (3, bytearray(mp3))],
        "doc_id LONG, snd BINARY",
    )
    got = {r["doc_id"]: r for r in
           multimodal.audio_metadata(wdf, binary_col="snd").collect()}
    w = got[1]
    assert (w["format"], w["sample_rate"], w["channels"],
            w["bits_per_sample"], w["n_samples"]) == ("wav", 44100, 2, 16,
                                                      2_000)
    assert (got[2]["format"], got[2]["n_samples"]) == ("flac", 123_456)
    assert (got[3]["format"], got[3]["sample_rate"],
            got[3]["n_samples"]) == ("mp3", 44100, 4608)
    with pytest.raises(Exception) as exc:
        multimodal.audio_metadata(pages, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )

    frames = multimodal.frame_sample(pages)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] >= 1 for r in per_doc)


def test_repetition_stats_edges(spark):
    """Word/2-gram repetition: hand-computed docs incl. empty and
    single-word edges; plan must stay shuffle-free (per-row arrays)."""
    from logparser_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a b a b a"),        # topw a=3/5, 2-grams: a b, b a, a b, b a
         (2, "x"),                # single word, zero 2-grams
         (3, ""),                 # empty
         (4, "u v w"),            # all distinct
         (5, "  s   s  ")],       # ws runs filtered out
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
    assert (got[1]["n_words"], got[1]["n_distinct_words"]) == (5, 2)
    assert got[1]["top_word_frac"] == 0.6          # 3/5
    assert got[1]["top_2gram_frac"] == 0.5         # 2/4
    assert got[1]["dup_word_frac"] == 0.6          # (5-2)/5
    assert (got[2]["n_words"], got[2]["top_2gram_frac"]) == (1, 0.0)
    assert (got[3]["n_words"], got[3]["dup_word_frac"]) == (0, 0.0)
    assert got[4]["dup_word_frac"] == 0.0
    assert (got[5]["n_words"], got[5]["n_distinct_words"]) == (2, 1)
    plan = textstats.repetition_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_pii_scrub_patterns(spark):
    from logparser_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "mail a.b-c_1@sub.domain.io and 192.168.0.1 ssn 123-45-6789"),
         (2, "no pii here, just words and 1234 numbers"),
         (3, "two mails x@y.com z@w.org; bad ip 999.1.2 is not 1.2.3.4x"),
         (4, "")],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in textstats.pii_scrub(df).collect()}
    assert got[1]["scrubbed_text"] == "mail <EMAIL> and <IP> ssn <SSN>"
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_ssn"]) == (1, 1, 1)
    assert got[2]["scrubbed_text"] == \
        "no pii here, just words and 1234 numbers"  # untouched
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_ssn"]) == (0, 0, 0)
    assert got[3]["n_emails"] == 2
    assert (got[4]["n_emails"], got[4]["scrubbed_text"]) == (0, "")

    # the deterministic feed round-trips: every planted item scrubbed
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    out = textstats.pii_scrub(textstats.with_pii(docs)).collect()
    for r in out:
        assert r["n_emails"] >= 1 and r["n_ipv4"] >= 1 and r["n_ssn"] >= 1
        s = r["scrubbed_text"]
        assert "<EMAIL>" in s and "<IP>" in s and "<SSN>" in s
        assert "@example.com" not in s


def test_video_dims_header_parsers(spark):
    """Real struct-based container decode: MP4 box walk + AVI avih."""
    import struct as st

    from logparser_spark.operators import multimodal
    from logparser_spark.operators.multimodal import (
        make_avi,
        make_mp4,
        video_dims,
    )

    # MP4: synthesized valid boxes round-trip every field
    assert video_dims(make_mp4(640, 360, 12345, 42)) == \
        ("mp4", 640, 360, 12345, 42)
    # v1 mvhd (64-bit duration) + v1 tkhd offsets
    mvhd1 = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
             + st.pack(">IQ", 90000, 90 * 90000) + b"\x00" * 80)
    tkhd1 = (b"\x01" + b"\x00" * 3 + b"\x00" * 84
             + st.pack(">II", 1280 << 16, 720 << 16))
    box = multimodal._box
    moov = box(b"moov", box(b"mvhd", mvhd1)
               + box(b"trak", box(b"tkhd", tkhd1)))
    b1 = box(b"ftyp", b"isom") + moov
    assert video_dims(b1) == ("mp4", 1280, 720, 90_000, None)
    # audio-only tkhd (0x0 dims) is skipped, not reported as 0x0
    tkhd_a = (b"\x00" + b"\x00" * 3 + b"\x00" * 72 + b"\x00" * 8)
    moov2 = box(b"moov", box(b"trak", box(b"tkhd", tkhd_a))
                + box(b"trak", box(b"tkhd",
                                   b"\x00" * 76
                                   + st.pack(">II", 320 << 16,
                                             240 << 16))))
    assert video_dims(box(b"ftyp", b"mp42") + moov2) == \
        ("mp4", 320, 240, None, None)
    # AVI: avih fields incl. duration from us/frame
    assert video_dims(make_avi(320, 240, 250, us_per_frame=40000)) == \
        ("avi", 320, 240, 10_000, 250)
    # non-videos -> None; truncation never crashes
    assert video_dims(b"") is None
    assert video_dims(b"RIFF\x00\x00\x00\x00WAVE") is None
    full = make_mp4(64, 48, 100, 3)
    for cut in (4, 11, 20, 40, len(full) - 1):
        video_dims(full[:cut])  # must not raise
    assert video_dims(b"\x00" * 4 + b"ftyp") is None

    # the Spark stage: synth per-doc containers, decode them back
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(24)
    meta = multimodal.video_metadata(
        multimodal.synth_video(docs), binary_col="vid"
    ).collect()
    assert len(meta) == 24
    for r in meta:
        i = r["doc_id"]
        assert r["width"] == (i % 640) + 1
        assert r["height"] == (i % 480) + 1
        assert r["n_frames"] == (i % 30) + 1
        if i % 2 == 0:
            assert r["format"] == "mp4"
            assert r["duration_ms"] == (i % 5000) + 1
            assert r["n_bytes"] == 284 + 4 * ((i % 30) + 1)
        else:
            assert r["format"] == "avi"
            assert r["duration_ms"] == 40 * ((i % 30) + 1)
            assert r["n_bytes"] == 88

    # strict mode raises where the ffmpeg call belongs
    from logparser_spark.sources.pages import build_pages_from_documents

    pages = build_pages_from_documents(spark, SF_DIR).limit(3)
    with pytest.raises(Exception) as exc:
        multimodal.video_metadata(pages, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_avi_frame_extraction(spark):
    """REAL uncompressed-AVI pixel decode: RIFF walk → DIB rows.

    Every expectation is arithmetic in the synthesis parameters; the
    stride-padding exclusion is what a naive whole-chunk sum would get
    wrong (widths 1,2,3,5,6,7 all pad)."""
    import struct as st

    from logparser_spark.operators import multimodal
    from logparser_spark.operators.multimodal import (
        extract_frames_avi,
        make_avi,
        make_avi_rgb,
    )

    # exact pixel sums for every stride-padding case
    for w in range(1, 9):
        fills = [0, 17, 255]
        frames = extract_frames_avi(make_avi_rgb(w, 3, fills))
        assert [f[:5] for f in frames] == [
            (i, w, 3, 3 * w * 3, fill * 3 * w * 3)
            for i, fill in enumerate(fills)
        ]
        # hash distinguishes distinct fills
        hashes = {f[5] for f in frames}
        assert len(hashes) == 3

    # BI_RGB stream with an empty movi decodes to zero frames;
    # a header-only AVI with NO strf can't prove it's uncompressed,
    # so it routes to the codec path (None)
    assert extract_frames_avi(make_avi_rgb(32, 24, [])) == []
    assert extract_frames_avi(make_avi(32, 24, 5)) is None
    # compressed stream (biCompression != 0) is None -> codec path
    b = make_avi_rgb(4, 2, [9])
    comp = b.replace(st.pack("<IiiHHI", 40, 4, 2, 1, 24, 0),
                     st.pack("<IiiHHI", 40, 4, 2, 1, 24, 1), 1)
    assert extract_frames_avi(comp) is None
    # truncated frame payload is None, never a crash
    assert extract_frames_avi(b[:-5]) is None
    assert extract_frames_avi(b"") is None

    # the Spark stage end to end: frame rows match the synthesis math
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    rows = multimodal.frame_sample(
        multimodal.synth_avi_rgb(docs), binary_col="vid"
    ).collect()
    assert len(rows) == sum((i % 5) + 1 for i in range(20))
    for r in rows:
        i, f = r["doc_id"], r["frame_no"]
        w, h = (i % 8) + 1, (i % 6) + 1
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_px"] == 3 * w * h
        assert r["px_sum"] == ((i * 7 + f * 13) % 256) * 3 * w * h

    # every_n_frames sampling keeps only multiples
    sampled = multimodal.frame_sample(
        multimodal.synth_avi_rgb(docs), binary_col="vid", every_n_frames=2
    ).collect()
    assert all(r["frame_no"] % 2 == 0 for r in sampled)
    assert len(sampled) == sum(((i % 5) + 2) // 2 for i in range(20))

    # compressed/unknown payloads: strict raises where ffmpeg belongs
    from logparser_spark.sources.pages import build_pages_from_documents

    pages = build_pages_from_documents(spark, SF_DIR).limit(3)
    with pytest.raises(Exception) as exc:
        multimodal.frame_sample(pages, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )
    # non-strict fallback still fans out >=1 row per doc with null px
    fb = multimodal.frame_sample(pages).collect()
    assert len(fb) >= 3 and all(r["px_sum"] is None for r in fb)


def test_decode_html_roundtrip(spark):
    from logparser_spark.operators import multimodal
    from logparser_spark.sources.pages import build_pages_from_documents

    pages = build_pages_from_documents(spark, SF_DIR).limit(10)
    out = multimodal.decode_html(pages)
    mism = out.filter(F.col("html_text") != F.col("text")).count()
    assert mism == 0


def test_extract_text_rules(spark):
    """Each boilerplate rule independently: script/style blocks with
    '<' and '>' inside, comments, tag strip, entity order, whitespace
    collapse. Expected values are written by hand, not recomputed."""
    from logparser_spark.operators import multimodal

    cases = [
        # (html, expected)
        ("<p>plain</p>", "plain"),
        ("<script>if(a<b){y('</')}</script>after", "after"),
        ("<SCRIPT a='x'>s</SCRIPT>kept", "kept"),
        ("<style>p > a{}</style>t", "t"),
        ("a<!-- <p>no</p> -->b", "ab"),
        ("x &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &apos;a&apos;",
         "x <tag> & \"q\" 's' 'a'"),
        # &amp; unescapes LAST, so the double-escape resolves one
        # level only — the correct single-pass HTML behavior
        ("&amp;lt;", "&lt;"),
        ("  a \t\n b\r\n ", "a b"),
        ("<div><h1>T</h1>\n<p>body text</p></div>", "T body text"),
        # numeric entities other than &#39; pass through untouched
        ("&#169; x", "&#169; x"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "id long, page string"
    )
    got = {
        r["id"]: r["extracted"]
        for r in multimodal.extract_text(
            df, html_col="page", binary=False
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])

    # binary path: UTF-8 bytes round-trip (incl. multi-byte content)
    from pyspark.sql import functions as F

    bdf = spark.createDataFrame(
        [(1, "<p>héllo &amp; wörld</p>")], "id long, page string"
    ).select("id", F.encode("page", "UTF-8").alias("html"))
    [r] = multimodal.extract_text(bdf).collect()
    assert r["extracted"] == "héllo & wörld"


def test_canonicalize_url_rules(spark):
    """Hand-written canonical expectations per normalization rule —
    including the NON-default-port-for-the-other-scheme traps
    (http:443 and https:80 must be KEPT)."""
    from logparser_spark.operators import weburl

    cases = [
        ("HTTP://Example.COM/Path", "http://example.com/Path",
         "example.com"),                      # case: scheme+host only
        ("http://example.com:80/a", "http://example.com/a",
         "example.com"),                      # default port dropped
        ("https://example.com:443/a", "https://example.com/a",
         "example.com"),
        ("http://example.com:443/a", "http://example.com:443/a",
         "example.com"),                      # NOT the default for http
        ("https://example.com:80/a", "https://example.com:80/a",
         "example.com"),
        ("http://e.com/a#frag", "http://e.com/a", "e.com"),
        ("http://e.com", "http://e.com/", "e.com"),      # empty path
        ("http://e.com?b=2&a=1", "http://e.com/?a=1&b=2", "e.com"),
        ("http://e.com/x?utm_source=s&utm_medium=m", "http://e.com/x",
         "e.com"),                            # all-tracker query dropped
        ("http://e.com/x?", "http://e.com/x", "e.com"),  # bare '?'
        ("ftp://Files.example.net/pub", "ftp://files.example.net/pub",
         "files.example.net"),                # non-http scheme passes
        ("http://admin:pw@Example.com/a", "http://example.com/a",
         "example.com"),                      # userinfo stripped
        ("https://u@e.com:8443/a", "https://e.com:8443/a",
         "e.com"),                            # userinfo + kept port
        ("no-scheme.example.com/a", None, ""),           # not absolute
        ("", None, ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)],
        "id long, url string",
    )
    got = {
        r["id"]: (r["canonical_url"], r["host"])
        for r in weburl.canonicalize_url(df).collect()
    }
    for i, (u, canon, host) in enumerate(cases):
        assert got[i] == (canon, host), (u, got[i])


def test_surt_key_and_cdx_rank(spark):
    """SURT keys from hand-picked hosts, then build_cdx ranks pinned
    against a plain global row_number() — with prefix_len=3, short
    enough that one bucket spans several hosts AND one host's captures
    split across a path boundary, the adversarial case for the
    two-level prefix sum."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from logparser_spark.operators import weburl

    urls = [
        "http://www.example.com/b",
        "http://www.example.com/a?x=1",
        "https://sub.example.com/z",
        "http://example.org/",
        "http://aaa.aa/p",
        "not a url at all",        # must be excluded
        "http://example.org/",     # duplicate URL, tie broken by id
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )

    # surt_key spot checks
    canon = weburl.canonicalize_url(df)
    keyed = canon.where(F.col("canonical_url").isNotNull()).select(
        "doc_id",
        weburl.surt_key(F.col("canonical_url"), F.col("host"))
        .alias("surt_key"),
    )
    got = {r["doc_id"]: r["surt_key"] for r in keyed.collect()}
    assert got[0] == "com,example,www)/b"
    assert got[1] == "com,example,www)/a?x=1"
    assert got[2] == "com,example,sub)/z"
    assert got[3] == "org,example)/"
    assert got[4] == "aa,aaa)/p"
    assert 5 not in got

    # rank parity vs the naive single-window form, at a bucket size
    # that forces multi-host buckets and cross-bucket host splits
    cdx = {
        (r["surt_key"], r["doc_id"]): r["rank"]
        for r in weburl.build_cdx(df, prefix_len=3).collect()
    }
    naive = {
        (r["surt_key"], r["doc_id"]): r["rank"]
        for r in keyed.withColumn(
            "rank",
            F.row_number().over(Window.orderBy("surt_key", "doc_id"))
            .cast("long"),
        ).collect()
    }
    assert cdx == naive and len(cdx) == 6


def test_cdx_mega_host_bucket_split(spark):
    """A planted mega-host (one host holding nearly all captures —
    SURT prefixes collapse it into one bucket) must (a) still rank
    bit-equal to the naive global window and (b) be SUB-SPLIT past
    ``bucket_cap`` so no window partition holds the whole host."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from logparser_spark.operators import weburl

    urls = [(i, f"http://mega.test/p{i:04d}") for i in range(40)]
    urls += [(100 + i, f"http://tiny{i}.org/x") for i in range(3)]
    df = spark.createDataFrame(urls, "doc_id long, url string")

    cdx_df = weburl.build_cdx(df, prefix_len=3, bucket_cap=4, ext_len=12)
    canon = weburl.canonicalize_url(df)
    keyed = canon.where(F.col("canonical_url").isNotNull()).select(
        "doc_id",
        weburl.surt_key(F.col("canonical_url"), F.col("host"))
        .alias("surt_key"),
    )
    naive = {
        (r["surt_key"], r["doc_id"]): r["rank"]
        for r in keyed.withColumn(
            "rank",
            F.row_number().over(Window.orderBy("surt_key", "doc_id"))
            .cast("long"),
        ).collect()
    }
    got = {(r["surt_key"], r["doc_id"]): r["rank"]
           for r in cdx_df.collect()}
    assert got == naive and len(got) == 43

    # the extended split rule (same rule the operator applies) bounds
    # every window partition: mega.test's keys differ within
    # prefix_len + ext_len = 15 chars ("tes,mega)/p0000"…), so the
    # extended buckets are singletons here — never one 40-row sort
    mega_keys = [k for (k, _d) in got if k.startswith("tes,mega)")]
    ext_buckets = {k[:15] for k in mega_keys}
    assert len(ext_buckets) == len(mega_keys)

    # and the physical plan's row-level rank window partitions by the
    # split bucket column, not the raw prefix
    plan = cdx_df._jdf.queryExecution().executedPlan().toString()
    rn = re.search(r"Window \[row_number\(\)[^\n]*", plan)
    assert rn and "__b" in rn.group(0)


def test_cdx_lookup_and_partition_pruning(spark, tmp_path):
    """cdx_lookup carries GLOBAL ranks through the prefix filter (and
    the trailing-comma form excludes sibling hosts); the partitioned
    layout serves the same lookup while touching only matching bucket
    directories (real partition pruning, asserted on the file
    listing)."""
    import re

    from pyspark.sql import functions as F

    from logparser_spark.operators import weburl

    tlds = ["com", "org", "net"]
    urls = [(i, f"http://h{i % 4}.example{i % 3}.{tlds[i % 3]}/p{i}")
            for i in range(60)]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    cdx = weburl.build_cdx(df, prefix_len=14)

    full = {(r["surt_key"], r["doc_id"]): r["rank"]
            for r in cdx.collect()}
    got = [(r["rank"], r["surt_key"], r["doc_id"])
           for r in weburl.cdx_lookup(cdx, "org,example1,").collect()]
    assert len(got) == 20
    assert all(k.startswith("org,example1,") for _, k, _d in got)
    # global ranks preserved, output in index order
    assert [r for r, _k, _d in got] == sorted(
        full[(k, d)] for _r, k, d in got
    )
    want = {(k, d) for (k, d) in full if k.startswith("org,example1,")}
    assert {(k, d) for _r, k, d in got} == want

    # partitioned layout: same rows, pruned directory listing
    path = str(tmp_path / "cdx")
    weburl.write_cdx_partitioned(cdx, path, prefix_len=5)
    pruned = weburl.cdx_lookup_pruned(spark, path, "org,example1,",
                                      prefix_len=5)
    assert [(r["rank"], r["surt_key"], r["doc_id"])
            for r in pruned.collect()] == got
    # file listing on the filter-only scan (input_file_name is a
    # scan-task value; it does not survive the orderBy exchange)
    scan = (
        spark.read.parquet(path)
        .where(F.col("__b") == "org,e")
        .where(F.col("surt_key").startswith("org,example1,"))
    )
    files = {
        r[0] for r in scan.select(F.input_file_name())
        .distinct().collect()
    }
    assert files
    touched = {re.search(r"__b=([^/]+)/", f).group(1) for f in files}
    # lookup prefix 'org,example1,'[:5] = 'org,e' — ONE bucket dir
    # of the table's three (com,e / net,e / org,e)
    assert len(touched) == 1 and next(iter(touched)).startswith("org")
    assert spark.read.parquet(path).select("__b").distinct().count() == 3
    # a shorter-than-partition prefix still prunes to its bucket range
    dom = weburl.cdx_lookup_pruned(spark, path, "org", prefix_len=5)
    assert dom.count() == 20


def test_unigram_doc_score(spark):
    """Hand-computed unigram model: corpus 'a a b' + 'a c' + '' ->
    counts a=3,b=1,c=1, total=5. Doc1 sum_freq=3+3+1=7, n=3 ->
    score = round(1e6*7/15) = 466667; doc2 = 3+1=4, n=2 ->
    round(1e6*4/10) = 400000; empty doc scores 0."""
    from logparser_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict()
           for r in textstats.unigram_doc_score(df).collect()}
    assert got[1] == {"doc_id": 1, "n_tokens": 3, "sum_freq": 7,
                      "score_ppm": 466667}
    assert got[2] == {"doc_id": 2, "n_tokens": 2, "sum_freq": 4,
                      "score_ppm": 400000}
    assert got[3] == {"doc_id": 3, "n_tokens": 0, "sum_freq": 0,
                      "score_ppm": 0}

    # a prebuilt (persisted) model gives identical scores — the
    # two-pass reuse path a 10^12-row pipeline would take
    from pyspark.sql import functions as F

    model = (
        df.select(F.explode(F.filter(F.split("text", " "),
                                     lambda t: F.length(t) > 0))
                  .alias("word"))
        .groupBy("word").agg(F.count("*").alias("word_count"))
        .persist()
    )
    got2 = {r["doc_id"]: r.asDict()
            for r in textstats.unigram_doc_score(df, model_df=model).collect()}
    assert got2 == got

    # out-of-vocabulary tokens (prebuilt model, newer corpus) still
    # count toward n_tokens and score as zero frequency — an inner
    # join would silently drop them and inflate the average
    newer = spark.createDataFrame(
        [(9, "a zz")], "doc_id long, text string"
    )
    [r] = textstats.unigram_doc_score(newer, model_df=model).collect()
    # model: a=3, total=5; doc: a (3) + zz (OOV, 0) over 2 tokens
    assert (r["n_tokens"], r["sum_freq"]) == (2, 3)
    assert r["score_ppm"] == (2_000_000 * 3 + 2 * 5) // (2 * 2 * 5)


def test_incremental_dedup_ledger(spark):
    """Batch-over-ledger semantics: seen digests drop ALL their batch
    copies; unseen digests dedup within the batch keep-first; appending
    the returned rows to the ledger makes a replayed batch a no-op."""
    from logparser_spark.operators import dedup

    seen_docs = spark.createDataFrame(
        [(100, "alpha"), (101, "beta")], "doc_id long, text string"
    )
    ledger = dedup.exact_dedup(seen_docs).select("md5_hi", "md5_lo")

    batch = spark.createDataFrame(
        [(1, "alpha"),            # already in the ledger -> dropped
         (2, "gamma"), (5, "gamma"),  # novel, duplicated in-batch
         (3, "delta")],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup(batch, ledger)
    got = {r["canonical_id"]: r["n_copies"] for r in out.collect()}
    assert got == {2: 2, 3: 1}

    # append-and-replay is a no-op: nothing in the batch is novel now
    ledger2 = ledger.unionAll(out.select("md5_hi", "md5_lo"))
    assert dedup.incremental_dedup(batch, ledger2).count() == 0


def test_filter_verdict_rules(spark):
    """Each gate fails in isolation on a crafted doc; a good doc keeps
    with empty reasons; reasons list failed rules in fixed order."""
    from logparser_spark.operators import textstats

    good = ("the cat and the dog of the house sat on the mat and "
            "the bird flew over the tree and all was well here")
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "der hund und die katze und der vogel sind gut "
                "zusammen in dem haus und der stadt immer froh"),  # lang
            (3, "the and of"),                   # too short (+quality)
            (4, "the " * 30 + "and of it"),      # repetition
            (5, ""),                             # everything fails
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reasons"], r["pred_lang"])
           for r in textstats.filter_verdict(docs).collect()}
    assert got[1] == (True, "", "en")
    assert got[2][0] is False and got[2][1] == "lang" \
        and got[2][2] == "de"
    assert got[3][0] is False and "length" in got[3][1]
    assert got[4][0] is False and got[4][1] == "repetition"
    assert got[5][0] is False \
        and got[5][1] == "lang,length,quality"  # 0 words: rep holds
    # reasons order is fixed: lang before length before quality
    assert got[5][1].split(",") == ["lang", "length", "quality"]


def test_warc_to_wet(spark):
    from logparser_spark.sources import warc

    docs = spark.createDataFrame(
        [(i, f"body text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    wet = warc.to_wet(warc.parse_warc(
        warc.synth_warc_files(docs, per_file=4)
    ))
    rows = {r["rec_no"] + 4 * r["file_id"]: r for r in wet.collect()}
    assert set(rows) == {i for i in range(20) if i % 17 != 0}
    for i, r in rows.items():
        assert r["wet_text"] == f"body text {i}"
        assert r["target_uri"].endswith(f"/page/{i}")


def test_bloom_bitmap_properties():
    """Pure-numpy bloom law: every inserted digest tests positive (NO
    false negatives — the property the dedup routing relies on), and
    a disjoint probe set stays under a loose FPR bound."""
    import hashlib

    import numpy as np

    from logparser_spark.operators.dedup import _bloom_positions

    def digests(texts):
        hs, ls = [], []
        for t in texts:
            d = hashlib.md5(t.encode()).digest()
            hs.append(int.from_bytes(d[:8], "big") - (1 << 63))
            ls.append(int.from_bytes(d[8:], "big") - (1 << 63))
        return np.array(hs, dtype=np.int64), np.array(ls, dtype=np.int64)

    n_bits, k = 1 << 14, 4
    hi, lo = digests([f"doc-{i}" for i in range(500)])
    bm = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = _bloom_positions(hi, lo, n_bits, k).ravel()
    np.bitwise_or.at(
        bm, (pos >> np.uint64(3)).astype(np.int64),
        (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
    )

    def member(h, l):
        p = _bloom_positions(h, l, n_bits, k)
        byte = (p >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8))
        return ((bm[byte] & bit) != 0).all(axis=0)

    assert member(hi, lo).all()                      # no false negatives
    oh, ol = digests([f"other-{i}" for i in range(2000)])
    fpr = member(oh, ol).mean()
    assert fpr < 0.15, fpr  # theory ~5% at this load; loose bound


def test_incremental_dedup_bloom_matches_exact(spark):
    """The bloom variant is output-identical to incremental_dedup on
    the same ledger/batch, and the routing really bypasses: with a
    big bitmap, only true dups reach the verify join."""
    from pyspark.sql import functions as F

    from logparser_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"text-{i % 40}") for i in range(100)],
        "doc_id long, text string",
    )
    ledger = dedup.exact_dedup(
        docs.where(F.col("doc_id") % 3 == 0)
    ).select("md5_hi", "md5_lo")

    base = {(r["md5_hi"], r["md5_lo"]): (r["canonical_id"], r["n_copies"])
            for r in dedup.incremental_dedup(docs, ledger).collect()}
    got = {(r["md5_hi"], r["md5_lo"]): (r["canonical_id"], r["n_copies"])
           for r in dedup.incremental_dedup_bloom(
               docs, ledger, n_bits=1 << 20).collect()}
    assert got == base and base

    # a reusable bitmap gives the same answer without rebuilding
    bloom = dedup.build_digest_bloom(ledger, n_bits=1 << 20)
    got2 = {(r["md5_hi"], r["md5_lo"]): (r["canonical_id"], r["n_copies"])
            for r in dedup.incremental_dedup_bloom(
                docs, ledger, n_bits=1 << 20, bloom=bloom).collect()}
    assert got2 == base


def test_near_dup_clusters_components(spark):
    """Hand-built pair graphs: a chain (propagation needs multiple
    rounds), a cycle, a separate pair, and singletons — every node
    labels to its component minimum."""
    from logparser_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    # chain 0-1-2-3-4 (diameter 4), cycle 5-6-7-5, pair 8-9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4),
         (5, 6), (6, 7), (5, 7),
         (8, 9)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.near_dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   5: 5, 6: 5, 7: 5, 8: 8, 9: 8}

    # no pairs at all: everyone is their own cluster
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got2 = {r["doc_id"]: r["cluster_id"]
            for r in dedup.near_dup_clusters(docs, empty).collect()}
    assert got2 == {i: i for i in range(10)}

    # non-convergence is an ERROR, not silently-partial labels
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.near_dup_clusters(docs, pairs, max_iter=2)


def test_robots_parse_and_filter(spark):
    """parse_robots line handling (case, comments, CRLF, empty values)
    and robots_filter longest-match semantics, hand-checked."""
    from logparser_spark.operators import weburl

    robots = spark.createDataFrame(
        [("a.com",
          "User-agent: *\r\nDisallow: /x\nALLOW: /x/pub # comment\n"
          "Disallow:\n# Disallow: /commented-out\nDisallow: /y\n"),
         ("empty.com", "User-agent: *\n# nothing\n")],
        "host string, robots_txt string",
    )
    rules = {(r["host"], r["path_prefix"], r["is_allow"])
             for r in weburl.parse_robots(robots)
             .select("host", "path_prefix", "is_allow").collect()}
    assert rules == {
        ("a.com", "/x", False),
        ("a.com", "/x/pub", True),
        ("a.com", "/y", False),
    }

    pages = spark.createDataFrame(
        [(1, "a.com", "/x/secret"),     # /x disallow
         (2, "a.com", "/x/pub/page"),   # /x/pub allow (longer) wins
         (3, "a.com", "/z"),            # rules exist, none match
         (4, "a.com", "/y/deep"),       # /y disallow
         (5, "empty.com", "/x/secret"), # host with zero rules
         (6, "norobots.com", "/x")],    # host absent from rules table
        "doc_id long, host string, path string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in weburl.robots_filter(
               pages, weburl.parse_robots(robots)).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False,
                   5: True, 6: True}

    # length tie: Allow wins (RFC 9309 tie-break)
    tie = spark.createDataFrame(
        [("t.com", "Allow: /dir\nDisallow: /dir\n")],
        "host string, robots_txt string",
    )
    p = spark.createDataFrame([(7, "t.com", "/dir/a")],
                              "doc_id long, host string, path string")
    [r] = weburl.robots_filter(p, weburl.parse_robots(tie)).collect()
    assert r["allowed"] is True

    # RFC 9309 special characters: '*' wildcard and end-of-URL '$';
    # regex metacharacters in rule paths are matched literally
    wild = spark.createDataFrame(
        [("w.com",
          "Disallow: /p/*/secret\nDisallow: /*.pdf$\n"
          "Disallow: /lit(x)+?\nAllow: /p/a/secret/ok\n")],
        "host string, robots_txt string",
    )
    wp = spark.createDataFrame(
        [(1, "w.com", "/p/a/secret"),        # matches /p/*/secret
         (2, "w.com", "/p/secret"),          # '*' needs >= 0 chars between
         (3, "w.com", "/doc.pdf"),           # $ anchors: disallowed
         (4, "w.com", "/doc.pdf/view"),      # not URL-end: allowed
         (5, "w.com", "/docXpdf"),           # '.' is literal: allowed
         (6, "w.com", "/lit(x)+?y"),         # metachars literal
         (7, "w.com", "/p/a/secret/ok2")],   # longer Allow beats wildcard
        "doc_id long, host string, path string",
    )
    gotw = {r["doc_id"]: r["allowed"]
            for r in weburl.robots_filter(
                wp, weburl.parse_robots(wild)).collect()}
    assert gotw == {1: False, 2: True, 3: False, 4: True, 5: True,
                    6: False, 7: True}

    # NULL host/path rows still come back with allowed = True
    np = spark.createDataFrame(
        [(8, None, "/x"), (9, "a.com", None)],
        "doc_id long, host string, path string",
    )
    gotn = {r["doc_id"]: r["allowed"]
            for r in weburl.robots_filter(
                np, weburl.parse_robots(robots)).collect()}
    assert gotn == {8: True, 9: True}


def test_rle8_opcodes_hand_built():
    """MS-RLE8 decode against a HAND-WRITTEN opcode stream (runs,
    word-padded absolute mode, delta skip, EOL, EOB) — independent of
    the fill-run encoder, so the decoder is pinned to the spec."""
    from logparser_spark.operators.multimodal import _rle8_decode

    data = bytes([
        2, 1,           # run: 2 pixels of index 1
        0, 3, 4, 5, 6,  # absolute mode: 3 literal indices...
        0,              # ...padded to a word boundary
        0, 0,           # EOL -> next row up
        0, 2, 2, 0,     # delta: skip 2 right (stay on row)
        3, 7,           # run: 3 pixels of index 7
        0, 0,           # EOL
        0, 1,           # EOB
    ])
    rows = _rle8_decode(data, 5, 2)
    assert bytes(rows[0]) == bytes([1, 1, 4, 5, 6])   # bottom row
    assert bytes(rows[1]) == bytes([0, 0, 7, 7, 7])   # delta left 0s
    # truncated stream: partial decode (the cut-off absolute byte
    # stays index 0), never a crash
    rows = _rle8_decode(data[:6], 5, 2)
    assert bytes(rows[0]) == bytes([1, 1, 4, 5, 0])
    assert bytes(rows[1]) == bytes(5)
    # early EOB leaves the rest at index 0
    rows = _rle8_decode(bytes([1, 9, 0, 1, 5, 5]), 3, 2)
    assert bytes(rows[0]) == bytes([9, 0, 0])
    assert bytes(rows[1]) == bytes(3)


def test_rle8_avi_roundtrip():
    """BI_RLE8 AVI end to end: encoder emits spec opcodes (incl. the
    max-255 run split at width 300), extractor decodes through the
    palette; pixel sums arithmetic in the palette entry."""
    from logparser_spark.operators.multimodal import (
        RLE8_TEST_PALETTE,
        extract_frames_avi,
        make_avi_rle8,
    )

    for w, h in [(1, 1), (5, 3), (8, 6), (300, 2)]:
        idxs = [0, 3, 7]
        frames = extract_frames_avi(
            make_avi_rle8(w, h, idxs, RLE8_TEST_PALETTE)
        )
        assert frames is not None and len(frames) == 3
        for f, (fno, fw, fh, n_px, px_sum, raw) in enumerate(frames):
            a = idxs[f]
            assert (fno, fw, fh, n_px) == (f, w, h, 3 * w * h)
            assert px_sum == (60 * a + 3) * w * h
            assert len(raw) == ((w * 3 + 3) & ~3) * h
    # an 8bpp RLE stream with NO palette bytes routes to the codec path
    import struct as st

    b = make_avi_rle8(4, 2, [1], RLE8_TEST_PALETTE)
    strf_hdr = st.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, 0, 0, 0, 8, 8)
    broken = b.replace(
        st.pack("<I", len(strf_hdr) + 32) + strf_hdr,
        st.pack("<I", len(strf_hdr)) + strf_hdr, 1,
    )
    # (palette truncated out of the chunk -> still decodes via the
    # zero-filled remainder, or None; must never crash)
    extract_frames_avi(broken)


def test_avi_multistream_video_strf_wins(spark):
    """A second (audio) stream's strf must not shadow the video
    BITMAPINFOHEADER: splice an audio strl AFTER the video one and
    assert frames still decode identically."""
    import struct as st

    from logparser_spark.operators.multimodal import (
        _avi_chunk,
        extract_frames_avi,
        make_avi_rgb,
    )

    base = make_avi_rgb(5, 3, [7, 200])
    want = [f[:5] for f in extract_frames_avi(base)]

    # audio strl: strh 'auds' + a WAVEFORMATEX-ish strf whose leading
    # bytes would parse as (compression != 0) garbage if mis-taken
    audio_strf = st.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    audio_strl = b"strl" + _avi_chunk(b"strh", b"auds" + b"\x00" * 52) \
        + _avi_chunk(b"strf", audio_strf + b"\x00" * 8)
    marker = b"hdrl"
    i = base.index(marker)
    # append the audio strl inside the hdrl LIST: grow the LIST size
    hdrl_size_at = i - 4
    hdrl_size = st.unpack("<I", base[hdrl_size_at:i])[0]
    hdrl_end = i + hdrl_size
    patched = (
        base[:hdrl_size_at]
        + st.pack("<I", hdrl_size + 8 + len(audio_strl) + (len(audio_strl) & 1))
        + base[i:hdrl_end]
        + _avi_chunk(b"LIST", audio_strl)
        + base[hdrl_end:]
    )
    # fix the RIFF size too
    grown = len(patched) - 8
    patched = patched[:4] + st.pack("<I", grown) + patched[8:]

    got = extract_frames_avi(patched)
    assert got is not None and [f[:5] for f in got] == want


def test_tfidf_top_terms_ranking_and_model_reuse(spark):
    from logparser_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (0, "apple apple banana rare"),
            (1, "apple banana banana"),
            (2, "apple cherry"),
            (3, ""),
        ],
        "doc_id LONG, text STRING",
    )
    out = textstats.tfidf_top_terms(df, k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    # N=4; idf_ppm: apple df=3 -> 1333333, banana df=2 -> 2000000,
    # rare/cherry df=1 -> 4000000
    d0 = {r["rank"]: (r["term"], r["score"]) for r in by_doc[0]}
    # doc0: rare 1*4000000 beats apple 2*1333333=2666666
    assert d0[1] == ("rare", 4_000_000)
    assert d0[2] == ("apple", 2_666_666)
    # doc1: banana 2*2000000 beats apple 1333333
    assert by_doc[1][0]["term"] == "banana"
    # empty doc contributes no rows, k caps output length
    assert 3 not in by_doc
    assert all(len(v) <= 2 for v in by_doc.values())

    # deterministic tie-break: equal scores order by term asc
    tie = textstats.tfidf_top_terms(
        spark.createDataFrame(
            [(0, "zeta alpha"), (1, "keep")], "doc_id LONG, text STRING"
        ),
        k=2,
    )
    t0 = sorted(
        [(r["rank"], r["term"]) for r in tie.collect() if r["doc_id"] == 0]
    )
    assert t0 == [(1, "alpha"), (2, "zeta")]

    # a persisted vocabulary can be supplied instead of being rebuilt
    from pyspark.sql import functions as F

    model = (
        df.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("term"),
        )
        .where(F.length("term") > 0)
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("doc_freq"))
    )
    out2 = textstats.tfidf_top_terms(df, k=2, model_df=model)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_extract_outlinks_classification(spark):
    from logparser_spark.operators import weburl

    html = (
        '<a href="https://User:pw@Ext.COM:8080/p">1</a>'
        '<a href="HTTP://ext.com/q">2</a>'
        '<a href="//cdn.net/x.js">3</a>'
        '<a href="/rel">4</a>'
        '<a href="page.html">5</a>'
        '<a href="mailto:x@y.z">6</a>'
        '<a href="javascript:void(0)">7</a>'
        '<a href="#frag">8</a>'
        "<a href=''>no-match-single-quote</a>"
    )
    pages = spark.createDataFrame(
        [(1, "me.com", html)], "doc_id LONG, host STRING, html STRING"
    )
    edges = weburl.extract_outlinks(pages).collect()
    got = [(r["href"], r["dst_host"], r["is_internal"]) for r in edges]
    # userinfo + port stripped, host lowercased; scheme case-blind;
    # protocol-relative resolved; root-relative -> own host (internal);
    # path-relative / mailto / javascript / anchors dropped
    assert got == [
        ("https://User:pw@Ext.COM:8080/p", "ext.com", False),
        ("HTTP://ext.com/q", "ext.com", False),
        ("//cdn.net/x.js", "cdn.net", False),
        ("/rel", "me.com", True),
    ]

    degs = {r["dst_host"]: tuple(r)[1:]
            for r in weburl.host_link_degrees(
                weburl.extract_outlinks(pages)).collect()}
    assert degs["ext.com"] == (2, 1, 0)
    assert degs["me.com"] == (1, 1, 1)


def test_host_pagerank_hand_computed(spark):
    from logparser_spark.operators import weburl

    edges = spark.createDataFrame(
        # A->B, A->C, B->C; C dangling; duplicate edge collapses
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")],
        "src_host STRING, dst_host STRING",
    )
    got = {r["host"]: r["rank"]
           for r in weburl.host_pagerank(edges, iters=1).collect()}
    # N=3, scale=1e12: r0 = 333333333333 each, base = 50000000000
    # B <- A/2 = 166666666666 -> 50e9 + (85*166666666666)//100
    # C <- A/2 + B = 499999999999 -> 50e9 + (85*499999999999)//100
    assert got == {
        "a": 50_000_000_000,
        "b": 191_666_666_666,
        "c": 474_999_999_999,
    }
    # deterministic across re-runs (integer arithmetic, no float sums)
    again = {r["host"]: r["rank"]
             for r in weburl.host_pagerank(edges, iters=1).collect()}
    assert again == got


class TestCountMinSketch:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )

    def test_overestimate_guarantee_and_exactness_when_wide(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import sketch

        docs = self._docs(spark, ["a b a c a b", "c d e a", "f f f"])
        true = {"a": 4, "b": 2, "c": 2, "d": 1, "e": 1, "f": 3}
        hh = {
            r["term"]: (r["cnt_true"], r["est"])
            for r in sketch.cms_heavy_hitters(
                docs, threshold=0, depth=4, width=4096
            ).collect()
        }
        assert {t: c for t, (c, _) in hh.items()} == true
        # est >= true always; with width >> vocab, exact w.h.p. (4096
        # buckets, 6 terms, 4 independent rows: a collision in EVERY
        # row is ~(6/4096)^4 — deterministic hashes, so just assert)
        assert all(e == c for c, e in hh.values())

    def test_collisions_only_inflate_never_deflate(self, spark):
        from logparser_spark.operators import sketch

        docs = self._docs(spark, ["x y z w v u t s r q p o n m"])
        hh = {
            r["term"]: (r["cnt_true"], r["est"])
            for r in sketch.cms_heavy_hitters(
                docs, threshold=0, depth=2, width=2
            ).collect()
        }
        assert all(e >= c for c, e in hh.values())
        # 14 distinct terms in 2 buckets: someone must have collided
        assert any(e > c for c, e in hh.values())

    def test_sketch_merge_equals_whole_corpus_build(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import sketch

        texts = ["a b c a", "b c d", "d d e a"]
        whole = sketch.cms_build(self._docs(spark, texts),
                                 depth=3, width=8)
        shards = [
            sketch.cms_build(self._docs(spark, [t]), depth=3, width=8)
            for t in texts
        ]
        merged = (
            shards[0].union(shards[1]).union(shards[2])
            .groupBy("r", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        key = lambda rows: sorted(map(tuple, rows))
        assert key(whole.collect()) == key(merged.collect())

    def test_absent_term_estimates_from_colliding_mass_only(self, spark):
        from logparser_spark.operators import sketch

        docs = self._docs(spark, ["a a a a"])
        sk = sketch.cms_build(docs, depth=4, width=4096)
        terms = docs.sparkSession.createDataFrame(
            [("zzz-not-present",)], ["term"]
        )
        est = sketch.cms_estimate(sk, terms, depth=4,
                                  width=4096).collect()[0]["est"]
        assert est == 0  # wide sketch: no collision with 'a'


class TestHyperLogLog:
    def test_estimate_accuracy_and_duplicate_blindness(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import sketch

        n = 5000
        items = spark.range(0, n).select(
            F.concat(F.lit("item-"), F.col("id")).alias("item")
        )
        est1 = sketch.hll_estimate(
            sketch.hll_registers(items, "item")
        ).collect()[0]
        # duplicating every item must not move a single register
        dup = items.union(items).union(items)
        est3 = sketch.hll_estimate(
            sketch.hll_registers(dup, "item")
        ).collect()[0]
        assert est1 == est3
        # 64 registers: typical error 1.04/sqrt(64) = 13%; allow 3x
        assert abs(est1["raw_est"] - n) / n < 0.40
        assert est1["v_empty"] == 0  # 5000 items >> 64 buckets

    def test_register_merge_law(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import sketch

        a = spark.range(0, 800).select(
            F.concat(F.lit("x"), F.col("id")).alias("item"))
        b = spark.range(400, 1500).select(
            F.concat(F.lit("x"), F.col("id")).alias("item"))
        whole = sketch.hll_registers(a.union(b), "item")
        merged = (
            sketch.hll_registers(a, "item")
            .union(sketch.hll_registers(b, "item"))
            .groupBy("bucket")
            .agg(F.max("max_rank").cast("int").alias("max_rank"))
        )
        key = lambda rows: sorted(map(tuple, rows))
        assert key(whole.collect()) == key(merged.collect())

    def test_rank_derivation_matches_bit_math(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import sketch
        import hashlib

        items = [f"probe-{i}" for i in range(50)]
        df = spark.createDataFrame([(s,) for s in items], ["item"])
        rows = sketch.hll_registers(df, "item").collect()
        regs = {r["bucket"]: r["max_rank"] for r in rows}
        expect = {}
        for s in items:
            h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            bucket = h >> 54
            suffix = h % (1 << 54)
            rank = 55 if suffix == 0 else 55 - suffix.bit_length()
            expect[bucket] = max(expect.get(bucket, 0), rank)
        assert regs == expect


class TestSimhashNearDup:
    def test_pigeonhole_route_equals_brute_force(self, spark):
        """With the cap disabled, the band join must find EXACTLY the
        all-pairs hamming<=3 set — the pigeonhole guarantee."""
        from pyspark.sql import functions as F

        from logparser_spark.operators import dedup

        base = "alpha beta gamma delta epsilon zeta eta theta " * 3
        texts = [base + suffix for suffix in
                 ["", "x", "x y", "qq rr ss tt uu vv ww zz", "x", ""]]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_near_dup_pairs(
                docs, max_bucket=None
            ).collect()
        )
        sims = {r["doc_id"]: r["simhash"]
                for r in dedup.simhash(docs).collect()}
        brute = sorted(
            (a, b, bin(sims[a] ^ sims[b]).count("1"))
            for a in sims for b in sims
            if a < b and bin(sims[a] ^ sims[b]).count("1") <= 3
        )
        assert got == brute and len(brute) >= 3  # non-trivial corpus

    def test_max_hamming_must_be_below_bands(self, spark):
        import pytest as _pytest

        from logparser_spark.operators import dedup

        docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="pigeonhole"):
            dedup.simhash_near_dup_pairs(docs, max_hamming=4, bands=4)

    def test_bucket_cap_drops_degenerate_buckets(self, spark):
        from logparser_spark.operators import dedup

        # 30 identical docs: every band bucket holds all 30
        docs = spark.createDataFrame(
            [(i, "same text here") for i in range(30)],
            ["doc_id", "text"],
        )
        assert dedup.simhash_near_dup_pairs(
            docs, max_bucket=10
        ).count() == 0
        assert dedup.simhash_near_dup_pairs(
            docs, max_bucket=None
        ).count() == 30 * 29 // 2


class TestExactQuantiles:
    QS = [0, 250_000, 500_000, 750_000, 990_000, 1_000_000]

    def _q(self, spark, vals, bucket_width=64, qs=None):
        from logparser_spark.operators import quantiles

        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = quantiles.quantiles_exact(
            df, "v", qs or self.QS, bucket_width=bucket_width
        ).collect()
        return {r["q_ppm"]: r["value"] for r in out}

    @staticmethod
    def _naive(vals, qs):
        s = sorted(vals)
        n = len(s)
        return {q: s[(q * (n - 1)) // 1_000_000] for q in qs}

    def test_matches_rank_contract(self, spark):
        import random

        rng = random.Random(3)
        vals = [rng.randrange(0, 500) for _ in range(997)]
        assert self._q(spark, vals) == self._naive(vals, self.QS)

    def test_bucket_width_is_semantics_free(self, spark):
        import random

        rng = random.Random(5)
        vals = [rng.randrange(0, 1000) for _ in range(400)]
        for w in (1, 7, 64, 10_000):
            assert self._q(spark, vals, bucket_width=w) \
                == self._naive(vals, self.QS), w

    def test_duplicate_heavy_and_single_value(self, spark):
        vals = [42] * 100
        got = self._q(spark, vals)
        assert set(got.values()) == {42}
        # ties at the median: 0 x50, 9 x50 -> p50 rank 50 = value 0
        vals = [0] * 50 + [9] * 50
        got = self._q(spark, vals, qs=[500_000])
        assert got[500_000] == self._naive(vals, [500_000])[500_000]

    def test_empty_input_yields_nulls(self, spark):
        got = self._q(spark, [], qs=[0, 1_000_000])
        assert got == {0: None, 1_000_000: None}


class TestFunnel:
    def _run(self, spark, rows, steps=("view", "click", "purchase")):
        from logparser_spark.operators import telemetry

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        out = telemetry.funnel(df, list(steps)).collect()
        return {r["step"]: (r["event_type"], r["n_users"],
                            r["conv_ppm"]) for r in out}

    def test_strict_order_and_conversion(self, spark):
        from datetime import datetime as dt

        T = lambda s: dt(2024, 1, 1, 0, 0, s)
        rows = [
            # user 1: full funnel in order
            (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
            # user 2: click BEFORE view -> stops at view
            (2, T(5), "click"), (2, T(6), "view"),
            # user 3: view + click, purchase before click -> step 2
            (3, T(1), "view"), (3, T(4), "click"), (3, T(2), "purchase"),
            # user 4: purchase only -> reaches nothing
            (4, T(1), "purchase"),
            # user 5: same-timestamp click as view -> NOT after
            (5, T(1), "view"), (5, T(1), "click"),
        ]
        got = self._run(spark, rows)
        assert got[1] == ("view", 4, 1_000_000)
        assert got[2] == ("click", 2, 500_000)
        assert got[3] == ("purchase", 1, 250_000)

    def test_later_earlier_pairs_still_count(self, spark):
        from datetime import datetime as dt

        T = lambda s: dt(2024, 1, 1, 0, 0, s)
        # first click precedes the first view, but a second click
        # follows it: t2 = first click AFTER t1 -> user converts
        rows = [(1, T(2), "view"), (1, T(1), "click"),
                (1, T(3), "click"), (1, T(4), "purchase")]
        got = self._run(spark, rows)
        assert got[2][1] == 1 and got[3][1] == 1

    def test_empty_events(self, spark):
        got = self._run(spark, [])
        assert got[1][1] == 0 and got[1][2] == 0


class TestRetentionAndSpikes:
    def test_cohort_retention_by_construction(self, spark):
        from datetime import datetime as dt

        from logparser_spark.operators import telemetry

        rows = [
            # user 1: first event week 0, active weeks 0, 1, 3
            (1, dt(2024, 1, 2), "a"), (1, dt(2024, 1, 9), "a"),
            (1, dt(2024, 1, 24), "a"),
            # user 2: first event week 1, active weeks 1, 2
            (2, dt(2024, 1, 10), "a"), (2, dt(2024, 1, 16), "a"),
            # user 3: week 0 only (two events, one distinct bucket)
            (3, dt(2024, 1, 3), "a"), (3, dt(2024, 1, 5), "a"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            (r["cohort"], r["offset"]): r["n_users"]
            for r in telemetry.cohort_retention(
                df, epoch="2024-01-01"
            ).collect()
        }
        assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                       (1, 0): 1, (1, 1): 1}

    def test_spike_detection_by_construction(self, spark):
        from datetime import datetime as dt, timedelta

        from logparser_spark.operators import telemetry

        rows = []
        t0 = dt(2024, 1, 1)
        # 30 hours of steady 4 events/hour, hour 27 carries 12 (3x)
        for h in range(30):
            n = 12 if h == 27 else 4
            for i in range(n):
                rows.append((h * 100 + i, t0 + timedelta(hours=h,
                                                         minutes=i),
                             "view"))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        got = telemetry.spike_hours(df).collect()
        assert [(r["event_type"], r["hour"], r["cnt"], r["trail_sum"])
                for r in got] == [
            ("view", "2024-01-02 03:00:00", 12, 96)
        ]
        # hours 0..23 are gated out (incomplete trailing window)
        assert all(r["hour"] >= "2024-01-02 00:00:00" for r in got)


class TestFuzzyAndSample:
    def test_fuzzy_pairs_equal_brute_force(self, spark):
        import itertools

        from logparser_spark.operators.fuzzyjoin import fuzzy_key_pairs

        keys = ["cat", "cats", "bat", "hat", "dog", "", "a", "f",
                "xyz", "cart", "car"]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        got = sorted((r["key_a"], r["key_b"])
                     for r in fuzzy_key_pairs(df).collect())

        def lev(a, b):
            import functools

            @functools.lru_cache(None)
            def d(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                           d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
            return d(len(a), len(b))

        brute = sorted(
            (min(a, b), max(a, b))
            for a, b in itertools.combinations(keys, 2)
            if lev(a, b) == 1
        )
        assert got == brute and len(brute) >= 6

    def test_fuzzy_bucket_cap_bounds_output(self, spark):
        from logparser_spark.operators.fuzzyjoin import fuzzy_key_pairs

        # 40 keys all sharing variant 'x' (they are 'x' + distinct
        # char): every pair is distance... only via bucket 'x'
        keys = [f"x{chr(97 + i)}" for i in range(26)]
        df = spark.createDataFrame([(k,) for k in keys], ["key"])
        assert fuzzy_key_pairs(df, max_bucket=5).count() == 0
        n = fuzzy_key_pairs(df, max_bucket=None).count()
        assert n == 26 * 25 // 2  # all pairs differ in one substitution

    def test_sample_fixed_n_deterministic_and_uniformish(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import corpus

        docs = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast("string").alias("text"),
        )
        s1 = sorted(r["doc_id"] for r in
                    corpus.sample_fixed_n(docs, 50).collect())
        s2 = sorted(r["doc_id"] for r in
                    corpus.sample_fixed_n(docs, 50).collect())
        assert s1 == s2 and len(s1) == 50
        s3 = sorted(r["doc_id"] for r in corpus.sample_fixed_n(
            docs, 50, salt="other|").collect())
        assert s3 != s1  # a different salt draws a different sample
        # n > rows: returns everything
        assert corpus.sample_fixed_n(docs, 5000).count() == 1000


class TestPolitenessOrder:
    def test_rounds_and_spacing(self, spark):
        from pyspark.sql import functions as F

        from logparser_spark.operators import weburl

        # 4 hosts x 6 urls, balanced
        rows = [(f"https://h{i % 4}.test/p/{i}",) for i in range(24)]
        df = spark.createDataFrame(rows, ["url"])
        out = weburl.politeness_order(df).collect()
        assert sorted(r["position"] for r in out) == list(range(1, 25))
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(
                (r["slot"], r["position"])
            )
        for host, sp in by_host.items():
            sp.sort()
            # positions increase with slot, spaced exactly n_hosts
            # apart in the balanced case
            assert [p - sp[0][1] for _, p in sp] == \
                [4 * k for k in range(6)], host
        # every round holds each host exactly once
        rounds = {}
        for r in out:
            rounds.setdefault(r["slot"], []).append(r["host"])
        for slot, hosts in rounds.items():
            assert len(hosts) == len(set(hosts)) == 4, slot

    def test_unbalanced_hosts_trail_off(self, spark):
        import hashlib

        from logparser_spark.operators import weburl

        big_urls = ["https://big.test/a", "https://big.test/b",
                    "https://big.test/c"]
        rows = [(u,) for u in big_urls] + [("https://small.test/x",)]
        df = spark.createDataFrame(rows, ["url"])
        out = {r["url"]: (r["slot"], r["position"])
               for r in weburl.politeness_order(df).collect()}
        # slot order within a host is (md5(url), url)
        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        big_sorted = sorted(big_urls, key=lambda u: (md5(u), u))
        # round 0: both hosts; rounds 1-2: big.test alone at the tail
        assert {out[big_sorted[0]][0],
                out["https://small.test/x"][0]} == {0}
        assert out[big_sorted[1]] == (1, 3)
        assert out[big_sorted[2]] == (2, 4)

    def test_mixed_case_scheme_keeps_host(self, spark):
        from logparser_spark.operators import weburl

        rows = [("HTTP://Big.test/a",), ("https://big.test/b",),
                ("hTtPs://OTHER.test/x",)]
        df = spark.createDataFrame(rows, ["url"])
        out = weburl.politeness_order(df).collect()
        hosts = {r["url"]: r["host"] for r in out}
        assert hosts["HTTP://Big.test/a"] == "big.test"
        assert hosts["hTtPs://OTHER.test/x"] == "other.test"
        # the two big.test urls occupy rounds 0 and 1, never one
        # pseudo-host '' bucket
        big_slots = sorted(r["slot"] for r in out
                           if r["host"] == "big.test")
        assert big_slots == [0, 1]

    def test_no_unsalted_per_host_window(self, spark):
        """The plan must never sort one whole host (or one whole slot)
        of ROW-LEVEL data in a single window partition: every
        row_number window (row_number only appears in the row-level
        ranks; the offset windows over the ≤256-row bucket aggregates
        use sum) must carry a hash-prefix salt bucket in its
        partition keys."""
        import re

        from logparser_spark.operators import weburl

        rows = [(f"https://h{i % 4}.test/p/{i}",) for i in range(24)]
        df = spark.createDataFrame(rows, ["url"])
        plan = weburl.politeness_order(df) \
            ._jdf.queryExecution().executedPlan().toString()
        rn_windows = [
            m.group(0)
            for m in re.finditer(
                r"Window \[row_number\(\)[^\]]*\], \[[^\]]*\]", plan
            )
        ]
        assert rn_windows, plan  # the ranks must still be windows
        for w in rn_windows:
            assert "__ub" in w or "__hb" in w, w


def test_gopher_quality_rules(spark):
    """Every Gopher rule (Rae et al. 2021 Table A1) against an
    INDEPENDENT python reference on an adversarial corpus: bullets,
    ellipsis line-ends, '#' symbol floods, non-alpha word floods,
    long words, empty docs, and a clean passing doc."""
    import re

    from logparser_spark.operators.textstats import (
        GOPHER_STOPWORDS,
        gopher_quality,
    )

    texts = [
        " ".join(["the quick brown fox and that dog have fun here"] * 6),
        "short text only",
        " ".join(["#tag"] * 60),
        "\n".join(["- bullet line"] * 10),
        "\n".join(["* starred"] * 9 + ["plain line"]),
        "\n".join(["ends with dots..."] * 3 + ["clean line"] * 7),
        " ".join(["12345"] * 60),
        "",
        "   \n  \n ",
        " ".join(["abcdefghijklmnop"] * 60),
        "with. the, and... that # be of to have",
        " ".join(["…"] * 55) + "\nline…",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    def ref(text):
        words = [w for w in re.split(r"\s+", text) if w]
        lines = [ln for ln in text.split("\n") if ln.strip()]
        nw, nl = len(words), len(lines)
        swl = sum(len(w) for w in words)
        nsym = text.count("#") + (
            len(text) - len(text.replace("...", ""))
        ) // 3
        nbul = sum(bool(re.match(r"^[•\-*]", ln.strip()))
                   for ln in lines)
        nell = sum(bool(re.search(r"(\.\.\.|…)$", ln.strip()))
                   for ln in lines)
        nalpha = sum(bool(re.search("[A-Za-z]", w)) for w in words)
        nstop = len({w.lower() for w in words} & set(GOPHER_STOPWORDS))
        p = lambda a, b: (a * 1_000_000) // b if b > 0 else None  # noqa: E731
        m = dict(
            n_words=nw,
            mean_word_len_ppm=p(swl, nw),
            symbol_ratio_ppm=p(nsym, nw),
            bullet_line_ppm=p(nbul, nl),
            ellipsis_line_ppm=p(nell, nl),
            alpha_word_ppm=p(nalpha, nw),
            n_stop_distinct=nstop,
        )
        r = dict(
            r1=50 <= nw <= 100_000,
            r2=(m["mean_word_len_ppm"] is not None
                and 3_000_000 <= m["mean_word_len_ppm"] <= 10_000_000),
            r3=(m["symbol_ratio_ppm"] is not None
                and m["symbol_ratio_ppm"] <= 100_000),
            r4=(m["bullet_line_ppm"] is None
                or m["bullet_line_ppm"] <= 900_000),
            r5=(m["ellipsis_line_ppm"] is None
                or m["ellipsis_line_ppm"] <= 300_000),
            r6=(m["alpha_word_ppm"] is not None
                and m["alpha_word_ppm"] >= 800_000),
            r7=nstop >= 2,
        )
        r["passes"] = all(r.values())
        return {**m, **r}

    for i, t in enumerate(texts):
        want = ref(t)
        have = {k: got[i][k] for k in want}
        assert have == want, (i, t, have, want)
    assert got[0]["passes"] is True
    assert sum(r["passes"] for r in got.values()) == 1


def test_extract_anchors_and_stats(spark):
    """Anchor text extraction: visible text cleaned (inner tags
    stripped, five entities unescaped, whitespace collapsed), empty
    image-link anchors kept, dst classification identical to
    extract_outlinks, junk schemes dropped; stats fold the top text
    with the lexicographic tie-break via min(struct(-n, anchor)) —
    never a per-host rank window."""
    from logparser_spark.operators.weburl import (
        anchor_text_stats,
        extract_anchors,
        extract_outlinks,
    )

    pages = spark.createDataFrame([
        (1, "me.com",
         '<a href="https://X.com:80/a">Hello <b>World</b></a>'
         '<a class="x" href="//y.net/z">A &amp; B &lt;ok&gt;</a>'
         '<a href="/local">  spaced\n  text </a>'
         '<a href="mailto:a@b.c">drop me</a>'
         '<a href="#top">also dropped</a>'
         '<a href="https://x.com/b"><img src="i.png"/></a>'),
        (2, "me.com", '<a href="https://x.com/c">Hello <b>World</b></a>'
                      '<a href="https://x.com/d">aardvark</a>'),
    ], "doc_id long, host string, html string")

    got = sorted(
        (r["doc_id"], r["dst_host"], r["anchor"])
        for r in extract_anchors(pages).collect()
    )
    assert got == [
        (1, "me.com", "spaced text"),
        (1, "x.com", ""),
        (1, "x.com", "Hello World"),
        (1, "y.net", "A & B <ok>"),
        (2, "x.com", "Hello World"),
        (2, "x.com", "aardvark"),
    ]
    # dst classification parity with extract_outlinks (same hrefs)
    ol = sorted(
        (r["doc_id"], r["dst_host"])
        for r in extract_outlinks(
            pages.withColumnRenamed("host", "host")
        ).collect()
    )
    assert ol == sorted((d, h) for d, h, _a in got)

    stats = {
        r["dst_host"]: (r["n_anchors"], r["n_unique_texts"],
                        r["top_anchor"], r["top_n"])
        for r in anchor_text_stats(extract_anchors(pages)).collect()
    }
    # x.com: 'Hello World' x2 beats '' and 'aardvark'
    assert stats["x.com"] == (4, 3, "Hello World", 2)
    assert stats["me.com"] == (1, 1, "spaced text", 1)
    # tie case: two distinct texts with n=1 -> lexicographic smallest
    tie = anchor_text_stats(extract_anchors(spark.createDataFrame(
        [(3, "h.com", '<a href="https://t.io/1">zeta</a>'
                      '<a href="https://t.io/2">alpha</a>')],
        "doc_id long, host string, html string",
    ))).collect()
    assert (tie[0]["top_anchor"], tie[0]["top_n"]) == ("alpha", 1)


def test_parse_sitemaps(spark):
    """Sitemap protocol: urlset vs sitemapindex kinds, loc
    XML-unescape, optional lastmod/priority, ppk conversion, loc-less
    blocks dropped with their seq gap kept."""
    from logparser_spark.operators.weburl import parse_sitemaps

    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.com/?x=1&amp;y=2</loc>"
        "<lastmod>2024-01-02</lastmod><priority>0.7</priority></url>"
        "<url><loc> https://a.com/plain </loc></url>"
        "<url><priority>0.9</priority></url>"
        "<url><loc>https://a.com/&apos;z&apos;</loc>"
        "<priority>1.0</priority></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>2024-02-03</lastmod></sitemap>"
        "<sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index)], "sitemap_id long, xml string"
    )
    got = sorted(
        (r["sitemap_id"], r["is_index"], r["seq"], r["loc"],
         r["lastmod"], r["priority_ppk"])
        for r in parse_sitemaps(df).collect()
    )
    assert got == [
        (1, False, 0, "https://a.com/?x=1&y=2", "2024-01-02", 700),
        (1, False, 1, "https://a.com/plain", None, None),
        (1, False, 3, "https://a.com/'z'", None, 1000),
        (2, True, 0, "https://a.com/s1.xml", "2024-02-03", None),
        (2, True, 1, "https://a.com/s2.xml", None, None),
    ]


def test_boilerplate_blocks_and_main_content(spark):
    """jusText-lite rules: script/style removed wholesale, the four
    verdict tiers (linky / good / short / low_stop), density ppm
    math, block order preserved in the reassembled content, and
    no-good-block pages yielding no row."""
    from logparser_spark.operators.boilerplate import (
        boilerplate_blocks,
        main_content,
    )

    good_p = ("This is the first real paragraph of the page and it is "
              "full of the usual function words that a normal English "
              "sentence carries with it.")
    good_p2 = ("Here is a second content paragraph and it also has "
               "plenty of the common words that are needed for it to "
               "pass the bar.")
    html = (
        '<html><head><style>.x{color:red}</style>'
        '<script>var s = "of the and to in";</script></head><body>'
        '<div class="nav"><a href="/">Home</a> '
        '<a href="/about">About us</a> <a href="/c">Contact</a></div>'
        f"<p>{good_p}</p>"
        "<p>Read more...</p>"
        "<div>word soup lacking stop tokens entirely just nouns "
        "verbs objects widgets gadgets sprockets flanges</div>"
        f"<p>{good_p2}</p>"
        '<div class="footer">Copyright 2024 <a href="/tos">Terms</a> '
        '<a href="/p">privacy</a></div></body></html>'
    )
    linky_only = ('<html><body><div><a href="/a">one link</a> '
                  '<a href="/b">two links</a></div></body></html>')
    df = spark.createDataFrame(
        [(1, html), (2, linky_only)], "doc_id long, html string"
    )
    blocks = sorted(
        ((r["doc_id"], r["seq"]), (r["verdict"], r["n_words"]))
        for r in boilerplate_blocks(df).collect()
    )
    verdicts = [v for (_d, _s), (v, _n) in blocks]
    assert verdicts == ["linky", "good", "short", "low_stop", "good",
                        "linky", "linky"]
    # script/style text never leaks into any block
    texts = [r["text"] for r in boilerplate_blocks(df).collect()]
    assert not any("color:red" in t or "var s" in t for t in texts)

    mc = {r["doc_id"]: r for r in main_content(df).collect()}
    assert set(mc) == {1}
    assert mc[1]["n_good_blocks"] == 2
    assert mc[1]["content"] == f"{good_p}\n{good_p2}"


def test_dedup_lines_within_doc(spark):
    """Intra-doc line dedup: first occurrence kept, order preserved,
    blank lines dedup like any line, counts exact."""
    from logparser_spark.operators.corpus import dedup_lines_within_doc

    df = spark.createDataFrame(
        [(1, "A\nB\nA\nC\nB\nA"), (2, "x"), (3, ""),
         (4, "p\n\nq\n\np")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text_dedup"], r["n_lines_in"],
                         r["n_lines_out"])
           for r in dedup_lines_within_doc(df).collect()}
    assert got[1] == ("A\nB\nC", 6, 3)
    assert got[2] == ("x", 1, 1)
    assert got[3] == ("", 1, 1)
    assert got[4] == ("p\n\nq", 5, 3)


def test_robots_sitemaps(spark):
    from logparser_spark.operators.weburl import robots_sitemaps

    txt = ("User-agent: *\nDisallow: /p\n"
           "# Sitemap: https://commented.out/x.xml\n"
           "Sitemap: https://a.com/s1.xml\n"
           "sitemap:https://a.com/s2.xml\n"
           "SITEMAP:   https://a.com/s1.xml\n"   # duplicate preserved
           "NotASitemap: https://a.com/no.xml\n")
    df = spark.createDataFrame([("a.com", txt)],
                               "host string, robots_txt string")
    got = sorted(r["sitemap_url"] for r in robots_sitemaps(df).collect())
    assert got == ["https://a.com/s1.xml", "https://a.com/s1.xml",
                   "https://a.com/s2.xml"]


def test_registrable_domain(spark):
    from logparser_spark.operators.weburl import registrable_domain

    cases = {
        "www.site7.co.uk": "site7.co.uk",
        "site7.co.uk": "site7.co.uk",
        "co.uk": "co.uk",                 # bare suffix: passthrough
        "a.b.site.com": "site.com",
        "site.com": "site.com",
        "localhost": "localhost",         # no dot: passthrough
        "deep.sub.x.com.au": "x.com.au",
        "WWW.Upper.CO.UK": "upper.co.uk",
        "something.co.ukx": "co.ukx",     # suffix needs label boundary
        "extra.suf.example": "party.suf.example",
    }
    df = spark.createDataFrame(
        [(h,) for h in cases
         if h != "extra.suf.example"] + [("my.party.suf.example",)],
        "host string",
    )
    got = {r["host"]: r["etld1"]
           for r in registrable_domain(
               df, extra_suffixes=["suf.example"]).collect()}
    for h, want in cases.items():
        key = "my.party.suf.example" if h == "extra.suf.example" else h
        assert got[key] == want, (key, got[key], want)


def test_sniff_mime_and_http_headers(spark):
    from logparser_spark.operators.multimodal import sniff_mime
    from logparser_spark.sources.warc import http_headers

    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0rest"), "image/jpeg"),
        (2, bytearray(b"\x89PNG\r\n\x1a\nx"), "image/png"),
        (3, bytearray(b"RIFF\x00\x00\x00\x00WAVEfmt "), "audio/wav"),
        (4, bytearray(b"RIFF\x00\x00\x00\x00AVI LIST"),
         "video/x-msvideo"),
        (5, bytearray(b"\x00\x00\x00 ftypisom"), "video/mp4"),
        (6, bytearray(b"random"), "application/octet-stream"),
        (7, None, None),
        (8, bytearray(b"GIF89a..."), "image/gif"),
        (9, bytearray(b"fLaC\x00"), "audio/flac"),
        (10, bytearray(b"\x1f\x8b\x08\x00"), "application/gzip"),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d, _m in rows], "doc_id long, data binary"
    )
    got = {r["doc_id"]: r["mime"] for r in sniff_mime(df).collect()}
    for i, _d, want in rows:
        assert got[i] == want, (i, got[i], want)

    h = spark.createDataFrame(
        [("r1", "HTTP/1.1 200 OK\r\nContent-Type: text/html; q=1\r\n"
                "X-N:  7 \r\nbad line\r\nSERVER:nginx\r\n\r\n"
                "body: colon\r\nx")],
        "record_id string, payload string",
    )
    hdrs = [(r["seq"], r["name"], r["value"])
            for r in http_headers(h).orderBy("seq").collect()]
    assert hdrs == [(1, "content-type", "text/html; q=1"),
                    (2, "x-n", "7"), (4, "server", "nginx")]


def test_kmeans_matches_python_reference(spark):
    """Integer k-means vs an independent per-row python reference
    (same quantize/trunc-div/tie-break/empty-carryover contract), on
    vectors engineered to exercise ties and an emptied cluster."""
    import math

    from logparser_spark.operators.kmeans import kmeans_fit_assign

    vecs = [
        (0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 10.0]),
        (3, [10.1, 10.0]), (4, [10.0, 10.1]), (5, [0.05, 0.05]),
        (6, [-5.0, -5.0]), (7, [-5.1, -5.0]), (8, [20.0, 20.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    K, IT = 3, 4
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_fit_assign(df, k=K, iters=IT).collect()}

    # reference: float32-faithful quantization, then pure ints
    def quant(v):
        import struct
        return [math.floor(
            struct.unpack("f", struct.pack("f", x))[0] * 1e6 + 0.5
        ) for x in v]

    q = {i: quant(v) for i, v in vecs}
    cent = [q[i] for i in range(K)]

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign():
        out = {}
        for i, qq in q.items():
            best = min((dist(qq, c), j) for j, c in enumerate(cent))
            out[i] = best
        return out

    for _ in range(IT):
        a = assign()
        sums = {}
        for i, (d, j) in a.items():
            s = sums.setdefault(j, [[0] * len(q[i]), 0])
            s[0] = [x + y for x, y in zip(s[0], q[i])]
            s[1] += 1
        for j, (svec, n) in sums.items():
            cent[j] = [(abs(s) // n) * (1 if s >= 0 else -1)
                       for s in svec]
    ref = {i: (j, d) for i, (d, j) in assign().items()}
    assert got == ref


def test_kmeans_ivf_topk_recall_and_self_hit(spark):
    """IVF ANN: self-hit at rank 1 with dist 0; results are a subset
    of brute-force candidates restricted to probed cells with exact
    integer distances; raising nprobe to k makes it EXACT brute-force
    top-k (the IVF recall law)."""
    from logparser_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_ivf_topk,
        quantize,
    )

    import random
    rng = random.Random(5)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_ivf_topk(df, k=3, iters=2, nprobe=1, topk=4,
                          query_mod=20)
    rows = sorted(
        (r["qid"], r["rank"], r["vec_id"], r["dist"])
        for r in out.collect()
    )
    qids = {q for q, _r, _v, _d in rows}
    assert qids == {0, 20, 40}
    for q in qids:
        first = [r for r in rows if r[0] == q and r[1] == 1][0]
        assert first[2] == q and first[3] == 0  # self-hit

    # nprobe = k  ==> exact brute-force top-k
    exact = kmeans_ivf_topk(df, k=3, iters=2, nprobe=3, topk=4,
                            query_mod=20)
    got = {(r["qid"], r["rank"]): (r["vec_id"], r["dist"])
           for r in exact.collect()}
    qrows = {r["vec_id"]: list(r["q"])
             for r in quantize(df).collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for q in qids:
        bf = sorted(
            (d2(qrows[q], qv), v) for v, qv in qrows.items()
        )[:4]
        for rk, (dd, vv) in enumerate(bf, start=1):
            assert got[(q, rk)] == (vv, dd), (q, rk)


def test_rebalance_mix_rates_and_binding_stratum(spark):
    """Rate derivation: binding stratum keeps 100%, other rates scale
    by the exact rational, absent strata drop, kept counts land near
    target proportions."""
    from logparser_spark.operators.corpus import rebalance_mix

    rows = [(i, "big") for i in range(300)]
    rows += [(1000 + i, "small") for i in range(50)]
    rows += [(2000 + i, "dropme") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_mix(df, {"big": 500_000, "small": 500_000})
    got = {(r["lang"], r["accept_ppm"]) for r in out.collect()}
    langs = {l for l, _p in got}
    assert langs == {"big", "small"}
    rates = dict(got)
    assert rates["small"] == 1_000_000           # binding stratum
    # big: floor(50 * 5e5 * 1e6 / (5e5 * 300)) = 166_666
    assert rates["big"] == 166_666
    n_big = sum(1 for r in out.collect() if r["lang"] == "big")
    assert 30 <= n_big <= 70  # ~50 expected of 300 at 16.7%


def test_tag_keywords(spark):
    from logparser_spark.operators.textstats import tag_keywords

    df = spark.createDataFrame(
        [(1, "the table scan beats a tablescan"),
         (2, "spark spark spark"),
         (3, "nothing relevant"),
         (4, "window. hash, table!")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["tags"], r["n_tags"])
           for r in tag_keywords(
               df, ["table", "scan", "spark", "window", "hash"]
           ).collect()}
    assert got[1] == (["scan", "table"], 2)   # 'tablescan' NOT matched
    assert got[2] == (["spark"], 1)
    assert got[3] == ([], 0)
    assert got[4] == (["hash", "table", "window"], 3)


def test_range_join_vs_naive(spark):
    """Grid-decomposed range join vs the naive predicate: boundary
    inclusion (ts == start in, ts == end out), empty and reversed
    intervals match nothing, intervals spanning many grid cells match
    once, and the plan has NO nested-loop/cartesian join."""
    import datetime as dt

    from logparser_spark.operators.rangejoin import range_join

    t0 = dt.datetime(2026, 3, 1, 0, 0, 0)

    def T(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    pts = [(i, T(m)) for i, m in enumerate(
        [0, 59, 60, 61, 119, 120, 180, 240, 600, 59, 200]
    )]
    ivs = [
        (0, T(0), T(60)),       # [0, 60)
        (1, T(60), T(120)),
        (2, T(0), T(600)),      # spans 10 cells
        (3, T(240), T(240)),    # empty
        (4, T(300), T(240)),    # reversed
        (5, T(601), T(602)),
    ]
    p = spark.createDataFrame(pts, "pid long, ts timestamp")
    v = spark.createDataFrame(
        ivs, "iid long, start_ts timestamp, end_ts timestamp"
    )
    out = range_join(p, v, ts_col="ts", bucket_s=3600)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    want = sorted(
        (pid, iid)
        for pid, ts in pts
        for iid, s, e in ivs
        if s <= ts < e
    )
    assert got == want and want  # non-trivial
    # at start_ts included; at exactly end_ts excluded
    assert (0, 0) in got and (2, 1) in got
    assert (2, 0) not in got and (5, 1) not in got
    assert all(i != 3 and i != 4 for _p, i in got)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_statuses(spark):
    """Digest-based diff: NULL-content transitions count as changes
    (null marker), added/removed/changed/unchanged all exercised,
    summary counts match."""
    from logparser_spark.operators.diffsnap import (
        diff_summary,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "now set"), (5, None), (6, "new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed", 5: "changed", 6: "added"}
    summ = {r["status"]: r["n"]
            for r in diff_summary(old, new).collect()}
    assert summ == {"unchanged": 1, "changed": 3, "removed": 1,
                    "added": 1}


def test_dq_check_null_fails_closed(spark):
    from logparser_spark.operators.corpus import dq_check

    df = spark.createDataFrame(
        [(1, "a", 1), (2, None, 2), (3, "c", 99), (4, "d", None)],
        "doc_id long, text string, v long",
    )
    got = {r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
           for r in dq_check(df, {
               "text not null": "text IS NOT NULL",
               "v in range": "v BETWEEN 1 AND 10",  # NULL v violates
               "id positive": "doc_id > 0",
           }).collect()}
    assert got == {"text not null": (4, 1, False),
                   "v in range": (4, 2, False),
                   "id positive": (4, 0, True)}


def test_kmeans_backends_agree(spark):
    """The catalyst (broadcast-join argmin) and arrow (mapInArrow
    NumPy) assignment backends are bit-identical — same clusters,
    same exact integer distances, same tie-breaks — on vectors with
    engineered ties."""
    import random

    from logparser_spark.operators.kmeans import kmeans_fit_assign

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)])
            for i in range(80)]
    # engineered exact ties: rows equidistant from two init rows
    vecs += [(100, [1.0] * 6), (101, [-1.0] * 6), (102, [0.0] * 6)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    cat = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_fit_assign(df, k=4, iters=3,
                                      backend="catalyst").collect()}
    arr = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_fit_assign(df, k=4, iters=3,
                                      backend="arrow").collect()}
    assert cat == arr


def test_kmeans_large_k_plan_is_o1(spark):
    """The round-4 verdict's k-budget finding: assignment must not
    embed k·dim literal expressions. At k=512 × dim=16 the physical
    plan stays small (codebook travels as broadcast DATA), uses a
    BroadcastHashJoin (never BroadcastNestedLoopJoin), and the
    assignment matches a NumPy reference."""
    import random

    import numpy as np

    from logparser_spark.operators.kmeans import _assign, quantize

    rng = random.Random(7)
    K, DIM = 512, 16
    cents = [[rng.randint(-1_000_000, 1_000_000) for _ in range(DIM)]
             for _ in range(K)]
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(DIM)])
         for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    qdf = quantize(df)
    out = _assign(qdf, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # O(1) plan: a literal fan-out at k=512×16 would be ~100k nodes /
    # megabytes of toString; the broadcast-data plan is a few KB.
    assert len(plan) < 20_000

    rows = out.collect()
    cm = np.asarray(cents, dtype=np.int64)
    qm = {r["vec_id"]: np.asarray(list(r["q"]), dtype=np.int64)
          for r in qdf.collect()}
    for r in rows:
        d = ((cm - qm[r["vec_id"]][None, :]) ** 2).sum(axis=1)
        j = int(d.argmin())
        assert (r["cluster"], r["dist"]) == (j, int(d[j]))


def test_incremental_lsh_matches_batch_minus_old_old(spark):
    """The incremental-LSH law: running the batch over the band/shingle
    ledger must yield EXACTLY the union-corpus batch result minus the
    ledger-internal (old-old) pairs — same pairs, same exact jaccard
    values — including a planted old↔new near-dup pair that only the
    ledger join can find."""
    from logparser_spark.operators import dedup

    base = [
        (i, f"document number {i} about spark partition strategy "
            f"with some shared vocabulary and unique token u{i}")
        for i in range(30)
    ]
    # planted near-dups: old↔old (0,1), old↔new (2, 102), new↔new
    # (103, 104)
    extra = [
        (1, base[0][1] + " tail"),
        (102, base[2][1] + "!"),
        (103, "an entirely new pair member alpha beta gamma delta "
              "epsilon zeta eta theta"),
        (104, "an entirely new pair member alpha beta gamma delta "
              "epsilon zeta eta theta!"),
    ]
    rows = dict(base)
    rows[1] = extra[0][1]
    rows[102], rows[103], rows[104] = (
        extra[1][1], extra[2][1], extra[3][1])
    old_ids = {i for i in rows if i < 100 and i % 2 == 0} | {1}
    old = spark.createDataFrame(
        [(i, t) for i, t in rows.items() if i in old_ids],
        "doc_id LONG, text STRING")
    new = spark.createDataFrame(
        [(i, t) for i, t in rows.items() if i not in old_ids],
        "doc_id LONG, text STRING")
    union = spark.createDataFrame(
        list(rows.items()), "doc_id LONG, text STRING")

    full_sh = dedup.shingle_hashes(union)
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                union,
                dedup.lsh_candidate_pairs(union, shingle_df=full_sh),
                shingle_df=full_sh).collect()}
    want = {p: j for p, j in full.items()
            if not (p[0] in old_ids and p[1] in old_ids)}

    old_sh = dedup.shingle_hashes(old)
    ledger_bands = dedup.lsh_bands(
        dedup.minhash_signature(old, shingle_df=old_sh))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.incremental_lsh_pairs(
               new, ledger_bands, old_sh).collect()}

    assert got == want
    assert (2, 102) in got          # the old↔new planted pair
    assert (0, 1) in full and (0, 1) not in got  # old-old excluded


def test_sentence_dedup_keep_first_matches_python(spark):
    """C4-rule sentence dedup vs an independent python recompute of the
    pinned split/keep-first/reassemble contract, on a corpus with
    cross-doc duplicate sentences, in-doc repeats, unterminated
    fragments, and an empty doc."""
    from logparser_spark.operators.corpus import sentence_dedup_keep_first

    docs = {
        1: "The sky is blue. Boilerplate footer. A unique one.",
        2: "Boilerplate footer. Another unique sentence! The end",
        3: "Repeat me. Repeat me. The sky is blue. Fresh tail?",
        4: "",
        5: "Boilerplate footer.",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["cleaned"], r["n_sents"], r["n_kept"])
           for r in sentence_dedup_keep_first(df).collect()}

    import re
    seen = {}
    split = {d: re.sub(r"([.!?]) ", "\\1\x1e", t).split("\x1e")
             for d, t in docs.items()}
    for d in sorted(split):
        for p, s in enumerate(split[d]):
            seen.setdefault(s, (d, p))
    want = {}
    for d, sents in split.items():
        kept = [s for p, s in enumerate(sents) if seen[s] == (d, p)]
        want[d] = (" ".join(kept), len(sents), len(kept))
    assert got == want
    # the rule's signature behaviors, explicitly:
    assert "Boilerplate footer." in want[1][0]       # first occurrence
    assert "Boilerplate footer" not in want[2][0]    # later ones drop
    assert "Boilerplate" not in want[5][0]
    assert want[3] == ("Repeat me. Fresh tail?", 4, 2)  # in-doc repeat
