"""WARC byte-walker robustness: spec round-trip plus the hostile
shapes a real crawl segment contains — lying Content-Length, truncated
tails, garbage between records — and the range-split property that
makes the format parallel-readable."""

from logparser_spark.sources.warc import (
    MAGIC,
    _parse_warc_buffer,
    parse_warc,
    synth_warc_files,
)


def _rec(uri: str, body: bytes, clen: int | None = None,
         status: bytes = b"200 OK") -> bytes:
    http = b"HTTP/1.1 " + status + b"\r\nContent-Type: text/plain\r\n\r\n" \
        + body
    n = len(http) if clen is None else clen
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"Content-Length: " + str(n).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )


def test_clean_walk():
    buf = _rec("http://a/1", b"one") + _rec("http://a/2", b"two")
    got = list(_parse_warc_buffer(buf))
    assert [(r[1], r[4], r[5], r[6]) for r in got] == [
        ("http://a/1", 200, "one", True),
        ("http://a/2", 200, "two", True),
    ]


def test_garbage_between_records_is_skipped():
    buf = b"\x00\xffjunk" + _rec("http://a/1", b"x") + b"noise here" \
        + _rec("http://a/2", b"y")
    got = list(_parse_warc_buffer(buf))
    assert [r[1] for r in got] == ["http://a/1", "http://a/2"]
    assert all(r[6] for r in got)


def test_lying_content_length_resyncs_without_losing_neighbor():
    # claims 3 octets but the HTTP block is longer -> terminator check
    # fails -> valid=False, payload withheld, next record still parsed
    bad = _rec("http://bad", b"longer than three", clen=3)
    buf = bad + _rec("http://good", b"ok")
    got = list(_parse_warc_buffer(buf))
    assert [(r[1], r[6]) for r in got] == [
        ("http://bad", False), ("http://good", True)
    ]
    assert got[0][3] is None and got[0][5] is None


def test_truncated_tail_yields_invalid_row():
    full = _rec("http://a/1", b"payload body")
    buf = _rec("http://ok", b"fine") + full[: len(full) - 9]
    got = list(_parse_warc_buffer(buf))
    assert [(r[1], r[6]) for r in got] == [
        ("http://ok", True), ("http://a/1", False)
    ]


def test_header_truncated_at_eof():
    buf = MAGIC + b"WARC-Type: resp"  # no header terminator at all
    got = list(_parse_warc_buffer(buf))
    assert got == [(None, None, None, None, None, None, False)]


def test_non_http_payload_is_invalid():
    r = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 7\r\n"
        b"\r\nnot-web\r\n\r\n"
    )
    got = list(_parse_warc_buffer(r))
    assert got[0][0] == "warcinfo" and got[0][6] is False


def test_range_split_parses_suffix_identically():
    """Parsing from any byte offset's first magic yields exactly the
    records starting there — the property a splittable input relies
    on."""
    recs = [_rec(f"http://a/{i}", b"b" * i) for i in range(6)]
    buf = b"".join(recs)
    whole = list(_parse_warc_buffer(buf))
    off = len(recs[0]) + len(recs[1]) // 2  # mid-record-1 split point
    suffix = list(_parse_warc_buffer(buf[off:]))
    assert suffix == whole[2:]


def test_spark_stage_round_trip(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} text body") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    out = parse_warc(synth_warc_files(docs, per_file=4)).collect()
    assert len(out) == 20
    by_key = {(r["file_id"], r["rec_no"]): r for r in out}
    r7 = by_key[(1, 3)]  # doc_id 7
    assert r7["target_uri"] == "http://site7.com/page/7"
    assert r7["payload"] == "<html><body>word7 text body</body></html>"
    assert r7["valid"] is True
    assert by_key[(0, 0)]["valid"] is False  # doc 0: planted corruption
    assert by_key[(0, 0)]["content_length"] is None
