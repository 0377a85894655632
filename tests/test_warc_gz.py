"""Gzipped-WARC member chain: clean splitting, gzip-level corruption
resync (garbage between members, corrupt member body, truncated
tail), and the random-access property — any member fetched by the
index's (offset, length) decompresses standalone to the same record.
"""

import gzip
import zlib

from logparser_spark.sources.warc_gz import (
    gzip_member,
    iter_gz_members,
    parse_warc_gz,
    synth_warc_gz_files,
    warc_gz_member_index,
)
from tests.test_warc import _rec


def _member(uri: str, body: bytes) -> bytes:
    return gzip_member(_rec(uri, body))


def test_clean_member_chain():
    buf = _member("http://a/1", b"one") + _member("http://a/2", b"two")
    got = list(iter_gz_members(buf))
    assert [m[3] for m in got] == [True, True]
    assert got[0][1] == 0 and got[1][1] == got[0][2]
    assert got[0][2] + got[1][2] == len(buf)
    assert got[0][0] == _rec("http://a/1", b"one")


def test_member_is_deterministic():
    assert _member("http://a", b"x") == _member("http://a", b"x")


def test_garbage_between_members_resyncs():
    buf = b"\x00junk" + _member("http://a/1", b"x") + b"zzz" \
        + _member("http://a/2", b"y")
    got = list(iter_gz_members(buf))
    assert [(m[0][:8], m[3]) for m in got] == [
        (b"WARC/1.0", True), (b"WARC/1.0", True)
    ]


def test_corrupt_member_body_resyncs_to_next():
    ok1 = _member("http://a/1", b"x")
    bad = bytearray(_member("http://bad", b"this will be corrupted"))
    bad[20] ^= 0xFF  # flip a deflate byte mid-stream
    ok2 = _member("http://a/2", b"y")
    got = list(iter_gz_members(bytes(ok1 + bad + ok2)))
    flags = [m[3] for m in got]
    assert flags[0] is True and flags[-1] is True
    assert False in flags[1:-1] or len(got) == 3 and flags[1] is False
    assert got[-1][0] == _rec("http://a/2", b"y")


def test_crc_mismatch_is_flagged():
    m = bytearray(_member("http://a", b"payload"))
    m[-5] ^= 0xFF  # corrupt the stored CRC32
    got = list(iter_gz_members(bytes(m)))
    assert len(got) == 1 and got[0][3] is False


def test_truncated_tail_member():
    full = _member("http://a/2", b"yyyyyyyyyy")
    buf = _member("http://a/1", b"x") + full[:-6]
    got = list(iter_gz_members(buf))
    assert got[0][3] is True and got[-1][3] is False


def test_range_fetch_matches_full_walk():
    """The CDX random-access contract: buf[offset:offset+length] is a
    complete standalone gzip stream for every indexed member."""
    members = [
        _member(f"http://h/{i}", str(i).encode() * (i + 1))
        for i in range(5)
    ]
    buf = b"".join(members)
    for data, off, length, ok in iter_gz_members(buf):
        assert ok
        assert gzip.decompress(buf[off:off + length]) == data
        # and the slice is exactly one member: no trailing bytes
        d = zlib.decompressobj(wbits=31)
        d.decompress(buf[off:off + length])
        assert d.eof and d.unused_data == b""


def test_spark_gz_round_trip(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    files = synth_warc_gz_files(docs, per_file=4)
    assert files.count() == 5
    rows = {
        (r["file_id"], r["rec_no"]): r
        for r in parse_warc_gz(files).collect()
    }
    assert len(rows) == 20
    for i in range(20):
        r = rows[(i // 4, i % 4)]
        assert r["valid"] == (i % 17 != 0)
        assert r["target_uri"].endswith(f"/page/{i}")
        if r["valid"]:
            assert r["payload"] == f"<html><body>text {i}</body></html>"

    idx = warc_gz_member_index(files).collect()
    assert len(idx) == 20 and all(r["ok"] for r in idx)
    # offsets tile each file exactly
    by_file: dict[int, list] = {}
    for r in idx:
        by_file.setdefault(r["file_id"], []).append(r)
    blobs = {r["file_id"]: bytes(r["warc_gz"]) for r in files.collect()}
    for fid, ms in by_file.items():
        ms.sort(key=lambda r: r["member_no"])
        pos = 0
        for m in ms:
            assert m["offset"] == pos
            pos += m["length"]
        assert pos == len(blobs[fid])


def test_read_warc_gz_files_from_disk_matches_blob_path(spark, tmp_path):
    """VERDICT r03 item 7: the binaryFile ingest must parse on-disk
    .warc.gz segments to exactly the records the synth blob path
    yields (file identity aside — disk uses xxhash64(path))."""
    from logparser_spark.sources.warc_gz import (
        list_warc_gz_files,
        read_warc_gz_files,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(24)], "doc_id long, text string"
    )
    files = synth_warc_gz_files(docs, per_file=6)
    for r in files.collect():
        (tmp_path / f"seg-{r['file_id']:05d}.warc.gz").write_bytes(
            bytes(r["warc_gz"])
        )
    (tmp_path / "ignore.txt").write_text("not a segment")

    got = read_warc_gz_files(spark, str(tmp_path)).collect()
    want = parse_warc_gz(files).collect()

    def key(r):
        return (r["rec_no"], r["warc_type"], r["target_uri"],
                r["record_id"], r["content_length"], r["http_status"],
                r["payload"], r["valid"])

    assert sorted(key(r) for r in got) == sorted(key(r) for r in want)
    # path column real + glob filter excluded the .txt
    assert all(r["path"].endswith(".warc.gz") for r in got)
    assert len({r["path"] for r in got}) == 4

    listing = list_warc_gz_files(spark, str(tmp_path)).collect()
    assert len(listing) == 4
    assert {r["file_id"] for r in got} == {r["file_id"] for r in listing}
    assert all(r["file_length"] > 0 for r in listing)


def test_fetch_gz_members_ranged_from_disk(spark, tmp_path):
    """CDX ranged-read contract on real files: member-index rows
    joined to the listing fetch ONLY their byte ranges and decode to
    the same records as the full-file walk."""
    from pyspark.sql import functions as F

    from logparser_spark.sources.warc_gz import (
        fetch_gz_members_ranged,
        list_warc_gz_files,
    )

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(12)],
        "doc_id long, text string",
    )
    files = synth_warc_gz_files(docs, per_file=4)
    for r in files.collect():
        (tmp_path / f"s{r['file_id']}.warc.gz").write_bytes(
            bytes(r["warc_gz"])
        )

    listing = list_warc_gz_files(spark, str(tmp_path)).withColumn(
        "blob_fid",
        F.regexp_extract("path", r"s(\d+)\.warc\.gz$", 1).cast("long"),
    )
    idx = warc_gz_member_index(files).withColumnRenamed(
        "file_id", "blob_fid"
    )
    ranged = idx.join(listing, "blob_fid").select(
        "blob_fid", "member_no", "path", "offset", "length"
    )
    got = fetch_gz_members_ranged(ranged).collect()
    assert len(got) == 12
    full = {r["target_uri"]: r for r in parse_warc_gz(files).collect()}
    assert len(full) == 12
    for r in got:
        w = full[r["target_uri"]]
        assert (r["payload"], r["valid"], r["http_status"]) == (
            w["payload"], w["valid"], w["http_status"]
        )

    # a bogus range must yield valid=false, not an exception
    bogus = spark.createDataFrame(
        [(str(tmp_path / "s0.warc.gz"), 3, 10)],
        "path string, offset long, length long",
    )
    br = fetch_gz_members_ranged(bogus).collect()
    assert len(br) == 1 and br[0]["valid"] is False
