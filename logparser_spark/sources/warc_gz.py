"""Gzipped WARC (``.warc.gz``) ingest — the layout Common Crawl
actually ships: ONE GZIP MEMBER PER RECORD, members concatenated into
a segment file. Per-member compression is what makes the format
random-accessible: any record can be fetched by (offset, length) and
decompressed standalone, which is exactly what a CDX index row points
at (see ``operators/weburl.build_cdx`` for the index side).

Three pieces:

- ``synth_warc_gz_files``: packs the pure-Catalyst WARC records from
  ``sources/warc.synth_warc_records`` into per-record gzip members
  (deterministic: mtime=0, fixed level) concatenated per file — the
  one Python stage compression inherently needs.
- ``parse_warc_gz``: map-only ``mapInPandas`` stage that walks the
  member chain with ``zlib.decompressobj(wbits=31)`` — the streaming
  splitter production readers use (``unused_data`` marks the member
  boundary; scanning for the 1f 8b magic inside compressed bytes is
  NOT reliable) — and feeds each decompressed member through the same
  record walker as plain WARC. Corrupt members (bad CRC, garbage
  between members, truncated tail) emit ``valid=false`` rows and the
  walk RESYNCS at the next plausible member header instead of
  aborting the file.
- ``warc_gz_member_index``: (file_id, member_no, offset, length) per
  member WITHOUT parsing record content — the offset/length columns a
  CDX build attaches so one record is one ranged read + one
  standalone gunzip.

Scale shape: all three are map-only over the file blobs — no shuffle,
no driver state; a 1 GiB segment splits into byte ranges served by
the member index, each range decompressed independently (per-member
compression means no inter-record compression state, unlike a
whole-file gzip stream).

Reference scope note: the reference ingests uncompressed framed files
(``/root/reference/src/file_parsing/file_parser.cpp``); per-member
gzip is the web-corpus transport for the same source role (S1 in
SURVEY.md §2).
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd

from logparser_spark.sources.warc import (
    WARC_SCHEMA,
    _parse_warc_buffer,
    synth_warc_records,
)

# RFC 1952 member header prefix: magic (1f 8b) + CM=8 (deflate).
_GZ_MAGIC = b"\x1f\x8b\x08"


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime=0 so identical input
    yields identical bytes across runs and workers)."""
    return gzip.compress(data, compresslevel=6, mtime=0)


def iter_gz_members(buf: bytes):
    """Yield ``(data, offset, length, ok)`` per gzip member in a
    concatenated-member buffer. ``ok=False`` flags a member that
    failed mid-stream (CRC mismatch, truncation, garbage) — its
    ``data`` is whatever decompressed before the fault. After a fault
    the walk resyncs at the next RFC-1952 header prefix; between-member
    garbage is skipped the same way (one resync, no row).

    Feeds zlib fixed-size memoryview slices instead of the whole
    remaining tail per member — slicing ``buf[pos:]`` would copy
    O(file_size) bytes PER MEMBER (and again via ``unused_data``),
    quadratic on the 1 GiB many-member segments this module targets.
    With chunking, per-member overcopy is bounded by one chunk."""
    pos = 0
    n = len(buf)
    mv = memoryview(buf)
    chunk = 1 << 20
    while pos < n:
        if not buf.startswith(_GZ_MAGIC, pos):
            nxt = buf.find(_GZ_MAGIC, pos + 1)
            if nxt == -1:
                return
            pos = nxt
            continue
        d = zlib.decompressobj(wbits=31)
        parts = []
        fed = pos
        fault = False
        while fed < n and not d.eof:
            end = min(fed + chunk, n)
            try:
                parts.append(d.decompress(mv[fed:end]))
            except zlib.error:
                fault = True
                break
            fed = end
        if fault:
            yield b"", pos, 0, False
            nxt = buf.find(_GZ_MAGIC, pos + 1)
            if nxt == -1:
                return
            pos = nxt
            continue
        data = b"".join(parts) + d.flush()
        if not d.eof:
            # truncated final member
            yield data, pos, n - pos, False
            return
        # unused_data holds only the tail of the LAST chunk fed (the
        # loop stops at eof), so this subtraction touches ≤1 chunk.
        length = (fed - pos) - len(d.unused_data)
        yield data, pos, length, True
        pos += length


def synth_warc_gz_files(docs, per_file: int = 8, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Pack consecutive WARC records (``doc_id div per_file``) into
    ``(file_id, warc_gz)`` blobs, ONE GZIP MEMBER PER RECORD in
    doc_id order. Records render in pure Catalyst
    (``synth_warc_records``); only the compression itself crosses to
    Python, as one Arrow-batched pandas UDF over the grouped record
    arrays (bounded: ``per_file`` records per group by construction).

    ``per_file`` contract: TEST-FIXTURE synthesizer — keep it small
    (≤ ~100); see ``warc.synth_warc_files``. Real many-member
    segments are read (``read_warc_gz_files``), not synthesized."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gz_concat(recs: pd.Series) -> pd.Series:
        return pd.Series([
            b"".join(
                gzip_member(r["rec"].encode("utf-8")) for r in arr
            )
            for arr in recs
        ])

    recs = synth_warc_records(docs, id_col=id_col, text_col=text_col)
    return (
        recs.groupBy(
            F.expr(f"{id_col} div {per_file}").cast("long")
            .alias("file_id")
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col), F.col("rec")))
            ).alias("__recs")
        )
        .select("file_id", _gz_concat("__recs").alias("warc_gz"))
    )


def parse_warc_gz(files, binary_col: str = "warc_gz",
                  file_col: str = "file_id"):
    """mapInPandas stage: ``.warc.gz`` blobs → one typed row per WARC
    record (``WARC_SCHEMA``), ``rec_no`` numbering records in member
    order. A member that fails to decompress emits one
    ``valid=false`` row (all-NULL fields — nothing recoverable) and
    the walk resyncs; a member that decompresses but holds a
    malformed record gets the record walker's own ``valid=false``
    row with whatever headers parsed."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[file_col], pdf[binary_col]):
                b = bytes(buf) if buf is not None else b""
                n = 0
                for data, _off, _len, ok in iter_gz_members(b):
                    if not ok and not data:
                        rows.append((fid, n, None, None, None, None,
                                     None, None, False))
                        n += 1
                        continue
                    for rec in _parse_warc_buffer(data):
                        if not ok:
                            rec = rec[:-1] + (False,)
                        rows.append((fid, n) + rec)
                        n += 1
            yield pd.DataFrame(
                rows,
                columns=[file_col, "rec_no", "warc_type", "target_uri",
                         "record_id", "content_length", "http_status",
                         "payload", "valid"],
            )

    return files.select(file_col, binary_col).mapInPandas(
        fn, WARC_SCHEMA
    )


def warc_gz_member_index(files, binary_col: str = "warc_gz",
                         file_col: str = "file_id"):
    """Map-only member index ``(file_id, member_no, offset, length,
    ok)`` — the byte ranges a CDX row stores so any record is one
    ranged read + one standalone gunzip (proven by the range-fetch
    pytest). Indexing never materializes record content beyond the
    decompressor's own pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf[file_col], pdf[binary_col]):
                b = bytes(buf) if buf is not None else b""
                for m, (_data, off, length, ok) in enumerate(
                    iter_gz_members(b)
                ):
                    rows.append((fid, m, off, length, ok))
            yield pd.DataFrame(
                rows,
                columns=[file_col, "member_no", "offset", "length",
                         "ok"],
            )

    return files.select(file_col, binary_col).mapInPandas(
        fn,
        f"{file_col} long, member_no int, offset long, length long, "
        "ok boolean",
    )


def list_warc_gz_files(spark, path, pattern: str = "*.warc.gz"):
    """Directory/glob listing as a DataFrame: ``(file_id, path,
    file_length)`` for every matching on-disk (or object-store —
    ``binaryFile`` speaks every Hadoop filesystem: s3a://, gs://,
    hdfs://) segment file. ``file_id`` is ``xxhash64(path)`` — a
    deterministic, shuffle-free 64-bit id (collision odds at a
    100k-file crawl listing ≈ 3e-10; the ``path`` column stays
    attached for exact joins). Metadata-only: the read schema prunes
    ``content``, so listing never fetches file bytes."""
    from pyspark.sql import functions as F

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.xxhash64("path").alias("file_id"),
            F.col("path"),
            F.col("length").alias("file_length"),
        )
    )


def read_warc_gz_files(spark, path, pattern: str = "*.warc.gz"):
    """REAL-FILE ingest: read ``.warc.gz`` segments from disk/object
    store via ``spark.read.format("binaryFile")`` and parse them with
    the same member walker as the blob path — one typed row per WARC
    record (``WARC_SCHEMA`` + ``path``).

    Scale shape: ``binaryFile`` makes one partition per file (a
    member-compressed segment can't be byte-range-split without the
    member index — for ranged parallelism within one huge segment,
    build ``warc_gz_member_index`` once and use
    ``fetch_gz_members_ranged``); file-level parallelism is the
    natural CC layout (segments ~1 GiB, thousands per crawl). The
    parse is the identical map-only ``mapInPandas`` stage as
    ``parse_warc_gz`` — no shuffle anywhere."""
    from pyspark.sql import functions as F

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.col("path"),
            F.xxhash64("path").alias("file_id"),
            F.col("content").alias("warc_gz"),
        )
    )
    recs = parse_warc_gz(files.select("file_id", "warc_gz"))
    paths = files.select("file_id", "path")
    return recs.join(F.broadcast(paths), "file_id")


def fetch_gz_members_ranged(index, path_col: str = "path",
                            offset_col: str = "offset",
                            length_col: str = "length"):
    """CDX random-access contract, disk edition: given member-index
    rows ``(path, offset, length, ...)`` (from
    ``warc_gz_member_index`` joined to the file listing, or straight
    from a CDX table), fetch EXACTLY those byte ranges — seek + read,
    never a whole-segment scan — gunzip each member standalone, and
    parse its record. This is the shape of an object-store ranged GET
    (local files here; the seek/read is the same contract).

    Output: the index row's ``(path, offset, length)`` plus the
    parsed ``WARC_SCHEMA`` record fields (``file_id``/``rec_no``
    omitted — identity is (path, offset)). A range that fails to
    gunzip or parse yields ``valid=false`` with NULL fields.

    Scale shape: map-only over index rows; each task touches only its
    own ranges, so a top-k CDX lookup reads k·(member length) bytes
    total regardless of segment sizes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, off, ln in zip(
                pdf[path_col], pdf[offset_col], pdf[length_col]
            ):
                local = str(p)
                if local.startswith("file:"):
                    # file:/x, file:///x → /x
                    local = local[5:]
                    while local.startswith("//"):
                        local = local[1:]
                rec = None
                try:
                    with open(local, "rb") as f:
                        f.seek(int(off))
                        raw = f.read(int(ln))
                    data = zlib.decompressobj(wbits=31).decompress(raw)
                    parsed = list(_parse_warc_buffer(data))
                    if parsed:
                        rec = parsed[0]
                except (OSError, zlib.error):
                    rec = None
                if rec is None:
                    rec = (None, None, None, None, None, None, False)
                rows.append((str(p), int(off), int(ln)) + rec)
            yield pd.DataFrame(
                rows,
                columns=[path_col, offset_col, length_col, "warc_type",
                         "target_uri", "record_id", "content_length",
                         "http_status", "payload", "valid"],
            )

    return index.select(path_col, offset_col, length_col).mapInPandas(
        fn,
        f"{path_col} string, {offset_col} long, {length_col} long, "
        "warc_type string, target_uri string, record_id string, "
        "content_length long, http_status int, payload string, "
        "valid boolean",
    )
