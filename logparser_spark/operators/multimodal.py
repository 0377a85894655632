"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition hygiene) is
real and tested; the actual media codecs are STUBBED — image/audio
libraries are not available in this environment. Each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode), so pipelines exercise the exact
dataflow that a real decoder would see: one binary column in, a struct
of typed features out, Arrow batches end to end, no driver collect.

``decode_html`` is NOT a stub: pages.html really is UTF-8 HTML and is
decoded/stripped with Catalyst expressions only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, "
    "fake_channels int"
)

AUDIO_META_SCHEMA = (
    "doc_id long, n_bytes long, fake_sample_rate int, fake_n_samples long"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, frame_no int, frame_hash long"


def decode_html(df, html_col: str = "html", out_col: str = "html_text"):
    """binary HTML → text: decode UTF-8 and strip tags. Pure Catalyst
    (decode + regexp_replace), no Python."""
    from pyspark.sql import functions as F

    txt = F.decode(F.col(html_col), "UTF-8")
    return df.withColumn(out_col, F.regexp_replace(txt, "<[^>]*>", ""))


def _fake_dims(buf: bytes) -> tuple[int, int, int]:
    """Deterministic fake image header read (stands in for a real
    decoder's metadata pass)."""
    n = len(buf)
    return (n % 640) + 1, (n % 480) + 1, 3


def image_metadata(df, binary_col: str = "html", id_col: str = "doc_id",
                   strict: bool = False):
    """mapInPandas stage: binary column → typed image metadata struct.

    STUB: a real implementation would decode the image header (PIL/
    libvips); ``strict=True`` raises NotImplementedError exactly where
    that decode belongs. The Arrow batch shape, schema, and partition
    behavior are the real thing.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL/libvips (unavailable here)"
                )
            rows = []
            for did, buf in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(buf) if buf is not None else b""
                w, h, c = _fake_dims(b)
                rows.append((did, len(b), w, h, c))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "fake_width", "fake_height",
                         "fake_channels"],
            )

    return df.select(id_col, binary_col).mapInPandas(fn, IMAGE_META_SCHEMA)


def audio_metadata(df, binary_col: str = "html", id_col: str = "doc_id",
                   strict: bool = False):
    """mapInPandas stage: binary column → typed audio metadata struct.
    STUB decode as above (soundfile/ffmpeg unavailable)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires soundfile/ffmpeg (unavailable)"
                )
            rows = []
            for did, buf in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(buf) if buf is not None else b""
                rows.append((did, len(b), 16000, len(b) // 2))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "fake_sample_rate",
                         "fake_n_samples"],
            )

    return df.select(id_col, binary_col).mapInPandas(fn, AUDIO_META_SCHEMA)


def frame_sample(df, binary_col: str = "html", id_col: str = "doc_id",
                 every_n_bytes: int = 4096, strict: bool = False):
    """mapInPandas stage: 'video' → sampled frames (one row per sampled
    frame, hash of the byte window). STUB for a real frame extractor;
    demonstrates the 1→N row fan-out shape with bounded memory per
    batch."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "frame extraction requires ffmpeg (unavailable)"
                )
            rows = []
            for did, buf in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(buf) if buf is not None else b""
                for fno, off in enumerate(range(0, max(len(b), 1),
                                                every_n_bytes)):
                    window = b[off:off + every_n_bytes]
                    h = int.from_bytes(
                        hashlib.md5(window).digest()[:8], "big", signed=False
                    ) >> 1
                    rows.append((did, fno, h))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_no", "frame_hash"]
            )

    return df.select(id_col, binary_col).mapInPandas(fn, FRAME_SAMPLE_SCHEMA)
