"""PNG and GIF codec correctness: round-trips over every filter type /
color family / interlace mode, HAND-BUILT streams that bind the
decoders to the specs (Paeth tie-break order, multi-IDAT framing,
LZW streams the encoder never writes: no leading clear, mid-stream
clear, KwKwK), and malformed-stream rejection."""

import struct
import zlib

import numpy as np
import pytest

from logparser_spark.operators.gifcodec import (
    _interlace_rows,
    _LzwWriter,
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)
from logparser_spark.operators.pngcodec import (
    _chunk,
    _paeth,
    _SIG,
    decode_png_pixels,
    encode_png_pixels,
)

PAL8 = [(10 * j, 20 * j + 1, 30 * j + 2) for j in range(8)]


# ── PNG ──────────────────────────────────────────────────────────────


def test_png_roundtrip_every_filter_gray_rgb_palette():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(13, 17)).astype(np.uint8)
    for f in range(5):
        kind, out = decode_png_pixels(
            encode_png_pixels(img, row_filters=[f] * 13)
        )
        assert kind == "gray" and np.array_equal(out, img), f
    img3 = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    kind, out = decode_png_pixels(
        encode_png_pixels(img3, row_filters=[(y + 2) % 5 for y in range(9)])
    )
    assert kind == "rgb" and np.array_equal(out, img3)
    idx = rng.randint(0, 8, size=(6, 11)).astype(np.uint8)
    kind, out = decode_png_pixels(
        encode_png_pixels(idx, row_filters=[y % 5 for y in range(6)],
                          palette=PAL8)
    )
    assert kind == "rgb"
    assert np.array_equal(out, np.array(PAL8, dtype=np.uint8)[idx])


def test_png_single_pixel_paeth():
    b = encode_png_pixels(np.array([[200]], dtype=np.uint8),
                          row_filters=[4])
    assert np.array_equal(decode_png_pixels(b)[1], [[200]])


def test_paeth_tie_break_order():
    # p = a + b - c. a=10,b=10,c=10 → all distances 0 → pick a (left)
    a = np.array([10], dtype=np.uint8)
    assert _paeth(a, a, a)[0] == 10
    # pa == pc < pb → a wins over c (left before upper-left)
    a = np.array([20], dtype=np.uint8)
    b = np.array([40], dtype=np.uint8)
    c = np.array([30], dtype=np.uint8)
    # p = 30; pa=10, pb=10, pc=0 → pa<=pb and pa<=pc is False (10>0)
    # → pb<=pc False → c
    assert _paeth(a, b, c)[0] == 30
    # pa <= pb tie → a before b: a=0,b=20,c=10 → p=10, pa=10,pb=10,pc=0
    # → c again; use c far: a=0,b=20,c=200 → p=-180 clamps in int16:
    a = np.array([0], dtype=np.uint8)
    b = np.array([20], dtype=np.uint8)
    c = np.array([200], dtype=np.uint8)
    # p = -180: pa=180, pb=200, pc=380 → a
    assert _paeth(a, b, c)[0] == 0


def test_png_multi_idat_concatenation():
    # the same filtered stream split across two IDAT chunks must decode
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    whole = encode_png_pixels(img)
    # rebuild: signature + IHDR + two IDATs + IEND
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
    lines = bytearray()
    for y in range(4):
        lines.append(0)
        lines += img[y].tobytes()
    z = zlib.compress(bytes(lines), 6)
    two = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", z[:7])
           + _chunk(b"IDAT", z[7:]) + _chunk(b"IEND", b""))
    kind, out = decode_png_pixels(two)
    assert kind == "gray" and np.array_equal(out, img)
    assert np.array_equal(decode_png_pixels(whole)[1], img)


def test_png_rejects_malformed():
    img = np.zeros((3, 3), dtype=np.uint8)
    good = bytearray(encode_png_pixels(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png_pixels(b"\x00" * 8 + bytes(good[8:]))
    # corrupt one IDAT byte → CRC mismatch
    bad = bytearray(good)
    i = bytes(good).find(b"IDAT") + 5
    bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(bad))
    # unknown interlace method (re-CRC'd)
    ih = bytes(good).find(b"IHDR")
    ihdr = bytearray(good[ih + 4:ih + 17])
    ihdr[12] = 2
    inter = (_SIG + _chunk(b"IHDR", bytes(ihdr))
             + bytes(good)[ih + 21:])
    with pytest.raises(ValueError, match="interlace"):
        decode_png_pixels(inter)
    # alpha color type
    ihdr6 = struct.pack(">IIBBBBB", 3, 3, 8, 6, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="alpha"):
        decode_png_pixels(_SIG + _chunk(b"IHDR", ihdr6)
                          + _chunk(b"IEND", b""))
    # truncated pixel data → size mismatch
    short = (_SIG
             + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png_pixels(short)


# ── GIF ──────────────────────────────────────────────────────────────


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.RandomState(5)
    P = np.array(PAL8, dtype=np.uint8)
    for shape in [(1, 1), (7, 13), (16, 16), (33, 5)]:
        idx = rng.randint(0, 8, size=shape).astype(np.uint8)
        for inter in (False, True):
            out = decode_gif(encode_gif(idx, PAL8, interlace=inter))
            assert np.array_equal(out, P[idx]), (shape, inter)


def test_gif_interlace_row_order_is_the_spec_passes():
    assert _interlace_rows(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _interlace_rows(3) == [0, 2, 1]
    assert _interlace_rows(1) == [0]


def test_gif_table_reset_path_256_colors():
    rng = np.random.RandomState(9)
    pal = [(j, (j * 3) % 256, (j * 7) % 256) for j in range(256)]
    idx = rng.randint(0, 256, size=(120, 100)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(out, np.array(pal, dtype=np.uint8)[idx])


def test_lzw_raw_roundtrips():
    for data in [b"", b"\x00" * 10000, bytes(range(256)) * 64,
                 b"ababab" * 700]:
        assert lzw_decompress(lzw_compress(data, 8), 8) == data
    assert lzw_decompress(lzw_compress(b"\x01" * 7, 2), 2) == b"\x01" * 7


def _pack_codes(codes_widths) -> bytes:
    w = _LzwWriter(0)
    for code, width in codes_widths:
        w.put(code, width)
    return w.flush()


def test_lzw_hand_stream_no_leading_clear_and_kwkwk():
    # min_code_size 2: clear=4, eoi=5, first dynamic code 6 (width 3).
    # Stream WITHOUT leading clear: 1, then KwKwK (code 6 = b"\x01\x01"),
    # then code 6 again, EOI → output 1,1,1,1,1
    data = _pack_codes([(1, 3), (6, 3), (6, 3), (5, 3)])
    assert lzw_decompress(data, 2) == b"\x01\x01\x01\x01\x01"


def test_lzw_hand_stream_midstream_clear_resets_width_and_table():
    # 0, 1 (table grows: 6=0+1), clear, then 6 must be INVALID until
    # rebuilt — emit 2, 3 instead and verify output
    data = _pack_codes([(0, 3), (1, 3), (4, 3), (2, 3), (3, 3), (5, 3)])
    assert lzw_decompress(data, 2) == b"\x00\x01\x02\x03"
    bad = _pack_codes([(0, 3), (4, 3), (7, 3), (5, 3)])
    with pytest.raises(ValueError, match="out of range"):
        lzw_decompress(bad, 2)


def test_lzw_missing_eoi_raises():
    with pytest.raises(ValueError, match="without EOI"):
        lzw_decompress(_pack_codes([(1, 3)]), 2)


def test_gif_skips_extension_blocks():
    idx = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    b = bytearray(encode_gif(idx, PAL8))
    # splice a Graphic Control Extension right before the image
    # descriptor (0x2C follows the 13-byte header + 24-byte GCT here)
    at = bytes(b).find(b"\x2c")
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = bytes(b[:at]) + gce + bytes(b[at:])
    assert np.array_equal(
        decode_gif(spliced), np.array(PAL8, dtype=np.uint8)[idx]
    )


def test_gif_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    idx = np.array([[1]], dtype=np.uint8)
    good = encode_gif(idx, PAL8)
    # trailer with no image descriptor
    no_img = good[:13 + 24] + b"\x3b"
    with pytest.raises(ValueError, match="no image"):
        decode_gif(no_img)
    with pytest.raises(ValueError, match="palette size"):
        encode_gif(idx, [(0, 0, 0)])
    with pytest.raises(ValueError, match="out of palette"):
        encode_gif(np.array([[9]], dtype=np.uint8), PAL8)


def test_synth_png_gif_decode_stage(spark):
    """Spark-side plumbing for both synths against the closed-form
    aggregates (all three PNG families, interlaced + plain GIF)."""
    from pyspark.sql import functions as F

    from logparser_spark.operators import multimodal

    docs = spark.range(0, 48).select(F.col("id").alias("doc_id"))
    P = np.array(PAL8, dtype=np.int64)

    png = {
        r["doc_id"]: r
        for r in multimodal.decode_image_pixels(
            multimodal.synth_png_pixels(docs), binary_col="img",
            strict=True,
        ).collect()
    }
    for i in range(48):
        w, h, fam = (i % 19) + 1, (i % 11) + 1, i % 3
        y, x = np.mgrid[0:h, 0:w]
        if fam == 2:
            px = P[(i + y * 5 + x) % 8]
        elif fam == 0:
            px = ((i * 13 + y * 7 + x * 3) % 256)
        else:
            c = np.arange(3)[None, None, :]
            px = ((i * 13 + y[:, :, None] * 7 + x[:, :, None] * 3
                   + c * 11) % 256)
        r = png[i]
        assert (r["format"], r["width"], r["height"]) == ("png", w, h)
        assert r["n_px"] == px.size and r["px_sum"] == int(px.sum())
        assert r["px_max"] == int(px.max())

    gif = {
        r["doc_id"]: r
        for r in multimodal.decode_image_pixels(
            multimodal.synth_gif(docs), binary_col="img", strict=True
        ).collect()
    }
    for i in range(48):
        w, h = (i % 17) + 1, (i % 9) + 1
        y, x = np.mgrid[0:h, 0:w]
        px = P[(i + 3 * y + 5 * x) % 8]
        r = gif[i]
        assert (r["format"], r["width"], r["height"]) == ("gif", w, h)
        assert r["n_px"] == px.size and r["px_sum"] == int(px.sum())
        assert r["px_max"] == int(px.max())


# ── BMP ──────────────────────────────────────────────────────────────


def test_bmp_24bit_roundtrip_both_orientations():
    from logparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
    )

    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (4, 2), (3, 14)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for td in (False, True):
            assert np.array_equal(
                decode_bmp_pixels(make_bmp(px, top_down=td)), px
            ), (h, w, td)


def test_bmp_8bit_palette_and_rle8_roundtrip():
    from logparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
    )

    rng = np.random.RandomState(4)
    P = np.array([(b, g, r) for b, g, r in PAL8], dtype=np.uint8)
    idx = rng.randint(0, 8, size=(6, 9)).astype(np.uint8)
    for rle in (False, True):
        out = decode_bmp_pixels(make_bmp(idx, palette=PAL8, rle8=rle))
        assert np.array_equal(out, P[idx]), rle


def test_rle8_row_encoder_is_decode_inverse_on_long_runs():
    from logparser_spark.operators.multimodal import (
        _rle8_decode,
        _rle8_encode_rows,
    )

    rows = [bytes([5] * 300 + [2] * 4 + [7]), bytes([1] * 305)]
    dec = _rle8_decode(_rle8_encode_rows(rows), 305, 2)
    assert [bytes(r) for r in dec] == rows


def test_bmp_rejects_malformed():
    from logparser_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(make_bmp(px))
    with pytest.raises(ValueError, match="signature"):
        decode_bmp_pixels(b"XX" + bytes(good[2:]))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(bytes(good[:-4]))
    # 16bpp unsupported
    bad = bytearray(good)
    bad[28] = 16
    with pytest.raises(NotImplementedError):
        decode_bmp_pixels(bytes(bad))
    with pytest.raises(ValueError, match="bottom-up"):
        make_bmp(np.zeros((2, 2), dtype=np.uint8), palette=PAL8,
                 rle8=True, top_down=True)


def test_synth_bmp_decode_stage(spark):
    from pyspark.sql import functions as F

    from logparser_spark.operators import multimodal

    docs = spark.range(0, 42).select(F.col("id").alias("doc_id"))
    P = np.array([(b, g, r) for b, g, r in PAL8], dtype=np.int64)
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_image_pixels(
            multimodal.synth_bmp(docs), binary_col="img", strict=True
        ).collect()
    }
    for i in range(42):
        w, h, fam = (i % 14) + 1, (i % 7) + 1, i % 3
        y, x = np.mgrid[0:h, 0:w]
        if fam == 2:
            px = P[(i + 2 * y + 3 * x) % 8]
        else:
            c = np.arange(3)[None, None, :]
            px = ((i * 11 + y[:, :, None] * 5 + x[:, :, None] * 3
                   + c * 7) % 256)
        r = got[i]
        assert (r["format"], r["width"], r["height"]) == ("bmp", w, h)
        assert r["n_px"] == px.size and r["px_sum"] == int(px.sum())
        assert r["px_max"] == int(px.max())


def test_png_adam7_interlace_roundtrip_all_families():
    rng = np.random.RandomState(13)
    # sizes that exercise empty passes (1x1: only pass 1 non-empty;
    # 2x2: passes 1,6,7; plus non-multiples of 8)
    for h, w in [(1, 1), (2, 2), (3, 5), (8, 8), (9, 17), (16, 4)]:
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        filters = [(y + 1) % 5 for y in range(h + 14)]  # per scanline
        b = encode_png_pixels(img, row_filters=filters, interlace=True)
        kind, out = decode_png_pixels(b)
        assert kind == "gray" and np.array_equal(out, img), (h, w)
        img3 = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        b = encode_png_pixels(img3, row_filters=filters, interlace=True)
        assert np.array_equal(decode_png_pixels(b)[1], img3), (h, w)
        idx = rng.randint(0, 8, size=(h, w)).astype(np.uint8)
        b = encode_png_pixels(idx, palette=PAL8, interlace=True)
        assert np.array_equal(
            decode_png_pixels(b)[1], np.array(PAL8, dtype=np.uint8)[idx]
        ), (h, w)


def test_png_adam7_pass_geometry():
    from logparser_spark.operators.pngcodec import _adam7_passes

    # 8x8: pass sizes 1,1,2,4,8,16,32 scanpixels (the spec's census)
    sizes = [(pw, ph) for *_, pw, ph in _adam7_passes(8, 8)]
    assert sizes == [(1, 1), (1, 1), (2, 1), (2, 2),
                     (4, 2), (4, 4), (8, 4)]
    assert sum(pw * ph for pw, ph in sizes) == 64
    # 1x1: only pass 1 contributes
    sizes = [(pw, ph) for *_, pw, ph in _adam7_passes(1, 1)]
    assert sizes[0] == (1, 1)
    assert all(pw == 0 or ph == 0 for pw, ph in sizes[1:])
    # any size: passes tile the image exactly
    for w, h in [(5, 3), (13, 9), (16, 16), (7, 1)]:
        assert sum(pw * ph for *_, pw, ph in _adam7_passes(w, h)) \
            == w * h
