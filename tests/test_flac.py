"""FLAC codec correctness: external CRC vectors pin the checksum
conventions, encoder/decoder round-trips cover every subframe kind,
and HAND-BUILT frames exercise decode paths the encoder never writes
(partition order > 0, escape partitions, wasted bits, mid-side
stereo) so the decoder is bound to the spec, not to the encoder."""

import struct

import numpy as np
import pytest

from logparser_spark.operators.flaccodec import (
    BitReader,
    BitWriter,
    _read_utf8_number,
    _write_utf8_number,
    crc8,
    crc16,
    decode_flac,
    decode_wav_pcm,
    encode_flac,
)
from logparser_spark.operators.multimodal import make_wav


def test_crc_known_answer_vectors():
    # CRC-8/SMBUS (poly 0x07, init 0) and CRC-16/UMTS (poly 0x8005,
    # init 0, unreflected): published check values over "123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_utf8_coded_number_roundtrip():
    for n in [0, 1, 127, 128, 2047, 2048, 65535, 65536, (1 << 31) - 1]:
        w = BitWriter()
        _write_utf8_number(w, n)
        assert _read_utf8_number(BitReader(w.bytes())) == n
    # frame 0 must be the single byte 0x00 (spec's UTF-8 coding)
    w = BitWriter()
    _write_utf8_number(w, 0)
    assert w.bytes() == b"\x00"
    w = BitWriter()
    _write_utf8_number(w, 128)  # 2-byte form: 0xC2 0x80, like UTF-8
    assert w.bytes() == b"\xc2\x80"


def test_roundtrip_every_subframe_kind():
    rng = np.random.default_rng(11)
    for kind in ["constant", "verbatim", "fixed0", "fixed1", "fixed2",
                 "fixed3", "fixed4", "lpc1"]:
        for n, ch in [(1, 1), (64, 2), (200, 3), (9000, 1)]:
            if kind == "constant":
                s = np.full((n, ch), -37, dtype=np.int64)
            else:
                s = rng.integers(-30000, 30000, size=(n, ch))
            b = encode_flac(s, 44100, bps=16, blocksize=64, kind=kind)
            meta, out = decode_flac(b)
            assert out.shape == (n, ch) and (out == s).all(), (kind, n)
            assert meta["total_samples"] == n


def test_bit_corruption_is_caught_by_crc():
    s = np.arange(-50, 50).reshape(-1, 1)
    b = bytearray(encode_flac(s, 8000, bps=16, blocksize=32,
                              kind="fixed2"))
    b[-7] ^= 0x10  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        decode_flac(bytes(b))


def _stream_head(blocksize: int, rate: int, ch: int, bps: int,
                 n: int) -> bytearray:
    v = ((rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36)
         | (n & ((1 << 36) - 1)))
    si = (struct.pack(">HH", blocksize, blocksize) + b"\x00" * 6
          + v.to_bytes(8, "big") + b"\x00" * 16)
    return bytearray(b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
                     + si)


def _frame_header(w: BitWriter, blocksize: int, ch_code: int,
                  head: bytearray) -> None:
    base = len(head)
    w.write(0xFFF8, 16)
    w.write(0b0111, 4)   # 16-bit blocksize field follows
    w.write(0b0000, 4)   # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(0b100, 3)    # 16 bps
    w.write(0, 1)
    _write_utf8_number(w, 0)
    w.write(blocksize - 1, 16)
    head += w.bytes()
    head.append(crc8(bytes(head[base:])))


def _finish_frame(w: BitWriter, head: bytearray, base: int) -> bytes:
    w.align()
    head += w.bytes()
    head += struct.pack(">H", crc16(bytes(head[base:])))
    return bytes(head)


def test_hand_built_partitioned_and_escape_residuals():
    """FIXED-0 subframe, partition order 2 over blocksize 8 (2 samples
    per partition), partitions: rice k=0, rice k=3, ESCAPE 5-bit raw,
    rice k=1 — none of which the encoder emits. FIXED-0 residuals ARE
    the samples, so the expectation is written directly."""
    samples = [0, -1, 5, -6, -13, 12, 1, -2]
    head = _stream_head(8, 8000, 1, 16, 8)
    base = len(head)
    w = BitWriter()
    _frame_header(w, 8, 0, head)
    w = BitWriter()
    w.write(0, 1)
    w.write(0x08, 6)     # fixed, order 0
    w.write(0, 1)        # no wasted bits
    w.write(0, 2)        # rice method 0
    w.write(2, 4)        # partition order 2 -> 4 partitions of 2
    zz = lambda r: (r << 1) if r >= 0 else (-r << 1) - 1  # noqa: E731

    w.write(0, 4)        # partition 0: k=0
    for r in samples[0:2]:
        w.write_unary(zz(r))
    w.write(3, 4)        # partition 1: k=3
    for r in samples[2:4]:
        w.write_unary(zz(r) >> 3)
        w.write(zz(r), 3)
    w.write(0xF, 4)      # partition 2: ESCAPE
    w.write(5, 5)        # raw 5-bit signed residuals
    for r in samples[4:6]:
        w.write(r & 0x1F, 5)
    w.write(1, 4)        # partition 3: k=1
    for r in samples[6:8]:
        w.write_unary(zz(r) >> 1)
        w.write(zz(r), 1)
    b = _finish_frame(w, head, base)
    meta, out = decode_flac(b)
    assert out[:, 0].tolist() == samples


def test_hand_built_wasted_bits():
    """Subframe with 2 wasted bits: stored samples are the true
    samples >> 2, decoder must shift them back."""
    true = [4, -8, 12, 16]
    head = _stream_head(4, 8000, 1, 16, 4)
    base = len(head)
    w = BitWriter()
    _frame_header(w, 4, 0, head)
    w = BitWriter()
    w.write(0, 1)
    w.write(0x01, 6)     # verbatim
    w.write(1, 1)        # wasted-bits flag
    w.write_unary(1)     # unary 1 -> wasted = 2
    for s in true:
        w.write(s >> 2, 14)  # effective bps = 16 - 2
    b = _finish_frame(w, head, base)
    meta, out = decode_flac(b)
    assert out[:, 0].tolist() == true


def test_hand_built_mid_side_stereo():
    """Mid-side frame (channel assignment 10): subframe 0 = mid at
    16 bps, subframe 1 = side at 17 bps; decoder reconstructs L/R."""
    left = [100, -3, 7, 0]
    right = [-50, -4, 8, 1]
    head = _stream_head(4, 8000, 2, 16, 4)
    base = len(head)
    w = BitWriter()
    _frame_header(w, 4, 10, head)
    w = BitWriter()
    w.write(0, 1)
    w.write(0x01, 6)
    w.write(0, 1)
    for lv, rv in zip(left, right):
        w.write((lv + rv) >> 1, 16)   # mid
    w.write(0, 1)
    w.write(0x01, 6)
    w.write(0, 1)
    for lv, rv in zip(left, right):
        w.write(lv - rv, 17)          # side, one extra bit
    b = _finish_frame(w, head, base)
    meta, out = decode_flac(b)
    assert out[:, 0].tolist() == left
    assert out[:, 1].tolist() == right


def test_wav_pcm_decode_values():
    arr = np.array([[-32768, 32767], [5, -5], [0, 1]])
    meta, out = decode_wav_pcm(make_wav(16000, 3, channels=2, bits=16,
                                        samples=arr))
    assert (out == arr).all()
    assert meta == {"sample_rate": 16000, "channels": 2,
                    "bits_per_sample": 16, "total_samples": 3}


def test_spark_audio_samples_stage(spark):
    from logparser_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(i,) for i in range(24)], "doc_id long"
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_audio_samples(
            multimodal.synth_audio_pcm(docs), binary_col="aud",
            strict=True,
        ).collect()
    }
    assert len(got) == 24
    for i in range(24):
        n = (i % 300) + 1
        ch = ((i // 2) % 2) + 1
        if i % 2 == 1 and (i // 2) % 4 == 0:
            vals = np.full((n, ch), (i % 201) - 100, dtype=np.int64)
        else:
            t = np.arange(n)[:, None]
            c = np.arange(ch)[None, :]
            vals = (i + 3 * t + 7 * c) % 201 - 100
        r = got[i]
        assert r["format"] == ("wav" if i % 2 == 0 else "flac")
        assert r["n_samples"] == n and r["channels"] == ch
        assert r["sum_s"] == int(vals.sum())
        assert r["sum_abs"] == int(np.abs(vals).sum())
        assert r["max_s"] == int(vals.max())
