"""Real GIF pixel decode — pure Python/NumPy, no imaging library:
header + logical-screen-descriptor walk, global color table, image
descriptor (including the 4-pass interlace row order), and a full
variable-width LZW decompressor (GIF89a appendix F semantics:
LSB-first bit packing across 255-byte sub-blocks, clear/EOI codes,
code width growing 3→12 bits as the table fills, the KwKwK
"code == next free slot" case, table reset on clear).

The companion encoder emits spec-valid streams (clear code first,
table reset when the 4096-entry space fills, optional interlace), so
round-trips bind decoder to encoder AND hand-built code streams in
tests bind the decoder to the spec. GIF is lossless over palette
indices — the oracle predicts decoded pixels arithmetically while the
decoder really unpacks bits.

Scale shape: called only inside Arrow-batched ``mapInPandas`` stages
(``multimodal.decode_image_pixels``) — map-only.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


def _interlace_rows(height: int) -> List[int]:
    """GIF 4-pass interlace output order: rows 0,8,16.. then 4,12..
    then 2,6,10.. then 1,3,5.. (89a spec §20)."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


class _LzwWriter:
    """Variable-width LZW code packer, LSB-first (GIF bit order)."""

    def __init__(self, min_code_size: int) -> None:
        self.min = min_code_size
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


def lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavour LZW: emits an initial clear, resets the table when
    code 4095 would be exceeded, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LzwWriter(min_code_size)

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    w.put(clear, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        w.put(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            w.put(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        w.put(table[prefix], width)
        # width bump the DECODER will apply after consuming this code
        if next_code < 4096 and next_code == (1 << width) and width < 12:
            width += 1
    w.put(eoi, width)
    return w.flush()


def lzw_decompress(data: bytes, min_code_size: int,
                   max_pixels: Optional[int] = None) -> bytes:
    """Inverse of :func:`lzw_compress`; bound to the spec, not the
    encoder — handles streams with or without leading clear, mid-stream
    clears, and the KwKwK case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    width = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if max_pixels is not None and len(out) > max_pixels:
            raise ValueError("gif: more pixels than image descriptor")
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        blk = payload[i:i + 255]
        out.append(len(blk))
        out += blk
    out.append(0)
    return bytes(out)


def encode_gif(indices: np.ndarray,
               palette: List[Tuple[int, int, int]],
               interlace: bool = False) -> bytes:
    """Palette indices (H, W) + palette → spec-valid GIF89a bytes.
    Deterministic for deterministic input."""
    indices = np.asarray(indices, dtype=np.uint8)
    h, w = indices.shape
    npal = len(palette)
    if npal < 2 or npal > 256:
        raise ValueError("gif: palette size out of range")
    ct_bits = max(1, (npal - 1).bit_length())
    ct_size = 1 << ct_bits
    if int(indices.max(initial=0)) >= npal:
        raise ValueError("gif: index out of palette range")

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, ct_bits depth
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ct_bits - 1) & 7)
                       | (((ct_bits - 1) & 7) << 4), 0, 0)
    for j in range(ct_size):
        r, g, b = palette[j] if j < npal else (0, 0, 0)
        out += bytes([r, g, b])
    # image descriptor (no local color table)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    rows = _interlace_rows(h) if interlace else list(range(h))
    stream = indices[rows].tobytes()
    min_code = max(2, ct_bits)
    out.append(min_code)
    out += _sub_blocks(lzw_compress(stream, min_code))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(b: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the FIRST image (the
    still-image case; animation frames would loop the same walk).
    Skips extension blocks; raises on local-color-table-less streams
    missing a global table and on truncated data."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b[i:i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            raise ValueError("gif: no image descriptor")
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while b[i] != 0:
                i += 1 + b[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", b[i + 1:i + 10])
        i += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(
                b[i:i + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            i += 3 * n
        if pal is None:
            raise ValueError("gif: no color table")
        min_code = b[i]
        i += 1
        payload = bytearray()
        while b[i] != 0:
            ln = b[i]
            payload += b[i + 1:i + 1 + ln]
            i += 1 + ln
        idx = np.frombuffer(
            lzw_decompress(bytes(payload), min_code, max_pixels=w * h),
            dtype=np.uint8,
        )
        if idx.shape[0] != w * h:
            raise ValueError("gif: pixel count mismatch")
        grid = idx.reshape(h, w)
        if iflags & 0x40:
            out = np.zeros_like(grid)
            out[_interlace_rows(h)] = grid
            grid = out
        if int(grid.max(initial=0)) >= pal.shape[0]:
            raise ValueError("gif: palette index out of range")
        return pal[grid]
    raise ValueError("gif: truncated stream")
