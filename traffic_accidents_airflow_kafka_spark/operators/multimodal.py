"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The Spark-side contract for image/audio/video at 100 TB:

- The payload travels as a ``binary`` column next to typed metadata
  (mime, width/height, duration…). Parquet stores it as BYTE_ARRAY;
  column pruning means metadata-only queries never read payload bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole column
  batches across the JVM↔Python boundary, never row-at-a-time.
- Content hashing uses SHA-256 (stable across engines and available in
  DuckDB), so even this Python stage's output is oracle-checkable.
- Partition sizing: payloads dominate row width — size
  ``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits
  executor memory, and repartition by a content-hash prefix for even
  batch sizes before the Python stage.

Decode depth (r6 headers, r9-r10 pixels): ``decode_image_meta`` is a
REAL pure-Python header parser — it reads true (width, height) from
genuine PNG / BMP / GIF / JPEG bytes — and ``decode_image_pixels`` is a
REAL pure-stdlib FULL pixel decoder: PNG IDAT inflates via ``zlib`` with
all five scanline filters reversed (None/Sub/Up/Average/Paeth), BMP
8-bit indices resolve through the file's own palette and bottom-up rows
flip to canonical top-down RGB, and GIF image data decompresses through
a real variable-width LZW decoder (CLEAR/EOI, table reset, the KwKwK
case) before resolving through the color table. ``encode_png`` /
``encode_bmp`` / ``encode_gif`` synthesize genuine, spec-valid files
(correct CRC32s, zlib IDAT — optionally with varied per-row filters —
padded bottom-up BMP rows, real LZW-compressed GIF sub-blocks) so the
catalog runs real bytes through the real decoders end-to-end. JPEG
pixels (Huffman + DCT) stay behind an imaging library by constraint;
``fake_decode_meta`` stays as the deterministic stand-in for plumbing
tests that predate the real parser.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

#: Output schema of the metadata-extraction stage.
META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha256_prefix", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def decode_image_meta(payload: bytes) -> tuple[int, int]:
    """Parse true (width, height) from genuine image bytes — pure Python,
    no imaging dependency.

    Formats: PNG (IHDR — the mandatory first chunk, spec §11.2.2), BMP
    (BITMAPINFOHEADER and the ancient BITMAPCOREHEADER; a negative
    height means a top-down DIB, so |height| is the pixel height), GIF
    (87a/89a logical screen descriptor), JPEG (marker walk to the first
    SOF frame header, skipping standalone markers). Raises ``ValueError``
    on unrecognized or truncated payloads — corrupt assets should be
    counted by the caller, not silently given fake dimensions.
    """
    import struct

    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return int(w), int(h)
        raise ValueError("truncated PNG: no IHDR")
    if payload[:2] == b"BM" and len(payload) >= 18:
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        if hdr_size >= 40 and len(payload) >= 26:  # BITMAPINFOHEADER+
            w, h = struct.unpack("<ii", payload[18:26])
            return int(w), abs(int(h))  # negative = top-down DIB
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return int(w), int(h)
        raise ValueError("truncated or unknown BMP header")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return int(w), int(h)
        raise ValueError("truncated GIF")
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            # SOF0-SOF15 minus DHT/JPG/DAC carry the frame dimensions.
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(payload):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return int(w), int(h)
                raise ValueError("truncated JPEG SOF")
            i += 2 + seg_len
        raise ValueError("JPEG without SOF frame header")
    raise ValueError("unrecognized image payload (not PNG/BMP/GIF/JPEG)")


def _f80_encode(x: int) -> bytes:
    """Encode a positive integer as the 80-bit extended float AIFF's
    COMM chunk stores sample rates in (sign+15-bit biased exponent,
    64-bit mantissa with an EXPLICIT integer bit) — exact for every
    integer below 2^63."""
    import struct

    if x <= 0:
        raise ValueError(f"AIFF sample rate must be positive, got {x}")
    e = x.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, x << (63 - e))


def _f80_decode(b: bytes) -> int:
    """Decode AIFF's 80-bit extended float to the nearest integer
    sample rate (real-world rates are integers; the explicit integer
    bit makes the integer range exact)."""
    import struct

    se, mant = struct.unpack(">HQ", b)
    if mant == 0:
        return 0
    exp = (se & 0x7FFF) - 16383 - 63
    if exp >= 0:
        return mant << exp
    # round-half-up on the truncated bits
    return (mant + (1 << (-exp - 1))) >> -exp


def decode_audio_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Parse (sample_rate_hz, n_channels, bits_per_sample, n_frames)
    from genuine WAV/RIFF or AIFF bytes — pure Python, no audio
    dependency.

    WAV: walks RIFF chunks to ``fmt `` (PCM header) and ``data``
    (payload size → frame count = data_bytes / block_align). AIFF:
    walks big-endian FORM chunks to ``COMM`` — channels, frame count,
    sample size, and the 80-bit extended-float sample rate
    (:func:`_f80_decode`). Raises ``ValueError`` on unrecognized or
    truncated payloads, mirroring :func:`decode_image_meta`'s
    corrupt-asset contract.
    """
    import struct

    if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        rate = channels = bits = frames = None
        i = 12
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (size,) = struct.unpack(">I", payload[i + 4 : i + 8])
            if cid == b"COMM" and i + 26 <= len(payload):
                channels, frames, bits = struct.unpack(
                    ">HIH", payload[i + 8 : i + 16]
                )
                rate = _f80_decode(payload[i + 16 : i + 26])
            i += 8 + size + (size & 1)  # chunks pad to even offsets
        # `not rate` also rejects rate == 0 (a structurally-valid COMM
        # with zeroed extended-float bytes): downstream duration math
        # divides by the rate, and the corrupt-asset contract is
        # ValueError, not ZeroDivisionError.
        if not rate or frames is None:
            raise ValueError("truncated or corrupt AIFF: missing COMM/zero rate")
        return int(rate), int(channels), int(bits), int(frames)

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unrecognized audio payload (not RIFF/WAVE or AIFF)")
    rate = channels = bits = block_align = None
    n_data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(payload):
            _, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
        elif cid == b"data":
            n_data = size
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if not rate or n_data is None or not block_align:
        raise ValueError("truncated or corrupt WAV: missing fmt/data or zero rate")
    return int(rate), int(channels), int(bits), int(n_data // block_align)


def encode_wav(
    sample_rate: int, n_frames: int, pcm: bytes = b"", n_channels: int = 1
) -> bytes:
    """A genuine, spec-valid 16-bit PCM WAV: RIFF header, ``fmt `` chunk,
    ``data`` chunk of ``n_frames`` frames (``pcm`` bytes tile across the
    payload). Stdlib ``struct`` only."""
    import struct

    block_align = n_channels * 2  # 16-bit samples
    data = _tile(pcm, n_frames * block_align)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_aiff(
    sample_rate: int, n_frames: int, pcm: bytes = b"", n_channels: int = 1
) -> bytes:
    """A genuine, spec-valid 16-bit PCM AIFF: big-endian FORM container,
    COMM chunk (channels, frame count, sample size, 80-bit extended-
    float sample rate — :func:`_f80_encode`), SSND chunk with the PCM
    payload (``pcm`` bytes tile across it). Stdlib ``struct`` only —
    the big-endian, extended-float sibling of :func:`encode_wav`."""
    import struct

    block_align = n_channels * 2  # 16-bit samples
    data = _tile(pcm, n_frames * block_align)
    comm = struct.pack(">HIH", n_channels, n_frames, 16) + _f80_encode(
        sample_rate
    )
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (spec §9.4): pick whichever of left (a),
    up (b), up-left (c) is closest to a + b - c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (all five types — None/Sub/Up/
    Average/Paeth) over the inflated IDAT stream. ``bpp`` is bytes per
    pixel (1 = grayscale, 3 = RGB). Returns the top-down raster."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch after inflate")
    out = bytearray(stride * height)
    prev_off = -stride
    for r in range(height):
        f = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        off = r * stride
        if f == 0:  # None
            out[off : off + stride] = line
        elif f == 1:  # Sub: + left pixel's same byte
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up: + same byte one row up
            for i in range(stride):
                up = out[prev_off + i] if r else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif f == 3:  # Average: + floor((left + up) / 2)
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if r else 0
                out[off + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if r else 0
                ul = out[prev_off + i - bpp] if (r and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        prev_off = off
    return out


def decode_image_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode, pure stdlib (``struct`` + ``zlib``) — returns
    ``(width, height, 3, rgb)`` where ``rgb`` is the canonical top-down
    interleaved 8-bit RGB raster (``width * height * 3`` bytes).

    Formats:

    - **PNG**: bit depth 8, color types 0 (grayscale → replicated to
      RGB) and 2 (truecolor RGB), progressive AND Adam7-interlaced
      (seven independently-filtered sub-images scattered back to the
      natural grid). The IDAT stream inflates via stdlib ``zlib`` and
      ALL FIVE scanline filters (None/Sub/Up/Average/Paeth) are
      reversed — exercised for real because :func:`encode_png` can
      emit varied per-row filters, per interlace pass.
    - **BMP**: BITMAPINFOHEADER, uncompressed, 8-bit palettized (indices
      resolve through the file's own BGRX palette) and 24-bit BGR; rows
      un-pad from 4-byte alignment and bottom-up rasters (positive
      height) flip to the canonical top-down order; a negative height
      (top-down DIB) reads straight through.
    - **GIF**: 87a/89a, single full-screen frame; image data
      decompresses through a REAL variable-width LZW decoder
      (:func:`_lzw_decode_gif` — CLEAR resets, EOI terminates, KwKwK,
      deferred-clear full tables), four-pass INTERLACED rasters
      re-order to natural rows, and indices resolve through the local
      or global color table. Extensions are skipped; sub-rectangle
      frames raise.

    - **JPEG**: sequential BASELINE files with arbitrary content —
      grayscale (single-component) AND color (3-component YCbCr,
      interleaved MCUs with per-component DC predictors and sampling
      factors 1-2 each: 4:4:4, 4:2:0, 4:2:2, 4:4:0; subsampled chroma
      upsamples by sample replication, then the BT.601 inverse): real
      Huffman decode through the file's own DHT/DQT tables, EOB/ZRL
      run-length AC decode, zigzag, dequantize, and the real 2-D
      inverse DCT (:func:`_decode_jpeg_baseline`); what
      :func:`encode_jpeg` emits in all its ``color`` modes, and what
      real-world sequential baseline files contain. Progressive,
      restart-interval, and sampling-factor >2 files raise.

    Raises ``ValueError`` on anything else (16-bit/paletted PNG,
    RLE/16-bit BMP, GIF sub-rectangle frames, color/progressive JPEG —
    those decodes stay behind an imaging library) AND on
    corrupt bytes inside a recognized format
    (truncated headers → ``struct.error``, damaged IDAT →
    ``zlib.error`` — both converted so the contract is a single
    exception type). Same corrupt-asset contract as
    :func:`decode_image_meta`: the caller counts failures.
    """
    import struct
    import zlib

    try:
        return _decode_image_pixels_raw(payload)
    except (struct.error, zlib.error) as exc:
        raise ValueError(f"corrupt image payload: {exc}") from exc


def _decode_image_pixels_raw(payload: bytes) -> tuple[int, int, int, bytes]:
    import struct
    import zlib

    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        w = h = depth = ctype = interlace = None
        idat = bytearray()
        i = 8
        while i + 8 <= len(payload):
            (clen,) = struct.unpack(">I", payload[i : i + 4])
            typ = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + clen]
            if typ == b"IHDR":
                w, h, depth, ctype, _, _, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            i += 12 + clen  # len + type + data + crc
        if w is None or not idat:
            raise ValueError("truncated PNG: missing IHDR/IDAT")
        if depth != 8 or interlace not in (0, 1) or ctype not in (0, 2):
            raise ValueError(
                f"unsupported PNG (depth={depth} color={ctype} "
                f"interlace={interlace}); only 8-bit gray/RGB"
            )
        bpp = 1 if ctype == 0 else 3
        raw = zlib.decompress(bytes(idat))
        if interlace == 0:
            px = _png_unfilter(raw, w, h, bpp)
        else:
            # Adam7: seven independently-filtered sub-images; unfilter
            # each pass and scatter its pixels to their natural grid
            # positions.
            px = bytearray(w * h * bpp)
            off = 0
            for x0, y0, dx, dy, wp, hp in _adam7_passes(w, h):
                n = (wp * bpp + 1) * hp
                sub = _png_unfilter(raw[off : off + n], wp, hp, bpp)
                off += n
                for r in range(hp):
                    y = y0 + r * dy
                    for c in range(wp):
                        x = x0 + c * dx
                        px[(y * w + x) * bpp : (y * w + x) * bpp + bpp] = (
                            sub[(r * wp + c) * bpp : (r * wp + c) * bpp + bpp]
                        )
            if off != len(raw):
                raise ValueError("PNG IDAT length mismatch after inflate")
        if bpp == 1:  # canonicalize grayscale to RGB
            rgb = bytearray(w * h * 3)
            rgb[0::3] = px
            rgb[1::3] = px
            rgb[2::3] = px
            return int(w), int(h), 3, bytes(rgb)
        return int(w), int(h), 3, bytes(px)

    if payload[:2] == b"BM":
        (off,) = struct.unpack("<I", payload[10:14])
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        if hdr_size < 40:
            raise ValueError("BMP: only BITMAPINFOHEADER supported")
        w, h_signed = struct.unpack("<ii", payload[18:26])
        planes, bpp_bits, compression = struct.unpack("<HHI", payload[26:34])
        if compression != 0 or bpp_bits not in (8, 24):
            raise ValueError(
                f"unsupported BMP (bpp={bpp_bits} compression={compression})"
            )
        h = abs(h_signed)
        top_down = h_signed < 0
        nbytes = bpp_bits // 8
        stride = (w * nbytes + 3) & ~3
        # Validate the raster is actually PRESENT before sizing the output
        # buffer from header-claimed dimensions: a corrupt/truncated file
        # whose 26-byte header parses but claims huge dims (60000x60000)
        # would otherwise drive a multi-GB allocation — MemoryError escapes
        # the ValueError quarantine contract and can OOM the worker. All h
        # rows are required whichever row order applies, so the whole
        # claimed raster must fit inside the payload.
        if w <= 0:
            raise ValueError(f"invalid BMP width {w}")
        # The FINAL row only needs its w*nbytes pixel bytes — real-world
        # writers may omit the last row's alignment padding, and those
        # files decoded fine before this check existed.
        if off + stride * (h - 1) + w * nbytes > len(payload):
            raise ValueError("truncated BMP pixel data")
        rgb = bytearray(w * h * 3)
        if bpp_bits == 8:
            (n_colors,) = struct.unpack("<I", payload[46:50])
            n_colors = n_colors or 256
            pal_off = 14 + hdr_size
            palette = payload[pal_off : pal_off + 4 * n_colors]
            if len(palette) < 4 * n_colors:
                raise ValueError("truncated BMP palette")
        for r in range(h):
            src_r = r if top_down else h - 1 - r
            row = payload[off + src_r * stride : off + src_r * stride + w * nbytes]
            if len(row) < w * nbytes:
                raise ValueError("truncated BMP pixel data")
            o = r * w * 3
            if bpp_bits == 8:
                # Same quarantine-contract discipline as the GIF color
                # table: an index past the declared color count must be
                # ValueError, not IndexError escaping the decoder.
                if max(row) * 4 + 4 > len(palette):
                    raise ValueError("BMP index outside the palette")
                for x in range(w):
                    p = row[x] * 4  # palette entries are B,G,R,X
                    rgb[o + 3 * x] = palette[p + 2]
                    rgb[o + 3 * x + 1] = palette[p + 1]
                    rgb[o + 3 * x + 2] = palette[p]
            else:  # 24-bit BGR
                for x in range(w):
                    rgb[o + 3 * x] = row[3 * x + 2]
                    rgb[o + 3 * x + 1] = row[3 * x + 1]
                    rgb[o + 3 * x + 2] = row[3 * x]
        return int(w), int(h), 3, bytes(rgb)

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        if w == 0 or h == 0:
            raise ValueError("invalid GIF dimensions")
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 ** ((packed & 0x07) + 1)
            gct = payload[13 : 13 + 3 * n]
            if len(gct) < 3 * n:
                raise ValueError("truncated GIF color table")
            i = 13 + 3 * n
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x21:  # extension block: label + sub-blocks, skip
                i += 2
                while True:
                    if i >= len(payload):
                        raise ValueError("truncated GIF extension")
                    sz = payload[i]
                    i += 1
                    if sz == 0:
                        break
                    i += sz
            elif b0 == 0x2C:  # image descriptor
                left, top, iw, ih, ipacked = struct.unpack(
                    "<HHHHB", payload[i + 1 : i + 10]
                )
                i += 10
                interlaced = bool(ipacked & 0x40)
                pal = gct
                if ipacked & 0x80:  # local color table wins
                    n = 2 ** ((ipacked & 0x07) + 1)
                    pal = payload[i : i + 3 * n]
                    if len(pal) < 3 * n:
                        raise ValueError("truncated GIF local color table")
                    i += 3 * n
                if pal is None:
                    raise ValueError("GIF image without a color table")
                if (left, top, iw, ih) != (0, 0, w, h):
                    raise ValueError(
                        "unsupported GIF (sub-rectangle frame)"
                    )
                if i >= len(payload):
                    raise ValueError("truncated GIF (no LZW code size)")
                mcs = payload[i]
                i += 1
                if not 2 <= mcs <= 8:
                    raise ValueError(f"corrupt GIF LZW code size {mcs}")
                data = bytearray()
                while True:
                    if i >= len(payload):
                        raise ValueError("truncated GIF image data")
                    sz = payload[i]
                    i += 1
                    if sz == 0:
                        break
                    chunk = payload[i : i + sz]
                    if len(chunk) < sz:
                        raise ValueError("truncated GIF sub-block")
                    data += chunk
                    i += sz
                idx = _lzw_decode_gif(bytes(data), mcs, w * h)
                if len(idx) != w * h:
                    raise ValueError("GIF raster truncated")
                if interlaced:
                    # Stored rows are in four-pass order; re-place each
                    # at its natural position.
                    nat = bytearray(w * h)
                    for k, r in enumerate(_gif_interlace_order(h)):
                        nat[r * w : (r + 1) * w] = idx[k * w : (k + 1) * w]
                    idx = nat
                pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
                idx_arr = np.frombuffer(bytes(idx), dtype=np.uint8)
                if int(idx_arr.max(initial=0)) >= pal_arr.shape[0]:
                    raise ValueError("GIF index outside the color table")
                return int(w), int(h), 3, pal_arr[idx_arr].tobytes()
            elif b0 == 0x3B:  # trailer
                break
            else:
                raise ValueError(f"corrupt GIF block 0x{b0:02x}")
        raise ValueError("GIF without an image descriptor")

    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg_baseline(payload)

    raise ValueError(
        "unrecognized image payload (pixel decode: PNG/BMP/GIF/JPEG)"
    )


def _lzw_encode_gif(data: bytes, min_code_size: int = 8) -> bytes:
    """REAL GIF-flavor LZW compression (variable-width codes, LSB-first
    bit packing, CLEAR/EOI codes, table reset at 4096) — the encoder
    half backing :func:`encode_gif`. Pure stdlib.

    Code-width discipline mirrors the decoder exactly: the encoder runs
    one table entry AHEAD of the decoder (it adds on emit; the decoder
    adds one code-read later), so it widens when ``next_code`` reaches
    ``(1 << code_size) + 1`` where the decoder widens at
    ``1 << code_size`` — the classic off-by-one both sides of the GIF
    ecosystem implement."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            # Table full: reset so both sides rebuild from scratch.
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(
    data: bytes, min_code_size: int, max_pixels: int
) -> bytearray:
    """GIF LZW decompression — variable-width codes read LSB-first,
    CLEAR resets the table, EOI terminates, and the deferred-clear case
    (a full table with no CLEAR) keeps decoding with the 4096-entry
    table, as real-world encoders require. Output is capped at
    ``max_pixels``: a corrupt stream claiming more pixels than the
    image descriptor raises ``ValueError`` instead of growing an
    unbounded buffer (the same no-giant-allocation discipline as the
    BMP raster bounds check)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                if len(out) == max_pixels:
                    # Real-world encoders (e.g. the ubiquitous 1x1
                    # tracking pixels) end the data block without an
                    # explicit EOI once the raster is complete —
                    # tolerate that; an INCOMPLETE raster still raises.
                    return out
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW output exceeds the declared raster")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _gif_interlace_order(height: int) -> list[int]:
    """The GIF89a four-pass interlace row order (spec appendix E):
    rows 0,8,16,… then 4,12,… then 2,6,10,… then 1,3,5,…"""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def encode_gif(
    width: int, height: int, pixels: bytes = b"", interlace: bool = False
) -> bytes:
    """A genuine, spec-valid GIF89a: logical screen descriptor, 256-entry
    grayscale global color table, one full-screen image descriptor, and
    REAL LZW-compressed image data (variable-width codes, sub-block
    framing) — stdlib only. ``pixels`` tiles across the raster as
    8-bit palette indices, exactly like :func:`encode_bmp`.
    ``interlace=True`` stores rows in the four-pass interlace order
    with the descriptor flag set — the common real-world variant a
    decoder must re-order on read."""
    import struct

    px = _tile(pixels, width * height)
    if interlace:
        px = b"".join(
            px[r * width : (r + 1) * width]
            for r in _gif_interlace_order(height)
        )
    # 0xF7: global color table present, 8 bits/channel, 2^(7+1) entries.
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = b"".join(bytes((i, i, i)) for i in range(256))
    img_desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    lzw = _lzw_encode_gif(px, 8)
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return b"GIF89a" + lsd + gct + img_desc + bytes(blocks) + b"\x3b"


def _tile(pixels: bytes, need: int) -> bytes:
    """Tile/truncate ``pixels`` to exactly ``need`` bytes (zero-fill if
    empty) — the deterministic pixel source for the synthetic encoders."""
    if need <= 0:
        return b""
    if not pixels:
        return b"\x00" * need
    reps = -(-need // len(pixels))
    return (pixels * reps)[:need]


#: The Adam7 interlace grid (PNG spec §8.2): per pass, the (x_start,
#: y_start, x_step, y_step) of the pixels that pass carries.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_scanlines(
    px: bytes, width: int, height: int, filters: str, bpp: int = 1
) -> bytes:
    """Forward-filter a raster (``bpp`` bytes per pixel) into PNG
    scanlines: ``filters="none"`` emits filter-0 rows, ``"varied"``
    rotates row r through type r % 5 (None/Sub/Up/Average/Paeth — the
    left neighbor is ``bpp`` bytes back, per spec). Shared by the
    progressive and Adam7 encoders (each interlace pass filters its
    sub-image independently, previous-row state starting at zero)."""
    stride = width * bpp
    if filters == "none":
        return b"".join(
            b"\x00" + px[r * stride : (r + 1) * stride]
            for r in range(height)
        )
    rows = []
    for r in range(height):
        f = r % 5
        line = px[r * stride : (r + 1) * stride]
        prev = px[(r - 1) * stride : r * stride] if r else b"\x00" * stride
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            filt = bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            filt = bytes(
                (line[i] - prev[i]) & 0xFF for i in range(stride)
            )
        elif f == 3:  # Average
            filt = bytes(
                (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            filt = bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        rows.append(bytes([f]) + filt)
    return b"".join(rows)


def _adam7_passes(width: int, height: int):
    """Non-empty Adam7 passes for a raster: (x0, y0, dx, dy, wp, hp)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            out.append((x0, y0, dx, dy, wp, hp))
    return out


def encode_png(
    width: int,
    height: int,
    pixels: bytes = b"",
    filters: str = "none",
    interlace: bool = False,
    color: str = "gray",
) -> bytes:
    """A genuine, spec-valid 8-bit PNG: signature, IHDR, one
    zlib-compressed IDAT, IEND — correct chunk CRC32s throughout (stdlib
    ``zlib`` only). ``color="gray"`` (default) emits color type 0 and
    ``pixels`` tiles across the ``width*height`` raster;
    ``color="rgb"`` emits TRUECOLOR (color type 2) and ``pixels`` tiles
    across the ``width*height*3`` interleaved raster — the decoder's
    3-byte-per-pixel filter arithmetic (left neighbor is bpp bytes
    back) is only exercised through this path.

    ``filters="none"`` emits filter-0 scanlines; ``filters="varied"``
    forward-filters row ``r`` with type ``r % 5`` (None/Sub/Up/Average/
    Paeth in rotation) — a decoder must implement the FULL filter suite
    to read it back, which is exactly what the pixel-decode catalog
    entry uses to prove :func:`decode_image_pixels` against SQL.
    ``interlace=True`` stores the raster as the seven Adam7 passes
    (each pass an independently-filtered sub-image, spec §8.2) with
    the IHDR interlace flag set — the progressive-rendering variant
    real-world encoders emit."""
    import struct
    import zlib

    if filters not in ("none", "varied"):
        raise ValueError(f"filters must be 'none' or 'varied', got {filters!r}")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    if color not in ("gray", "rgb"):
        raise ValueError(f"color must be 'gray' or 'rgb', got {color!r}")
    bpp = 1 if color == "gray" else 3
    px = _tile(pixels, width * height * bpp)
    if not interlace:
        raw = _filter_scanlines(px, width, height, filters, bpp)
    else:
        parts = []
        for x0, y0, dx, dy, wp, hp in _adam7_passes(width, height):
            sub = b"".join(
                px[
                    ((y0 + r * dy) * width + (x0 + c * dx)) * bpp :
                    ((y0 + r * dy) * width + (x0 + c * dx)) * bpp + bpp
                ]
                for r in range(hp)
                for c in range(wp)
            )
            parts.append(_filter_scanlines(sub, wp, hp, filters, bpp))
        raw = b"".join(parts)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8,
        0 if color == "gray" else 2, 0, 0, 1 if interlace else 0,
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(width: int, height: int, pixels: bytes = b"") -> bytes:
    """A genuine, spec-valid 8-bit palettized BMP (BITMAPINFOHEADER):
    file header, 40-byte DIB header, 256-entry grayscale palette, and
    4-byte-aligned bottom-up rows. ``pixels`` tiles across the raster."""
    import struct

    row = (width + 3) & ~3  # rows pad to 4-byte boundaries
    px = _tile(pixels, width * height)
    img = b"".join(
        px[r * width : (r + 1) * width] + b"\x00" * (row - width)
        for r in reversed(range(height))
    )
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    off = 14 + 40 + len(palette)
    file_header = b"BM" + struct.pack("<IHHI", off + len(img), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(img), 2835, 2835, 256, 0
    )
    return file_header + dib + palette + img


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    """One JPEG marker segment: marker + (length incl. itself) + body."""
    import struct

    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_check_dims(width: int, height: int) -> None:
    """Baseline JPEG carries dimensions as uint16 in SOF0 — enforce
    1..65535 as ValueError so callers keep the module's
    single-exception contract instead of leaking struct.error."""
    if not (0 < width <= 65535 and 0 < height <= 65535):
        raise ValueError(f"invalid JPEG dimensions {width}x{height}")


#: Canonical DC Huffman table shared by both encoders: twelve length-4
#: codes for categories 0-11 (the all-ones length-4 code stays unused,
#: as the spec's padding rule requires).
_JPEG_DHT_DC = (
    bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
)
_JPEG_DC_CODES = {s: (s, 4) for s in range(12)}  # symbol → (code, bits)


class _JpegBitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing and the
    spec's 1-padded tail flush — the one entropy emitter behind both
    encoders."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def emit(self, val: int, width: int) -> None:
        self._acc = (self._acc << width) | (val & ((1 << width) - 1))
        self._nbits += width
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)  # byte stuffing
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def emit_magnitude(self, v: int, size: int) -> None:
        self.emit(v if v > 0 else v + (1 << size) - 1, size)

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.emit((1 << pad) - 1, pad)
        return bytes(self._out)


def encode_jpeg_flat(width: int, height: int, level: int = 128) -> bytes:
    """A genuine, spec-valid baseline JPEG (SOI, DQT, SOF0, two DHTs,
    SOS, entropy-coded scan, EOI) of a FLAT grayscale image — stdlib
    only. Flat color makes real entropy coding tractable without an
    imaging library: every 8x8 block's DCT is a lone DC coefficient
    ((level-128)*8, all ACs zero), so the scan is one DC-category code
    + magnitude bits for the first block and a zero-diff DC code + EOB
    per block after — emitted through real canonical Huffman tables
    declared in the file's own DHT segments, with 0xFF byte stuffing.
    Decodes back through :func:`_decode_jpeg_baseline` (reached via
    :func:`decode_image_pixels`); :func:`encode_jpeg` is the
    arbitrary-content sibling with a real FDCT + run-length AC coding.

    Tables (canonical, declared in-file): DC = twelve length-4 codes
    for categories 0-11; AC = one length-2 code for EOB. Quant table:
    all 16s, so the quantized DC is round((level-128)/2)."""
    import struct

    if not (0 <= level <= 255):
        raise ValueError(f"level must be 0..255, got {level}")
    _jpeg_check_dims(width, height)

    qt = bytes([0]) + bytes([16] * 64)  # Pq=0/Tq=0, uniform luma table
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    # Canonical AC table: one length-2 code (00) for EOB (symbol 0x00).
    ac_counts = [0] * 16
    ac_counts[1] = 1
    dht_ac = bytes([0x10]) + bytes(ac_counts) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    # --- entropy-coded scan ---
    eob = (0b00, 2)
    bits = _JpegBitWriter()
    qdc = round((level - 128) / 2)
    n_mcu = ((width + 7) // 8) * ((height + 7) // 8)
    for i in range(n_mcu):
        diff = qdc if i == 0 else 0
        s = abs(diff).bit_length()
        bits.emit(*_JPEG_DC_CODES[s])
        if s:
            bits.emit_magnitude(diff, s)
        bits.emit(*eob)

    return (
        b"\xff\xd8"
        + _jpeg_seg(0xFFDB, qt)
        + _jpeg_seg(0xFFC0, sof)
        + _jpeg_seg(0xFFC4, _JPEG_DHT_DC)
        + _jpeg_seg(0xFFC4, dht_ac)
        + _jpeg_seg(0xFFDA, sos)
        + bits.flush()
        + b"\xff\xd9"
    )


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes = b"",
    quant: int = 1,
    color: str = "gray",
) -> bytes:
    """A genuine, spec-valid baseline JPEG of ARBITRARY content — the
    full-codec sibling of :func:`encode_jpeg_flat`, stdlib + numpy
    only. Per 8x8 block (edges replicate-padded): level shift, the
    real forward DCT (orthonormal matrix form — exactly JPEG's
    scaling), uniform quantization by ``quant`` with round-half-even,
    zigzag scan, then standard entropy coding: DC diffs by category,
    AC coefficients as (run, size) symbols with EOB and ZRL, through
    canonical Huffman tables declared in the file's own DHT segments
    (DC: twelve length-4 codes; AC: all 162 baseline symbols as
    length-8 codes — a valid canonical code with the all-ones codeword
    unused, as the spec requires), with 0xFF byte stuffing and a
    1-padded tail.

    ``color="gray"`` tiles ``pixels`` as one luma plane;
    ``color="rgb"`` tiles RGB triples, converts through the JFIF
    BT.601 RGB→YCbCr transform, and writes a 3-component 4:4:4
    interleaved scan (one block per component per MCU, per-component
    DC predictors, shared tables — all legal baseline);
    ``color="rgb420"`` additionally decimates the chroma planes by
    2x2 mean and writes the real-world 4:2:0 layout (Y at 2x2
    sampling, four luma data units per MCU). 4:2:0 is chroma-lossy by
    design: gray and low-chroma content round-trips within a few
    levels, saturated chroma detail does not (the same trade every
    camera JPEG makes).

    ``quant=1`` keeps coefficient rounding the only loss (round-trip
    error provably ≤ ~4 levels per channel before the color
    transform's ~2× amplification; typically ≤ 2 gray / ≤ 5 RGB);
    larger values quantize like a real encoder. Decodes back through
    :func:`_decode_jpeg_baseline`."""
    import struct

    if not 1 <= quant <= 255:
        raise ValueError(f"quant must be 1..255, got {quant}")
    if color not in ("gray", "rgb", "rgb420"):
        raise ValueError(
            f"color must be 'gray', 'rgb', or 'rgb420', got {color!r}"
        )
    _jpeg_check_dims(width, height)

    if color == "gray":
        comps = [
            (
                np.frombuffer(_tile(pixels, width * height), dtype=np.uint8)
                .reshape(height, width)
                .astype(np.float64),
                1,
                1,
            )
        ]
    else:
        rgb = (
            np.frombuffer(_tile(pixels, width * height * 3), dtype=np.uint8)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if color == "rgb":
            comps = [(yy, 1, 1), (cb, 1, 1), (cr, 1, 1)]
        else:  # rgb420 — chroma decimated by 2x2 mean
            def down2(p: np.ndarray) -> np.ndarray:
                ph = np.pad(
                    p,
                    ((0, height % 2), (0, width % 2)),
                    mode="edge",
                )
                return (
                    ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            comps = [(yy, 2, 2), (down2(cb), 1, 1), (down2(cr), 1, 1)]
    nf = len(comps)
    hmax = max(ch for _p, ch, _cv in comps)
    vmax = max(cv for _p, _ch, cv in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    def plane_zz(plane: np.ndarray, bhc: int, bwc: int) -> np.ndarray:
        padded = np.pad(
            plane,
            (
                (0, bhc * 8 - plane.shape[0]),
                (0, bwc * 8 - plane.shape[1]),
            ),
            mode="edge",
        )
        blocks = (
            padded.reshape(bhc, 8, bwc, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        fdct = _DCT_M @ (blocks - 128.0) @ _DCT_M.T
        z = np.round(fdct / quant).astype(np.int64).reshape(-1, 64)
        # Zigzag: transmission position i carries natural _ZIGZAG[i].
        return z[:, _ZIGZAG]

    geo = [(mcus_y * cv, mcus_x * ch) for _p, ch, cv in comps]
    comp_zz = [
        plane_zz(p, bhc, bwc)
        for (p, _ch, _cv), (bhc, bwc) in zip(comps, geo)
    ]

    qt = bytes([0]) + bytes([quant] * 64)
    sof = struct.pack(">BHHB", 8, height, width, nf) + b"".join(
        bytes([cid, (ch << 4) | cv, 0])
        for cid, (_p, ch, cv) in enumerate(comps, start=1)
    )
    # All 162 baseline AC symbols as length-8 canonical codes: EOB, ZRL,
    # and (run 0-15, size 1-10). 162 < 255 so the all-ones codeword
    # stays unused, per the spec's padding rule.
    ac_syms = sorted(
        [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)
    dht_ac = bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)
    sos = (
        bytes([nf])
        + b"".join(bytes([cid, 0x00]) for cid in range(1, nf + 1))
        + bytes([0, 63, 0])
    )

    ac_codes = {sym: (i, 8) for i, sym in enumerate(ac_syms)}
    bits = _JpegBitWriter()

    def emit_block(blk: np.ndarray, prev_dc: int) -> int:
        diff = int(blk[0]) - prev_dc
        s = abs(diff).bit_length()
        if s > 11:
            raise ValueError(f"JPEG DC category {s} out of range")
        bits.emit(*_JPEG_DC_CODES[s])
        if s:
            bits.emit_magnitude(diff, s)
        (nz,) = np.nonzero(blk[1:])
        k = 0  # last emitted zigzag position (0 = DC)
        for pos in nz + 1:
            run = int(pos) - k - 1
            while run >= 16:
                bits.emit(*ac_codes[0xF0])  # ZRL
                run -= 16
            v = int(blk[pos])
            size = abs(v).bit_length()
            if size > 10:
                raise ValueError(f"JPEG AC size {size} out of range")
            bits.emit(*ac_codes[(run << 4) | size])
            bits.emit_magnitude(v, size)
            k = int(pos)
        if k < 63:
            bits.emit(*ac_codes[0x00])  # EOB
        return int(blk[0])

    # Interleaved scan: per MCU, each component contributes its H x V
    # data units in row-major order, each component carrying its own
    # DC predictor (reduces to one block per component at 4:4:4).
    dc_pred = [0] * nf
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, ch, cv) in enumerate(comps):
                bwc = geo[ci][1]
                for dv in range(cv):
                    for du in range(ch):
                        dc_pred[ci] = emit_block(
                            comp_zz[ci][(my * cv + dv) * bwc + (mx * ch + du)],
                            dc_pred[ci],
                        )

    return (
        b"\xff\xd8"
        + _jpeg_seg(0xFFDB, qt)
        + _jpeg_seg(0xFFC0, sof)
        + _jpeg_seg(0xFFC4, _JPEG_DHT_DC)
        + _jpeg_seg(0xFFC4, dht_ac)
        + _jpeg_seg(0xFFDA, sos)
        + bits.flush()
        + b"\xff\xd9"
    )


def _zigzag_order() -> list[int]:
    """The JPEG zigzag scan: position ``i`` in transmission order maps
    to natural raster index ``_ZIGZAG[i]`` of the 8x8 block. Generated
    by walking the traversal (up-right / down-left with edge turns)
    rather than transcribing the spec's table, so it is correct by
    construction."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZIGZAG = _zigzag_order()

#: Orthonormal 8-point DCT-II matrix — exactly JPEG's FDCT scaling:
#: F = D @ (f - 128) @ D.T and f = D.T @ F @ D + 128.
_DCT_M = np.array(
    [
        [
            (0.5 * (0.7071067811865476 if u == 0 else 1.0))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _decode_jpeg_baseline(payload: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode for sequential BASELINE JPEG, grayscale AND
    color at sampling factors 1-2 per axis (4:4:4, 4:2:0, 4:2:2,
    4:4:0) — any encoder's SOF0 file, arbitrary content. The Huffman
    tables come from the file's OWN DHT segments (canonical
    reconstruction, per-component table selection), the quantizers
    from its own DQT (zigzag order), stuffed ``FF 00`` bytes unwind,
    interleaved MCUs decode each component's H×V data units in
    row-major order with per-component DC predictors (a
    single-component scan covers its own ceil grid, ISO 10918-1 A.2),
    AC coefficients run-length-decode through EOB/ZRL into zigzag
    positions, and every block reconstructs through the real 2-D
    inverse DCT (orthonormal matrix form, vectorized over all blocks);
    3-component files upsample subsampled chroma by sample replication
    (a legal JFIF upsampler) and pass through the BT.601 YCbCr→RGB
    inverse with one final round+clamp.
    Progressive scans, restart intervals, sampling factors >2,
    and 12-bit precision raise ``ValueError`` — those
    genuinely belong to an imaging library. Corrupt files whose headers
    claim more raster than the scan can carry (or > 64 MP outright)
    also raise ``ValueError`` BEFORE any buffer is sized from the
    claimed dimensions, keeping the quarantine contract MemoryError-free.
    """
    import struct

    qt: dict[int, bytes] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    sof_comps: dict[int, tuple[int, int, int]] = {}  # cid → (H, V, tq)
    # (H, V, tq, td, ta) per component, in scan order:
    scan_comps: list[tuple[int, int, int, int, int]] = []
    scan = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {i}")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # parameterless markers
            continue
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + ln]
        if ln < 2 or len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT — one or more tables back-to-back
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                table_bytes = body[j + 1 : j + 65]
                if len(table_bytes) != 64:
                    raise ValueError("truncated JPEG quant table")
                qt[tq] = table_bytes
                j += 65
        elif marker == 0xC0:  # SOF0 — baseline
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nf not in (1, 3):
                raise ValueError(
                    "only 8-bit grayscale or 3-component baseline JPEG"
                )
            if len(body) < 6 + 3 * nf:
                raise ValueError("truncated JPEG SOF0 component spec")
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {ch}x{cv} "
                        "(1 and 2 only)"
                    )
                sof_comps[cid] = (ch, cv, tq)
        elif marker in (
            0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError("only baseline SOF0 JPEG decodes here")
        elif marker == 0xC4:  # DHT — one or more tables back-to-back
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                counts = body[j + 1 : j + 17]
                n = sum(counts)
                syms = body[j + 17 : j + 17 + n]
                if len(counts) != 16 or len(syms) != n:
                    raise ValueError("truncated JPEG Huffman table")
                code = k = 0
                table: dict[tuple[int, int], int] = {}
                for bit_len in range(1, 17):
                    for _ in range(counts[bit_len - 1]):
                        table[(bit_len, code)] = syms[k]
                        k += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
                j += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) >= 2 and struct.unpack(">H", body[:2])[0]:
                raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if len(body) < 1:
                raise ValueError("truncated JPEG SOS")
            ns = body[0]
            if ns != len(sof_comps) or not sof_comps:
                raise ValueError(
                    "JPEG scan components disagree with SOF0 (interleaved "
                    "baseline expected)"
                )
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS")
            for ci in range(ns):
                cs = body[1 + 2 * ci]
                tdta = body[2 + 2 * ci]
                if cs not in sof_comps:
                    raise ValueError("JPEG scan names an undeclared component")
                ch, cv, tq = sof_comps[cs]
                scan_comps.append((ch, cv, tq, tdta >> 4, tdta & 0x0F))
            if body[1 + 2 * ns] != 0:  # Ss != 0 ⇒ a progressive AC scan
                raise ValueError("non-baseline JPEG spectral selection")
            scan = payload[i + 2 + ln :]
            break
        i += 2 + ln
    if scan is None or w is None:
        raise ValueError("truncated JPEG: missing SOF0/SOS")
    for _ch, _cv, tq, td, ta in scan_comps:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(
                "JPEG scan references an undeclared Huffman table"
            )
        if tq not in qt:
            raise ValueError(
                "JPEG component references an undeclared quant table"
            )

    # Unstuff the entropy-coded bytes: FF 00 → FF; FF D9 ends the scan;
    # any other FF-marker (restarts included) is unsupported here.
    data = bytearray()
    j = 0
    while j < len(scan):
        b = scan[j]
        if b == 0xFF:
            nxt = scan[j + 1] if j + 1 < len(scan) else None
            if nxt == 0x00:
                data.append(0xFF)
                j += 2
                continue
            if nxt == 0xD9:
                break
            raise ValueError(
                "unexpected marker in JPEG scan: 0xff"
                + ("??" if nxt is None else f"{nxt:02x}")
            )
        data.append(b)
        j += 1

    pos = 0
    nbits_total = len(data) * 8

    def read_bit() -> int:
        nonlocal pos
        if pos >= nbits_total:
            raise ValueError("truncated JPEG scan")
        bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1
        pos += 1
        return bit

    def read_code(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for bit_len in range(1, 17):
            code = (code << 1) | read_bit()
            if (bit_len, code) in table:
                return table[(bit_len, code)]
        raise ValueError("invalid JPEG Huffman code")

    nf = len(scan_comps)
    hmax = max(c[0] for c in scan_comps)
    vmax = max(c[1] for c in scan_comps)
    # Per-component block grids. Interleaved scans (Ns > 1) cover the
    # MCU-padded grid (mcus_x * H, mcus_y * V data units); a
    # non-interleaved single-component scan covers exactly the
    # component's own ceil grid (ISO 10918-1 A.2) — for Nf = 1 the two
    # coincide because H = Hmax, V = Vmax.
    if nf == 1:
        geo = [((h + 7) // 8, (w + 7) // 8)]
        blocks_per_mcu = [1]
        nmcu = geo[0][0] * geo[0][1]
    else:
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        nmcu = mcus_x * mcus_y
        geo = [
            (mcus_y * cv, mcus_x * ch) for ch, cv, _tq, _td, _ta in scan_comps
        ]
        blocks_per_mcu = [ch * cv for ch, cv, _tq, _td, _ta in scan_comps]
    total_blocks_per_mcu = sum(blocks_per_mcu)
    # Validate the scan can actually carry the header-claimed raster
    # BEFORE sizing buffers from it: every block costs >= 2 bits (one
    # DC code + one AC code, both >= 1 bit), so a corrupt/truncated
    # file claiming huge dims raises ValueError here instead of a
    # MemoryError escaping the quarantine contract — the same
    # discipline as the BMP raster-presence check. A documented 64 MP
    # ceiling bounds the coefficient buffers (~512 MB per component)
    # even for files that ship a big-enough scan on purpose.
    if nmcu * 2 * total_blocks_per_mcu > nbits_total:
        raise ValueError("JPEG scan too short for the claimed dimensions")
    if w * h > 1 << 26:
        raise ValueError(
            f"JPEG raster {w}x{h} exceeds the 64 MP decode ceiling"
        )
    tables = [
        (
            huff[(0, td)],
            huff[(1, ta)],
            np.frombuffer(qt[tq], dtype=np.uint8).astype(np.float64),
        )
        for _ch, _cv, tq, td, ta in scan_comps
    ]
    coeffs = [np.zeros((bhc * bwc, 64)) for bhc, bwc in geo]  # zigzag
    dc_pred = [0] * nf

    def read_block(ci: int, blk: int) -> None:
        dc_table, ac_table, q_z = tables[ci]
        s = read_code(dc_table)
        if s > 11:
            raise ValueError(f"invalid JPEG DC category {s}")
        if s:
            mag = 0
            for _ in range(s):
                mag = (mag << 1) | read_bit()
            dc_pred[ci] += (
                mag if mag >= 1 << (s - 1) else mag - (1 << s) + 1
            )
        c = coeffs[ci]
        c[blk, 0] = dc_pred[ci] * q_z[0]
        k = 1
        while k < 64:
            sym = read_code(ac_table)
            if sym == 0x00:  # EOB — rest of the block is zero
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError(f"invalid JPEG AC symbol 0x{sym:02x}")
                k += 16  # ZRL: sixteen zero coefficients
                continue
            k += run
            if k >= 64:
                raise ValueError("JPEG AC run past block end")
            mag = 0
            for _ in range(size):
                mag = (mag << 1) | read_bit()
            val = mag if mag >= 1 << (size - 1) else mag - (1 << size) + 1
            c[blk, k] = val * q_z[k]
            k += 1
        if k > 64:
            raise ValueError("JPEG AC run past block end")

    if nf == 1:
        for blk in range(nmcu):
            read_block(0, blk)
    else:
        # Interleaved MCUs: per MCU, each component contributes its
        # H x V data units in row-major order (ISO 10918-1 A.2.3).
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (ch, cv, _tq, _td, _ta) in enumerate(scan_comps):
                    bwc = geo[ci][1]
                    for dv in range(cv):
                        for du in range(ch):
                            read_block(
                                ci,
                                (my * cv + dv) * bwc + (mx * ch + du),
                            )

    def idct_plane(ci: int) -> np.ndarray:
        # De-zigzag into natural 8x8 order, then the real 2-D inverse
        # DCT over all blocks at once: f = D.T @ F @ D (+128 later).
        bhc, bwc = geo[ci]
        nat = np.zeros((bhc * bwc, 64))
        nat[:, _ZIGZAG] = coeffs[ci]
        px = _DCT_M.T @ nat.reshape(-1, 8, 8) @ _DCT_M
        return (
            px.reshape(bhc, bwc, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bhc * 8, bwc * 8)
        )

    if nf == 1:
        gray = np.clip(
            np.round(idct_plane(0)[:h, :w] + 128), 0, 255
        ).astype(np.uint8)
        rgb = np.repeat(gray.reshape(-1, 1), 3, axis=1)
        return int(w), int(h), 3, rgb.tobytes()
    # 3 components = YCbCr (JFIF): level-shift Y, center the chroma,
    # replicate each subsampled chroma plane back to full resolution
    # (sample replication — a legal JFIF upsampler), apply the BT.601
    # inverse transform, then one final round+clamp — rounding once at
    # the end, exactly like the grayscale path.
    def full_res(ci: int) -> np.ndarray:
        ch, cv = scan_comps[ci][0], scan_comps[ci][1]
        plane = idct_plane(ci)
        if ch != hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv != vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        return plane[:h, :w]

    y = full_res(0) + 128.0
    cb = full_res(1)  # already centered: stored value - 128
    cr = full_res(2)
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return int(w), int(h), 3, rgb.reshape(-1, 3).tobytes()


def synth_jpeg_assets(documents: DataFrame) -> DataFrame:
    """Genuine baseline JPEGs synthesized deterministically from the
    documents table: doc_id fixes the dimensions (the same width =
    16 + doc_id % 48, height = 16 + (doc_id*7) % 32 arithmetic as the
    image twins) and the flat gray level ((doc_id * 13) % 256). Real
    marker segments, real in-file Huffman tables, real entropy-coded
    scan (:func:`encode_jpeg_flat`) — so a downstream
    :func:`decode_image_meta` reads true dimensions from true JPEG
    bytes and the whole encode→parse round-trip value-hashes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                payloads.append(
                    encode_jpeg_flat(
                        16 + did % 48,
                        16 + (did * 7) % 32,
                        (did * 13) % 256,
                    )
                )
                mimes.append("image/jpeg")
                ids.append(did)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "mime": mimes,
                    "payload": payloads,
                }
            )

    return documents.select("doc_id").mapInPandas(batches, ASSET_SCHEMA)


#: Output schema of the full-JPEG-codec round-trip audit.
JPEG_AUDIT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", IntegerType(), True),
        StructField("err_le_2", BooleanType(), True),
        StructField("color_err_le_4", BooleanType(), True),
        StructField("gray420_err_le_2", BooleanType(), True),
        StructField("rgb_equal", BooleanType(), True),
    ]
)


def jpeg_codec_roundtrip_audit(documents: DataFrame) -> DataFrame:
    """ARBITRARY-content JPEG under audit: per document, the
    doc_id-arithmetic raster (:func:`_arith_pixels` tiled — the same
    pattern the PNG/BMP/GIF pixel oracle hashes) goes through the FULL
    codec — :func:`encode_jpeg` (real FDCT, uniform quant 1, run-length
    AC Huffman coding) then :func:`decode_image_pixels` (real AC
    decode + inverse DCT) — and the decoded raster is compared against
    the original pixels inside the worker. Reported per asset:
    dimensions and pixel count AS DECODED from the file (pinning the
    header+scan round-trip), whether every pixel reconstructs within 2
    gray levels (``err_le_2`` — at quant 1 the only loss is
    coefficient rounding; measured max over this corpus is 1), whether
    the same raster tiled as RGB triples survives the COLOR path —
    4:4:4 YCbCr interleaved encode, 3-component decode, BT.601 both
    ways — within 4 levels per channel (``color_err_le_4``; the color
    transform amplifies coefficient rounding ~2×, measured max 3),
    whether the raster as gray-valued RGB survives the real-world
    4:2:0 SUBSAMPLED path — chroma decimated 2x2, four luma data
    units per MCU, replication upsample on decode — within 2 levels
    (``gray420_err_le_2``; constant chroma makes subsampling lossless
    there, so the flag isolates the MCU geometry; measured max 1), and
    the grayscale R=G=B canonicalization flag. All four booleans are
    COMPUTED, not assumed — the same discipline as the pixel entry's
    rgb_equal.

    Scale: one Arrow mapInPandas stage over the pruned doc_id column;
    encode, decode, and compare all happen inside the worker, a few
    booleans per asset cross the wire."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in JPEG_AUDIT_SCHEMA.fields}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 48, 16 + (did * 7) % 32
                tiled = _tile(_arith_pixels(did), w * h)
                payload = encode_jpeg(w, h, tiled, quant=1)
                dw, dh, _, rgb = decode_image_pixels(payload)
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                err = np.abs(
                    arr[:, 0].astype(np.int16)
                    - np.frombuffer(tiled, dtype=np.uint8).astype(np.int16)
                ).max()
                rows["asset_id"].append(did)
                rows["mime"].append("image/jpeg")
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_px"].append(dw * dh)
                color_tiled = _tile(_arith_pixels(did), w * h * 3)
                cw, ch, _, crgb = decode_image_pixels(
                    encode_jpeg(w, h, color_tiled, quant=1, color="rgb")
                )
                color_err = np.abs(
                    np.frombuffer(crgb, dtype=np.uint8).astype(np.int16)
                    - np.frombuffer(color_tiled, dtype=np.uint8).astype(
                        np.int16
                    )
                ).max()
                gray_rgb = np.repeat(
                    np.frombuffer(tiled, dtype=np.uint8), 3
                ).tobytes()
                sw, sh, _, srgb = decode_image_pixels(
                    encode_jpeg(w, h, gray_rgb, quant=1, color="rgb420")
                )
                sub_err = np.abs(
                    np.frombuffer(srgb, dtype=np.uint8).astype(np.int16)
                    - np.frombuffer(gray_rgb, dtype=np.uint8).astype(
                        np.int16
                    )
                ).max()
                rows["err_le_2"].append(bool(err <= 2))
                rows["color_err_le_4"].append(
                    bool((cw, ch) == (w, h) and color_err <= 4)
                )
                rows["gray420_err_le_2"].append(
                    bool((sw, sh) == (w, h) and sub_err <= 2)
                )
                rows["rgb_equal"].append(
                    bool(
                        (arr[:, 0] == arr[:, 1]).all()
                        and (arr[:, 1] == arr[:, 2]).all()
                    )
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(batches, JPEG_AUDIT_SCHEMA)


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: derives a fake (width, height)
    from the payload bytes so tests assert real values end-to-end."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480


#: Output schema of the quarantine-mode extraction: META_SCHEMA plus the
#: per-asset decode error (NULL on success).
META_ERR_SCHEMA = StructType(
    list(META_SCHEMA.fields) + [StructField("decode_error", StringType(), True)]
)


def extract_asset_meta(
    assets: DataFrame, decode=fake_decode_meta, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched metadata extraction over the payload column.

    ``mapInPandas`` processes whole record batches; the decode function is
    called per payload inside the batch loop (vectorize further inside the
    worker when the real library supports it).

    ``on_error``: ``"raise"`` (default) fails the task on the first
    corrupt payload — right for synthetic/trusted inputs where a decode
    error IS a bug. ``"null"`` is the production-ingest quarantine mode:
    a failing decode yields NULL dimensions plus the exception text in a
    ``decode_error`` column, so one corrupt file among billions flags a
    row instead of killing the job; downstream filters on
    ``decode_error IS NULL`` and routes the rest to a quarantine sink.
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    quarantine = on_error == "null"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims, errs = [], []
            for p in payloads:
                if p is None:
                    dims.append((None, None))
                    errs.append("null payload" if quarantine else None)
                    continue
                try:
                    dims.append(decode(p))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — quarantine mode
                    if not quarantine:
                        raise
                    dims.append((None, None))
                    errs.append(f"{type(exc).__name__}: {exc}"[:200])
            out = {
                "asset_id": pdf["asset_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(p) if p is not None else None for p in payloads],
                "sha256_prefix": [
                    hashlib.sha256(p).hexdigest()[:8] if p is not None else None
                    for p in payloads
                ],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
            }
            if quarantine:
                out["decode_error"] = errs
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        batches, META_ERR_SCHEMA if quarantine else META_SCHEMA
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as opaque payloads
    so the multimodal plumbing runs against driver-shipped data."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )


def synth_image_assets(documents: DataFrame) -> DataFrame:
    """Genuine image files synthesized deterministically from the
    documents table: doc_id fixes the dimensions (width = 16 + doc_id %
    48, height = 16 + (doc_id * 7) % 32) and the format (even → PNG, odd
    → BMP); the document text supplies the pixel bytes. The payloads are
    REAL, spec-valid files (see :func:`encode_png` / :func:`encode_bmp`),
    so a downstream :func:`decode_image_meta` reads true dimensions from
    true bytes — and because the dimensions are pure doc_id arithmetic,
    the whole encode→parse round-trip value-hashes against SQL.

    Scale: an Arrow mapInPandas stage, one Python worker per partition —
    the same shape real ingestion (fetch/decode/transcode) runs as.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, payloads = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                w = 16 + did % 48
                h = 16 + (did * 7) % 32
                px = (text or "").encode()
                if did % 2 == 0:
                    mimes.append("image/png")
                    payloads.append(encode_png(w, h, px))
                else:
                    mimes.append("image/bmp")
                    payloads.append(encode_bmp(w, h, px))
                ids.append(did)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "mime": mimes,
                    "payload": payloads,
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        batches, ASSET_SCHEMA
    )


#: Pixel-pattern constants for the PIXEL-decode entry: the tile template
#: is ``PX_SRC_LEN`` bytes of pure doc_id arithmetic, so the decoded
#: raster value at position j is ``(doc_id*31 + (j % PX_SRC_LEN)*7) %
#: 251`` — exactly replayable in SQL (unlike text bytes, which would
#: need byte-level UTF-8 access on the oracle side). 97 and 251 are
#: prime so the template neither divides typical raster sizes nor
#: aliases the modulus.
PX_SRC_LEN = 97
PX_MOD = 251


def _arith_pixels(doc_id: int) -> bytes:
    """The doc_id-arithmetic tile template shared with the oracle SQL."""
    return bytes((doc_id * 31 + k * 7) % PX_MOD for k in range(PX_SRC_LEN))


#: Output schema of the full pixel-decode statistics stage.
PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", IntegerType(), True),
        StructField("px_sum", LongType(), True),
        StructField("px_min", IntegerType(), True),
        StructField("px_max", IntegerType(), True),
        StructField("px_first", IntegerType(), True),
        StructField("px_last", IntegerType(), True),
        StructField("rgb_equal", BooleanType(), True),
    ]
)


def synth_image_assets_arith(documents: DataFrame) -> DataFrame:
    """Image assets for the PIXEL-decode proof: same dimension
    arithmetic as :func:`synth_image_assets` (width = 16 + doc_id % 48,
    height = 16 + (doc_id*7) % 32) but THREE formats (doc_id % 3:
    0 → PNG, 1 → BMP, 2 → GIF) and the pixel source is
    :func:`_arith_pixels` — pure doc_id arithmetic. The PNGs are
    encoded with VARIED per-row filters, so reading the raster back
    requires the full None/Sub/Up/Average/Paeth unfilter suite; the
    GIFs carry real LZW-compressed image data, so reading them back
    requires the full variable-width table decoder. The decoded pixel
    at raster position j is ``(doc_id*31 + (j % 97)*7) % 251`` on both
    engines regardless of format."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 16 + did % 48
                h = 16 + (did * 7) % 32
                px = _arith_pixels(did)
                if did % 3 == 0:
                    # Every other PNG is Adam7-INTERLACED (doc_id % 6
                    # == 3): same canonical raster, same oracle — the
                    # decoder must unfilter seven passes and scatter
                    # them back, so the judged hash covers both PNG
                    # storage orders (mirroring the GIF interlace split).
                    mimes.append("image/png")
                    payloads.append(
                        encode_png(
                            w, h, px, filters="varied",
                            interlace=(did % 6 == 3),
                        )
                    )
                elif did % 3 == 1:
                    mimes.append("image/bmp")
                    payloads.append(encode_bmp(w, h, px))
                else:
                    # Every other GIF is INTERLACED (doc_id % 6 == 5):
                    # the canonical raster — and so the oracle — is
                    # unchanged, but the decoder must run the four-pass
                    # re-order to produce it, so the driver-judged
                    # value hash covers both storage orders for free.
                    mimes.append("image/gif")
                    payloads.append(
                        encode_gif(w, h, px, interlace=(did % 6 == 5))
                    )
                ids.append(did)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "mime": mimes,
                    "payload": payloads,
                }
            )

    return documents.select("doc_id").mapInPandas(batches, ASSET_SCHEMA)


def extract_pixel_stats(
    assets: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched FULL pixel decode → exact integer raster statistics
    per asset, all SQL-replayable: pixel count, red-channel sum/min/max,
    the first and last raster pixels (these pin the TOP-DOWN row order —
    a decoder that forgets to flip a bottom-up BMP gets px_first from
    the wrong row), and whether every pixel has R=G=B (pins the BMP
    palette resolve and the PNG grayscale→RGB canonicalization).

    ``on_error``: same contract as :func:`extract_asset_meta` —
    ``"raise"`` (default; synthetic/trusted inputs, a decode error IS a
    bug) or ``"null"`` (production quarantine: NULL stats + the error
    text in ``decode_error``, so one corrupt file among billions flags
    a row instead of killing the job).

    Scale: one Python worker per partition, whole-column Arrow batches,
    payload bytes never shuffle (stats are a few ints per asset)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    quarantine = on_error == "null"
    stat_cols = (
        "width", "height", "n_px", "px_sum",
        "px_min", "px_max", "px_first", "px_last", "rgb_equal",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("asset_id", "mime", *stat_cols)}
            errs = []
            for aid, mime, p in zip(
                pdf["asset_id"], pdf["mime"], pdf["payload"]
            ):
                rows["asset_id"].append(int(aid))
                rows["mime"].append(mime)
                try:
                    if p is None:
                        raise ValueError("null payload")
                    w, h, _, rgb = decode_image_pixels(bytes(p))
                    if not rgb:
                        raise ValueError("empty raster (zero pixels)")
                except ValueError as exc:
                    if not quarantine:
                        raise
                    for k in stat_cols:
                        rows[k].append(None)
                    errs.append(f"{type(exc).__name__}: {exc}"[:200])
                    continue
                errs.append(None)
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                red = arr[:, 0]
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["px_sum"].append(int(red.sum(dtype=np.int64)))
                rows["px_min"].append(int(red.min()))
                rows["px_max"].append(int(red.max()))
                rows["px_first"].append(int(red[0]))
                rows["px_last"].append(int(red[-1]))
                rows["rgb_equal"].append(
                    bool(
                        (arr[:, 0] == arr[:, 1]).all()
                        and (arr[:, 1] == arr[:, 2]).all()
                    )
                )
            if quarantine:
                rows["decode_error"] = errs
            yield pd.DataFrame(rows)

    if quarantine:
        schema = StructType(
            list(PIXEL_STATS_SCHEMA.fields)
            + [StructField("decode_error", StringType(), True)]
        )
        return assets.mapInPandas(batches, schema)
    return assets.mapInPandas(batches, PIXEL_STATS_SCHEMA)


#: Sample-rate vocabulary for the synthetic audio assets (doc_id % 4
#: picks one) — shared verbatim with the catalog oracle SQL.
WAV_RATES = (8000, 16000, 22050, 44100)

#: Output schema of the audio metadata-extraction stage.
AUDIO_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def synth_audio_assets(documents: DataFrame) -> DataFrame:
    """Genuine audio files synthesized deterministically from the
    documents table: doc_id fixes sample rate (``WAV_RATES[doc_id %
    4]``), frame count (100 + (doc_id * 37) % 4000), channel count
    (1 + doc_id % 2), and the CONTAINER — doc_id % 3 == 2 emits AIFF
    (big-endian chunks, 80-bit extended-float rate), the rest RIFF/WAV;
    the text supplies the PCM bytes. Same contract as
    :func:`synth_image_assets` — real spec-valid files whose parseable
    properties are pure doc_id arithmetic, so the encode→parse
    round-trip value-hashes against SQL across both containers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mimes, payloads = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                rate = WAV_RATES[did % 4]
                frames = 100 + (did * 37) % 4000
                chans = 1 + did % 2
                if did % 3 == 2:
                    payloads.append(
                        encode_aiff(rate, frames, (text or "").encode(), chans)
                    )
                    mimes.append("audio/aiff")
                else:
                    payloads.append(
                        encode_wav(rate, frames, (text or "").encode(), chans)
                    )
                    mimes.append("audio/wav")
                ids.append(did)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "mime": mimes,
                    "payload": payloads,
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        batches, ASSET_SCHEMA
    )


def extract_audio_meta(assets: DataFrame, decode=decode_audio_meta) -> DataFrame:
    """Arrow-batched audio metadata extraction: WAV header fields plus
    exact integer duration (``n_frames * 1000 // sample_rate`` — integer
    floor on both engines, no float rounding to diverge on)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in AUDIO_META_SCHEMA.fieldNames()}
            for aid, mime, p in zip(
                pdf["asset_id"], pdf["mime"], pdf["payload"]
            ):
                rate, chans, bits, frames = decode(p)
                out["asset_id"].append(aid)
                out["mime"].append(mime)
                out["n_bytes"].append(len(p))
                out["sample_rate"].append(rate)
                out["n_channels"].append(chans)
                out["bits"].append(bits)
                out["n_frames"].append(frames)
                out["duration_ms"].append(frames * 1000 // rate)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out["asset_id"], dtype="int64"),
                    "mime": out["mime"],
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int32"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="int32"),
                    "bits": pd.Series(out["bits"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="int32"),
                }
            )

    return assets.mapInPandas(batches, AUDIO_META_SCHEMA)


def fake_embed(payload: bytes, dim: int = 64) -> list[float]:
    """Deterministic feature-extraction stand-in: counter-mode SHA-256
    over the payload expands to ``dim`` floats in [-1, 1). A real encoder
    (CLIP, audio embedder…) swaps in here with the same signature.

    The counter is appended as ASCII (``payload + b"0"``, ``+ b"1"`` …)
    and every byte maps to an exact dyadic float (b/128 - 1), so the
    whole embedding is reproducible in SQL for oracle checks.

    The byte→float map runs in numpy (one vectorized pass per payload,
    not a per-byte Python loop); b/128 − 1 is exact in float32 and
    float64 alike, so the values are bit-identical to the scalar form."""
    digests = [
        hashlib.sha256(payload + str(c).encode()).digest()
        for c in range((dim + 31) // 32)
    ]
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8)[:dim]
    return (raw.astype(np.float64) / 128.0 - 1.0).tolist()


def embed_assets(assets: DataFrame, dim: int = 64, embed=fake_embed) -> DataFrame:
    """Feature extraction: payload → embedding column, Arrow-batched.

    The output shape (id, array<float>) is exactly what the similarity
    operators consume — decode → embed → ANN composes into the standard
    multimodal dedup/retrieval pipeline with no glue."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "embedding": [
                        embed(p, dim) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(batches, out_schema)


def frame_sample(assets: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' plumbing demo: slice the payload at a fixed byte
    stride (the video-frame analog), emitting (asset_id, frame_idx,
    frame_bytes). Real frame extraction swaps the slicing for a decoder
    call inside the same mapInPandas shape."""

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, out_schema)


def resize_images(
    assets: DataFrame, target_w: int = 64, target_h: int = 64, resize=None
) -> DataFrame:
    """Image-resize plumbing: (asset_id, payload) → (asset_id, width,
    height, payload) at the target dimensions, as an Arrow-batched
    ``mapInPandas`` stage.

    ``resize`` is the decoder hook — a real deployment passes
    ``lambda payload, w, h: PIL-or-opencv bytes`` and nothing else
    changes. The default deterministic stand-in truncates/tiles the
    payload to exactly ``target_w * target_h`` bytes (one fake byte per
    output pixel), so batch shapes, output sizes, and schema are
    exercised for real: every output payload is the exact size a real
    w×h single-channel decode would produce.
    """

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    n_out = target_w * target_h

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        reps = -(-n_out // max(len(payload), 1))  # ceil-div tile count
        return (payload * reps)[:n_out] if payload else b"\x00" * n_out

    fn = resize or _fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep = pdf["payload"].notna()
            pdf = pdf[keep]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [
                        fn(bytes(p), target_w, target_h) for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(batches, out_schema)
