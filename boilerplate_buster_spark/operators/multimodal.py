"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

REAL decode paths (numpy + struct, no external media libraries needed):

  * BMP  - 24-bit uncompressed (BI_RGB), bottom-up or top-down rows,
           4-byte row padding, BGR->RGB
  * PPM  - binary P6, maxval 255, '#' comments in the header
  * WAV  - RIFF chunk walk, PCM16 mono (fmt + data chunks)
  * video - concatenated P6 frames (a raw frame stream; the shape ffmpeg's
           image2pipe/-f rawvideo emit), parsed frame-by-frame

`decode_bytes`, `resize_images` (true nearest-neighbor over real pixels,
re-encoded as P6) and `sample_frames` (true uniform frame selection from the
parsed stream) run these decoders whenever the payload parses; payloads in
no supported container fall back to the clearly-marked deterministic hash
STUB, so the plumbing keeps working over arbitrary bytes (and the
documents-as-media contract queries stay pinned to their sha256 oracles).
Compressed formats (JPEG/PNG/MP3/H.264) still need a production decoder
(PIL/ffmpeg) dropped into `_decode_media` - the dispatch point is the same.

Decoded features are INTEGER-EXACT content statistics (sums/extrema -
exactly representable in float32 at these sizes) rather than learned
embeddings, so a DuckDB oracle can recompute them in closed form from the
synthetic generator (synthetic_media_df) - byte-real decode, SQL-checkable
values.  A production embedding model slots into the same dispatch."""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 8


# --------------------------------------------------------------- codecs

def encode_ppm(rgb: np.ndarray) -> bytes:
    """Binary P6 of an (h, w, 3) uint8 array."""
    h, w = rgb.shape[0], rgb.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(rgb).tobytes()


def _ppm_decode_at(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one P6 frame starting at `pos`; returns (rgb, next_pos).
    Handles '#' comments and arbitrary whitespace in the header per the
    netpbm spec; raises ValueError on anything that isn't P6/maxval-255."""
    if buf[pos : pos + 2] != b"P6":
        raise ValueError("not P6")
    i = pos + 2
    fields = []
    while len(fields) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated P6 header")
        fields.append(int(buf[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported P6 ({w}x{h} maxval={maxval})")
    need = w * h * 3
    if len(buf) - i < need:
        raise ValueError("truncated P6 raster")
    rgb = np.frombuffer(buf, np.uint8, count=need, offset=i).reshape(h, w, 3)
    return rgb, i + need


def decode_ppm(buf: bytes) -> np.ndarray:
    rgb, _ = _ppm_decode_at(bytes(buf), 0)
    return rgb


def decode_ppm_stream(buf: bytes) -> list[np.ndarray]:
    """All frames of a concatenated-P6 stream (>= 1)."""
    buf = bytes(buf)
    frames, pos = [], 0
    while pos < len(buf):
        rgb, pos = _ppm_decode_at(buf, pos)
        frames.append(rgb)
    if not frames:
        raise ValueError("empty P6 stream")
    return frames


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR, rows
    padded to 4 bytes) of an (h, w, 3) uint8 array."""
    h, w = rgb.shape[0], rgb.shape[1]
    pad = (-(w * 3)) % 4
    img_size = (w * 3 + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                          2835, 2835, 0, 0)
    bgr = rgb[:, :, ::-1]
    rows = [bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
    return header + b"".join(rows)


def decode_bmp(buf: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from a 24- or 32-bit BI_RGB BMP (round 6: the
    32-bit screenshot layout, 4th byte dropped); honors the pixel-data
    offset, signed height (top-down when negative), and row padding."""
    buf = bytes(buf)
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ValueError("not BMP")
    off = struct.unpack_from("<I", buf, 10)[0]
    hsz, w, h_signed, planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp not in (24, 32) or comp != 0 or w <= 0 or h_signed == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={comp})")
    bottom_up = h_signed > 0
    h = abs(h_signed)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3  # 32-bit rows are already 4-aligned
    if len(buf) - off < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(buf, np.uint8, count=stride * h, offset=off)
    px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    bgr = px[:, :, :3]  # 32-bit BI_RGB: 4th byte is padding/alpha, dropped
    if bottom_up:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-flavor LZW: variable-width codes (LSB-first bit packing), CLEAR
    emitted up front and on dictionary overflow at 4096, EOI at the end."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = width_acc = 0  # bit accumulator + fill level

    def emit(code: int, width: int) -> None:
        nonlocal acc, width_acc
        acc |= code << width_acc
        width_acc += width
        while width_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            width_acc -= 8

    table: dict[tuple, int] = {(i,): i for i in range(1 << mcs)}
    next_code, width = eoi + 1, mcs + 1
    emit(clear, width)
    seq: tuple = ()
    for v in indices.tolist():
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(1 << mcs)}
            next_code, width = eoi + 1, mcs + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if width_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    """Inverse of _lzw_encode (standard GIF LZW incl. the cScSc case)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    width = mcs + 1
    acc = bits = pos = 0
    prev: bytes | None = None
    while n_out < n_expected:
        while bits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width, prev = mcs + 1, None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # cScSc
        else:
            raise ValueError("corrupt LZW code")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_expected:
        raise ValueError("LZW pixel count mismatch")
    return out


def gif_interlace_order(h: int) -> np.ndarray:
    """Display-row order in which an interlaced GIF stores its rows (the
    standard four passes: every 8th from 0, every 8th from 4, every 4th
    from 2, every 2nd from 1)."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """GIF87a with a global color table built from the image's unique colors
    (<= 256 required) and a real LZW-compressed raster; interlace=True
    stores rows in the standard 8/8/4/2 pass order and sets the flag."""
    h, w = rgb.shape[0], rgb.shape[1]
    rgb = np.ascontiguousarray(rgb)
    if interlace:
        rgb = rgb[gif_interlace_order(h)]
    flat = np.ascontiguousarray(rgb).reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros(((1 << bits), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )  # image descriptor
    out.append(mcs)
    lzw = _lzw_encode(indices.astype(np.int64), mcs)
    for i in range(0, len(lzw), 255):  # sub-blocks
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def encode_gif_animation(
    frames: list[np.ndarray], delay_cs: int = 10, interlace: bool = False
) -> bytes:
    """GIF89a animation: one global color table over all frames (union
    <= 256 colors required), a no-transparency Graphic Control Extension
    (delay in centiseconds) before each full-screen image block, plus the
    standard NETSCAPE2.0 loop extension - the banner-animation shape
    decode_gif_frames accepts."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[0], frames[0].shape[1]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one size")
    stack = np.ascontiguousarray(np.stack(frames)).reshape(-1, 3)
    palette, indices = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, got {len(palette)}")
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros(((1 << bits), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    per = w * h
    for fi in range(len(frames)):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        out.append(mcs)
        idx = indices[fi * per : (fi + 1) * per].reshape(h, w)
        if interlace:
            idx = idx[gif_interlace_order(h)]
        lzw = _lzw_encode(idx.reshape(-1).astype(np.int64), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(buf: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 of a GIF's first frame (see decode_gif_frames
    for the supported subset)."""
    return decode_gif_frames(buf)[0]


def decode_gif_frames(buf: bytes) -> list[np.ndarray]:
    """All image blocks of a GIF87a/89a as (h, w, 3) RGB uint8 frames:
    global/local color tables, interlace de-scrambled (8/8/4/2 passes),
    LZW decoded per block - GIF89a animations arrive as the frame list.
    Honest subset for multi-frame files: every block must cover the full
    logical screen at (0, 0) and carry no transparency flag (the common
    banner-animation shape); partial-frame disposal compositing is
    refused, never approximated.  A single-image GIF may be any size (its
    own block defines the canvas, matching how the encoder writes it)."""
    buf = bytes(buf)
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gtable = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gtable = np.frombuffer(buf, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    geoms: list[tuple[int, int, int, int]] = []
    transparent = False
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:  # 89a extension: label + sub-blocks
            label = buf[pos + 1]
            pos += 2
            if label == 0xF9 and buf[pos] >= 4 and (buf[pos + 1] & 0x01):
                # single-frame transparency renders as the palette pixels
                # (no compositing exists to change them); MULTI-frame
                # transparency needs compositing and is refused below
                transparent = True
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:
            x, y, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos + 1)
            pos += 10
            table = gtable
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    buf, np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            interlaced = bool(ipacked & 0x40)
            mcs = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                data += buf[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            if table is None:
                raise ValueError("GIF image without a color table")
            geoms.append((x, y, w, h))
            idx = _lzw_decode(bytes(data), mcs, w * h)
            rgb = table[idx].reshape(h, w, 3)
            if interlaced:
                out = np.empty_like(rgb)
                out[gif_interlace_order(h)] = rgb
                frames.append(out)
            else:
                frames.append(rgb.copy())
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image block")
    if len(frames) > 1:
        # multi-frame honest subset: EVERY block (including the first)
        # full-screen at the origin, and no transparency compositing
        if any(g != (0, 0, sw, sh) for g in geoms):
            raise ValueError("partial GIF animation frames unsupported")
        if transparent:
            raise ValueError("transparent GIF animations unsupported")
    return frames


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16LE mono data."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM RIFF/WAVE file; walks the
    chunk list (fmt /data may be separated by LIST/fact/etc chunks).
    Round 6 widens the honest subset: 8-bit unsigned PCM (centered and
    widened to int16) and multi-channel files (integer-floor mean downmix
    to mono) decode; non-PCM formats still refuse."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        sz = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or channels < 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAVE (fmt={audio_fmt} ch={channels} bits={bits})")
    if bits == 8:  # 8-bit PCM is UNSIGNED per the spec -> center + widen
        frames = len(data) // channels
        raw = np.frombuffer(data, np.uint8, count=frames * channels)
        samples = (raw.astype(np.int16) - 128) << 8
    else:
        frames = len(data) // (2 * channels)
        samples = np.frombuffer(data, "<i2", count=frames * channels)
    if channels > 1:  # integer mean downmix (floor), deterministic
        samples = (
            samples.astype(np.int32).reshape(frames, channels).sum(axis=1)
            // channels
        ).astype(np.int16)
    return rate, samples


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(
    rgb: np.ndarray, cycle_filters: bool = True, interlace: bool = False
) -> bytes:
    """Real PNG (8-bit truecolor) of an (h, w, 3) uint8 array: IHDR + one
    zlib IDAT + IEND, CRC-correct.  With cycle_filters, scanline y uses
    filter type y % 5, so every decoder filter path (None/Sub/Up/Average/
    Paeth) is exercised by any image >= 5 rows.  interlace=True emits a
    real Adam7 stream (seven sub-images, each filtered independently)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    bpp = 3
    if interlace:
        lines = bytearray()
        for xs, ys, xst, yst in _ADAM7:
            sub = rgb[ys::yst, xs::xst]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += _png_filter_lines(
                sub.reshape(sub.shape[0], sub.shape[1] * bpp).astype(np.int32),
                bpp, cycle_filters,
            )
        return _png_container(w, h, bytes(lines), interlace=1)
    raw = rgb.reshape(h, w * bpp).astype(np.int32)
    lines = bytearray(_png_filter_lines(raw, bpp, cycle_filters))
    return _png_container(w, h, bytes(lines), interlace=0)


def _png_filter_lines(raw: np.ndarray, bpp: int, cycle_filters: bool) -> bytes:
    """Filter the rows of one (sub-)image into PNG scanline bytes."""
    h = raw.shape[0]
    stride = raw.shape[1]
    lines = bytearray()
    for y in range(h):
        ft = (y % 5) if cycle_filters else 0
        cur = raw[y]
        prev = raw[y - 1] if y else np.zeros(stride, np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - a
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - (a + prev) // 2
        else:  # Paeth
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = cur - pred
        lines.append(ft)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
    return bytes(lines)


def _png_container(w: int, h: int, lines: bytes, interlace: int) -> bytes:
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(data: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters -> (h, stride) uint8 matrix."""
    return _png_unfilter_at(data, h, stride, bpp, 0)[0]


def _png_unfilter_at(
    data: bytes, h: int, stride: int, bpp: int, pos: int
) -> tuple[np.ndarray, int]:
    """_png_unfilter starting at byte `pos`, returning (matrix, end pos) -
    what Adam7 needs to walk the seven concatenated sub-images."""
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        if pos >= len(data):
            raise ValueError("truncated PNG scanlines")
        ft = data[pos]
        pos += 1
        if len(data) - pos < stride:
            raise ValueError("truncated PNG scanline")
        row = np.frombuffer(data, np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if ft == 0:
            out[y] = row
        elif ft == 2:
            out[y] = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    return out.astype(np.uint8), pos


# Adam7 pass layout: (x_start, y_start, x_step, y_step) per sub-image
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(buf: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from a PNG: color types 0 (gray, replicated),
    2 (RGB), 3 (palette via PLTE), 4 (gray+alpha, alpha dropped), 6 (RGBA,
    alpha dropped); all five scanline filters (stdlib zlib inflate +
    Sub/Up/Average/Paeth reconstruction); round 6 adds Adam7 interlace
    (seven independently filtered sub-images scattered back by the
    standard pass layout) and 16-bit depth (filters reversed at the byte
    level per the spec, then the high byte displayed, browser-style;
    16-bit palette is not a legal PNG combination and raises)."""
    import zlib

    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not PNG")
    pos, w, h, ctype, plte, idat = 8, None, None, None, None, bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if depth not in (8, 16) or (depth == 16 and ctype == 3):
                raise ValueError(f"unsupported PNG (depth={depth})")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace {interlace}")
            if ctype not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    nb = depth // 8  # bytes per sample; filters operate on BYTES
    bpp = channels * nb
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt deflate stream must not kill a task
        raise ValueError(f"corrupt PNG stream: {e}") from e
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full-size grid by the standard pass layout
        pix = np.zeros((h, w, bpp), np.uint8)
        pos = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = (w - xs + xst - 1) // xst
            ph = (h - ys + yst - 1) // yst
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _png_unfilter_at(raw, ph, pw * bpp, bpp, pos)
            pix[ys::yst, xs::xst] = sub.reshape(ph, pw, bpp)
    else:
        pix = _png_unfilter(raw, h, w * bpp, bpp).reshape(h, w, bpp)
    if depth == 16:
        # 16 -> 8 bit: the high byte (what browsers display); samples are
        # big-endian so it is byte 0 of each pair
        pix = np.ascontiguousarray(pix.reshape(h, w, channels, 2)[:, :, :, 0])
    if ctype == 2:
        return np.ascontiguousarray(pix)
    if ctype == 6:
        return np.ascontiguousarray(pix[:, :, :3])
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[pix.reshape(h, w)].copy()
    # gray (0) or gray+alpha (4): replicate luminance, drop alpha
    return np.repeat(pix[:, :, :1], 3, axis=2)


def _decode_media(payload: bytes, kind: str):
    """Dispatch: ('image', rgb) | ('audio', (rate, samples)) |
    ('video', [rgb, ...]) for parseable payloads; raises ValueError
    otherwise.  PNG and baseline JPEG are REAL decoders (core/jpeg.py);
    a production MP3/MP4 decoder plugs in HERE."""
    if payload[:8] == _PNG_SIG:
        return "image", decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from boilerplate_buster_spark.core.jpeg import decode_jpeg, split_mjpeg

        parts = split_mjpeg(payload)
        if kind == "video" or len(parts) > 1:
            # MJPEG-style concatenated-JPEG stream
            return "video", [decode_jpeg(p) for p in parts]
        return "image", decode_jpeg(parts[0])
    if payload[:2] == b"BM":
        return "image", decode_bmp(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        frames = decode_gif_frames(payload)
        if kind == "video" or len(frames) > 1:
            return "video", frames
        return "image", frames[0]
    if payload[:2] == b"P6":
        frames = decode_ppm_stream(payload)
        if kind == "video" or len(frames) > 1:
            return "video", frames
        return "image", frames[0]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)
    raise ValueError("no supported container")


def decode_bytes(payload: bytes, kind: str) -> list[float]:
    """8-dim feature vector.

    REAL path (payload parses as BMP/P6/P6-stream/WAV): integer-exact content
    statistics of the decoded pixels/samples -
      image: [w, h, sum_r, sum_g, sum_b, min_r, max_r, n_pixels]
      audio: [n_samples, rate, sum, min, max, first]  (+2 zero pads)
      video: [n_frames, w, h, sum_rgb, min_rgb, max_rgb, n_values]  (+1 pad)
    All values are integers well inside float32's 2^24 exact range at
    supported sizes, so the DuckDB oracle recomputes them bit-exactly.

    STUB fallback (anything else, e.g. plain text bytes OR a payload that
    starts like a supported container but is malformed - truncated GIF
    sub-blocks, empty WAV data chunk, a P6 stream with varying frame sizes):
    deterministic 8-dim sha256-derived vector - the documented stand-in for
    compressed formats until a production decoder is added to _decode_media.
    The ENTIRE decode + statistic computation sits inside the fallback's
    try (and IndexError is caught alongside ValueError/struct.error, the
    escape a truncated GIF's sub-block walk takes): one malformed record
    must degrade to the stub, never kill the Spark job."""
    try:
        what, obj = _decode_media(payload, kind)
        if what == "image":
            rgb = obj.astype(np.int64)
            h, w = obj.shape[0], obj.shape[1]
            r = rgb[:, :, 0]
            return [
                float(w), float(h),
                float(r.sum()), float(rgb[:, :, 1].sum()), float(rgb[:, :, 2].sum()),
                float(r.min()), float(r.max()), float(w * h),
            ]
        if what == "audio":
            rate, s = obj
            s64 = s.astype(np.int64)
            if len(s64) == 0:  # legal WAV, zero-length data chunk
                return [0.0, float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
            return [
                float(len(s)), float(rate), float(s64.sum()),
                float(s64.min()), float(s64.max()),
                float(s64[0]), 0.0, 0.0,
            ]
        frames = obj
        # np.stack raises ValueError on varying frame sizes -> stub fallback
        all_px = np.stack(frames).astype(np.int64)
        h, w = frames[0].shape[0], frames[0].shape[1]
        return [
            float(len(frames)), float(w), float(h),
            float(all_px.sum()), float(all_px.min()), float(all_px.max()),
            float(all_px.size), 0.0,
        ]
    except (ValueError, struct.error, IndexError, KeyError, zlib.error):
        digest = hashlib.sha256(kind.encode() + payload).digest()
        return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                feats.append(decode_bytes(raw, kind))
                hashes.append(hashlib.md5(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def nearest_resize(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """True nearest-neighbor resample: output pixel (X, Y) reads source pixel
    (floor(X*w/W), floor(Y*h/H)) - the standard point-sampling map, exactly
    reproducible in SQL for the oracle.  Pure numpy fancy indexing."""
    h, w = rgb.shape[0], rgb.shape[1]
    xs = (np.arange(width) * w) // width
    ys = (np.arange(height) * h) // height
    return rgb[ys][:, xs]


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize for undecodable payloads: deterministic
    width*height-byte pseudo-pixel buffer from the payload digest; the Arrow
    batching, schema and row-count contract around it are real."""
    digest = hashlib.sha256(payload).digest()
    need = width * height
    return (digest * (need // len(digest) + 1))[:need]


def resize_one(payload: bytes, width: int, height: int) -> bytes:
    """REAL path when the payload decodes (BMP or single-frame P6): decode ->
    nearest-neighbor resize -> re-encode as P6.  STUB fallback otherwise."""
    try:
        what, obj = _decode_media(payload, "image")
        if what != "image":
            raise ValueError("not a still image")
    except (ValueError, struct.error, IndexError, KeyError, zlib.error):
        return resize_stub(payload, width, height)
    return encode_ppm(nearest_resize(obj, width, height))


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Arrow-batched image resize over opaque payloads (kind='image' rows
    only; the filter stays JVM-side so audio/video rows never enter Python).
    Decodable payloads (BMP/P6) take the REAL pixel path (nearest-neighbor,
    P6 output); others keep the digest stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_one(bytes(p) if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, fps: int = 25) -> DataFrame:
    """Arrow-batched video frame sampling: each video row EXPANDS to
    n_frames rows (one-to-many mapInPandas, per-frame timestamps).

    REAL path - payloads that parse as a concatenated-P6 frame stream: the
    stream is decoded, frame k of the sample reads source frame
    floor(k * n_src / n_frames) (uniform point sampling over the real frame
    list; repeats when the clip is shorter than the sample), emitted
    re-encoded as P6 with frame_ts_ms = src_idx * 1000 / fps.  STUB fallback
    for undecodable payloads: sha256-derived frame bytes and a
    size-proportional fake duration, kept so the shape works over arbitrary
    binaries until an ffmpeg-backed decoder joins _decode_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                try:
                    if raw[:2] == b"\xff\xd8":
                        from boilerplate_buster_spark.core.jpeg import (
                            decode_jpeg,
                            split_mjpeg,
                        )

                        src = [decode_jpeg(p) for p in split_mjpeg(raw)]
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        src = decode_gif_frames(raw)
                    else:
                        src = decode_ppm_stream(raw)
                    if not src or len({f.shape for f in src}) != 1:
                        src = None
                except (ValueError, struct.error, IndexError, KeyError, zlib.error):
                    src = None
                if src is not None:
                    for i in range(n_frames):
                        j = (i * len(src)) // n_frames
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(j * 1000 // fps)
                        frames.append(encode_ppm(src[j]))
                    continue
                # hex-string hash domain: keeps the stub SQL-expressible for
                # the DuckDB oracle (its sha256 is VARCHAR-only)
                base_hex = hashlib.sha256(raw).hexdigest()
                # stub duration: 1 second of synthetic video per KiB
                dur_ms = max(1000, (len(raw) // 1024) * 1000)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * dur_ms // max(n_frames, 1))
                    frames.append(
                        hashlib.sha256(f"{base_hex}:{i}".encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame": frames,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def synth_media_payload(i: int) -> tuple[str, bytes]:
    """Deterministic REAL-format payload for integer id `i` (closed form -
    every decoded statistic is recomputable in plain SQL, see the oracle
    entries in __spark_entry__):

      i % 3 == 0 -> image, BMP when i is even / binary P6 when odd;
                    w = 8 + i%5, h = 6 + i%4 (w=9,11 exercise BMP row pad);
                    channel c of linear pixel p: (i*31 + p*7 + c*11) % 256
      i % 3 == 1 -> audio, WAV PCM16 mono; rate = 8000 + (i%5)*1000,
                    n = 256 + i%100; s[k] = ((i*77 + k*123) % 65536) - 32768
      i % 3 == 2 -> video, concatenated P6; F = 3 + i%4 frames of
                    w = 4 + i%3, h = 3 + i%3; channel c of pixel p in frame
                    f: (i*31 + f*17 + p*7 + c*11) % 256
    """
    m = i % 3
    if m == 0:
        w, h = 8 + i % 5, 6 + i % 4
        p = np.arange(w * h, dtype=np.int64)
        rgb = np.stack(
            [((i * 31 + p * 7 + c * 11) % 256).astype(np.uint8).reshape(h, w)
             for c in range(3)],
            axis=-1,
        )
        return "image", (encode_bmp(rgb) if i % 2 == 0 else encode_ppm(rgb))
    if m == 1:
        n, rate = 256 + i % 100, 8000 + (i % 5) * 1000
        k = np.arange(n, dtype=np.int64)
        s = ((i * 77 + k * 123) % 65536 - 32768).astype(np.int16)
        return "audio", encode_wav(rate, s)
    n_f, w, h = 3 + i % 4, 4 + i % 3, 3 + i % 3
    p = np.arange(w * h, dtype=np.int64)
    frames = []
    for f in range(n_f):
        rgb = np.stack(
            [((i * 31 + f * 17 + p * 7 + c * 11) % 256)
             .astype(np.uint8).reshape(h, w) for c in range(3)],
            axis=-1,
        )
        frames.append(encode_ppm(rgb))
    return "video", b"".join(frames)


def synthetic_media_df(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """MEDIA_SCHEMA frame of real BMP/P6/WAV/P6-stream payloads generated
    cluster-side (Arrow batches; nothing materializes on the driver) from an
    id column - the seeded corpus the real-decode contract queries and
    goldens run on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, payloads = [], []
            for i in pdf[id_col]:
                kind, pay = synth_media_payload(int(i))
                kinds.append(kind)
                payloads.append(pay)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": kinds,
                    "payload": payloads,
                    "meta": [None] * len(kinds),
                }
            )

    return ids.select(F.col(id_col).alias(id_col)).mapInPandas(run, MEDIA_SCHEMA)


def image_stats(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id",
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Integer pixel statistics of a decodable image column (BMP/P6) - the
    scalar surface the oracle pins the REAL pixel path with.  `passthrough`
    integer columns (e.g. frame_idx) are copied to the output unchanged."""
    fields = [T.StructField(id_col, T.LongType(), False)]
    fields += [T.StructField(c, T.IntegerType(), False) for c in passthrough]
    fields += [
        T.StructField("img_w", T.IntegerType(), False),
        T.StructField("img_h", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
    schema = T.StructType(fields)
    cols = [id_col, *passthrough, "img_w", "img_h", "sum_r", "sum_g", "sum_b"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                what, rgb = _decode_media(bytes(rec[payload_col]), "image")
                if what != "image":
                    raise ValueError("image_stats: payload is not a still image")
                s = rgb.astype(np.int64)
                rows.append(
                    (int(rec[id_col]), *(int(rec[c]) for c in passthrough),
                     rgb.shape[1], rgb.shape[0],
                     int(s[:, :, 0].sum()), int(s[:, :, 1].sum()),
                     int(s[:, :, 2].sum()))
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema)


def dhash_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, dhash_hi, dhash_lo): 64-bit perceptual difference hash
    (dHash - the standard near-duplicate-image fingerprint) of each
    decodable still image, packed as TWO 32-bit halves so every value is
    int64-safe in every engine (a single 64-bit pack would set the sign
    bit).  REAL pixels, never stubbed: raises on undecodable payloads,
    same contract as image_stats.

    Per image: decode -> integer luma (299r + 587g + 114b) div 1000 ->
    9x8 nearest-neighbor resample (the same point-sampling map as
    nearest_resize, so the oracle reproduces it in closed form) ->
    bit(y, x) = luma[y, x] < luma[y, x+1] -> hi packs rows 0-3 LSB-first
    at bit index y*8+x, lo packs rows 4-7 at (y-4)*8+x.

    Arrow-batched mapInPandas, no shuffle - at 100 TB this pipelines with
    the media scan like every other decode stage in this module."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash_hi", T.LongType(), False),
            T.StructField("dhash_lo", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                what, rgb = _decode_media(bytes(rec[payload_col]), "image")
                if what != "image":
                    raise ValueError("dhash_images: payload is not a still image")
                s = rgb.astype(np.int64)
                lum = (299 * s[:, :, 0] + 587 * s[:, :, 1] + 114 * s[:, :, 2]) // 1000
                g = nearest_resize(lum, 9, 8)
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64)
                hi = int(
                    sum(int(bits[y, x]) << (y * 8 + x) for y in range(4) for x in range(8))
                )
                lo = int(
                    sum(int(bits[y, x]) << ((y - 4) * 8 + x) for y in range(4, 8) for x in range(8))
                )
                rows.append((int(rec[id_col]), hi, lo))
            yield pd.DataFrame(rows, columns=[id_col, "dhash_hi", "dhash_lo"])

    return df.mapInPandas(run, schema)


def dhash_candidate_pairs(
    hashes: DataFrame,
    max_hamming: int = 8,
    id_col: str = "media_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming): near-duplicate IMAGE pairs from a dhash table
    - 16-bit band blocking (4 bands over the 64 hash bits; by pigeonhole a
    pair within hamming <= 3 ALWAYS shares a band, larger radii trade
    recall for pruning exactly like MinHash-LSH banding) followed by an
    exact Hamming verify (bit_count of xor, pure expressions).

    Same no-self-join shape as dedup.lsh_candidate_pairs: ONE shuffle on
    (band, val), members collected sorted, pairs expanded in-array, then
    distinct; `max_bucket` guards the pathological all-identical bucket.
    A 30-image sf0.001 corpus prunes ~2/3 of all-pairs; at crawl scale the
    bucket join is what makes this feasible at all (all-pairs is O(n^2))."""
    bands = hashes.select(
        F.col(id_col),
        "dhash_hi",
        "dhash_lo",
        F.explode(
            F.expr(
                "array(named_struct('band', 0, 'val', dhash_hi & 65535),"
                "      named_struct('band', 1, 'val', shiftright(dhash_hi, 16) & 65535),"
                "      named_struct('band', 2, 'val', dhash_lo & 65535),"
                "      named_struct('band', 3, 'val', shiftright(dhash_lo, 16) & 65535))"
            )
        ).alias("bv"),
    ).select(id_col, "dhash_hi", "dhash_lo", "bv.band", "bv.val")
    grouped = bands.groupBy("band", "val").agg(
        F.expr(
            f"array_sort(collect_set(struct({id_col} AS id, "
            "dhash_hi AS hi, dhash_lo AS lo)))"
        ).alias("ms")
    )
    if max_bucket is not None:
        grouped = grouped.filter(F.size("ms") <= max_bucket)
    pairs = grouped.filter(F.size("ms") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms)), y -> "
                "named_struct('id_a', x.id, 'id_b', y.id, "
                "'hamming', bit_count(x.hi ^ y.hi) + bit_count(x.lo ^ y.lo)))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.id_a", "p.id_b", F.col("p.hamming").cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_patches(
    df: DataFrame,
    patch: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, patch_row, patch_col, ph, pw, sum_r, sum_g, sum_b):
    non-overlapping `patch` x `patch` tiling of each decodable image -
    the ViT/CLIP preprocessing shape (patch grid -> per-patch features),
    with integer channel sums as the exact feature surface (means are
    caller-side divisions).  Edge patches run short (ph/pw carry the
    actual tile geometry); REAL pixels, raises on undecodable payloads
    like image_stats.

    Arrow-batched mapInPandas, one-to-many (one row per patch), no
    shuffle - patch extraction pipelines with the media scan, and the
    per-patch rows are what a downstream embedding UDF batches over."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("patch_row", T.IntegerType(), False),
            T.StructField("patch_col", T.IntegerType(), False),
            T.StructField("ph", T.IntegerType(), False),
            T.StructField("pw", T.IntegerType(), False),
            T.StructField("sum_r", T.LongType(), False),
            T.StructField("sum_g", T.LongType(), False),
            T.StructField("sum_b", T.LongType(), False),
        ]
    )
    p = int(patch)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                what, rgb = _decode_media(bytes(rec[payload_col]), "image")
                if what != "image":
                    raise ValueError("image_patches: payload is not a still image")
                s = rgb.astype(np.int64)
                h, w = s.shape[0], s.shape[1]
                mid = int(rec[id_col])
                for pr in range((h + p - 1) // p):
                    for pc in range((w + p - 1) // p):
                        tile = s[pr * p : (pr + 1) * p, pc * p : (pc + 1) * p]
                        rows.append(
                            (
                                mid, pr, pc,
                                tile.shape[0], tile.shape[1],
                                int(tile[:, :, 0].sum()),
                                int(tile[:, :, 1].sum()),
                                int(tile[:, :, 2].sum()),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "patch_row", "patch_col", "ph", "pw",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.mapInPandas(run, schema)


def frame_diffs(
    media: DataFrame,
    cut_mad_e3: int = 20000,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, frame_idx, sad, mad_e3, is_cut): scene-change detection
    over decodable video streams - per consecutive-frame pair, the sum of
    absolute pixel differences (SAD, all channels), its per-value mean in
    exact integer millis (mad_e3 = sad*1000 div (w*h*3)), and the cut flag
    mad_e3 >= cut_mad_e3 (default 20.0/255 mean step - tune per corpus).
    Frame 0 anchors the stream: sad = mad_e3 = 0, is_cut = false.
    Raises on non-video payloads (same strictness as image_stats); frames
    of differing sizes raise too - a REAL stream keeps one geometry.

    Arrow-batched mapInPandas, one-to-many (one row per frame), no
    shuffle: at 100 TB the decode+diff pipelines with the media scan."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("sad", T.LongType(), False),
            T.StructField("mad_e3", T.LongType(), False),
            T.StructField("is_cut", T.BooleanType(), False),
        ]
    )
    thr = int(cut_mad_e3)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                what, frames = _decode_media(bytes(rec[payload_col]), "video")
                if what != "video":
                    raise ValueError("frame_diffs: payload is not a video stream")
                if len({f.shape for f in frames}) > 1:
                    raise ValueError("frame_diffs: inconsistent frame geometry")
                mid = int(rec[id_col])
                nvals = frames[0].size
                prev = None
                for idx, fr in enumerate(frames):
                    cur = fr.astype(np.int64)
                    sad = 0 if prev is None else int(np.abs(cur - prev).sum())
                    mad = (sad * 1000) // nvals
                    rows.append((mid, idx, sad, mad, mad >= thr and idx > 0))
                    prev = cur
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "sad", "mad_e3", "is_cut"]
            )

    return media.mapInPandas(run, schema)


def audio_windows(
    media: DataFrame,
    win: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, win_idx, n_samples, sum_abs, sum_sq, zero_crossings):
    fixed-size window analysis of decodable audio - per window of `win`
    samples (last window may run short), the integer energy surface
    (sum |s|, sum s^2; RMS = sqrt(sum_sq/n) stays caller-side - roots are
    not cross-engine stable) and the zero-crossing count (sign flips
    between consecutive samples WITHIN the window; sign(s) = s < 0, so 0
    counts as non-negative).  int64-safe: s^2 <= 2^30, so ~2^33 samples
    per window before overflow.  Raises on non-audio payloads.

    Arrow-batched mapInPandas, one-to-many (one row per window), no
    shuffle - the same 100-TB posture as every decode stage here."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("win_idx", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("sum_abs", T.LongType(), False),
            T.StructField("sum_sq", T.LongType(), False),
            T.StructField("zero_crossings", T.IntegerType(), False),
        ]
    )
    w = int(win)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                what, decoded = _decode_media(bytes(rec[payload_col]), "audio")
                if what != "audio":
                    raise ValueError("audio_windows: payload is not audio")
                _, samples = decoded
                s = samples.astype(np.int64)
                mid = int(rec[id_col])
                for wi in range(0, (len(s) + w - 1) // w):
                    seg = s[wi * w : (wi + 1) * w]
                    neg = seg < 0
                    rows.append(
                        (
                            mid,
                            wi,
                            len(seg),
                            int(np.abs(seg).sum()),
                            int((seg * seg).sum()),
                            int((neg[1:] != neg[:-1]).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "win_idx", "n_samples",
                    "sum_abs", "sum_sq", "zero_crossings",
                ],
            )

    return media.mapInPandas(run, schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/bench: treat the documents table's text bytes as an
    opaque payload (the driver testdata ships no real media files)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr("element_at(array('image','audio','video'), cast(pmod(doc_id, 3) AS int) + 1)").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
