"""Baseline JPEG codec: constant-block q100 EXACT round trip (the oracle
property), smooth-image error bounds across 4:4:4 / 4:2:0 / restart
markers, grayscale single-component decode, honest boundaries
(progressive/12-bit refused), and the multimodal dispatch integration."""

import struct

import numpy as np
import pytest

from boilerplate_buster_spark.core import jpeg
from boilerplate_buster_spark.operators import multimodal as mm


def _const_block_img(rng, bx, by):
    blocks = rng.randint(0, 256, (by, bx, 3)).astype(np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)


def test_constant_blocks_quality100_exact():
    rng = np.random.RandomState(3)
    for shape in [(1, 1), (2, 2), (3, 5)]:
        img = _const_block_img(rng, *shape)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
        assert (dec == img).all(), shape


def test_smooth_error_bounds_all_paths():
    xs = np.arange(48)[None, :]
    ys = np.arange(32)[:, None]
    img = np.stack(
        [(xs * 3 + ys * 2) % 256, ((xs + ys) % 256) // 2 + 60,
         np.full((32, 48), 77)],
        axis=2,
    ).astype(np.uint8)
    for sub in (False, True):
        for ri in (0, 2):
            dec = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, quality=92, subsample=sub,
                                 restart_interval=ri)
            )
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int)).max()
            assert err <= 8, (sub, ri, err)


def test_odd_sizes_and_edge_padding():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (17, 19, 3)).astype(np.uint8)
    for sub in (False, True):
        dec = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=90, subsample=sub, restart_interval=1)
        )
        assert dec.shape == img.shape


def test_grayscale_single_component():
    # hand-assemble a 1-component baseline JPEG from the module's own
    # primitives; decoder must replicate gray into RGB
    gray = np.full((8, 8), 200.0) - 128.0
    qlum, _ = jpeg._quality_tables(100)
    bw = jpeg._BitWriter()
    jpeg._encode_block(bw, gray, qlum.reshape(8, 8),
                       jpeg._build_codes(*jpeg._STD_DC_LUM),
                       jpeg._build_codes(*jpeg._STD_AC_LUM), 0)
    scan = bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    buf = bytearray(b"\xff\xd8")
    buf += seg(0xFFDB, b"\x00" + bytes(int(v) for v in qlum[jpeg._ZIGZAG]))
    buf += seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0))
    for tc_th, (bits, vals) in (((0, 0), jpeg._STD_DC_LUM), ((1, 0), jpeg._STD_AC_LUM)):
        tc, th = tc_th
        buf += seg(0xFFC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    buf += seg(0xFFDA, struct.pack(">B", 1) + struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00")
    buf += scan + b"\xff\xd9"
    dec = jpeg.decode_jpeg(bytes(buf))
    assert dec.shape == (8, 8, 3)
    assert (dec == 200).all()


def test_honest_boundaries():
    rng = np.random.RandomState(5)
    img = _const_block_img(rng, 2, 2)
    enc = bytearray(jpeg.encode_jpeg(img, quality=90))
    # flip SOF0 -> SOF7 (hierarchical): must refuse, not garble.  (SOF2 is
    # no longer refused - the progressive decoder is real since round 5 -
    # but a baseline full-band scan under an SOF2 header is still malformed
    # and must raise, not garble.)
    sof_at = bytes(enc).find(b"\xff\xc0")
    enc[sof_at + 1] = 0xC7
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(enc))
    enc[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")


def test_dispatch_and_stub_fallback():
    rng = np.random.RandomState(6)
    img = _const_block_img(rng, 2, 2)  # 16x16
    enc = jpeg.encode_jpeg(img, quality=100)
    v = mm.decode_bytes(enc, "image")
    assert v[0] == 16.0 and v[1] == 16.0 and v[7] == 256.0
    assert v[2] == float(img[:, :, 0].sum())
    assert v[5] == float(img[:, :, 0].min()) and v[6] == float(img[:, :, 0].max())
    # truncated payload degrades to the deterministic stub, not a crash
    assert len(mm.decode_bytes(enc[:40], "image")) == mm.FEATURE_DIM
    # resize takes the real path
    assert mm.resize_one(enc, 4, 4)[:2] == b"P6"


def test_mjpeg_stream_video_path():
    rng = np.random.RandomState(7)
    frames = [_const_block_img(rng, 2, 2) for _ in range(3)]
    stream = b"".join(jpeg.encode_jpeg(f, quality=100) for f in frames)
    parts = jpeg.split_mjpeg(stream)
    assert len(parts) == 3
    for p, f in zip(parts, frames):
        assert (jpeg.decode_jpeg(p) == f).all()
    # dispatch: video kind decodes all frames; stats exact at q100
    v = mm.decode_bytes(stream, "video")
    all_px = np.stack(frames).astype(np.int64)
    assert v[0] == 3.0 and v[1] == 16.0 and v[2] == 16.0
    assert v[3] == float(all_px.sum()) and v[6] == float(all_px.size)
    # frame sampling takes the real path (P6-encoded output frames)
    import pandas as pd  # noqa: F401  (spark fixture not needed here)


def test_mjpeg_sample_frames_spark(spark):
    rng = np.random.RandomState(8)
    frames = [_const_block_img(rng, 2, 2) for _ in range(4)]
    stream = b"".join(jpeg.encode_jpeg(f, quality=100) for f in frames)
    media = spark.createDataFrame(
        [(7, "video", bytearray(stream))],
        "media_id long, kind string, payload binary",
    )
    rows = sorted(
        mm.sample_frames(media, n_frames=2, fps=10).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1]
    # frame k reads source frame floor(k*4/2) = 0, 2; re-encoded as P6
    assert (mm.decode_ppm(bytes(rows[0]["frame"])) == frames[0]).all()
    assert (mm.decode_ppm(bytes(rows[1]["frame"])) == frames[2]).all()
    assert rows[1]["frame_ts_ms"] == 2 * 1000 // 10


def test_decoder_fuzz_never_crashes():
    """Any byte soup behind a valid magic number must reach the stub (or
    decode), never raise out of decode_bytes - the Spark job survives
    malformed real-world media."""
    rng = np.random.RandomState(9)
    magics = [b"\xff\xd8", mm._PNG_SIG, b"BM", b"GIF87a", b"GIF89a",
              b"P6 ", b"RIFF", b""]
    for _ in range(120):
        magic = magics[rng.randint(len(magics))]
        body = bytes(rng.randint(0, 256, rng.randint(0, 200), dtype=np.uint8).tolist())
        for kind in ("image", "video", "audio"):
            v = mm.decode_bytes(magic + body, kind)
            assert len(v) == mm.FEATURE_DIM


def test_fill_bytes_and_standalone_markers_in_header():
    # 0xFF fill bytes before a marker and a standalone TEM (0xFF01) between
    # segments are legal per T.81 B.1.1.2 - the decoder must step over them
    rng = np.random.RandomState(7)
    img = _const_block_img(rng, 2, 2)
    enc = jpeg.encode_jpeg(img, quality=100)
    # inject after SOI: two fill bytes + TEM before the first APP0 marker
    patched = enc[:2] + b"\xff\x01" + b"\xff" + enc[2:]
    out = jpeg.decode_jpeg(patched)
    assert np.array_equal(out, jpeg.decode_jpeg(enc))
    assert jpeg.jpeg_end(patched) == len(patched)


def test_inconsistent_component_count_refused():
    # an SOF claiming 4 components while carrying specs for 3 is truncated
    # garbage - must raise, never decode through a wrong color path
    rng = np.random.RandomState(8)
    img = _const_block_img(rng, 2, 2)
    enc = bytearray(jpeg.encode_jpeg(img, quality=90))
    sof_at = bytes(enc).find(b"\xff\xc0")
    assert enc[sof_at + 9] == 3  # component count byte
    enc[sof_at + 9] = 4
    with pytest.raises(ValueError, match="truncated SOF"):
        jpeg.decode_jpeg(bytes(enc))


def test_progressive_roundtrip_exact_and_matches_baseline():
    rng = np.random.RandomState(21)
    # constant blocks at q100: the full progressive pipeline (DC first+
    # refine, AC first+refine over both spectral bands, EOBRUN) must be
    # BIT-EXACT, same property the baseline oracle uses
    img = _const_block_img(rng, 3, 4)
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, quality=100)), img
    )
    # same quantized coefficients as baseline -> identical decoded pixels,
    # at every quality/subsampling combination
    img2 = rng.randint(0, 256, (37, 45, 3)).astype(np.uint8)
    for q in (90, 75):
        for ss in (False, True):
            prog = jpeg.decode_jpeg(
                jpeg.encode_jpeg_progressive(img2, quality=q, subsample=ss)
            )
            base = jpeg.decode_jpeg(jpeg.encode_jpeg(img2, quality=q, subsample=ss))
            assert np.array_equal(prog, base), (q, ss)


def test_progressive_eobrun_and_zrl_paths():
    # smooth gradients produce long EOB runs; sparse impulses produce ZRL +
    # scattered refinement bits - both must match the baseline decode
    xs, ys = np.meshgrid(np.arange(64), np.arange(48))
    smooth = np.stack(
        [(xs * 2) % 256, (ys * 3) % 256, (xs + ys) % 256], axis=2
    ).astype(np.uint8)
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(smooth, quality=85)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=85)),
    )
    sp = np.zeros((40, 40, 3), np.uint8)
    sp[::7, ::5] = 255
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(sp, quality=60, subsample=True)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(sp, quality=60, subsample=True)),
    )


def test_progressive_dispatches_to_real_decoder():
    # the multimodal feature path must now take the REAL decode for
    # progressive payloads (round-4 verdict: majority of web JPEGs are SOF2)
    rng = np.random.RandomState(22)
    img = _const_block_img(rng, 2, 2)
    enc = jpeg.encode_jpeg_progressive(img, quality=100)
    v = mm.decode_bytes(enc, "image")
    assert v[0] == 16.0 and v[1] == 16.0
    assert v[2] == float(img[:, :, 0].sum())


def test_411_and_422_subsampling_roundtrip():
    # round-6 honest-subset widening: 4:2:2 and 4:1:1 (sampling factor 4)
    # decode through the same general MCU loop; constant-block images stay
    # exact at quality 100 (chroma mean-pooling over a constant is the
    # identity)
    rng = np.random.RandomState(9)
    # constant tiles must span a full CHROMA block: 4:1:1 chroma covers 32
    # image px in x, so 8-row x 32-col tiles keep every DCT block constant
    blocks = rng.randint(0, 256, (4, 2, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 32, axis=1)  # 32x64
    for mode in ("422", "411"):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, subsample=mode))
        assert np.array_equal(out, img), mode
    # smooth content stays within lossy bounds at web quality
    base = rng.randint(0, 255, (3, 4, 3)).astype(np.float64)
    smooth = np.kron(base, np.ones((16, 16, 1)))[:45, :61].astype(np.uint8)
    for mode in ("422", "411"):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=90, subsample=mode))
        assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 24, mode


def test_nonint_sampling_ratio_refused():
    # 3x2 luma over 2x1 chroma needs a 1.5x upsample - the INTEGER-RATIO
    # guard must refuse at SOF parse (factors 1-4 are each individually
    # legal per T.81, so only the ratio check can catch this); a factor
    # outside 1-4 refuses via the range check
    rng = np.random.RandomState(10)
    img = _const_block_img(rng, 2, 2)
    buf = bytearray(jpeg.encode_jpeg(img, subsample="420"))
    i = buf.find(b"\xff\xc0")
    # SOF0 payload = P(1) H(2) W(2) Nc(1), then per-comp (id, samp, tq):
    # comp0 sampling byte at +7, comp1's at +10
    samp_off = i + 4 + 6 + 1
    assert buf[samp_off] == 0x22
    buf[samp_off] = 0x32      # Y 3x2
    buf[samp_off + 3] = 0x21  # Cb 2x1 -> hmax 3 over 2 = 1.5
    with pytest.raises(ValueError, match="ratio"):
        jpeg.decode_jpeg(bytes(buf))
    buf[samp_off] = 0x52      # factor 5 is outside T.81's 1-4
    with pytest.raises(ValueError, match="sampling 5x2"):
        jpeg.decode_jpeg(bytes(buf))


def test_exif_orientation_honored_and_optional():
    # round-6: Orientation 1-8 applied like a browser; raw array still
    # reachable; malformed EXIF never fails the decode
    rng = np.random.RandomState(11)
    img = _const_block_img(rng, 3, 5)  # non-square so transposes are visible
    raw_ref = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    cases = {
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1, :],
        5: lambda a: a.transpose(1, 0, 2),
        6: lambda a: a.transpose(1, 0, 2)[:, ::-1],
        7: lambda a: a.transpose(1, 0, 2)[::-1, ::-1],
        8: lambda a: a.transpose(1, 0, 2)[::-1, :],
    }
    for o, fn in cases.items():
        enc = jpeg.encode_jpeg(img, quality=100, orientation=o)
        assert np.array_equal(jpeg.decode_jpeg(enc), fn(raw_ref)), o
        assert np.array_equal(
            jpeg.decode_jpeg(enc, apply_orientation=False), raw_ref
        ), o
    # big-endian TIFF variant is parsed too
    seg = jpeg.exif_app1_segment(3)
    be = b"Exif\x00\x00MM\x00\x2a\x00\x00\x00\x08\x00\x01" + bytes.fromhex(
        "0112" "0003" "00000001" "0003" "0000"
    ) + b"\x00\x00\x00\x00"
    import struct as _s

    plain = jpeg.encode_jpeg(img, quality=100)
    spliced = plain[:2] + _s.pack(">HH", 0xFFE1, len(be) + 2) + be + plain[2:]
    assert np.array_equal(jpeg.decode_jpeg(spliced), raw_ref[::-1, ::-1])
    # truncated/garbage APP1 payloads are ignored, not fatal
    for junk in (b"Exif\x00\x00XX", b"Exif\x00\x00II\x2a\x00\xff\xff\xff\xff", b"nope"):
        spl = plain[:2] + _s.pack(">HH", 0xFFE1, len(junk) + 2) + junk + plain[2:]
        assert np.array_equal(jpeg.decode_jpeg(spl), raw_ref)


def _const_cmyk(rng, by, bx):
    blocks = rng.randint(0, 256, (by, bx, 4)).astype(np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)


def test_cmyk_decode_closed_form():
    # round-6: 4-component Adobe CMYK (stored inverted) at quality=100 with
    # constant 8x8 blocks decodes to EXACTLY round(stored_c*k/255) per
    # channel - same closed-form-oracle property as the RGB path
    rng = np.random.RandomState(30)
    cmyk = _const_cmyk(rng, 3, 4)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_cmyk(cmyk, quality=100, transform=0))
    f = cmyk.astype(np.float64)
    want = np.clip(
        np.round(np.stack([f[:, :, 0], f[:, :, 1], f[:, :, 2]], axis=2)
                 * f[:, :, 3:4] / 255.0), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def test_ycck_decode_matches_cmyk():
    # YCCK is CMYK routed through the YCbCr transform: same image encoded
    # both ways must decode to (nearly) the same RGB; the transform's
    # float rounding bounds the difference at quality=100
    rng = np.random.RandomState(31)
    cmyk = _const_cmyk(rng, 2, 3)
    a = jpeg.decode_jpeg(jpeg.encode_jpeg_cmyk(cmyk, quality=100, transform=0))
    b = jpeg.decode_jpeg(jpeg.encode_jpeg_cmyk(cmyk, quality=100, transform=2))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_adobe_rgb_three_component():
    # APP14 transform=0 with 3 components = planes are straight RGB (the
    # Photoshop "RGB JPEG" case): splicing the marker into a standard
    # YCbCr encode must yield the RAW planes, not the YCbCr inverse
    rng = np.random.RandomState(32)
    img = _const_block_img(rng, 2, 2)
    enc = jpeg.encode_jpeg(img, quality=100)
    seg = jpeg.adobe_app14_segment(0)
    spliced = enc[:2] + struct.pack(">HH", 0xFFEE, len(seg) + 2) + seg + enc[2:]
    out = jpeg.decode_jpeg(spliced)
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    want = np.stack([y, cb, cr], axis=2)
    # quality=100 constant blocks: DC rounds to nearest 1/8, so the decoded
    # raw planes sit within 1 of the forward-transform values
    assert np.abs(out.astype(np.float64) - want).max() <= 1.0
    # and transform=1 (plain YCbCr) must keep the standard interpretation
    seg1 = jpeg.adobe_app14_segment(1)
    spliced1 = enc[:2] + struct.pack(">HH", 0xFFEE, len(seg1) + 2) + seg1 + enc[2:]
    assert np.array_equal(jpeg.decode_jpeg(spliced1), jpeg.decode_jpeg(enc))


def test_cmyk_through_multimodal_dispatch():
    # the distributed decode path must take the REAL 4-component branch
    from boilerplate_buster_spark.operators import multimodal as mm

    rng = np.random.RandomState(33)
    cmyk = _const_cmyk(rng, 2, 2)
    enc = jpeg.encode_jpeg_cmyk(cmyk, quality=100, transform=0)
    v = mm.decode_bytes(enc, "image")
    f = cmyk.astype(np.float64)
    want = np.clip(np.round(f[:, :, 0] * f[:, :, 3] / 255.0), 0, 255)
    assert v[0] == 16.0 and v[1] == 16.0
    assert v[2] == float(want.sum())
