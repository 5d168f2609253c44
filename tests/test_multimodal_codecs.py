"""Real media codecs (BMP / binary P6 / WAV PCM16 / concatenated-P6 video):
roundtrips, spec-layout golden bytes (encoder and decoder can't share a bug
against a hand-written byte literal), resize semantics vs a naive loop, frame
sampling vs the closed-form index map, and the stub fallback contract."""

from __future__ import annotations

import struct

import numpy as np

from boilerplate_buster_spark.operators import multimodal as mm


def _rand_rgb(rng, w, h):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_bmp_ppm_roundtrip_all_paddings():
    rng = np.random.RandomState(7)
    for w in range(1, 9):  # w*3 % 4 covers every BMP pad width 0..3
        for h in (1, 2, 5):
            rgb = _rand_rgb(rng, w, h)
            assert np.array_equal(mm.decode_bmp(mm.encode_bmp(rgb)), rgb)
            assert np.array_equal(mm.decode_ppm(mm.encode_ppm(rgb)), rgb)


def test_bmp_golden_bytes_bottom_up_bgr_pad():
    # hand-assembled per the BITMAPINFOHEADER spec: 2x2, 24bpp, rows
    # bottom-up, channels BGR, rows padded to 4 bytes (2*3=6 -> pad 2).
    # image (top-left origin): [[red, green], [blue, white]]
    bottom_row = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    top_row = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    raster = bottom_row + top_row  # file stores BOTTOM row first
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster),
                       0, 0, 0, 0)
    img = mm.decode_bmp(hdr + raster)
    assert img.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 255, 255]],
    ]
    # our encoder must reproduce those exact bytes
    assert mm.encode_bmp(img)[54:] == raster


def test_bmp_top_down_negative_height():
    rgb = _rand_rgb(np.random.RandomState(1), 3, 2)
    buf = bytearray(mm.encode_bmp(rgb))
    # flip to top-down: negate height, reorder rows
    struct.pack_into("<i", buf, 22, -2)
    stride = (3 * 3 + 3) & ~3
    r0, r1 = bytes(buf[54 : 54 + stride]), bytes(buf[54 + stride :])
    assert np.array_equal(mm.decode_bmp(bytes(buf[:54]) + r1 + r0), rgb)


def test_wav_golden_bytes_and_chunk_walk():
    # canonical 44-byte header golden: rate 8000, samples [0, 1, -1]
    want = (
        b"RIFF" + struct.pack("<I", 36 + 6) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 6)
        + b"\x00\x00\x01\x00\xff\xff"
    )
    assert mm.encode_wav(8000, np.array([0, 1, -1], np.int16)) == want
    rate, s = mm.decode_wav(want)
    assert rate == 8000 and s.tolist() == [0, 1, -1]
    # chunk walk: a LIST chunk (odd size -> word-align) between fmt and data
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    padded = want[:36] + extra + want[36:]
    rate2, s2 = mm.decode_wav(padded)
    assert rate2 == 8000 and s2.tolist() == [0, 1, -1]


def test_ppm_comments_and_stream():
    ppm = b"P6\n# c1\n 2 \t2\n#c2\n255\n" + bytes(range(12))
    img = mm.decode_ppm(ppm)
    assert img.shape == (2, 2, 3) and img.ravel().tolist() == list(range(12))
    rng = np.random.RandomState(3)
    frames = [_rand_rgb(rng, 4, 3) for _ in range(5)]
    dec = mm.decode_ppm_stream(b"".join(mm.encode_ppm(f) for f in frames))
    assert len(dec) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))


def test_decode_errors_fall_back_to_stub():
    for junk in (b"", b"BMxx", b"P6\n9 9\n255\nshort", b"RIFFxxxxWAVE",
                 b"plain document text"):
        feats = mm.decode_bytes(junk, "image")
        assert len(feats) == mm.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in feats)  # stub domain


def test_nearest_resize_matches_naive():
    rng = np.random.RandomState(11)
    rgb = _rand_rgb(rng, 9, 6)
    out = mm.nearest_resize(rgb, 5, 4)
    for Y in range(4):
        for X in range(5):
            assert (out[Y, X] == rgb[(Y * 6) // 4, (X * 9) // 5]).all()
    # upscale repeats pixels
    up = mm.nearest_resize(rgb[:1, :1], 3, 3)
    assert (up == rgb[0, 0]).all()


def test_synth_payload_features_match_formula():
    for i in range(15):
        kind, pay = mm.synth_media_payload(i)
        f = [int(v) for v in mm.decode_bytes(pay, kind)]
        if kind == "image":
            w, h = 8 + i % 5, 6 + i % 4
            sum_r = sum((i * 31 + p * 7) % 256 for p in range(w * h))
            assert f[:3] == [w, h, sum_r] and f[7] == w * h
        elif kind == "audio":
            n = 256 + i % 100
            s = [((i * 77 + k * 123) % 65536) - 32768 for k in range(n)]
            assert f == [n, 8000 + (i % 5) * 1000, sum(s), min(s), max(s),
                         s[0], 0, 0]
        else:
            nf, w, h = 3 + i % 4, 4 + i % 3, 3 + i % 3
            vals = [
                (i * 31 + fi * 17 + p * 7 + c * 11) % 256
                for fi in range(nf) for p in range(w * h) for c in range(3)
            ]
            assert f == [nf, w, h, sum(vals), min(vals), max(vals),
                         len(vals), 0]


def test_spark_real_paths_end_to_end(spark):
    ids = spark.range(0, 24).selectExpr("id AS media_id")
    media = mm.synthetic_media_df(ids)
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 24
    # REAL resize path: every image payload decodes and the output is a
    # valid P6 of the requested size with true nearest-neighbor pixels
    resized = mm.resize_images(media, width=5, height=4).collect()
    assert len(resized) == 8
    for r in resized:
        out = mm.decode_ppm(bytes(r["payload"]))
        src = mm._decode_media(bytes(rows[r["media_id"]]["payload"]), "image")[1]
        assert np.array_equal(out, mm.nearest_resize(src, 5, 4))
    # REAL frame sampling: frame k is source frame (k*nf)//4, ts = j*40ms
    frames = mm.sample_frames(media, n_frames=4, fps=25).collect()
    assert len(frames) == 32
    for r in frames:
        i = r["media_id"]
        nf = 3 + i % 4
        j = (r["frame_idx"] * nf) // 4
        assert r["frame_ts_ms"] == j * 1000 // 25
        src = mm.decode_ppm_stream(bytes(rows[i]["payload"]))
        assert np.array_equal(mm.decode_ppm(bytes(r["frame"])), src[j])


def test_image_stats_passthrough(spark):
    ids = spark.range(0, 9).selectExpr("id AS media_id")
    media = mm.synthetic_media_df(ids).filter("kind = 'image'")
    out = mm.image_stats(
        media.selectExpr("media_id", "CAST(7 AS INT) AS tag", "payload"),
        passthrough=("tag",),
    ).collect()
    assert len(out) == 3
    for r in out:
        i = r["media_id"]
        w, h = 8 + i % 5, 6 + i % 4
        assert r["tag"] == 7 and (r["img_w"], r["img_h"]) == (w, h)
        assert r["sum_r"] == sum((i * 31 + p * 7) % 256 for p in range(w * h))


import pytest

# ---------------------------------------------------------------- GIF / LZW

def test_gif_roundtrip_shapes_and_palettes():
    rng = np.random.default_rng(7)
    for shape, ncol in [((4, 5), 3), ((16, 16), 16), ((1, 1), 1), ((23, 31), 250)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, shape)]
        out = mm.decode_gif(mm.encode_gif(img))
        assert out.shape == img.shape and (out == img).all()


def test_gif_lzw_cscsc_and_dict_overflow():
    # 'ababab...' drives the decoder's code==len(table) (cScSc) case
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    img = pal[np.tile([0, 1], 500).reshape(20, 50)]
    assert (mm.decode_gif(mm.encode_gif(img)) == img).all()
    # 90k pixels overflow the 4096-entry table -> clear-and-reset path
    rng = np.random.default_rng(1)
    big = rng.integers(0, 256, (4, 3), dtype=np.uint8)[rng.integers(0, 4, (300, 300))]
    assert (mm.decode_gif(mm.encode_gif(big)) == big).all()


def test_gif_compresses():
    img = np.zeros((100, 100, 3), dtype=np.uint8)  # constant image
    assert len(mm.encode_gif(img)) < 400  # vs 30000 raw


def test_gif_89a_extension_skip_and_boundaries():
    img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    data = bytearray(mm.encode_gif(img))
    # splice a Graphic Control Extension after the header+GCT, flip to 89a
    data[:6] = b"GIF89a"
    gct_end = 13 + 2 * 3  # 1-bit palette -> 2 entries
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(data[:gct_end]) + ext + bytes(data[gct_end:])
    assert (mm.decode_gif(patched) == img).all()
    # >256 colors must be refused at encode
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError):
        mm.encode_gif(
            np.arange(300, dtype=np.int64).reshape(30, 10)[..., None]
            .repeat(3, axis=2).astype(np.uint8) + rng.integers(0, 2, (30, 10, 3), dtype=np.uint8) * 100
        )
    with pytest.raises(ValueError):
        mm.decode_gif(b"NOTAGIF")


def test_gif_dispatches_into_features():
    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    img = pal[np.array([[0, 1], [1, 0]])]
    feats = mm.decode_bytes(mm.encode_gif(img), "image")
    # [w, h, sum_r, sum_g, sum_b, min_r, max_r, n_pixels]
    assert feats == [2.0, 2.0, 100.0, 140.0, 180.0, 10.0, 40.0, 4.0]


def test_malformed_payloads_degrade_to_stub_not_crash():
    """ADVICE round-3: reachable exceptions must take the stub fallback, not
    kill the job - truncated GIF (IndexError in the sub-block walk), empty
    WAV data chunk, P6 stream with varying frame sizes."""
    import numpy as np

    rng = np.random.RandomState(7)
    img = _rand_rgb(rng, 9, 7)
    truncated_gif = mm.encode_gif(img)[:20]  # cuts mid color table/blocks
    for cut in (8, 14, 20, len(mm.encode_gif(img)) - 3):
        payload = mm.encode_gif(img)[:cut]
        v = mm.decode_bytes(payload, "image")
        assert len(v) == mm.FEATURE_DIM
        out = mm.resize_one(payload, 4, 4)
        assert len(out) in (16, len(mm.encode_ppm(np.zeros((4, 4, 3), np.uint8))))

    # empty WAV data chunk: decodes for real, stats must not crash
    empty_wav = mm.encode_wav(8000, np.array([], np.int16))
    v = mm.decode_bytes(empty_wav, "audio")
    assert v == [0.0, 8000.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]

    # P6 stream with varying frame sizes: np.stack would raise -> stub
    mixed = mm.encode_ppm(_rand_rgb(rng, 4, 4)) + mm.encode_ppm(_rand_rgb(rng, 5, 5))
    v = mm.decode_bytes(mixed, "video")
    assert len(v) == mm.FEATURE_DIM


def test_sample_frames_truncated_stream_takes_stub(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    good = mm.encode_ppm(_rand_rgb(rng, 4, 4))
    media = spark.createDataFrame(
        [(1, "video", bytearray(good[:10]))], "media_id long, kind string, payload binary"
    )
    rows = mm.sample_frames(media, n_frames=2).collect()
    assert len(rows) == 2  # stub path emitted the full frame contract


# ------------------------------------------------------------------ PNG

def test_png_roundtrip_all_filters():
    rng = np.random.RandomState(5)
    for shape in [(7, 9), (1, 1), (5, 3), (32, 17)]:
        img = _rand_rgb(rng, shape[1], shape[0])
        for cyc in (True, False):
            out = mm.decode_png(mm.encode_png(img, cycle_filters=cyc))
            assert out.shape == img.shape and (out == img).all(), (shape, cyc)


def _png_chunk(t, d):
    import struct, zlib
    return struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF)


def _hand_png(w, h, ctype, raw, extra=b""):
    import struct, zlib
    return (
        mm._PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_gray_rgba_palette_variants():
    rng = np.random.RandomState(6)
    gray = np.array([[0, 128], [255, 7]], np.uint8)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))
    out = mm.decode_png(_hand_png(2, 2, 0, raw))
    assert (out[..., 0] == gray).all() and (out[..., 2] == gray).all()
    rgba = rng.randint(0, 256, (3, 4, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    assert (mm.decode_png(_hand_png(4, 3, 6, raw)) == rgba[:, :, :3]).all()
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = _hand_png(2, 2, 3, raw, extra=_png_chunk(b"PLTE", pal.tobytes()))
    assert (mm.decode_png(png) == pal[idx]).all()


def test_png_boundaries_and_dispatch():
    import pytest as _pt

    rng = np.random.RandomState(8)
    img = _rand_rgb(rng, 6, 5)
    # interlaced refused, truncated degrades to stub through decode_bytes
    import struct
    with _pt.raises(ValueError):
        mm.decode_png(_hand_png(2, 2, 2, b"", extra=b"")[:8] + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)))
    v = mm.decode_bytes(mm.encode_png(img), "image")
    assert v[0] == 6.0 and v[1] == 5.0 and v[7] == 30.0
    assert v[2] == float(img[:, :, 0].sum())
    assert len(mm.decode_bytes(mm.encode_png(img)[:30], "image")) == mm.FEATURE_DIM
    # resize_one takes the REAL path on PNG input (P6 output, not stub)
    out = mm.resize_one(mm.encode_png(img), 4, 4)
    assert out[:2] == b"P6"


def test_dhash_identical_and_distinct_images(spark):
    rng = np.random.RandomState(21)
    a = _rand_rgb(rng, 12, 10)
    b = 255 - a  # luma-inverted: flips every strict-inequality bit pattern
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(mm.encode_bmp(a)), None),
            (2, "image", bytearray(mm.encode_ppm(a)), None),  # same pixels, other codec
            (3, "image", bytearray(mm.encode_bmp(b)), None),
        ],
        mm.MEDIA_SCHEMA,
    )
    hashes = {r.media_id: (r.dhash_hi, r.dhash_lo)
              for r in mm.dhash_images(media).collect()}
    assert hashes[1] == hashes[2]  # codec-independent: pixels define the hash
    assert 0 <= hashes[1][0] < 2 ** 32 and 0 <= hashes[1][1] < 2 ** 32
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in mm.dhash_candidate_pairs(
                 mm.dhash_images(media), max_hamming=64).collect()}
    assert pairs[(1, 2)] == 0  # exact perceptual duplicate found


def test_dhash_pairs_max_bucket_guard(spark):
    # three identical images share every band; max_bucket=2 drops the bucket
    rng = np.random.RandomState(22)
    img = _rand_rgb(rng, 9, 8)
    media = spark.createDataFrame(
        [(i, "image", bytearray(mm.encode_bmp(img)), None) for i in (1, 2, 3)],
        mm.MEDIA_SCHEMA,
    )
    h = mm.dhash_images(media)
    assert mm.dhash_candidate_pairs(h, max_hamming=8).count() == 3
    assert mm.dhash_candidate_pairs(h, max_hamming=8, max_bucket=2).count() == 0


def test_frame_diffs_hand_computed(spark):
    # 3 frames 2x2: f1 == f0 (sad 0), f2 = f0 + 100 (hard cut)
    base = np.full((2, 2, 3), 50, dtype=np.uint8)
    stream = b"".join(
        [mm.encode_ppm(base), mm.encode_ppm(base), mm.encode_ppm(base + 100)]
    )
    media = spark.createDataFrame(
        [(7, "video", bytearray(stream), None)], mm.MEDIA_SCHEMA
    )
    rows = {r.frame_idx: r for r in mm.frame_diffs(media, cut_mad_e3=30000).collect()}
    assert (rows[0].sad, rows[0].mad_e3, rows[0].is_cut) == (0, 0, False)
    assert (rows[1].sad, rows[1].is_cut) == (0, False)  # identical frame
    assert rows[2].sad == 100 * 12 and rows[2].mad_e3 == 100000
    assert rows[2].is_cut


def test_audio_windows_hand_computed(spark):
    # 5 samples, window 4: [3, -2, 0, -1 | 7] -> crossings within windows
    s = np.array([3, -2, 0, -1, 7], dtype=np.int16)
    media = spark.createDataFrame(
        [(9, "audio", bytearray(mm.encode_wav(8000, s)), None)], mm.MEDIA_SCHEMA
    )
    rows = {r.win_idx: r for r in mm.audio_windows(media, win=4).collect()}
    # window 0: |3|+|-2|+|0|+|-1|=6; sq=9+4+0+1=14; flips: 3/-2, -2/0, 0/-1
    assert (rows[0].n_samples, rows[0].sum_abs, rows[0].sum_sq) == (4, 6, 14)
    assert rows[0].zero_crossings == 3
    # window 1: single sample, no in-window predecessor
    assert (rows[1].n_samples, rows[1].sum_abs, rows[1].sum_sq,
            rows[1].zero_crossings) == (1, 7, 49, 0)


def test_image_patches_tiling_and_edges(spark):
    # h=5 x w=6 image, patch 4 -> 2x2 grid with short edge tiles
    rng = np.random.RandomState(31)
    img = _rand_rgb(rng, 6, 5)  # (w, h) argument order -> shape (5, 6, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(mm.encode_bmp(img)), None)], mm.MEDIA_SCHEMA
    )
    rows = {(r.patch_row, r.patch_col): r
            for r in mm.image_patches(media, patch=4).collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert (rows[(0, 0)].ph, rows[(0, 0)].pw) == (4, 4)
    assert (rows[(1, 1)].ph, rows[(1, 1)].pw) == (1, 2)  # edge tile
    s = img.astype(np.int64)
    assert rows[(0, 0)].sum_r == int(s[:4, :4, 0].sum())
    assert rows[(1, 1)].sum_b == int(s[4:, 4:, 2].sum())
    # full coverage: patch sums reassemble the whole-image channel sum
    assert sum(r.sum_g for r in rows.values()) == int(s[:, :, 1].sum())


def test_media_pipeline_invariants(spark):
    """The composed multimodal capstone: one row per media id, every
    branch through the real codec path, clusters only among images."""
    import __spark_entry__ as entry

    rows = entry.queries()["media_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 90
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert {k: len(v) for k, v in by_kind.items()} == {
        "image": 30, "audio": 30, "video": 30}
    # audio/video never cluster across ids; images may
    assert all(r.cluster_id == r.media_id for r in by_kind["audio"])
    assert all(r.cluster_id == r.media_id for r in by_kind["video"])
    assert any(r.cluster_id != r.media_id for r in by_kind["image"])
    # scene cuts only on videos, and at least one video has one
    assert all(r.n_cuts == 0 for r in by_kind["image"] + by_kind["audio"])
    assert any(r.n_cuts > 0 for r in by_kind["video"])


def test_png_adam7_roundtrip():
    # round-6: Adam7 interlace - seven independently filtered sub-images
    # scattered back by the standard pass layout; exact for every size
    # including degenerate single-row/column images and sizes that leave
    # some passes empty
    rng = np.random.RandomState(61)
    for h, w in [(1, 1), (3, 2), (5, 5), (8, 8), (13, 17), (32, 9)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for cyc in (True, False):
            enc = mm.encode_png(img, cycle_filters=cyc, interlace=True)
            # IHDR interlace byte set
            assert enc[8 + 8 + 12] == 1
            assert np.array_equal(mm.decode_png(enc), img), (h, w, cyc)


def test_gif_interlace_roundtrip():
    # round-6: GIF 8/8/4/2 interlace de-scrambled to display order
    rng = np.random.RandomState(62)
    for h, w in [(1, 3), (7, 4), (16, 5), (33, 6)]:
        img = (rng.randint(0, 8, (h, w, 1)) * 30).astype(np.uint8).repeat(
            3, axis=2
        )
        enc = mm.encode_gif(img, interlace=True)
        assert np.array_equal(mm.decode_gif(enc), img), (h, w)
        # interlaced and plain encodes of the same image decode identically
        assert np.array_equal(
            mm.decode_gif(enc), mm.decode_gif(mm.encode_gif(img))
        )


def test_png_16bit_and_gray_alpha():
    # round-6: 16-bit depth (byte-level filters, high byte displayed) and
    # color type 4 (gray+alpha) - hand-built streams, not our encoder, so
    # the decoder is pinned against the spec layout
    import struct as _s
    import zlib

    rng = np.random.RandomState(63)
    img = rng.randint(0, 256, (5, 4, 3)).astype(np.uint8)

    def chunk(typ, data):
        return (
            _s.pack(">I", len(data)) + typ + data
            + _s.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    raw = bytearray()
    for y in range(5):
        raw.append(0)
        for x in range(4):
            for c in range(3):
                raw += bytes([img[y, x, c], 0x7F])  # hi=value, lo=junk
    enc16 = (
        sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 5, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_png(enc16), img)

    g = rng.randint(0, 256, (3, 5)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(10, np.int32)
    for y in range(3):
        raw.append(2)  # Up filter over 2-byte pixels
        cur = np.array(
            [v for x in range(5) for v in (int(g[y, x]), 200)], np.int32
        )
        raw += ((cur - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    enc4 = (
        sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 5, 3, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_png(enc4), np.repeat(g[:, :, None], 3, 2))

    # 16-bit palette is not a legal PNG combination
    bad = (
        sig + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00")) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm.decode_png(bad)


def test_gif_animation_frames():
    # round-6: GIF89a animations decode as the full frame list and route
    # through the video dispatch; transparency and partial frames refused
    rng = np.random.RandomState(64)
    frames = [
        (rng.randint(0, 6, (9, 7, 1)) * 40).astype(np.uint8).repeat(3, 2)
        for _ in range(4)
    ]
    for inter in (False, True):
        enc = mm.encode_gif_animation(frames, interlace=inter)
        got = mm.decode_gif_frames(enc)
        assert len(got) == 4
        for a, b in zip(got, frames):
            assert np.array_equal(a, b), inter
        what, obj = mm._decode_media(enc, "image")
        assert what == "video" and len(obj) == 4
    # decode_gif = first frame; single image still an image
    assert np.array_equal(mm.decode_gif(enc), frames[0])
    what, _ = mm._decode_media(mm.encode_gif(frames[0]), "image")
    assert what == "image"
    # transparent GCE flag -> refuse
    enc = bytearray(mm.encode_gif_animation(frames))
    at = bytes(enc).find(b"\x21\xf9\x04\x00")
    enc[at + 3] = 0x01
    with pytest.raises(ValueError, match="transparent"):
        mm.decode_gif_frames(bytes(enc))


def test_fuzz_decode_bytes_never_raises():
    # one malformed record must degrade to the stub, never kill a Spark
    # task: seeded byte flips and truncations over every container the
    # dispatch recognizes (incl. corrupt PNG deflate -> zlib.error and
    # JPEG scans referencing missing tables -> KeyError, both previously
    # able to escape the fallback boundary)
    from boilerplate_buster_spark.core import jpeg as J

    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    pal = (rng.randint(0, 4, (8, 8, 1)) * 60).astype(np.uint8).repeat(3, 2)
    samples = (rng.randint(-500, 500, 64)).astype(np.int16)
    payloads = [
        mm.encode_png(img),
        mm.encode_png(img, interlace=True),
        mm.encode_gif(pal),
        mm.encode_gif_animation([pal, pal[::-1]]),
        mm.encode_bmp(img),
        mm.encode_ppm(img),
        mm.encode_wav(8000, samples),
        J.encode_jpeg(img, quality=90),
        J.encode_jpeg_progressive(img, quality=90),
        J.encode_jpeg_cmyk(np.dstack([img, img[:, :, :1]])),
    ]
    for base in payloads:
        for trial in range(30):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
            cut = rng.randint(0, len(b) + 1)
            for payload in (bytes(b), bytes(b[:cut])):
                for kind in ("image", "video", "audio"):
                    v = mm.decode_bytes(payload, kind)
                    assert isinstance(v, list) and len(v) == 8


def test_wav_stereo_and_8bit():
    # round-6: stereo -> integer-floor mean downmix; 8-bit unsigned PCM
    # centered and widened; non-PCM still refuses
    import struct as _s

    rng = np.random.RandomState(65)
    left = rng.randint(-30000, 30000, 50).astype(np.int16)
    right = rng.randint(-30000, 30000, 50).astype(np.int16)
    inter = np.empty(100, np.int16)
    inter[0::2], inter[1::2] = left, right
    data = inter.astype("<i2").tobytes()
    wav = (
        b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + _s.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + _s.pack("<I", len(data)) + data
    )
    rate, got = mm.decode_wav(wav)
    want = ((left.astype(np.int32) + right.astype(np.int32)) // 2).astype(
        np.int16
    )
    assert rate == 8000 and np.array_equal(got, want)

    u8 = rng.randint(0, 256, 40).astype(np.uint8)
    wav8 = (
        b"RIFF" + _s.pack("<I", 36 + len(u8)) + b"WAVEfmt "
        + _s.pack("<IHHIIHH", 16, 1, 1, 11025, 11025, 1, 8)
        + b"data" + _s.pack("<I", len(u8)) + u8.tobytes()
    )
    _, got8 = mm.decode_wav(wav8)
    assert np.array_equal(got8, (u8.astype(np.int16) - 128) << 8)

    bad = wav8.replace(_s.pack("<IHHIIHH", 16, 1, 1, 11025, 11025, 1, 8),
                       _s.pack("<IHHIIHH", 16, 3, 1, 11025, 11025, 1, 8))
    with pytest.raises(ValueError):
        mm.decode_wav(bad)  # IEEE-float format refused


def test_bmp_32bit():
    # round-6: 32-bit BI_RGB (screenshot layout) - 4th byte dropped,
    # top-down honored
    import struct as _s

    rng = np.random.RandomState(66)
    img = rng.randint(0, 256, (3, 2, 3)).astype(np.uint8)
    raster = bytearray()
    for y in range(3):
        for x in range(2):
            raster += bytes([img[y, x, 2], img[y, x, 1], img[y, x, 0], 0xAA])
    hdr = b"BM" + _s.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    hdr += _s.pack(
        "<IiiHHIIiiII", 40, 2, -3, 1, 32, 0, len(raster), 0, 0, 0, 0
    )
    assert np.array_equal(mm.decode_bmp(hdr + bytes(raster)), img)
    # bottom-up variant
    hdr2 = b"BM" + _s.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    hdr2 += _s.pack(
        "<IiiHHIIiiII", 40, 2, 3, 1, 32, 0, len(raster), 0, 0, 0, 0
    )
    assert np.array_equal(mm.decode_bmp(hdr2 + bytes(raster)), img[::-1])


def test_gif_single_frame_transparency_decodes():
    # review fix: a single-frame GIF with the GCE transparency flag (the
    # majority of web GIFs) must decode to its palette pixels - no
    # compositing exists to change them; only multi-frame transparency
    # refuses.  An animation whose FIRST frame is offset also refuses.
    import struct as _s

    img = (np.arange(12).reshape(3, 4, 1) % 4 * 60).astype(np.uint8).repeat(3, 2)
    enc = bytearray(mm.encode_gif(img))
    at = bytes(enc).find(b"\x2c")
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparency flag set
    spliced = bytes(enc[:at]) + gce + bytes(enc[at:])
    assert np.array_equal(mm.decode_gif(spliced), img)

    frames = [img, img[::-1].copy()]
    anim = bytearray(mm.encode_gif_animation(frames))
    at = bytes(anim).find(b"\x2c")
    anim[at + 1] = 2  # first frame x-offset = 2
    with pytest.raises(ValueError, match="partial"):
        mm.decode_gif_frames(bytes(anim))
