"""Stdlib media codecs (datapipe/codecs.py): PNG decode verified
against an INDEPENDENT spec-transliterated filter implementation, BMP
against hand-built bytes, WAV against known signals — then the real
decode legs end-to-end through the Spark multimodal stages."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from docrawl_spark.datapipe import codecs

rng = np.random.default_rng(4242)


# -- independent PNG builder (straight from the spec, per-byte) -------------


def _spec_filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """PNG spec §9 FILTER direction (recon -> filtered), transliterated
    independently of the module's unfilter."""
    out = bytearray()
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            f = x
        elif ftype == 1:
            f = (x - a) & 0xFF
        elif ftype == 2:
            f = (x - b) & 0xFF
        elif ftype == 3:
            f = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f = (x - pred) & 0xFF
        out.append(f)
    return bytes(out)


def _build_png(px: np.ndarray, filters: list[int], color_type: int,
               palette: bytes | None = None) -> bytes:
    """Hand-assemble a PNG with the given per-row filter types."""
    h, w = px.shape[:2]
    bpp = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * bpp)
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        line = flat[y].tobytes()
        raw.append(filters[y])
        raw.extend(_spec_filter_line(filters[y], line, prev, bpp))
        prev = line

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_decodes(ftype):
    px = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    data = _build_png(px, [ftype] * 7, color_type=2)
    got = codecs.parse_png(data)
    assert np.array_equal(got, px), f"filter {ftype}"


def test_png_mixed_filters_and_channels():
    for c, ctype in [(1, 0), (2, 4), (3, 2), (4, 6)]:
        px = rng.integers(0, 256, (9, 4, c), dtype=np.uint8)
        filters = list(rng.integers(0, 5, 9))
        got = codecs.parse_png(_build_png(px, filters, color_type=ctype))
        assert np.array_equal(got, px), f"channels={c} filters={filters}"


def test_png_palette_expands_to_rgb():
    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.integers(0, 16, (5, 6, 1), dtype=np.uint8)
    data = _build_png(idx, [0] * 5, color_type=3, palette=pal)
    got = codecs.parse_png(data)
    exp = np.frombuffer(pal, np.uint8).reshape(16, 3)[idx[:, :, 0]]
    assert np.array_equal(got, exp)


def test_png_roundtrip_encoder():
    for shape in [(11, 13), (8, 9, 3), (6, 7, 4)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        got = codecs.parse_png(codecs.png_bytes(px))
        exp = px if px.ndim == 3 else px[:, :, None]
        assert np.array_equal(got, exp)


def test_png_rejects_unsupported():
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    data = bytearray(_build_png(px, [0] * 4, color_type=2))
    with pytest.raises(ValueError, match="signature"):
        codecs.parse_png(b"JUNK" + bytes(data))
    # flip interlace byte (last IHDR body byte: sig 8 + len 4 + type 4 + 12)
    data[8 + 4 + 4 + 12] = 1
    # fix nothing else; CRC is not validated by the parser
    with pytest.raises(ValueError, match="interlace"):
        codecs.parse_png(bytes(data))


# -- BMP --------------------------------------------------------------------


def _build_bmp(px: np.ndarray, bottom_up: bool = True) -> bytes:
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    rows = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in rows:
        row = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            row += bytes([b, g, r])
        row += bytes(stride - len(row))
        body += row
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return bytes(hdr + dib + body)


def test_bmp_decode_bottom_up_and_top_down():
    px = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    assert np.array_equal(codecs.parse_bmp(_build_bmp(px, True)), px)
    assert np.array_equal(codecs.parse_bmp(_build_bmp(px, False)), px)


def test_bmp_rejects_compressed():
    data = bytearray(_build_bmp(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)))
    data[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        codecs.parse_bmp(bytes(data))


# -- WAV --------------------------------------------------------------------


def test_wav_roundtrip_sine_rms():
    rate = 16000
    t = np.arange(rate)  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    dur, got_rate, rms = codecs.parse_wav(codecs.wav_bytes(sine, rate))
    assert got_rate == rate and dur == 1000
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3  # sine rms = A/sqrt(2)


def test_wav_silence_and_full_scale():
    rate = 8000
    dur, _, rms = codecs.parse_wav(codecs.wav_bytes(np.zeros(800), rate))
    assert dur == 100 and rms == 0.0
    _, _, rms1 = codecs.parse_wav(codecs.wav_bytes(np.ones(800), rate))
    assert abs(rms1 - 1.0) < 1e-3


# -- luma / resize ----------------------------------------------------------


def test_mean_luma_grays_and_rgb():
    assert codecs.mean_luma(np.full((4, 4), 255, np.uint8)) == 1.0
    assert codecs.mean_luma(np.zeros((4, 4, 3), np.uint8)) == 0.0
    # pure green: luma = 0.587
    g = np.zeros((4, 4, 3), np.uint8)
    g[:, :, 1] = 255
    assert abs(codecs.mean_luma(g) - 0.587) < 1e-6


def test_resize_nearest_bounds_and_aspect():
    px = rng.integers(0, 256, (300, 100, 3), dtype=np.uint8)
    small = codecs.resize_nearest(px, 64)
    assert max(small.shape[:2]) <= 64
    assert abs(small.shape[0] / small.shape[1] - 3.0) < 0.25
    assert codecs.resize_nearest(px, 1000) is px  # no upscale


# -- Spark stages: real decode legs -----------------------------------------


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id string, content binary")


def test_decode_image_features_real_png_bmp(spark):
    px_png = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    px_bmp = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
    df = _media_df(
        spark,
        [("png1", bytearray(codecs.png_bytes(px_png))),
         ("bmp1", bytearray(_build_bmp(px_bmp)))],
    )
    from docrawl_spark.datapipe.multimodal import decode_image_features

    got = {r["media_id"]: r for r in decode_image_features(df).collect()}
    assert (got["png1"]["width"], got["png1"]["height"]) == (30, 20)
    assert (got["bmp1"]["width"], got["bmp1"]["height"]) == (8, 10)
    assert abs(got["png1"]["mean_luma"] - codecs.mean_luma(px_png)) < 1e-5
    assert abs(got["bmp1"]["mean_luma"] - codecs.mean_luma(px_bmp)) < 1e-5


def test_resize_images_real_roundtrip(spark):
    px = rng.integers(0, 256, (200, 120, 3), dtype=np.uint8)
    df = _media_df(spark, [("m1", bytearray(codecs.png_bytes(px)))])
    from docrawl_spark.datapipe.multimodal import resize_images

    r = resize_images(df, max_side=64).collect()[0]
    assert max(r["out_width"], r["out_height"]) <= 64
    back = codecs.parse_png(bytes(r["out_bytes"]))  # output is REAL PNG
    assert back.shape == (r["out_height"], r["out_width"], 3)
    assert np.array_equal(back, codecs.resize_nearest(px, 64))


def test_extract_audio_features_real_wav(spark):
    rate = 22050
    sine = 0.25 * np.sin(2 * np.pi * 220 * np.arange(rate // 2) / rate)
    df = _media_df(spark, [("a1", bytearray(codecs.wav_bytes(sine, rate)))])
    from docrawl_spark.datapipe.multimodal import extract_audio_features

    r = extract_audio_features(df).collect()[0]
    assert r["sample_rate"] == rate and r["duration_ms"] == 500
    assert abs(r["rms"] - 0.25 / np.sqrt(2)) < 1e-3


def test_unsupported_formats_still_raise(spark):
    df = _media_df(spark, [("j1", bytearray(b"\xff\xd8\xffJPEGBODY"))])
    from docrawl_spark.datapipe.multimodal import decode_image_features

    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image_features(df).collect()
