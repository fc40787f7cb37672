"""Pure-numpy PNG codec (engine/ops/png.py): round-trips across every
channel layout x scanline filter, palette expansion, fail-clean fuzzing,
and routing through the multimodal feature/resize stages."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from engine.ops import multimodal as M
from engine.ops import png


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(0)
    for c in (1, 2, 3, 4):
        for ft in range(5):
            img = rng.integers(0, 256, (13, 17, c)).astype(np.uint8)
            np.testing.assert_array_equal(
                png.decode_png(png.encode_png(img, filter_type=ft)), img
            )
    # gradient images make Sub/Up/Average/Paeth predictions non-trivial
    g = (
        np.arange(64)[:, None, None]
        + np.arange(48)[None, :, None] * 3
        + np.arange(3)[None, None, :] * 7
    ).astype(np.uint8)
    for ft in range(5):
        np.testing.assert_array_equal(
            png.decode_png(png.encode_png(g, filter_type=ft)), g
        )
    # 1x1 and single-row/column edge shapes
    for shape in [(1, 1, 3), (1, 9, 1), (9, 1, 4)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            np.testing.assert_array_equal(
                png.decode_png(png.encode_png(img, filter_type=ft)), img
            )


def test_png_palette_expands_to_rgb():
    """Hand-built color-type-3 stream: palette indices expand through PLTE."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    scan = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    buf = (
        png.SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = png.decode_png(buf)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    np.testing.assert_array_equal(out, want)
    # palette index out of range fails clean
    bad = (
        png.SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte[:3])
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(bad)


def test_png_fail_clean_on_malformed_input():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    good = png.encode_png(img, filter_type=2)
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="truncated"):
        png.decode_png(good[:20])
    # flip one byte anywhere after the signature: must either raise
    # ValueError (CRC/structure) or still decode to the exact image — never
    # return silently wrong pixels (CRC covers every chunk payload)
    for pos in rng.integers(8, len(good), 200):
        mutated = bytearray(good)
        mutated[pos] ^= 0x5A
        try:
            out = png.decode_png(bytes(mutated))
        except ValueError:
            continue
        np.testing.assert_array_equal(out, img)
    # interlaced / 16-bit declared streams are rejected, not garbled
    ihdr_interlaced = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    buf = png.SIGNATURE + chunk(b"IHDR", ihdr_interlaced) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        png.decode_png(buf)
    ihdr_16bit = struct.pack(">IIBBBBB", 8, 8, 16, 2, 0, 0, 0)
    buf = png.SIGNATURE + chunk(b"IHDR", ihdr_16bit) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        png.decode_png(buf)
    # a stream with no IEND terminator is truncated, not trusted
    with pytest.raises(ValueError, match="IEND"):
        png.decode_png(png.SIGNATURE + chunk(b"IHDR", ihdr_16bit))


def test_extract_features_decodes_real_png(spark):
    """A real PNG routes through the actual decoder: w/h/c and channel
    means land in the feature lanes (4-channel padded layout)."""
    img = np.full((4, 6, 3), 0, np.uint8)
    img[:, :, 0] = 200  # red plane constant, others zero
    rows = [("p", "image", png.encode_png(img), 6, 4, None, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = list(M.extract_features(media, dim=16).collect()[0]["feature"])
    assert out[:7] == [6.0, 4.0, 3.0, 200.0, 0.0, 0.0, 0.0]  # w,h,c,means+pad
    assert out[7:11] == [0.0, 0.0, 0.0, 0.0]  # stds of constant planes + pad


def test_resize_media_handles_png(spark):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 12, 4)).astype(np.uint8)
    rows = [("p", "image", png.encode_png(img, filter_type=4), 12, 16, None, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.resize_media(media, 6, 4).collect()[0]
    got = png.decode_png(bytes(out["content"]))
    np.testing.assert_array_equal(got, M.resize_image(img, 6, 4))
    assert (out["width"], out["height"]) == (6, 4)


def test_decodable_rows_include_all_png_layouts():
    """The frozen-oracle gate data must exercise every PNG channel layout
    and every scanline filter type, and its stored expectations must match
    a fresh decode."""
    rows = M.decodable_media_rows(n=48, seed=7, dim=8)
    chans = set()
    filters = set()
    for r in rows:
        content = r[2]
        if content[:8] == png.SIGNATURE:
            img = png.decode_png(content)
            chans.add(img.shape[2])
            # scanline filter byte of the first row, via the IDAT stream
            w, h, depth, color, _, _, _ = struct.unpack(
                ">IIBBBBB", content[16:29]
            )
            raw = zlib.decompress(
                b"".join(d for t, d in png._chunks(content) if t == b"IDAT")
            )
            filters.add(raw[0])
            # stored resize expectation replays exactly
            want_sha = r[8]
            got_sha = hashlib.sha256(
                png.encode_png(M.resize_image(img, 8, 8))
            ).hexdigest()
            assert got_sha == want_sha
    assert chans == {1, 2, 3, 4}
    assert filters == {0, 1, 2, 3, 4}
