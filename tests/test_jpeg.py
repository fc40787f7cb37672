"""Pure-numpy baseline JPEG codec (engine/ops/jpeg.py): transform + table
construction pinned against the spec's definitions, PSNR-bounded
round-trips across subsampling/restart/quality configurations, fail-clean
mutation fuzzing, and routing through the multimodal stages."""

import numpy as np
import pytest

from engine.ops import jpeg
from engine.ops import multimodal as M


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / mse) if mse else float("inf")


def _gradient(h, w):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(x * 2) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_idct_matches_naive_inverse_transform():
    """The matrix IDCT must equal the spec's O(n^4) inverse DCT sum
    (A.3.3) to float precision."""
    rng = np.random.default_rng(0)
    coefs = rng.integers(-500, 500, (8, 8)).astype(np.float64)

    def naive_idct(S):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        acc += (
                            cu * cv * S[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = acc / 4.0
        return out

    fast = jpeg._DCT.T @ coefs @ jpeg._DCT
    assert np.allclose(fast, naive_idct(coefs), atol=1e-9)
    # and forward/inverse are exact inverses
    rt = jpeg._DCT.T @ (jpeg._DCT @ coefs @ jpeg._DCT.T) @ jpeg._DCT
    assert np.allclose(rt, coefs, atol=1e-9)


def test_canonical_huffman_spec_vectors():
    """Canonical code assignment (spec C.2) on the Annex K luma DC table:
    the first symbols get the known codes 00, 010, 011, 100... and no code
    is a prefix of another."""
    codes = jpeg._canonical_codes(*jpeg.STD_DC_LUMA)
    got = {s: (c, ln) for s, c, ln in codes}
    assert got[0] == (0b00, 2)
    assert got[1] == (0b010, 3)
    assert got[2] == (0b011, 3)
    assert got[3] == (0b100, 3)
    assert got[11] == (0b111111110, 9)
    as_bits = [format(c, f"0{ln}b") for _, c, ln in codes]
    for i, a in enumerate(as_bits):
        for j, b in enumerate(as_bits):
            if i != j:
                assert not b.startswith(a), (a, b)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_roundtrip_psnr_bounds(sub, ri):
    img = _gradient(45, 70)
    for quality, floor in [(95, 44), (85, 42), (50, 35)]:
        buf = jpeg.encode_jpeg(img, quality, sub, restart_interval=ri)
        back = jpeg.decode_jpeg(buf)
        assert back.shape == img.shape
        p = _psnr(img, back)
        assert p > floor, (sub, ri, quality, p)
    # smaller files at lower quality, and 420 < 444 at same quality
    assert len(jpeg.encode_jpeg(img, 50, sub)) < len(jpeg.encode_jpeg(img, 95, sub))
    assert len(jpeg.encode_jpeg(img, 85, "420")) < len(jpeg.encode_jpeg(img, 85, "444"))


def test_flat_image_lossless_and_odd_shapes():
    flat = np.full((17, 23, 3), 128, np.uint8)
    assert (jpeg.decode_jpeg(jpeg.encode_jpeg(flat, 90)) == 128).all()
    rng = np.random.default_rng(1)
    for shape in [(1, 1, 3), (7, 9, 3), (8, 8, 1), (17, 31, 3), (16, 16, 3)]:
        im = rng.integers(0, 256, shape).astype(np.uint8)
        for sub in ("444", "420"):
            if shape[2] == 1 and sub == "420":
                continue
            back = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 95, sub))
            assert back.shape == im.shape, (shape, sub)


def test_restart_markers_do_not_change_pixels():
    img = _gradient(48, 64)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, "444"))
    for ri in (1, 2, 5):
        assert (
            jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, "444", restart_interval=ri))
            == base
        ).all()


def test_fail_clean_on_malformed_streams():
    img = _gradient(24, 24)
    good = jpeg.encode_jpeg(img, 85)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:40])
    # progressive marker rejected, not garbled
    prog = bytearray(good)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode_jpeg(bytes(prog))
    # mutation fuzz: flipped bytes either raise ValueError or decode to
    # SOME valid image (entropy bits may legally decode differently; the
    # contract is no crash, no wrong-shape garbage)
    rng = np.random.default_rng(2)
    outcomes = {"ok": 0, "err": 0}
    for pos in rng.integers(2, len(good), 150):
        mutated = bytearray(good)
        mutated[pos] ^= 0x5A
        try:
            out = jpeg.decode_jpeg(bytes(mutated))
            assert out.dtype == np.uint8 and out.ndim == 3
            outcomes["ok"] += 1
        except ValueError:
            outcomes["err"] += 1
        except Exception as e:
            raise AssertionError(f"non-ValueError escape at byte {pos}: {e!r}")
    assert outcomes["err"] > 0  # corruption is actually detected sometimes


def test_extract_features_decodes_real_jpeg(spark):
    """A real JPEG routes through the actual decoder: w/h/c and channel
    means land in the feature lanes (flat image -> exact means, zero
    stds)."""
    img = np.full((16, 24, 3), 0, np.uint8)
    img[:, :, 0] = 200
    rows = [("j", "image", jpeg.encode_jpeg(img, 95), 24, 16, None, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = list(M.extract_features(media, dim=16).collect()[0]["feature"])
    assert out[:3] == [24.0, 16.0, 3.0]
    # JPEG is lossy: means within 2/255 of the true plane means
    assert abs(out[3] - 200.0) < 2 and abs(out[4]) < 2 and abs(out[5]) < 2


def test_resize_media_handles_jpeg(spark):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 24, 3)).astype(np.uint8)
    rows = [("j", "image", jpeg.encode_jpeg(img, 95), 24, 32, None, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.resize_media(media, 8, 8).collect()[0]
    got = jpeg.decode_jpeg(bytes(out["content"]))
    assert got.shape == (8, 8, 3)
    assert (out["width"], out["height"]) == (8, 8)
    # thumbnail approximates the nearest-neighbor resize of the decoded
    # original (two lossy hops, so PSNR-bounded, not exact)
    want = M.resize_image(jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95)), 8, 8)
    assert _psnr(got, want) > 25


def test_decodable_rows_include_jpeg_variants():
    rows = M.decodable_media_rows(n=48, seed=7, dim=8)
    subs = set()
    chans = set()
    n_jpeg = 0
    for r in rows:
        content = r[2]
        if content[:3] == b"\xff\xd8\xff":
            n_jpeg += 1
            img = jpeg.decode_jpeg(content)
            chans.add(img.shape[2])
            # stored resize expectation replays exactly
            import hashlib

            want = hashlib.sha256(
                jpeg.encode_jpeg(M.resize_image(img, 8, 8), quality=90)
            ).hexdigest()
            assert want == r[8]
    assert n_jpeg == 8 and chans == {1, 3}


def _encode_noninterleaved(img, quality=90):
    """Spec-valid 3-scan non-interleaved baseline file (one component per
    scan, 1x1 sampling) built from the module's primitives — the shape a
    first-scan-only decoder silently corrupts (r5 review pass 2 #1)."""
    import struct

    h, w, _ = img.shape
    ql = jpeg._quality_scale(jpeg.STD_QUANT_LUMA, quality)
    qc = jpeg._quality_scale(jpeg.STD_QUANT_CHROMA, quality)
    x = img.astype(np.float64)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
    cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]

    def blocks(plane, q):
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        pad = np.empty((ph, pw))
        pad[:h, :w] = plane
        pad[h:, :w] = plane[-1:, :]
        pad[:, w:] = pad[:, w - 1 : w]
        b = (
            pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        cf = np.einsum("ij,njk,kl->nil", jpeg._DCT, b, jpeg._DCT.T)
        return (
            np.round(cf / q.astype(float).reshape(8, 8)[None])
            .astype(np.int32)
            .reshape(-1, 64)[:, jpeg.ZIGZAG]
        )

    def codes(t):
        return {s: (c, ln) for s, c, ln in jpeg._canonical_codes(*t)}

    dc_l, ac_l = codes(jpeg.STD_DC_LUMA), codes(jpeg.STD_AC_LUMA)
    dc_c, ac_c = codes(jpeg.STD_DC_CHROMA), codes(jpeg.STD_AC_CHROMA)

    def seg(m, p):
        return m + struct.pack(">H", len(p) + 2) + p

    out = bytearray(b"\xff\xd8")
    out += seg(b"\xff\xdb", bytes([0]) + ql[jpeg.ZIGZAG].astype(np.uint8).tobytes())
    out += seg(b"\xff\xdb", bytes([1]) + qc[jpeg.ZIGZAG].astype(np.uint8).tobytes())
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i in range(3):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += seg(b"\xff\xc0", bytes(sof))

    def dht(tc, th, t):
        return seg(b"\xff\xc4", bytes([(tc << 4) | th]) + bytes(t[0]) + bytes(t[1]))

    out += dht(0, 0, jpeg.STD_DC_LUMA) + dht(1, 0, jpeg.STD_AC_LUMA)
    out += dht(0, 1, jpeg.STD_DC_CHROMA) + dht(1, 1, jpeg.STD_AC_CHROMA)
    for i, (pl, q) in enumerate([(y, ql), (cb, qc), (cr, qc)]):
        out += seg(b"\xff\xda", bytes([1, i + 1, 0x00 if i == 0 else 0x11, 0, 63, 0]))
        bw = jpeg._BitWriter()
        pred = 0
        for blk in blocks(pl, q):
            pred = jpeg._encode_one_block(
                blk, pred, dc_l if i == 0 else dc_c, ac_l if i == 0 else ac_c, bw
            )
        bw.flush()
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_non_interleaved_multi_scan_decodes_fully():
    """Three single-component scans must decode ALL components — a pure
    red image comes back red, and the result is bit-identical to the
    interleaved encoding of the same data."""
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 200
    dec = jpeg.decode_jpeg(_encode_noninterleaved(img))
    means = dec.reshape(-1, 3).mean(0)
    assert abs(means[0] - 200) < 3 and means[1] < 3 and means[2] < 3
    img2 = _gradient(24, 40)
    a = jpeg.decode_jpeg(_encode_noninterleaved(img2, 90))
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img2, 90, "444"))
    assert (a == b).all()


def test_truncation_points_fail_clean():
    """Truncations at marker/segment boundaries (incl. the bare 3-byte
    magic prefix the multimodal router matches on) raise ValueError,
    never IndexError (r5 review pass 2 #2)."""
    good = jpeg.encode_jpeg(_gradient(24, 24), 85)
    for cut in [3, 21, 40, 100, len(good) // 2]:
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(good[:cut])
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff")
