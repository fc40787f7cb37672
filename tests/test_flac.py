"""FLAC encode/decode (engine/ops/flac.py): exact round trips, byte-level
grammar checks, CRC/MD5 tamper detection, and the decoder-superset paths
(LPC subframes, side-channel stereo, multi-partition residuals) driven by
hand-built bitstreams the encoder never emits."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from engine.ops import flac


def _tone(n, ch, seed=0, amp=6000, noise=900):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    return (
        (amp * np.sin(t / 7.0)).astype(np.int64)
        + rng.integers(-noise, noise, (n, ch))
    ).astype(np.int64)


def test_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        x = _tone(9000, ch, seed=ch)
        buf = flac.encode_flac(x, 44100)
        y, sr = flac.decode_flac(buf)
        assert sr == 44100
        assert np.array_equal(y, x)
        assert len(buf) < x.size * 2  # really compressed vs 16-bit PCM


def test_roundtrip_multi_frame_and_tail():
    x = _tone(4096 * 2 + 123, 1, seed=3)  # two full blocks + short tail
    y, _ = flac.decode_flac(flac.encode_flac(x, 8000))
    assert np.array_equal(y, x)


def test_constant_and_verbatim_paths():
    z = np.full(5000, -42, np.int64)
    bz = flac.encode_flac(z, 8000)
    assert len(bz) < 120  # constant subframes collapse
    yz, _ = flac.decode_flac(bz)
    assert np.array_equal(yz[:, 0], z)
    rng = np.random.default_rng(9)
    w = rng.integers(-32768, 32768, 2000).astype(np.int64)
    yw, _ = flac.decode_flac(flac.encode_flac(w, 48000))
    assert np.array_equal(yw[:, 0], w)


def test_grammar_magic_and_streaminfo():
    x = _tone(500, 1)
    buf = flac.encode_flac(x, 16000)
    assert buf[:4] == b"fLaC"
    assert buf[4] == 0x80  # last-metadata-block, type 0 (STREAMINFO)
    assert int.from_bytes(buf[5:8], "big") == 34
    # frame sync directly after metadata
    assert buf[42] == 0xFF and (buf[43] & 0xFC) == 0xF8


def test_crc_and_md5_tamper_detected():
    x = _tone(6000, 2, seed=5)
    buf = bytearray(flac.encode_flac(x, 44100))
    flipped = bytes(buf[: len(buf) - 40]) + bytes(
        [buf[len(buf) - 40] ^ 0x10]
    ) + bytes(buf[len(buf) - 39 :])
    with pytest.raises(ValueError, match="CRC|MD5|sync|truncated"):
        flac.decode_flac(flipped)
    # MD5 catches a consistent-but-wrong stream: rewrite streaminfo md5
    buf2 = bytearray(flac.encode_flac(x, 44100))
    buf2[26] ^= 0xFF  # inside the 16-byte md5 field (offset 8 + 18)
    with pytest.raises(ValueError, match="MD5 mismatch"):
        flac.decode_flac(bytes(buf2))


def test_decoder_lpc_subframe():
    """The encoder never emits LPC; build one by hand and check the
    decoder reconstructs the exact samples (coefficients in-stream, the
    defining property that makes FLAC fully derivable)."""
    n, order, precision, shift = 64, 2, 12, 5
    coefs = [50, -20]
    rng = np.random.default_rng(2)
    res = rng.integers(-30, 30, n - order).astype(np.int64)
    x = np.empty(n, np.int64)
    x[:order] = [100, -200]
    for i in range(order, n):
        acc = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        x[i] = (acc >> shift) + res[i - order]
    w = flac._BitWriter()
    w.write(0, 1)
    w.write(32 | (order - 1), 6)  # LPC subframe
    w.write(0, 1)
    for v in x[:order]:
        w.write_signed(int(v), 16)
    w.write(precision - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, precision)
    flac._write_residual(w, res)
    w.align()
    r = flac._BitReader(w.bytes())
    got = flac._read_subframe(r, n, 16)
    assert np.array_equal(got, x)


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_decoder_side_channel_stereo(mode):
    """left/side, right/side and mid/side frames (hand-built, since the
    encoder writes independent channels) reconstruct the exact L/R pair,
    including the (mid<<1)|(side&1) parity bit."""
    n = 96
    rng = np.random.default_rng(mode)
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    w = flac._BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0b0111, 4)
    w.write(0b0000, 4)
    w.write(mode, 4)
    w.write(4, 3)  # 16-bit
    w.write(0, 1)
    flac._utf8_number(w, 0)
    w.write(n - 1, 16)
    w.write(flac._crc8(bytes(w.buf)), 8)
    side = left - right
    if mode == 8:
        c0, b0 = left, 16
        c1, b1 = side, 17
    elif mode == 9:
        c0, b0 = side, 17
        c1, b1 = right, 16
    else:
        c0, b0 = (left + right) >> 1, 16
        c1, b1 = side, 17

    def sub(vals, bits):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in vals:
            w.write_signed(int(v), bits)

    sub(c0, b0)
    sub(c1, b1)
    w.align()
    frame = w.bytes()
    si = flac._BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(44100, 20)
    si.write(1, 3)  # 2 channels
    si.write(15, 5)  # 16-bit
    si.write(n, 36)
    stream = (
        b"fLaC"
        + bytes([0x80])
        + (34).to_bytes(3, "big")
        + si.bytes()
        + b"\x00" * 16
        + frame
        + struct.pack(">H", flac._crc16(frame))
    )
    y, sr = flac.decode_flac(stream)
    assert np.array_equal(y[:, 0], left) and np.array_equal(y[:, 1], right)


def test_decoder_multi_partition_residual():
    """Partition order > 0 (never emitted by this encoder): four Rice
    partitions with different parameters decode to the exact residuals."""
    n, order = 64, 0
    rng = np.random.default_rng(4)
    res = np.concatenate(
        [
            rng.integers(-3, 3, 16),
            rng.integers(-100, 100, 16),
            rng.integers(-1000, 1000, 16),
            np.zeros(16, np.int64),
        ]
    ).astype(np.int64)
    w = flac._BitWriter()
    w.write(0, 2)  # method 0
    w.write(2, 4)  # partition order 2 -> 4 partitions
    for p in range(4):
        part = res[p * 16 : (p + 1) * 16]
        u = flac._zigzag(part)
        k = flac._best_rice_k(u)
        w.write(k, 4)
        for uv in u.tolist():
            w.write_unary(int(uv) >> k)
            w.write(int(uv) & ((1 << k) - 1), k)
    w.align()
    r = flac._BitReader(w.bytes())
    got = flac._read_residual(r, n, order)
    assert np.array_equal(got, res)


def test_wasted_bits_decode():
    """Samples with shared low zero bits: flag + unary count, samples
    shift back up after decode."""
    n = 32
    vals = (np.arange(n, dtype=np.int64) - 16) << 3  # 3 wasted bits
    w = flac._BitWriter()
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(2)  # k-1 = 2 -> 3 wasted bits
    for v in vals:
        w.write_signed(int(v) >> 3, 13)  # 16 - 3
    w.align()
    got = flac._read_subframe(flac._BitReader(w.bytes()), n, 16)
    assert np.array_equal(got, vals)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 700),
    ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_hypothesis(n, ch, sr, seed):
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:
        x = rng.integers(-32768, 32768, (n, ch)).astype(np.int64)
    elif kind == 1:
        x = np.full((n, ch), int(rng.integers(-32768, 32768)), np.int64)
    else:
        x = _tone(n, ch, seed=seed)
        x = np.clip(x, -32768, 32767)
    y, got_sr = flac.decode_flac(flac.encode_flac(x, sr))
    assert got_sr == sr
    assert np.array_equal(y, x)
