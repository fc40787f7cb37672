"""REAL container/frame-header parsing for compressed audio/video — the
metadata half of the remaining MP3/MP4 stub.

A training-data pipeline's video/audio handling starts with structure,
not samples: route by container, filter by duration/resolution/codec,
build frame-sampling work lists from real frame counts. All of that is
pure byte-format parsing (ISO BMFF boxes, MPEG audio frame headers) —
implemented here with stdlib+numpy, same discipline as ``png.py``/
``jpeg.py``. What still needs ffmpeg is decoding the codec PAYLOAD
(H.264 frames, MP3 audio samples) — that half remains the declared stub
in ``multimodal._fake_feature``.

Validation stance: no independent MP4/MP3 parser ships in this
container, so the builders below construct spec-shaped streams the tests
parse back (structure round-trip), plus fail-clean fuzzing; the parsers
check every size field against the buffer so lying containers raise
ValueError instead of garbling.
"""

from __future__ import annotations

import struct

import numpy as np

# --- MP4 / ISO base media file format ---------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in a range,
    validating sizes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} size out of range")
        yield btype, body, pos + size
        pos += size


def _find(buf, start, end, *path):
    """Descend a box path; returns (payload_start, payload_end) or None."""
    if not path:
        return start, end
    for btype, b0, b1 in _boxes(buf, start, end):
        if btype == path[0]:
            return _find(buf, b0, b1, *path[1:])
    return None


def _fullbox_u32_u64(buf, pos, version):
    """(creation+modification skipped) -> timescale, duration and bytes
    consumed for mvhd/mdhd-style layouts."""
    if version == 1:
        ts, dur = struct.unpack(">IQ", buf[pos + 16 : pos + 28])
    else:
        ts, dur = struct.unpack(">II", buf[pos + 8 : pos + 16])
    return ts, dur


def parse_mp4(buf: bytes) -> dict:
    """ISO BMFF structure -> {'brand', 'duration_s', 'tracks': [{'kind',
    'codec', 'width', 'height', 'n_samples', 'timescale', 'duration'}]}.
    Raises ValueError for non-MP4 or structurally lying input (short
    fullbox payloads would otherwise surface as IndexError/struct.error
    from the field reads; r5 review pass 3 #1)."""
    try:
        return _parse_mp4_impl(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed MP4 structure ({e!r})") from e


def _parse_mp4_impl(buf: bytes) -> dict:
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an MP4 stream (no ftyp box)")
    brand = buf[8:12].decode("latin1")
    top = list(_boxes(buf, 0, len(buf)))
    moov = next(((b0, b1) for t, b0, b1 in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("MP4 stream has no moov box")
    out = {"brand": brand, "duration_s": 0.0, "tracks": []}
    for btype, b0, b1 in _boxes(buf, *moov):
        if btype == b"mvhd":
            version = buf[b0]
            ts, dur = _fullbox_u32_u64(buf, b0 + 4, version)
            if ts == 0:
                raise ValueError("MP4 mvhd timescale is zero")
            out["duration_s"] = dur / ts
        elif btype == b"trak":
            out["tracks"].append(_parse_trak(buf, b0, b1))
    return out


def _parse_trak(buf, b0, b1) -> dict:
    track = {
        "kind": None, "codec": None, "width": None, "height": None,
        "n_samples": 0, "timescale": None, "duration": None,
    }
    mdia = _find(buf, b0, b1, b"mdia")
    if mdia is None:
        return track
    for btype, m0, m1 in _boxes(buf, *mdia):
        if btype == b"mdhd":
            version = buf[m0]
            ts, dur = _fullbox_u32_u64(buf, m0 + 4, version)
            track["timescale"], track["duration"] = ts, dur
        elif btype == b"hdlr":
            track["kind"] = buf[m0 + 8 : m0 + 12].decode("latin1")
        elif btype == b"minf":
            stbl = _find(buf, m0, m1, b"stbl")
            if stbl is None:
                continue
            for st, s0, s1 in _boxes(buf, *stbl):
                if st == b"stsd":
                    (n_entries,) = struct.unpack(">I", buf[s0 + 4 : s0 + 8])
                    if n_entries:
                        # first sample entry: [size][fourcc]...
                        track["codec"] = buf[s0 + 12 : s0 + 16].decode("latin1")
                        if track["kind"] == "vide" and s1 - s0 >= 44:
                            # VisualSampleEntry: 6 reserved + 2 dref idx +
                            # 16 predefined -> width/height u16 at +24/+26
                            w, h = struct.unpack(
                                ">HH", buf[s0 + 40 : s0 + 44]
                            )
                            track["width"], track["height"] = w, h
                elif st == b"stsz":
                    sample_size, count = struct.unpack(
                        ">II", buf[s0 + 4 : s0 + 12]
                    )
                    # a lying count escapes the struct/Index wrappers (the
                    # unpack succeeds) and would overflow downstream int32
                    # columns — validate against the entry table the box
                    # actually carries (r5 review pass 4 #2)
                    if sample_size == 0 and 12 + 4 * count > s1 - s0:
                        raise ValueError(
                            f"MP4 stsz declares {count} samples but the box "
                            f"holds {(s1 - s0 - 12) // 4} entries"
                        )
                    if count >= 1 << 31:
                        raise ValueError(f"MP4 stsz count {count} out of range")
                    track["n_samples"] = count
    return track


def build_fake_mp4(
    width: int = 64,
    height: int = 48,
    n_frames: int = 100,
    fps: int = 25,
    codec: str = "avc1",
) -> bytes:
    """Minimal spec-shaped MP4 (ftyp + moov with one video trak + an mdat
    of placeholder sample bytes) for table generation and tests. The
    sample payload is deterministic junk — exactly the part a real
    pipeline hands to ffmpeg."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    timescale = fps
    dur = n_frames
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,
    )
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 4,
    )
    hdlr = box(
        b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"fake\x00"
    )
    # VisualSampleEntry is 86 bytes INCLUDING its 8-byte box header (the
    # +8 double-count made the entry overhang its stsd parent; r5 review
    # pass 3 #4)
    entry = (
        struct.pack(">I", 86)
        + codec.encode("latin1")
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + b"\x00" * 50
    )
    stsd = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    stsz = box(
        b"stsz",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, n_frames)
        + b"".join(struct.pack(">I", 64) for _ in range(n_frames)),
    )
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)
    moov = box(b"moov", mvhd + trak)
    rng = np.random.default_rng(n_frames * 31 + width)
    mdat = box(b"mdat", rng.integers(0, 256, 64 * n_frames).astype(np.uint8).tobytes())
    return ftyp + moov + mdat


# --- MP3 / MPEG audio frame headers ------------------------------------------

_MPEG1_L3_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0
]
_MPEG1_RATES = [44100, 48000, 32000, 0]


def parse_mp3(buf: bytes) -> dict:
    """Walk MPEG-1 Layer III frame headers (skipping a leading ID3v2 tag)
    -> {'n_frames', 'sample_rate', 'bitrate_kbps' (mean), 'duration_s',
    'vbr'}. Frame payloads are never decoded. Raises ValueError when no
    valid frame sequence exists."""
    try:
        return _parse_mp3_impl(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed MP3 stream ({e!r})") from e


def _parse_mp3_impl(buf: bytes) -> dict:
    pos = 0
    if buf[:3] == b"ID3":
        if len(buf) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = 0
        for b in buf[6:10]:  # syncsafe u28
            if b & 0x80:
                raise ValueError("invalid ID3v2 syncsafe size")
            sz = (sz << 7) | b
        pos = 10 + sz
    n_frames = 0
    bitrates = []
    sample_rate = None
    while pos + 4 <= len(buf):
        h = buf[pos : pos + 4]
        if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
            break
        version = (h[1] >> 3) & 0x03
        layer = (h[1] >> 1) & 0x03
        if version != 3 or layer != 1:  # MPEG-1 Layer III only
            raise ValueError("only MPEG-1 Layer III frames supported")
        br = _MPEG1_L3_BITRATES[(h[2] >> 4) & 0x0F]
        sr = _MPEG1_RATES[(h[2] >> 2) & 0x03]
        pad = (h[2] >> 1) & 0x01
        if br == 0 or sr == 0:
            raise ValueError("invalid MP3 bitrate/samplerate index")
        if sample_rate is None:
            sample_rate = sr
        elif sr != sample_rate:
            raise ValueError("sample-rate change mid-stream")
        flen = 144 * br * 1000 // sr + pad
        if pos + flen > len(buf):
            raise ValueError("truncated MP3 frame")
        bitrates.append(br)
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "bitrate_kbps": float(np.mean(bitrates)),
        "duration_s": n_frames * 1152 / sample_rate,
        "vbr": len(set(bitrates)) > 1,
    }


def build_fake_mp3(
    n_frames: int = 40, bitrate: int = 128, sample_rate: int = 44100,
    seed: int = 0
) -> bytes:
    """Valid MPEG-1 Layer III frame headers with deterministic junk
    payloads (the payload is what a real pipeline hands to a DSP
    decoder)."""
    bidx = _MPEG1_L3_BITRATES.index(bitrate)
    sidx = _MPEG1_RATES.index(sample_rate)
    rng = np.random.default_rng(seed)
    out = bytearray()
    for _ in range(n_frames):
        hdr = bytes(
            [0xFF, 0xFB, (bidx << 4) | (sidx << 2), 0x00]
        )
        flen = 144 * bitrate * 1000 // sample_rate
        body = rng.integers(0, 256, flen - 4).astype(np.uint8).tobytes()
        out += hdr + body
    return bytes(out)
