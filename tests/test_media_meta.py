"""MP4 container / MP3 frame-header parsing (engine/ops/media_meta.py):
structure round-trips through the spec-shaped builders, fail-clean
behavior on lying containers, and the typed probe_media pass."""

import numpy as np
import pytest

from engine.ops import media_meta as mm
from engine.ops import multimodal as M


def test_mp4_structure_roundtrip():
    buf = mm.build_fake_mp4(width=320, height=240, n_frames=250, fps=25)
    info = mm.parse_mp4(buf)
    assert info["brand"] == "isom"
    assert abs(info["duration_s"] - 10.0) < 1e-9
    t = info["tracks"][0]
    assert t["kind"] == "vide" and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (320, 240)
    assert t["n_samples"] == 250 and t["timescale"] == 25


def test_mp3_frame_walk_and_id3():
    buf = mm.build_fake_mp3(n_frames=38, bitrate=128, sample_rate=44100)
    info = mm.parse_mp3(buf)
    assert info["n_frames"] == 38 and info["sample_rate"] == 44100
    assert not info["vbr"]
    assert abs(info["duration_s"] - 38 * 1152 / 44100) < 1e-9
    # leading ID3v2 tag (syncsafe size) is skipped
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"X" * 10
    assert mm.parse_mp3(id3 + buf)["n_frames"] == 38
    # mixed bitrates -> vbr
    vbr = mm.build_fake_mp3(5, 96, 44100) + mm.build_fake_mp3(5, 192, 44100)
    assert mm.parse_mp3(vbr)["vbr"]


def test_media_meta_fail_clean():
    good4 = mm.build_fake_mp4(n_frames=10)
    good3 = mm.build_fake_mp3(n_frames=10)
    with pytest.raises(ValueError, match="ftyp"):
        mm.parse_mp4(b"nope" * 4)
    with pytest.raises(ValueError):
        mm.parse_mp4(good4[:40])  # truncated mid-box
    with pytest.raises(ValueError):
        mm.parse_mp3(good3[:100])  # truncated frame
    with pytest.raises(ValueError, match="frames"):
        mm.parse_mp3(b"\x00" * 64)
    # size-field fuzz: flipped bytes raise ValueError or still parse;
    # no IndexError/struct.error escapes
    rng = np.random.default_rng(0)
    for pos in rng.integers(0, len(good4), 150):
        mutated = bytearray(good4)
        mutated[pos] ^= 0x5A
        try:
            mm.parse_mp4(bytes(mutated))
        except ValueError:
            pass


def test_extract_features_real_mp4_mp3(spark):
    """MP4/MP3 payloads route through the REAL structure parsers: the
    feature lanes carry duration/frames/dimensions (video) and
    duration/rate/bitrate (audio), not the hash-fake."""
    v = mm.build_fake_mp4(width=128, height=96, n_frames=50, fps=25)
    a = mm.build_fake_mp3(n_frames=20, bitrate=128, sample_rate=44100)
    rows = [
        ("v", "video", v, 128, 96, None, 50),
        ("a", "audio", a, None, None, 44100, None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {
        r["media_id"]: list(r["feature"])
        for r in M.extract_features(media, dim=8).collect()
    }
    assert out["v"][:5] == [2.0, 50.0, 128.0, 96.0, 1.0]
    assert out["a"][1:4] == [44100.0, 128.0, 20.0]


def test_probe_media_typed_columns(spark):
    """probe_media: one typed row per payload with real format detection;
    corrupt payloads surface as format='corrupt', unknown as 'unknown' —
    a filtering pass, not an error."""
    from engine.ops import jpeg, png

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
    rows = [
        ("m4", "video", mm.build_fake_mp4(64, 48, 30, 25), 64, 48, None, 30),
        ("m3", "audio", mm.build_fake_mp3(15, 96, 48000), None, None, 48000, None),
        ("jp", "image", jpeg.encode_jpeg(img, 90), 20, 12, None, None),
        ("pg", "image", png.encode_png(img), 20, 12, None, None),
        ("pp", "image", M.encode_ppm(img), 20, 12, None, None),
        ("wv", "audio", M.encode_wav(np.zeros(160, np.int16), 16000), None, None, 16000, None),
        ("xx", "image", b"some unknown payload", None, None, None, None),
        ("cr", "video", mm.build_fake_mp4(64, 48, 30, 25)[:50], None, None, None, None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.probe_media(media).collect()}
    assert out["m4"]["format"] == "mp4" and out["m4"]["n_frames"] == 30
    assert (out["m4"]["width"], out["m4"]["height"]) == (64, 48)
    assert out["m4"]["codec"] == "avc1"
    assert out["m3"]["format"] == "mp3" and out["m3"]["sample_rate"] == 48000
    assert out["jp"]["format"] == "jpeg" and out["jp"]["width"] == 20
    assert out["pg"]["format"] == "png" and out["pp"]["format"] == "netpbm"
    assert out["wv"]["format"] == "wav" and out["wv"]["n_frames"] == 160
    assert out["xx"]["format"] == "unknown"
    assert out["cr"]["format"] == "corrupt"


def test_parsers_wrap_structural_errors_as_valueerror():
    """Short fullbox payloads (mvhd/mdhd/stsd) must raise ValueError, not
    IndexError/struct.error — probe_media catches only ValueError, so an
    escape would kill the Spark stage instead of yielding
    format='corrupt' (r5 review pass 3 #1)."""
    import struct as st

    def box(t, p):
        return st.pack(">I", 8 + len(p)) + t + p

    ftyp = box(b"ftyp", b"isomAAAA")
    for bad_moov in [
        box(b"mvhd", b""),
        box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 10),
        box(b"trak", box(b"mdia", box(b"mdhd", b"\x01\x00"))),
        box(b"trak", box(b"mdia", box(b"minf", box(b"stbl", box(b"stsd", b"\x00\x00"))))),
    ]:
        with pytest.raises(ValueError):
            mm.parse_mp4(ftyp + box(b"moov", bad_moov))


def test_fake_mp4_sample_entry_size_consistent():
    """The builder's VisualSampleEntry size field must cover exactly its
    own bytes (86 incl. header) — a lying size overhangs the stsd parent
    and strict validators reject it (r5 review pass 3 #4)."""
    import struct as st

    buf = mm.build_fake_mp4(64, 48, 10)
    # walk to stsd and check the entry's declared size against its span
    info = mm.parse_mp4(buf)  # still parses
    moov = mm._find(buf, 0, len(buf), b"moov")
    stbl = None
    for t, b0, b1 in mm._boxes(buf, *moov):
        if t == b"trak":
            stbl = mm._find(buf, b0, b1, b"mdia", b"minf", b"stbl")
    (stsd,) = [(b0, b1) for t, b0, b1 in mm._boxes(buf, *stbl) if t == b"stsd"]
    (entry_size,) = st.unpack(">I", buf[stsd[0] + 8 : stsd[0] + 12])
    assert stsd[0] + 8 + entry_size == stsd[1], (entry_size, stsd)


def test_loose_sniff_falls_back_not_raises(spark):
    """Arbitrary binary matching the loose MP3 sync / ftyp sniff routes
    to the deterministic fake instead of killing the stage (r5 review
    pass 3 #2); probe_media reports it as corrupt/unknown."""
    rows = [
        ("x1", "audio", b"\xff\xfbjunkjunkjunkjunkjunk", None, None, None, None),
        ("x2", "video", b"xxxxftypjunkjunkjunkjunk", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    feats = M.extract_features(media, dim=8).collect()
    assert len(feats) == 2  # no stage failure
    probes = {r["media_id"]: r["format"] for r in M.probe_media(media).collect()}
    assert probes == {"x1": "corrupt", "x2": "corrupt"}


def test_probe_uses_headers_not_full_decode(monkeypatch):
    """The per-payload probe must not pay pixel/sample decode. Driven
    DRIVER-SIDE through the module-level _probe_payload — a monkeypatch
    cannot reach Spark's python workers, so the earlier in-UDF version of
    this test was vacuous (r5 review pass 4 #3): full decoders are
    patched to explode and the probe still answers from headers."""
    import wave as wave_mod

    from engine.ops import jpeg, png

    def boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("full decode invoked from probe")

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    wav = M.encode_wav(np.zeros(160, np.int16), 16000)
    payloads = {
        "netpbm": M.encode_ppm(img),
        "png": png.encode_png(img),
        "jpeg": jpeg.encode_jpeg(img, 90),
    }
    monkeypatch.setattr(png, "decode_png", boom)
    monkeypatch.setattr(jpeg, "decode_jpeg", boom)
    monkeypatch.setattr(M, "decode_ppm", boom)
    monkeypatch.setattr(M, "decode_wav", boom)
    monkeypatch.setattr(wave_mod.Wave_read, "readframes", boom)
    for fmt, b in payloads.items():
        got = M._probe_payload(b)
        assert got[0] == fmt and (got[2], got[3]) == (13, 11), fmt
    got = M._probe_payload(wav)
    assert got[0] == "wav" and got[5] == 160 and got[6] == "pcm_s16le"


def test_probe_rejects_lying_wav_and_stsz_counts():
    """Lying size fields that the format libraries accept must surface as
    corrupt, not overflow downstream int32 columns (r5 review pass 4
    #1/#2): a WAV data-chunk size claiming 2^32 frames in a 44-byte file,
    and an MP4 stsz declaring more samples than its entry table holds."""
    import struct as st

    # minimal RIFF/WAVE header with a lying data size (mono, 8-bit)
    data_size = 0xFFFFFFF0
    hdr = (
        b"RIFF" + st.pack("<I", 36 + 0) + b"WAVE"
        + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + st.pack("<I", data_size)
    )
    assert M._probe_payload(hdr)[0] == "corrupt"
    # 24-bit WAV is labeled by its true width, not pcm_s16le
    b24 = (
        b"RIFF" + st.pack("<I", 36 + 6) + b"WAVE"
        + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 8000, 24000, 3, 24)
        + b"data" + st.pack("<I", 6) + b"\x00" * 6
    )
    got = M._probe_payload(b24)
    assert got[0] == "wav" and got[6] == "pcm_s24le" and got[5] == 2

    def box(t, p):
        return st.pack(">I", 8 + len(p)) + t + p

    lying_stsz = box(b"stsz", b"\x00\x00\x00\x00" + st.pack(">II", 0, 0xFFFFFFF0))
    mp4 = (
        box(b"ftyp", b"isomAAAA")
        + box(
            b"moov",
            box(
                b"trak",
                box(b"mdia", box(b"minf", box(b"stbl", lying_stsz))),
            ),
        )
    )
    with pytest.raises(ValueError, match="stsz"):
        mm.parse_mp4(mp4)
    assert M._probe_payload(mp4)[0] == "corrupt"
