"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode status (r7): REAL decoders exist for every IMAGE format a
training corpus carries — netpbm (P5/P6, ``decode_ppm``), PNG (stdlib
zlib inflate + per-scanline unfilter incl. Paeth, ``engine/ops/png.py``)
and baseline JPEG (huffman + DCT, pure numpy, ``engine/ops/jpeg.py``) —
plus TWO real audio sample decoders: RIFF/WAVE PCM (``decode_wav``) and
compressed FLAC (Rice + fixed/LPC prediction, CRC-8/16 + MD5 verified,
``engine/ops/flac.py``), and REAL structure parsing for MP4 (ISO BMFF
boxes/tracks/sample tables) and MP3 (MPEG frame-header walk) via
``engine/ops/media_meta.py``. ``extract_features`` sniffs magic bytes
and routes everything through real parsing. The only remaining stub is
decoding MP3/H.264 codec PAYLOADS: unlike JPEG/PNG/FLAC, whose entropy
tables travel in-band or derive from first principles, those codecs fix
thousands of Huffman/window constants in their specs (ISO 11172-3 Annex
B) — with no spec text or codec library in this environment to
transcribe from, a hand-recalled table set would round-trip itself while
silently violating the standard, so the stub stays declared. Unknown/raw
payloads fall to ``_fake_feature``; swap it for ffmpeg on a cluster that
has it.

Scale notes: media bytes never enter a shuffle — feature extraction is a
``mapInPandas`` projection; only the (small) extracted features flow
downstream. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory for wide binary rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from engine.ops import jpeg, media_meta, png
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The one remaining decode stub, named by FORMAT (VERDICT r5 #8 — the old
# boolean flag dated from when most media decode was faked): only compressed
# codec PAYLOADS of these container formats (H.264 frames, MP3 samples)
# fall to the deterministic fake; their structure/duration/dimensions
# parse for real, and every image format + WAV decode for real.
PAYLOAD_DECODE_STUBBED = frozenset({"mp3", "mp4"})

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def _ppm_header(buf: bytes) -> tuple[int, int, int, int]:
    """Parse just the netpbm header -> (w, h, channels, data_pos); shared
    by the full decode and the header-only probe."""
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm stream (want P5/P6 magic)")
    channels = 3 if buf[:2] == b"P6" else 1
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines start with '#'); pixel data begins after the single
    # whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(buf):
            raise ValueError("truncated netpbm header")
        c = buf[pos : pos + 1]
        if c == b"#":
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated netpbm comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(buf) and not buf[end : end + 1].isspace():
                end += 1
            fields.append(int(buf[pos:end]))
            pos = end
    w, h, maxval = fields
    pos += 1  # the single whitespace after maxval
    if w <= 0 or h <= 0:
        # a negative token would turn the frombuffer count into
        # read-everything and reshape would INFER the negative dim —
        # garbage out instead of an error (r4 review #2)
        raise ValueError(f"invalid netpbm dimensions {w}x{h}")
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported netpbm maxval {maxval} (8-bit only)")
    return w, h, channels, pos


def decode_ppm(buf: bytes) -> np.ndarray:
    """REAL netpbm binary decode (P5 grayscale -> (h, w, 1), P6 RGB ->
    (h, w, 3)), pure numpy — no imaging library needed for the uncompressed
    interchange format. Raises ValueError on malformed input (same
    fail-clean contract as the chunk decoders)."""
    w, h, channels, pos = _ppm_header(buf)
    need = w * h * channels
    if len(buf) - pos < need:
        raise ValueError("truncated netpbm pixel data")
    data = np.frombuffer(buf, np.uint8, count=need, offset=pos)
    return data.reshape(h, w, channels)


def sniff_format(buf: bytes) -> str:
    """Magic-byte format detection — the ONE place the routing predicates
    live (they were duplicated between the feature extractor and the
    probe and could drift; r5 review pass 3 #7). The MP3 sync sniff is
    inherently loose (11 set bits) — callers must treat a failed parse
    after an mp3 sniff as 'unknown', not an error."""
    if buf[:2] in (b"P5", b"P6"):
        return "netpbm"
    if buf[:8] == png.SIGNATURE:
        return "png"
    if buf[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(buf) >= 12 and buf[4:8] == b"ftyp":
        return "mp4"
    if buf[:3] == b"ID3" or (
        len(buf) >= 2 and buf[0] == 0xFF and (buf[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:4] == b"fLaC":
        return "flac"
    return "unknown"


def decode_wav(buf: bytes):
    """REAL RIFF/WAVE PCM decode via the stdlib ``wave`` module:
    (samples int16 ndarray of shape (n, channels), sample_rate)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(buf)) as wf:
            if wf.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM WAV supported")
            n, ch, sr = wf.getnframes(), wf.getnchannels(), wf.getframerate()
            raw = wf.readframes(n)
    except (wave.Error, EOFError) as e:
        # the stdlib parser raises EOFError (not wave.Error) on truncated
        # chunks — caught by fuzzing; both map to the fail-clean contract
        raise ValueError(f"malformed WAV stream: {e}") from e
    if ch <= 0 or sr <= 0:
        raise ValueError(f"malformed WAV stream: {ch} channels, rate {sr}")
    samples = np.frombuffer(raw, np.int16).reshape(-1, ch)
    return samples, sr


def _fake_feature(buf: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for the PAYLOAD_DECODE_STUBBED codec
    payloads and unparseable/raw bytes: a pure function of the bytes so
    tests are reproducible. Swap for ffmpeg on a cluster that has it."""
    h = hashlib.sha256(buf).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def _pad(vals: list, dim: int) -> np.ndarray:
    out = np.zeros(dim, np.float32)
    out[: min(len(vals), dim)] = np.asarray(vals[:dim], np.float32)
    return out


def _decode_image_bytes(buf: bytes, dim: int) -> np.ndarray:
    """Feature vector per media payload, routed by ``sniff_format``: real
    decode + real statistics for netpbm/PNG/JPEG images and WAV audio,
    real structure parsing for MP4/MP3, the deterministic fake for
    unknown payloads. The MP4/MP3 sniffs are loose (an 11-bit sync / an
    offset-4 fourcc), so a failed parse there FALLS BACK to the fake
    instead of erroring — arbitrary binary matching a sync pattern must
    not kill the stage (r5 review pass 3 #2); image formats stay strict
    (a corrupt image in a typed media column IS an upstream bug)."""
    fmt = sniff_format(buf)
    if fmt == "netpbm":
        img = decode_ppm(buf).astype(np.float64)
        h, w, c = img.shape
        means = img.reshape(-1, c).mean(axis=0)
        stds = img.reshape(-1, c).std(axis=0)
        vals = [w, h, c, *means, *np.zeros(3 - c), *stds, *np.zeros(3 - c)]
        return _pad(vals, dim)
    if fmt == "png":
        img = png.decode_png(buf).astype(np.float64)
        h, w, c = img.shape
        means = img.reshape(-1, c).mean(axis=0)
        stds = img.reshape(-1, c).std(axis=0)
        # PNG images can carry up to 4 channels (gray+alpha / RGBA), so the
        # channel-stat lanes pad to 4 (vs the 3 of the netpbm layout, which
        # stays frozen for its existing oracles)
        vals = [w, h, c, *means, *np.zeros(4 - c), *stds, *np.zeros(4 - c)]
        return _pad(vals, dim)
    if fmt == "jpeg":
        img = jpeg.decode_jpeg(buf).astype(np.float64)
        h, w, c = img.shape
        means = img.reshape(-1, c).mean(axis=0)
        stds = img.reshape(-1, c).std(axis=0)
        vals = [w, h, c, *means, *np.zeros(3 - c), *stds, *np.zeros(3 - c)]
        return _pad(vals, dim)
    if fmt == "mp4":
        # REAL container parsing (boxes/tracks/sample tables); the codec
        # payload itself is what still needs ffmpeg. PAYLOAD_DECODE_STUBBED
        # is authoritative (r6 review #8): un-stubbing a format without
        # wiring a decoder fails loudly here instead of silently keeping
        # structure-only features.
        if fmt not in PAYLOAD_DECODE_STUBBED:
            raise NotImplementedError(
                "mp4 removed from PAYLOAD_DECODE_STUBBED but no frame "
                "decoder is wired into _decode_image_bytes"
            )
        try:
            info = media_meta.parse_mp4(buf)
        except ValueError:
            return _fake_feature(buf, dim)
        v = next((t for t in info["tracks"] if t["kind"] == "vide"), None)
        vals = [
            info["duration_s"],
            float(v["n_samples"]) if v else 0.0,
            float(v["width"] or 0) if v else 0.0,
            float(v["height"] or 0) if v else 0.0,
            float(len(info["tracks"])),
        ]
        return _pad(vals, dim)
    if fmt == "mp3":
        # REAL frame-header walk (duration/bitrate/rate); audio sample
        # decode still needs a DSP stack. Same authoritative-set contract
        # as the mp4 branch above.
        if fmt not in PAYLOAD_DECODE_STUBBED:
            raise NotImplementedError(
                "mp3 removed from PAYLOAD_DECODE_STUBBED but no sample "
                "decoder is wired into _decode_image_bytes"
            )
        try:
            info = media_meta.parse_mp3(buf)
        except ValueError:
            return _fake_feature(buf, dim)
        vals = [
            info["duration_s"],
            float(info["sample_rate"]),
            info["bitrate_kbps"],
            float(info["n_frames"]),
            1.0 if info["vbr"] else 0.0,
        ]
        return _pad(vals, dim)
    if fmt in ("wav", "flac"):
        # REAL sample decode for both PCM containers: stdlib wave for
        # RIFF, the from-scratch numpy FLAC decoder (engine/ops/flac.py —
        # Rice/fixed-predictor/LPC, CRC-8/16 + MD5 verified) for fLaC.
        # Identical statistic lanes so the two formats share oracles.
        if fmt == "wav":
            samples, sr = decode_wav(buf)
        else:
            from engine.ops import flac as flac_mod

            samples, sr = flac_mod.decode_flac(buf)
        x = samples.astype(np.float64)
        rms = float(np.sqrt((x**2).mean())) if x.size else 0.0
        zc = (
            float((np.diff(np.signbit(x[:, 0])).sum()) / max(len(x) - 1, 1))
            if len(x) > 1
            else 0.0
        )
        vals = [sr, len(samples), samples.shape[1], rms, zc, float(np.abs(x).mean())]
        return _pad(vals, dim)
    return _fake_feature(buf, dim)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: batches arrive as Arrow; each batch is
    processed vectorized; media bytes are dropped before any shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_bytes(b, dim) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": pd.Series(list(feats), dtype=object),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("format", StringType(), False),
        StructField("duration_s", FloatType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]
)


def _probe_payload(b: bytes):
    """One payload -> (format, duration_s, width, height, sample_rate,
    n_frames, codec). Module-level so tests can drive it directly on the
    driver (a monkeypatch on the driver cannot reach Spark's python
    workers, so an in-UDF closure would make the no-full-decode guard
    unverifiable — r5 review pass 4 #3)."""
    fmt = sniff_format(b)
    try:
        if fmt == "netpbm":
            w, h, c, _ = _ppm_header(b)
            return ("netpbm", None, w, h, None, None, None)
        if fmt == "png":
            w, h, c = png.read_ihdr(b)
            return ("png", None, w, h, None, None, None)
        if fmt == "jpeg":
            w, h, c = jpeg.read_dimensions(b)
            return ("jpeg", None, w, h, None, None, None)
        if fmt == "mp4":
            info = media_meta.parse_mp4(b)
            v = next((t for t in info["tracks"] if t["kind"] == "vide"), None)
            return (
                "mp4",
                float(info["duration_s"]),
                v["width"] if v else None,
                v["height"] if v else None,
                None,
                v["n_samples"] if v else None,
                v["codec"] if v else None,
            )
        if fmt == "mp3":
            info = media_meta.parse_mp3(b)
            return (
                "mp3",
                float(info["duration_s"]),
                None,
                None,
                info["sample_rate"],
                info["n_frames"],
                "mp3",
            )
        if fmt == "wav":
            import io
            import wave

            # header fields only — readframes (the expensive part)
            # never runs
            try:
                with wave.open(io.BytesIO(b)) as wf:
                    nfr = wf.getnframes()
                    sr = wf.getframerate()
                    ch = wf.getnchannels()
                    width = wf.getsampwidth()
            except (wave.Error, EOFError) as e:
                raise ValueError(f"malformed WAV header: {e}") from e
            if sr <= 0 or ch <= 0 or width <= 0:
                raise ValueError("malformed WAV header: zero rate/channels")
            # the declared frame count comes from the data-chunk SIZE
            # field; a lying header can claim 2^32 frames a 44-byte file
            # cannot hold, which would overflow downstream int32 columns
            # (r5 review pass 4 #1) — bound by the actual buffer
            if nfr * ch * width > len(b):
                raise ValueError(
                    f"WAV header declares {nfr} frames but the payload "
                    f"holds at most {len(b) // (ch * width)}"
                )
            # true codec label from the header (the old hardcoded
            # pcm_s16le mislabeled 8/24/32-bit PCM)
            return ("wav", nfr / sr, None, None, sr, nfr, f"pcm_s{width * 8}le")
        if fmt == "flac":
            # streaminfo only (first metadata block) — no frame decode
            from engine.ops import flac as flac_mod

            if len(b) < 4 + 4 + 34 or (b[4] & 0x7F) != 0:
                raise ValueError("flac: missing streaminfo")
            r = flac_mod._BitReader(b[8:42])
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            sr = r.read(20)
            ch = r.read(3) + 1
            r.read(5)
            total = r.read(36)
            if sr <= 0:
                raise ValueError("flac: zero sample rate")
            return ("flac", total / sr, None, None, sr, total, "flac")
    except ValueError:
        return ("corrupt", None, None, None, None, None, None)
    return ("unknown", None, None, None, None, None, None)


def probe_media(media: DataFrame) -> DataFrame:
    """Typed metadata probe over opaque media payloads — the routing/
    filtering pass a training pipeline runs BEFORE deciding what to hand
    to a decoder fleet: HEADER-ONLY parsing everywhere (PNG IHDR, JPEG
    SOF walk, netpbm header, WAV header without reading frames, MP4 box
    walk, MP3 frame-header walk — no pixel/sample decode anywhere; r5
    review pass 3 #5), routed by the shared ``sniff_format``. Unknown
    payloads surface as format='unknown' and parse failures as
    format='corrupt' — values, not errors."""
    _probe_one = _probe_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [_probe_one(b) for b in pdf["content"]]
            fmt, dur, w, h, sr, nf, codec = (
                list(z) for z in zip(*probed)
            ) if probed else ([], [], [], [], [], [], [])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmt,
                    "duration_s": pd.array(dur, dtype="Float32"),
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "n_frames": pd.array(nf, dtype="Int32"),
                    "codec": codec,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, PROBE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) rows via sequence +
    explode — the distributed work-list a real frame extractor would consume."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def fake_media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic fake media rows (shared by the Spark table builder and
    the parquet writer, so an external oracle can regenerate the exact same
    table). Payloads are hex-text noise bytes: opaque binary to the engine,
    but valid ASCII so a SQL oracle can sha256 them (DuckDB cannot hash raw
    blobs). Lengths vary per row to exercise Arrow batching."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        raw = rng.integers(0, 256, 256 + (i % 5) * 64).astype(np.uint8).tobytes()
        payload = raw.hex().encode("ascii")
        rows.append(
            (
                f"m-{i:06d}",
                kind,
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                100 if kind == "video" else None,
            )
        )
    return rows


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table.

    Typed tuples, NOT a pandas frame: pandas upcasts int+None columns to
    float64, which IntegerType rejects (64.0 is not an int)."""
    return spark.createDataFrame(fake_media_rows(n, seed), MEDIA_SCHEMA)


def write_fake_media_parquet(path: str, n: int = 64, seed: int = 42) -> str:
    """Write the deterministic fake media table to parquet WITHOUT Spark
    (pure pyarrow), so an external SQL oracle and the Spark query can read
    the identical file. Atomic via temp + rename."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = fake_media_rows(n, seed)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "kind": pa.array(cols[1], pa.string()),
            "content": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "sample_rate": pa.array(cols[5], pa.int32()),
            "n_frames": pa.array(cols[6], pa.int32()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (binary P5/P6, 8-bit)."""
    img = np.asarray(img, np.uint8)
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("netpbm supports 1 (P5) or 3 (P6) channels")
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (16-bit PCM)."""
    import io
    import wave

    samples = np.asarray(samples, np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return bio.getvalue()


def decodable_media_rows(n: int = 48, seed: int = 7, dim: int = 8) -> list:
    """Deterministic REAL-format media rows (netpbm + PNG + JPEG images
    and PCM WAVs) with the feature vector FROZEN at generation time: the gate
    recomputes features by actually decoding the bytes, so a broken parser
    or changed statistic diverges from the stored expectation and fails
    the hash. PNG rows cycle channel counts (gray / RGB / gray+alpha /
    RGBA) AND scanline filter types 0-4, so every unfilter path sits under
    the oracle."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 6 == 0:
            # i % 6 == 0 rows are all divisible by 3, so channel/stereo
            # toggles key off i // 6 — an i % 3 condition would collapse
            # to a constant and silently drop P5-gray coverage (r5 review
            # pass 3 #3)
            w, h = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            c = 3 if (i // 6) % 2 == 0 else 1
            img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
            content = encode_ppm(img)
            kind, width, height, sr, nf = "image", w, h, None, None
        elif i % 6 == 1:
            # audio rows alternate RIFF/WAV and FLAC (both REAL decode
            # paths); channel count cycles independently of the format so
            # each format sees mono AND stereo. FLAC rows mix a tone with
            # noise so the fixed predictors actually engage (pure noise
            # would push every subframe to VERBATIM).
            sr = int(rng.choice([8000, 16000]))
            ns = int(rng.integers(64, 512))
            ch = 2 if (i // 6) % 4 >= 2 else 1
            tt = np.arange(ns)[:, None]
            tone = (6000 * np.sin(tt / (3.0 + (i % 7)))).astype(np.int64)
            wave_s = (
                tone + rng.integers(-(2**10), 2**10, (ns, ch))
            ).astype(np.int16)
            if (i // 6) % 2:
                from engine.ops import flac as flac_mod

                content = flac_mod.encode_flac(
                    wave_s.astype(np.int64), sr
                )
            else:
                content = encode_wav(wave_s, sr)
            kind, width, height, nf = "audio", None, None, None
        elif i % 6 == 2:
            w, h = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            c = (1, 3, 2, 4)[(i // 6) % 4]
            img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
            content = png.encode_png(img, filter_type=(i // 6) % 5)
            kind, width, height, sr, nf = "image", w, h, None, None
        elif i % 6 == 3:
            # real JPEGs, cycling gray/RGB x 4:4:4 / 4:2:0 x restart
            # (i % 6 == 3 rows are all divisible by 3, so the channel
            # toggle keys off i // 6)
            w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            c = 3 if (i // 6) % 2 == 0 else 1
            img = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
            content = jpeg.encode_jpeg(
                img,
                quality=90,
                subsampling="420" if (c == 3 and (i // 12) % 2) else "444",
                restart_interval=(i // 6) % 3,
            )
            kind, width, height, sr, nf = "image", w, h, None, None
        elif i % 6 == 4:
            # real MP4 container structure (codec payload = declared junk)
            w, h = int(rng.integers(4, 40)) * 16, int(rng.integers(4, 30)) * 16
            nf = int(rng.integers(20, 200))
            content = media_meta.build_fake_mp4(
                width=w, height=h, n_frames=nf, fps=25
            )
            kind, width, height, sr = "video", w, h, None
        else:
            # real MP3 frame-header sequence (payload = declared junk)
            sr = int(rng.choice([44100, 48000, 32000]))
            nfr = int(rng.integers(10, 60))
            content = media_meta.build_fake_mp3(
                n_frames=nfr, bitrate=int(rng.choice([96, 128, 192])),
                sample_rate=sr, seed=i,
            )
            kind, width, height, nf = "audio", None, None, None
        feat = _decode_image_bytes(content, dim)
        # frozen expectation for the RESIZE stage too: sha of the
        # re-encoded 8x8 nearest-neighbor thumbnail (images only), via the
        # same shared per-payload resize the Spark stage runs
        if kind == "image":
            resized_sha = hashlib.sha256(
                _resize_payload(content, 8, 8)
            ).hexdigest()
        else:
            resized_sha = None
        rows.append(
            (
                f"d-{i:06d}",
                kind,
                content,
                width,
                height,
                sr,
                nf,
                [float(v) for v in feat],
                resized_sha,
            )
        )
    return rows


def write_decodable_media_parquet(
    path: str, n: int = 48, seed: int = 7, dim: int = 8
) -> str:
    """Pure-pyarrow writer for the decodable media table (shared-file
    oracle pattern, like :func:`write_fake_media_parquet`)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = decodable_media_rows(n, seed, dim)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "kind": pa.array(cols[1], pa.string()),
            "content": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "sample_rate": pa.array(cols[5], pa.int32()),
            "n_frames": pa.array(cols[6], pa.int32()),
            "expected_feature": pa.array(cols[7], pa.list_(pa.float64())),
            "resized_sha": pa.array(cols[8], pa.string()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index sampling (the standard
    thumbnail/normalization step before feature extraction; no imaging
    library needed). Works for any channel count."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"invalid resize target {out_w}x{out_h}")
    h, w, _ = img.shape
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[rows[:, None], cols[None, :], :]


def _resize_payload(b: bytes, out_w: int, out_h: int) -> bytes | None:
    """Decode -> nearest-neighbor resize -> re-encode in the same format
    for image payloads (routed by the shared ``sniff_format``; r5 review
    pass 4 #7 removed the duplicated magic checks); None = pass through
    untouched (non-image)."""
    fmt = sniff_format(b)
    if fmt == "netpbm":
        return encode_ppm(resize_image(decode_ppm(b), out_w, out_h))
    if fmt == "png":
        return png.encode_png(resize_image(png.decode_png(b), out_w, out_h))
    if fmt == "jpeg":
        return jpeg.encode_jpeg(
            resize_image(jpeg.decode_jpeg(b), out_w, out_h), quality=90
        )
    return None


def resize_media(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """mapInPandas resize stage: netpbm and PNG image payloads are decoded,
    nearest-neighbor resized and re-encoded in their own format (so the
    output column is the same opaque-binary media shape and can feed any
    downstream stage, including the engine's BinaryType encode);
    non-image payloads pass through untouched. Bytes never enter a
    shuffle — this is a projection."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            ws, hs = [], []
            for b in pdf["content"]:
                resized = _resize_payload(b, out_w, out_h)
                if resized is None:
                    out.append(b)
                    ws.append(None)
                    hs.append(None)
                else:
                    out.append(resized)
                    ws.append(out_w)
                    hs.append(out_h)
            res = pdf.copy()
            res["content"] = out
            res["width"] = pd.array(ws, dtype="Int32")
            res["height"] = pd.array(hs, dtype="Int32")
            yield res

    return media.mapInPandas(run, media.schema)
