"""Block compression codecs applied to whole encoded chunks (post-encoding).

Reference ``Codec`` trait + ``create_codec`` factory
(``src/compression.rs:54-79``): SNAPPY/GZIP/BROTLI/LZ4/ZSTD. GZIP rides
zlib from the stdlib; SNAPPY/ZSTD/LZ4/BROTLI ride the codecs pyarrow links
in (always present wherever this engine runs — pyarrow is a hard dependency
of the Arrow-batched encode path), with the dedicated python packages
(python-snappy, zstandard, lz4, brotli) as a fallback when pyarrow was
built without a codec. LZO is unimplemented, like the reference
(``src/compression.rs:77``).

pyarrow's raw block codecs require the decompressed size up front, so all
non-gzip payloads carry a u64-LE uncompressed-length prefix (``_SIZED_MAGIC``
+ length + the codec's standard stream). BOTH backends write this frame and
both auto-detect it on read: the inner stream is the codec's interchange
format (zstd frame / LZ4 frame / raw snappy / raw brotli), which pyarrow and
the dedicated packages each understand, so stores written by either backend
read back with either. A legacy UNPREFIXED stream (written before the frame
existed) decodes through the dedicated package when installed — pyarrow
alone cannot, because the size is unrecoverable; that path raises a clear
error naming the missing package.

By default our chunks stay UNCOMPRESSED — matching the reference's default
(``src/file/properties.rs:59``) and keeping the size-parity metric about
*lightweight encodings*, not general-purpose compression. The hooks exist so
a cluster deployment can stack zstd on cold storage.
"""

from __future__ import annotations

import struct
import zlib

# Prefix of every non-gzip payload: magic (4) | u64-LE uncompressed length
# | the codec's standard stream. The magic disambiguates from a legacy
# unprefixed stream (zstd frames start 0x28B52FFD, lz4 frames 0x04224D18;
# no codec stream we ever wrote begins with these four bytes).
_SIZED_MAGIC = b"SGZ1"


def _frame(raw_len: int, comp: bytes) -> bytes:
    return _SIZED_MAGIC + struct.pack("<Q", raw_len) + comp


def _unframe(data: bytes):
    """(inner stream, uncompressed size) for a prefixed payload, or
    (data, None) for a legacy unprefixed stream."""
    if len(data) >= 12 and data[:4] == _SIZED_MAGIC:
        (n,) = struct.unpack("<Q", data[4:12])
        return data[12:], n
    return data, None


class _PaCodec:
    """pyarrow.Codec adapter over the shared sized frame."""

    def __init__(self, name: str, pa_name: str | None = None):
        import pyarrow as pa

        self.name = name
        self._codec = pa.Codec(pa_name or name)
        # legacy-stream fallback codec: unset -> not yet checked;
        # False -> checked, package absent (negative result cached too)
        self._native = None

    def compress(self, data: bytes) -> bytes:
        return _frame(len(data), self._codec.compress(data, asbytes=True))

    def decompress(self, data: bytes) -> bytes:
        inner, n = _unframe(data)
        if n is not None:
            return self._codec.decompress(inner, decompressed_size=n, asbytes=True)
        # legacy unprefixed stream: pyarrow cannot decompress without the
        # size — route through the dedicated package when installed
        # (cached, including the package-absent outcome: a legacy store
        # hits this once per CHUNK)
        if self._native is None:
            self._native = _NATIVE_MAKERS[self.name]() or False
        native = self._native
        if native is False:
            raise ValueError(
                f"{self.name}: legacy unprefixed stream needs the dedicated "
                f"{self.name} package, which is not installed"
            )
        return native.decompress(data)


class _NativeCodec:
    """Dedicated-package adapter over the same sized frame: writes are
    byte-interchangeable with _PaCodec (both carry the codec's standard
    stream inside the frame) and reads accept legacy unprefixed streams."""

    def __init__(self, name: str, comp, decomp):
        self.name = name
        self._comp = comp
        self._decomp = decomp

    def compress(self, data: bytes) -> bytes:
        return _frame(len(data), self._comp(data))

    def decompress(self, data: bytes) -> bytes:
        inner, n = _unframe(data)
        return self._decomp(inner if n is not None else data)


class _Gzip:
    name = "gzip"

    def compress(self, data: bytes) -> bytes:
        return zlib.compress(data, 6)

    def decompress(self, data: bytes) -> bytes:
        return zlib.decompress(data)


def _try_import(maker):
    try:
        return maker()
    except ImportError:
        return None


def _make_snappy():
    import snappy

    return _NativeCodec("snappy", snappy.compress, snappy.decompress)


def _make_zstd():
    import zstandard

    return _NativeCodec(
        "zstd",
        lambda d: zstandard.ZstdCompressor(level=1).compress(d),
        lambda d: zstandard.ZstdDecompressor().decompress(d),
    )


def _make_lz4():
    import lz4.frame

    return _NativeCodec("lz4", lz4.frame.compress, lz4.frame.decompress)


def _make_brotli():
    import brotli

    return _NativeCodec(
        "brotli", lambda d: brotli.compress(d, quality=1), brotli.decompress
    )


_NATIVE_MAKERS = {
    "snappy": lambda: _try_import(_make_snappy),
    "zstd": lambda: _try_import(_make_zstd),
    "lz4": lambda: _try_import(_make_lz4),
    "brotli": lambda: _try_import(_make_brotli),
}


def _make_pa(name: str, pa_name: str | None = None):
    """pyarrow backend if it was built with this codec, else None."""
    try:
        import pyarrow as pa

        if not pa.Codec.is_available(pa_name or name):
            return None
        return _PaCodec(name, pa_name)
    except ImportError:
        return None


def create_codec(name: str | None):
    """None/'uncompressed' -> None (reference returns Ok(None) for
    UNCOMPRESSED); unknown/unavailable -> ValueError.

    Non-gzip codecs prefer the pyarrow backend (always linked in this
    engine's environments) and fall back to the dedicated python package.
    """
    if name is None or name == "uncompressed":
        return None
    codecs = {
        "gzip": lambda: _Gzip(),
        "snappy": lambda: _make_pa("snappy") or _NATIVE_MAKERS["snappy"](),
        "zstd": lambda: _make_pa("zstd") or _NATIVE_MAKERS["zstd"](),
        "lz4": lambda: _make_pa("lz4") or _NATIVE_MAKERS["lz4"](),
        "brotli": lambda: _make_pa("brotli") or _NATIVE_MAKERS["brotli"](),
    }
    if name not in codecs:
        raise ValueError(f"unknown compression codec: {name}")
    codec = codecs[name]()
    if codec is None:
        raise ValueError(f"codec {name} not available in this environment")
    return codec


def available_codecs() -> list[str]:
    out = ["uncompressed", "gzip"]
    for name in ("snappy", "zstd", "lz4", "brotli"):
        try:
            if create_codec(name) is not None:
                out.append(name)
        except ValueError:
            pass
    return out
