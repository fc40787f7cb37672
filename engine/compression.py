"""Block compression codecs applied to whole encoded chunks (post-encoding).

Reference ``Codec`` trait + ``create_codec`` factory
(``src/compression.rs:54-79``): SNAPPY/GZIP/BROTLI/LZ4/ZSTD. GZIP rides
zlib from the stdlib; SNAPPY/ZSTD/LZ4/BROTLI ride the codecs pyarrow links
in (always present wherever this engine runs — pyarrow is a hard dependency
of the Arrow-batched encode path), with the dedicated python packages
(python-snappy, zstandard, lz4, brotli) as a fallback when pyarrow was
built without a codec. LZO is unimplemented, like the reference
(``src/compression.rs:77``).

pyarrow's raw block codecs require the decompressed size up front, so the
pyarrow-backed payloads carry their own u64-LE uncompressed-length prefix
(``_SIZED_MAGIC`` + length + blocks). Decompress auto-detects the prefix,
so stores written by either backend read back with either.

By default our chunks stay UNCOMPRESSED — matching the reference's default
(``src/file/properties.rs:59``) and keeping the size-parity metric about
*lightweight encodings*, not general-purpose compression. The hooks exist so
a cluster deployment can stack zstd on cold storage.
"""

from __future__ import annotations

import struct
import zlib

# Prefix marking a payload framed by the pyarrow backend:
# magic (4) | u64-LE uncompressed length | raw codec blocks.
# The magic disambiguates from a native-library stream (zstd frames start
# 0x28B52FFD, lz4 frames 0x04224D18, brotli/snappy have no fixed magic but
# cannot begin with these four bytes followed by a plausible length for any
# payload we produce, because we only ever *write* one framing per backend
# and try the prefixed parse first, falling back on any mismatch).
_SIZED_MAGIC = b"SGZ1"


class _PaCodec:
    """pyarrow.Codec adapter with an explicit uncompressed-size frame."""

    def __init__(self, name: str, pa_name: str | None = None):
        import pyarrow as pa

        self.name = name
        self._codec = pa.Codec(pa_name or name)

    def compress(self, data: bytes) -> bytes:
        comp = self._codec.compress(data, asbytes=True)
        return _SIZED_MAGIC + struct.pack("<Q", len(data)) + comp

    def decompress(self, data: bytes) -> bytes:
        if len(data) < 12 or data[:4] != _SIZED_MAGIC:
            raise ValueError(
                f"{self.name}: payload lacks the sized-frame prefix; "
                "was it written by a native codec library?"
            )
        (n,) = struct.unpack("<Q", data[4:12])
        return self._codec.decompress(data[12:], decompressed_size=n, asbytes=True)


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

    class _Snappy:
        name = "snappy"
        compress = staticmethod(snappy.compress)
        decompress = staticmethod(snappy.decompress)

    return _Snappy()


def _make_zstd():
    import zstandard

    class _Zstd:
        name = "zstd"

        def compress(self, data: bytes) -> bytes:
            return zstandard.ZstdCompressor(level=1).compress(data)

        def decompress(self, data: bytes) -> bytes:
            return zstandard.ZstdDecompressor().decompress(data)

    return _Zstd()


def _make_lz4():
    import lz4.frame

    class _Lz4:
        name = "lz4"
        compress = staticmethod(lz4.frame.compress)
        decompress = staticmethod(lz4.frame.decompress)

    return _Lz4()


def _make_brotli():
    import brotli

    class _Brotli:
        name = "brotli"

        def compress(self, data: bytes) -> bytes:
            return brotli.compress(data, quality=1)

        decompress = staticmethod(brotli.decompress)

    return _Brotli()


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
        "snappy": lambda: _make_pa("snappy") or _try_import(_make_snappy),
        "zstd": lambda: _make_pa("zstd") or _try_import(_make_zstd),
        "lz4": lambda: _make_pa("lz4") or _try_import(_make_lz4),
        "brotli": lambda: _make_pa("brotli") or _try_import(_make_brotli),
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
