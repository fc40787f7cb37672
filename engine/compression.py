"""Block compression codecs applied to whole encoded chunks (post-encoding).

Reference ``Codec`` trait + ``create_codec`` factory
(``src/compression.rs:54-79``): SNAPPY/GZIP/BROTLI/LZ4/ZSTD. This container
ships only zlib, so GZIP is always available and the rest are gated behind
import-tries (exactly like the reference's feature-gated codecs; LZO is
unimplemented there too, ``src/compression.rs:77``).

By default our chunks stay UNCOMPRESSED — matching the reference's default
(``src/file/properties.rs:59``) and keeping the size-parity metric about
*lightweight encodings*, not general-purpose compression. The hooks exist so
a cluster deployment can stack zstd on cold storage.
"""

from __future__ import annotations

import zlib


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


def create_codec(name: str | None):
    """None/'uncompressed' -> None (reference returns Ok(None) for
    UNCOMPRESSED); unknown/unavailable -> ValueError."""
    if name is None or name == "uncompressed":
        return None
    codecs = {
        "gzip": lambda: _Gzip(),
        "snappy": lambda: _try_import(_make_snappy),
        "zstd": lambda: _try_import(_make_zstd),
        "lz4": lambda: _try_import(_make_lz4),
        "brotli": lambda: _try_import(_make_brotli),
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
