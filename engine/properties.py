"""Writer properties: the engine's configuration surface.

Mirrors the reference's ``WriterProperties`` extension point
(``src/file/properties.rs:94-202``): per-column encoding overrides with
column > global > type-default precedence (``src/file/properties.rs:154-160``,
``set_column_encoding`` ``:351-354``), dictionary toggles, and the
write batch / page size knobs reinterpreted for the distributed engine
(rows_per_bucket = the row-group size lever; compression applied to chunk
payloads post-encoding, default UNCOMPRESSED like ``:59``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .skew import DEFAULT_ROWS_PER_BUCKET

# (kind, default override) per supported logical column type; None = auto-select
_TYPE_DEFAULTS = {
    "int32_list": ("int32_list", None),
    "int32": ("int32", None),
    "int64": ("int64", None),
    "bytes": ("bytes", None),
    "bool": ("bool", None),
}


@dataclass
class WriterProperties:
    """Configuration for :func:`engine.jobs.encode.encode_table`.

    ``column_encodings``: column name -> codec name; wins over auto-selection
    (the reference rejects explicit dictionary choices the same way we let
    the selector own 'dict' unless forced — we allow forcing for tests).
    ``dictionary_enabled``: remove 'dict'/'dict_ba' from the candidate set
    globally or per column (reference ``set_dictionary_enabled``).
    """

    rows_per_bucket: int = DEFAULT_ROWS_PER_BUCKET
    compression: str | None = None  # uncompressed default (properties.rs:59)
    column_encodings: dict[str, str] = field(default_factory=dict)
    dictionary_enabled: bool = True
    column_dictionary_enabled: dict[str, bool] = field(default_factory=dict)

    def encoding_for(self, column: str) -> str | None:
        """column > global precedence (src/file/properties.rs:154-160)."""
        return self.column_encodings.get(column)

    def dict_enabled_for(self, column: str) -> bool:
        return self.column_dictionary_enabled.get(column, self.dictionary_enabled)

    def columns_spec(self, schema: dict[str, str]) -> dict[str, tuple[str, str | None]]:
        """Build the encode job's columns dict from a name->kind schema."""
        out = {}
        for name, kind in schema.items():
            if kind not in _TYPE_DEFAULTS:
                raise ValueError(f"unsupported column kind {kind}")
            out[name] = (kind, self.encoding_for(name))
        return out
