"""Struct/map flattening for the generic encode path.

The reference assembles nested records from flat column readers — structs
are just groups of leaf columns (``SchemaDescriptor`` leaf flattening,
``src/schema/types.rs:652-735``), maps are repeated (key, value) groups
(``KeyValueReader``, ``src/record/reader.rs:241-302``). The Spark-native
equivalent: project nested columns to leaf columns *declaratively* before
encoding (Catalyst does the shredding; no Python touches rows), then rebuild
the nested shape with ``F.struct`` / ``F.map_from_arrays`` after decode.

- struct ``s`` -> leaves ``s.a``, ``s.b`` (+ ``s.__valid`` bool when the
  struct itself is nullable — def-level semantics distinguishing a null
  struct from a struct of nulls);
- map ``m`` -> ``m.__keys`` / ``m.__vals`` array leaves (a null map rides
  the arrays' own null-list encoding);
- ``array<struct<a,b>>`` -> parallel ``array<a>``, ``array<b>`` leaves via
  ``F.transform`` (+ an ``__evalid`` bool-array leaf when elements may be
  null structs), rebuilt with ``arrays_zip``/``zip_with`` — the Spark
  expression of the reference's repeated-group shredding
  (``RepeatedReader``, ``src/record/reader.rs:159-240``): one rep level,
  per-field def levels, no explode and no extra shuffle;
- nested structs flatten recursively (inner structs rebuilt first), so
  ``array<struct<x: struct<...>>>`` bottoms out in scalar-array leaves.

Usage::

    flat, plan = nested.flatten(df)
    cols = encode.derive_columns(flat)
    chunks = encode.encode_table(flat, columns=cols, ...)
    out = nested.rebuild(decode.decode_table(chunks, cols), plan)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

VALID_LEAF = "__valid"
EVALID_LEAF = "__evalid"
KEYS_LEAF = "__keys"
VALS_LEAF = "__vals"
LENS_LEAF = "__lens"
FLAT_LEAF = "__flat"

# leaf-name separator: NOT '.' — PySpark's mapInPandas resolves columns with
# df[name], which parses dots as struct access and cannot be quoted there
SEP = "$"


def _q(name: str):
    """Column ref that tolerates special characters in the flattened name."""
    return F.col(f"`{name}`")


def flatten(df: DataFrame) -> tuple[DataFrame, list]:
    """Project struct/map columns down to scalar/array leaves.

    Returns ``(flat_df, plan)``; feed ``plan`` to :func:`rebuild` after
    decoding. Raises for shapes with no leaf mapping (arrays of structs).
    """
    for f in df.schema.fields:
        if SEP in f.name and not isinstance(
            f.dataType, (T.StructType, T.MapType)
        ):
            raise ValueError(
                f"column {f.name!r} contains the reserved flatten separator {SEP!r}"
            )
    plan: list = []
    changed = True
    while changed:
        changed = False
        fields = df.schema.fields
        cols = []
        for f in fields:
            dt = f.dataType
            if isinstance(dt, T.StructType):
                changed = True
                leaves = []
                for sub in dt.fields:
                    if SEP in sub.name:
                        raise ValueError(
                            f"struct field {f.name}.{sub.name!r} contains "
                            f"the reserved flatten separator {SEP!r}"
                        )
                    leaf = f"{f.name}{SEP}{sub.name}"
                    cols.append(_q(f.name).getField(sub.name).alias(leaf))
                    leaves.append((sub.name, leaf))
                valid_leaf = None
                if f.nullable:
                    valid_leaf = f"{f.name}{SEP}{VALID_LEAF}"
                    cols.append(_q(f.name).isNotNull().alias(valid_leaf))
                plan.append(("struct", f.name, leaves, valid_leaf))
            elif isinstance(dt, T.MapType):
                # ANY value type works: struct values surface as an
                # array<struct> leaf, array/map values as array<array> /
                # array<map> leaves — all shredded further on later passes
                # (KeyValueReader over group values, reference
                # src/record/reader.rs:241-302)
                changed = True
                k_leaf = f"{f.name}{SEP}{KEYS_LEAF}"
                v_leaf = f"{f.name}{SEP}{VALS_LEAF}"
                cols.append(F.map_keys(_q(f.name)).alias(k_leaf))
                cols.append(F.map_values(_q(f.name)).alias(v_leaf))
                plan.append(("map", f.name, k_leaf, v_leaf))
            elif isinstance(dt, T.ArrayType) and isinstance(
                dt.elementType, T.StructType
            ):
                # repeated group: shred array<struct<a,b>> into parallel
                # array<a>/array<b> leaves — all leaves share the record's
                # length/null structure, so arrays_zip reassembles exactly
                changed = True
                leaves = []
                for sub in dt.elementType.fields:
                    if SEP in sub.name:
                        raise ValueError(
                            f"struct field {f.name}.{sub.name!r} contains "
                            f"the reserved flatten separator {SEP!r}"
                        )
                    leaf = f"{f.name}{SEP}{sub.name}"
                    # closure factory, NOT a default arg: F.transform treats
                    # a two-parameter lambda as (element, index)
                    getter = (lambda s: lambda x: x[s])(sub.name)
                    cols.append(F.transform(_q(f.name), getter).alias(leaf))
                    leaves.append((sub.name, leaf))
                ev_leaf = None
                if dt.containsNull:
                    # a null struct ELEMENT shreds to nulls in every leaf —
                    # indistinguishable from a struct of nulls without its
                    # own def-level bit
                    ev_leaf = f"{f.name}{SEP}{EVALID_LEAF}"
                    cols.append(
                        F.transform(_q(f.name), lambda x: x.isNotNull()).alias(
                            ev_leaf
                        )
                    )
                plan.append(("array_struct", f.name, leaves, ev_leaf))
            elif isinstance(dt, T.ArrayType) and isinstance(
                dt.elementType, T.ArrayType
            ):
                # two rep levels: array<array<T>> decomposes into an inner-
                # lengths leaf (size(null inner) = -1 marks null inner
                # arrays) and one flattened array<T> leaf; T may itself be
                # nested — the loop shreds whatever comes out next pass
                changed = True
                lens_leaf = f"{f.name}{SEP}{LENS_LEAF}"
                flat_leaf = f"{f.name}{SEP}{FLAT_LEAF}"
                empty = F.array().cast(dt.elementType.simpleString())
                cols.append(
                    F.transform(_q(f.name), lambda x: F.size(x)).alias(lens_leaf)
                )
                cols.append(
                    F.flatten(
                        F.transform(
                            _q(f.name),
                            (lambda e: lambda x: F.coalesce(x, e))(empty),
                        )
                    ).alias(flat_leaf)
                )
                plan.append(("array_array", f.name, lens_leaf, flat_leaf))
            elif isinstance(dt, T.ArrayType) and isinstance(
                dt.elementType, T.MapType
            ):
                # array<map<k,v>> -> parallel array<array<k>> / array<array<v>>
                # leaves (null maps ride as null inner arrays); both recurse
                # through the array<array> branch next pass
                changed = True
                k_leaf = f"{f.name}{SEP}{KEYS_LEAF}"
                v_leaf = f"{f.name}{SEP}{VALS_LEAF}"
                cols.append(
                    F.transform(_q(f.name), lambda x: F.map_keys(x)).alias(k_leaf)
                )
                cols.append(
                    F.transform(_q(f.name), lambda x: F.map_values(x)).alias(v_leaf)
                )
                plan.append(("array_map", f.name, k_leaf, v_leaf))
            else:
                cols.append(_q(f.name))
        if changed:
            df = df.select(*cols)
    return df, plan


def rebuild(df: DataFrame, plan: list) -> DataFrame:
    """Inverse of :func:`flatten`: reassemble structs/maps from decoded
    leaves (inner-most steps were appended last, so apply in reverse)."""
    for step in reversed(plan):
        if step[0] == "array_array":
            _, name, lens_leaf, flat_leaf = step
            lens, flat = _q(lens_leaf), _q(flat_leaf)
            # running offsets per row (array-concat fold: O(k^2) element
            # copies for k inner arrays — fine for record-shaped data; rows
            # with thousands of inner arrays should explode to rows instead)
            offs = F.aggregate(
                lens,
                F.array(F.lit(0)),
                lambda acc, x: F.concat(
                    acc, F.array(F.element_at(acc, -1) + F.greatest(x, F.lit(0)))
                ),
            )
            built = F.zip_with(
                lens,
                F.slice(offs, 1, F.size(lens)),
                (lambda fl: lambda ln, off: F.when(
                    ln >= 0, F.slice(fl, off + 1, ln)
                ))(flat),
            )
            df = df.withColumn(name, built).drop(lens_leaf, flat_leaf)
        elif step[0] == "array_map":
            _, name, k_leaf, v_leaf = step
            built = F.zip_with(
                _q(k_leaf), _q(v_leaf), lambda k, v: F.map_from_arrays(k, v)
            )
            df = df.withColumn(name, built).drop(k_leaf, v_leaf)
        elif step[0] == "array_struct":
            _, name, leaves, ev_leaf = step
            built = F.arrays_zip(*[_q(leaf).alias(sub) for sub, leaf in leaves])
            if ev_leaf is not None:
                built = F.zip_with(
                    built, _q(ev_leaf), lambda s, v: F.when(v, s)
                )
            drop = [leaf for _, leaf in leaves] + (
                [ev_leaf] if ev_leaf else []
            )
            df = df.withColumn(name, built).drop(*drop)
        elif step[0] == "struct":
            _, name, leaves, valid_leaf = step
            built = F.struct(*[_q(leaf).alias(sub) for sub, leaf in leaves])
            if valid_leaf is not None:
                built = F.when(_q(valid_leaf), built)
            drop = [leaf for _, leaf in leaves] + (
                [valid_leaf] if valid_leaf else []
            )
            df = df.withColumn(name, built).drop(*drop)
        else:
            _, name, k_leaf, v_leaf = step
            df = df.withColumn(
                name, F.map_from_arrays(_q(k_leaf), _q(v_leaf))
            ).drop(k_leaf, v_leaf)
    return df


def encode_nested_table(df: DataFrame, **encode_kwargs):
    """Convenience: flatten -> derive -> encode. Returns (chunks, cols, plan);
    decode with ``nested.rebuild(decode.decode_table(chunks, cols), plan)``."""
    from . import encode as encode_job

    flat, plan = flatten(df)
    cols = encode_job.derive_columns(flat)
    chunks = encode_job.encode_table(flat, columns=cols, **encode_kwargs)
    return chunks, cols, plan
