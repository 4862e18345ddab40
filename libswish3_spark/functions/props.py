"""Typed property consumption (the index-sink side of P7/C2).

The engine stores every property as text (reference: property values
are always ``xmlChar*``; libswish3.h:102-104 types them only logically).
The CONSUMER applies the type system — ``swish_xapian.cpp:449-483``
replaces bumper bytes with spaces and serializes ``SWISH_PROP_INT``
values numerically (``sortable_serialise(string_to_int(...))``),
``SWISH_PROP_DATE`` at query time (swish_xapian.cpp:937+).

These are JVM column expressions over the ``properties`` map column of
the extracted table, so typed consumption stays inside whole-stage
codegen and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from libswish3_spark.config import (
    PROP_DATE,
    PROP_INT,
    Property,
    SwishConfig,
    TOKENPOS_BUMPER,
)


def utf8_byte_truncate(v: Column, nbytes: int) -> Column:
    """Truncate to the longest character prefix of at most ``nbytes``
    UTF-8 bytes. ``Property.max`` is a BYTE count in the reference
    (unsigned int prefix of a C string, libswish3.h:357 — the same
    rationale as sort_key's byte-based sort_length), not a character
    count. A multibyte character split by the byte cap is dropped
    whole: the cut backs off past the split character's bytes (its lead
    is within the last 3 bytes of the prefix — UTF-8 chars are ≤ 4
    bytes), so the result is exactly the store-time path
    ``encode()[:max].decode(errors='ignore')`` for valid input. A
    LITERAL U+FFFD already in the value survives (it is three intact
    bytes) — an earlier make_valid_utf8 + strip-trailing-U+FFFD version
    wrongly shortened values that legitimately end in U+FFFD."""
    full = F.encode(v, "utf-8")

    def _is_cont(i: int) -> Column:
        # byte i (1-based) of the encoded value is a UTF-8 continuation
        # byte 0x80-0xBF; a beyond-end probe hexes to '' → conv 0 → False
        b = F.conv(F.hex(F.substring(full, i, 1)), 16, 10).cast("int")
        return (b >= 128) & (b <= 191)

    back = (
        F.when(~_is_cont(nbytes), F.lit(1))
        .when(~_is_cont(nbytes - 1), F.lit(2))
        .otherwise(F.lit(3))
    )
    cut = F.when(
        (F.octet_length(full) <= nbytes) | ~_is_cont(nbytes + 1),
        F.lit(nbytes),
    ).otherwise(F.lit(nbytes) - back)
    return F.substring(full, 1, cut).cast("string")


def typed_property(props_col, prop: Property) -> Column:
    """One property's typed value from the ``properties`` map column.

    Mirrors the Xapian consumer: multi-segment values join with a space
    where the engine wrote a bumper byte (swish_xapian.cpp:460-470);
    ``string_to_int`` is C ``atoi`` — leading integer parse, not a
    strict cast (swish_xapian.cpp:478); dates parse to timestamps.
    """
    v = F.element_at(props_col, prop.alias_for or prop.name)
    v = F.regexp_replace(v, TOKENPOS_BUMPER, " ")
    if prop.max and prop.max > 0:
        v = utf8_byte_truncate(v, prop.max)
    if prop.type == PROP_INT:
        # atoi semantics: optional sign + leading digits, else 0
        digits = F.regexp_extract(v, r"^[ \t]*([+-]?[0-9]+)", 1)
        return F.when(digits == "", F.lit(0)).otherwise(digits.cast("long"))
    if prop.type == PROP_DATE:
        return F.to_timestamp(v)
    return v


def sort_key(props_col, prop: Property) -> Column:
    """Consumer-side ordering key for a property (the reference's
    sort/presort/sort_length hints, property.c:41-43: consumers sort on
    the first ``sort_length`` bytes; swish_xapian.cpp:1041 builds its
    sort value the same way).

    NULL for ``sort=False`` properties (declared unsortable, like the
    default swishdescription); otherwise the bumper-joined, max-capped
    value, case-folded when ``ignore_case``, truncated to
    ``sort_length`` BYTES (0 = whole value). ``sort_length`` is a byte
    count in the reference (unsigned int prefix of a C string,
    libswish3.h:357), not a character count — so the truncated key is
    the hex encoding of the first sort_length UTF-8 bytes: fixed two
    chars per byte with digits '0-9A-F' in ascending ASCII order, so
    lexicographic order on the key == memcmp on the byte prefix, which
    is exactly the ordering a C consumer of the reference sees. Keys
    are only ever compared within one property (same sort_length), so
    the representation switch is consistent. ``presort`` is an
    indexer-side materialization hint — in Spark terms: compute this
    column once at write time and sortWithinPartitions/Z-order on it,
    instead of re-deriving it per query."""
    if not prop.sort:
        return F.lit(None).cast("string")
    v = F.element_at(props_col, prop.alias_for or prop.name)
    v = F.regexp_replace(v, TOKENPOS_BUMPER, " ")
    if prop.max and prop.max > 0:
        v = utf8_byte_truncate(v, prop.max)
    if prop.ignore_case:
        v = F.lower(v)
    if prop.sort_length and prop.sort_length > 0:
        v = F.substring(F.hex(F.encode(v, "utf-8")), 1, 2 * prop.sort_length)
    return v


def typed_properties(
    extracted: DataFrame,
    config: SwishConfig,
    keep: tuple[str, ...] = ("doc_id",),
    with_sort_keys: bool = False,
) -> DataFrame:
    """Extracted table → one typed column per configured property.

    Column types follow the config: PROP_INT → long, PROP_DATE →
    timestamp, PROP_STRING → string (max-capped). Aliases resolve to
    their target's stored value, like ``add_stack_to_prop_buf``'s
    alias redirect (parser.c:2882-2890). ``with_sort_keys`` adds a
    ``<name>_sortkey`` column per sortable property (see sort_key).
    """
    cols = [F.col(c) for c in keep]
    for name in sorted(config.properties):
        prop = config.properties[name]
        cols.append(typed_property(F.col("properties"), prop).alias(name))
        if with_sort_keys and prop.sort:
            cols.append(sort_key(F.col("properties"), prop).alias(f"{name}_sortkey"))
    return extracted.select(*cols)
