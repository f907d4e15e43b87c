"""Column-level transforms — the Catalyst-native part of the pipeline.

Read-path map projections (P9, reference README.md:69-73), key normalization
(P4, main.go:331-334), null elimination (P6, main.go:312), forced numeric
coercion (P5, main.go:339-345) and promoted materialized columns
(README.md:69-91) — all as pure Column expressions so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def field_string(key: str) -> Column:
    """``fields_string['key']`` — P9/F3, reference README.md:69-70."""
    return F.element_at(F.col("fields_string"), key)


def field_number(key: str) -> Column:
    """``fields_number['key']`` — P9/F4, reference README.md:72-73."""
    return F.element_at(F.col("fields_number"), key)


def has_field(column: str, key: str) -> Column:
    """Map-key existence (F5) — ``mapContains`` equivalent."""
    return F.array_contains(F.map_keys(F.col(column)), key)


def normalize_keys(map_col: Column) -> Column:
    """Force_Underscores on an existing map: '.' -> '_' (main.go:331-334)."""
    return F.transform_keys(map_col, lambda k, _: F.replace(k, F.lit("."), F.lit("_")))


def drop_null_values(map_col: Column) -> Column:
    """Null elimination (P6): nil-valued fields are never stored (main.go:312)."""
    return F.map_filter(map_col, lambda _, v: v.isNotNull())


def force_numbers(df: DataFrame, keys: list[str]) -> DataFrame:
    """Forced numeric coercion (P5) applied at rest: for each key, values in
    ``fields_string`` that parse as double move to ``fields_number``; parse
    failures stay strings (main.go:339-345).
    """
    out = df
    for key in keys:
        parsed = field_string(key).try_cast("double")
        moved = parsed.isNotNull() & has_field("fields_string", key)
        out = out.withColumn(
            "fields_number",
            F.when(
                moved,
                F.map_concat(
                    F.map_filter(F.col("fields_number"), lambda k, _: k != F.lit(key)),
                    F.create_map(F.lit(key), parsed),
                ),
            ).otherwise(F.col("fields_number")),
        ).withColumn(
            "fields_string",
            F.when(
                moved,
                F.map_filter(F.col("fields_string"), lambda k, _: k != F.lit(key)),
            ).otherwise(F.col("fields_string")),
        )
    return out


def parse_logfmt(log: Column) -> Column:
    """Parse a logfmt-style line (``k=v k2=v2 ...``) into a string map.

    The read-path twin of Fluent Bit's logfmt parser: tokens without ``=``
    become null-valued entries and are dropped (P6 semantics). Pure
    ``str_to_map`` — stays in codegen.
    """
    return drop_null_values(F.str_to_map(log, F.lit(" "), F.lit("=")))


def merge_log_json(df: DataFrame, log_col: str = "log") -> DataFrame:
    """Merge_Log equivalent (reference cluster/fluent-bit.yaml:83-84): when
    the raw line is a JSON object, parse it and merge its scalar fields into
    ``fields_string`` (stringified, like the upstream filter does before the
    plugin's type dispatch). Non-JSON lines pass through unchanged."""
    parsed = F.from_json(F.col(log_col), "map<string,string>")
    # existing keys win: map_concat raises on duplicates under the default
    # dedup policy, so restrict the merged map to genuinely-new keys
    new_entries = F.map_filter(
        drop_null_values(parsed),
        lambda k, _: ~F.array_contains(F.map_keys(F.col("fields_string")), k),
    )
    return df.withColumn(
        "fields_string",
        F.when(
            parsed.isNotNull(),
            F.map_concat(F.col("fields_string"), new_entries),
        ).otherwise(F.col("fields_string")),
    )


def promote_string_field(df: DataFrame, key: str, column: str) -> DataFrame:
    """Materialized fast-path column for a hot map key.

    Parity with the reference's ``ALTER TABLE ... ADD COLUMN content_level
    String DEFAULT fields_string['content.level']`` + MATERIALIZE COLUMN
    recipe (README.md:69-91). Written as a real column so filters on it scan a
    dictionary-encoded parquet column instead of the whole map (SURVEY §4
    option b — no custom Catalyst rule needed; Catalyst prunes the map column
    away when only the promoted column is referenced).
    """
    return df.withColumn(column, field_string(key))


def promote_number_field(df: DataFrame, key: str, column: str) -> DataFrame:
    """Numeric variant of :func:`promote_string_field` (README.md:72-73)."""
    return df.withColumn(column, field_number(key))
