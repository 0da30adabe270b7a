"""DataFusion-compatible session configuration registry.

The reference exposes a typed configuration namespace (``datafusion.*``)
through ``SET`` / ``SHOW`` SQL and the ``information_schema.df_settings``
view (datafusion/common/src/config.rs ``ConfigOptions``;
datafusion/core/src/catalog/information_schema.rs ``DfSettingsTable``;
SET/SHOW statement handling in datafusion/sql/src/planner.rs and
sqllogictest coverage in test_files/set_variable.slt, options.slt,
information_schema.slt).

This module mirrors that surface: the same key namespace and defaults,
the same typed parse errors (``Error parsing abc as bool`` /
``Error parsing -1 as usize``), and — where a key has a real Spark
equivalent — a live mapping onto the SparkSession conf so the setting
actually changes engine behavior:

==============================================  =============================
DataFusion key                                  Spark effect
==============================================  =============================
datafusion.execution.target_partitions          spark.sql.shuffle.partitions
datafusion.execution.batch_size                 Arrow maxRecordsPerBatch
datafusion.execution.time_zone                  spark.sql.session.timeZone
datafusion.execution.coalesce_batches           AQE coalescePartitions
datafusion.execution.parquet.compression        parquet compression codec
datafusion.optimizer.prefer_hash_join           preferSortMergeJoin (inverse)
datafusion.catalog.information_schema           gates information_schema SQL
datafusion.catalog.has_header                   CSV default header
datafusion.execution.enable_recursive_ctes      gates WITH RECURSIVE
datafusion.sql_parser.parse_float_as_decimal    decimal literal typing
datafusion.catalog.default_catalog/_schema      information_schema display
==============================================  =============================

Unmapped keys are accepted, validated, stored, and visible through
SHOW/df_settings — exactly like the reference, where many options only
influence subsystems a given query never touches.
"""

from __future__ import annotations

import re

_U64_MAX = 18446744073709551615

# key suffix (under "datafusion.") → (default value or callable, type)
# Types: "bool" / "usize" / "string" and Option<> variants "opt_bool" /
# "opt_usize" / "opt_f64" / "opt_string" (default NULL, shown as NULL).
# Machine-dependent defaults (target_partitions, planning_concurrency are
# "number of cores" in the reference) are callables evaluated at init.


def _cores(spark) -> str:
    return str(spark.sparkContext.defaultParallelism)


_REGISTRY: dict[str, tuple[object, str]] = {
    "catalog.create_default_catalog_and_schema": ("true", "bool"),
    "catalog.default_catalog": ("datafusion", "string"),
    "catalog.default_schema": ("public", "string"),
    "catalog.format": (None, "opt_string"),
    "catalog.has_header": ("false", "bool"),
    "catalog.information_schema": ("false", "bool"),
    "catalog.location": (None, "opt_string"),
    "execution.aggregate.scalar_update_factor": ("10", "usize"),
    "execution.batch_size": ("8192", "usize"),
    "execution.coalesce_batches": ("true", "bool"),
    "execution.collect_statistics": ("false", "bool"),
    "execution.enable_recursive_ctes": ("true", "bool"),
    "execution.keep_partition_by_columns": ("false", "bool"),
    "execution.listing_table_ignore_subdirectory": ("true", "bool"),
    "execution.max_buffered_batches_per_output_file": ("2", "usize"),
    "execution.meta_fetch_concurrency": ("32", "usize"),
    "execution.minimum_parallel_output_files": ("4", "usize"),
    "execution.parquet.allow_single_file_parallelism": ("true", "bool"),
    "execution.parquet.bloom_filter_fpp": (None, "opt_f64"),
    "execution.parquet.bloom_filter_ndv": (None, "opt_usize"),
    "execution.parquet.bloom_filter_on_read": ("true", "bool"),
    "execution.parquet.bloom_filter_on_write": ("false", "bool"),
    "execution.parquet.column_index_truncate_length": (None, "opt_usize"),
    "execution.parquet.compression": ("zstd(3)", "opt_string"),
    "execution.parquet.created_by": ("datafusion", "string"),
    "execution.parquet.data_page_row_count_limit": (str(_U64_MAX), "usize"),
    "execution.parquet.data_pagesize_limit": ("1048576", "usize"),
    "execution.parquet.dictionary_enabled": (None, "opt_bool"),
    "execution.parquet.dictionary_page_size_limit": ("1048576", "usize"),
    "execution.parquet.enable_page_index": ("true", "bool"),
    "execution.parquet.encoding": (None, "opt_string"),
    "execution.parquet.max_row_group_size": ("1048576", "usize"),
    "execution.parquet.max_statistics_size": (None, "opt_usize"),
    "execution.parquet.maximum_buffered_record_batches_per_stream": ("2", "usize"),
    "execution.parquet.maximum_parallel_row_group_writers": ("1", "usize"),
    "execution.parquet.metadata_size_hint": (None, "opt_usize"),
    "execution.parquet.pruning": ("true", "bool"),
    "execution.parquet.pushdown_filters": ("false", "bool"),
    "execution.parquet.reorder_filters": ("false", "bool"),
    "execution.parquet.skip_metadata": ("true", "bool"),
    "execution.parquet.statistics_enabled": (None, "opt_string"),
    "execution.parquet.write_batch_size": ("1024", "usize"),
    "execution.parquet.writer_version": ("1.0", "string"),
    "execution.planning_concurrency": (_cores, "usize"),
    "execution.soft_max_rows_per_output_file": ("50000000", "usize"),
    "execution.sort_in_place_threshold_bytes": ("1048576", "usize"),
    "execution.sort_spill_reservation_bytes": ("10485760", "usize"),
    "execution.split_file_groups_by_statistics": ("false", "bool"),
    "execution.target_partitions": (_cores, "usize"),
    "execution.time_zone": ("+00:00", "string"),
    "explain.logical_plan_only": ("false", "bool"),
    "explain.physical_plan_only": ("false", "bool"),
    "explain.show_schema": ("false", "bool"),
    "explain.show_sizes": ("true", "bool"),
    "explain.show_statistics": ("false", "bool"),
    "optimizer.allow_symmetric_joins_without_pruning": ("true", "bool"),
    "optimizer.default_filter_selectivity": ("20", "usize"),
    "optimizer.enable_distinct_aggregation_soft_limit": ("true", "bool"),
    "optimizer.enable_round_robin_repartition": ("true", "bool"),
    "optimizer.enable_topk_aggregation": ("true", "bool"),
    "optimizer.filter_null_join_keys": ("false", "bool"),
    "optimizer.hash_join_single_partition_threshold": ("1048576", "usize"),
    "optimizer.hash_join_single_partition_threshold_rows": ("131072", "usize"),
    "optimizer.max_passes": ("3", "usize"),
    "optimizer.prefer_existing_sort": ("false", "bool"),
    "optimizer.prefer_existing_union": ("false", "bool"),
    "optimizer.prefer_hash_join": ("true", "bool"),
    "optimizer.repartition_aggregations": ("true", "bool"),
    "optimizer.repartition_file_min_size": ("10485760", "usize"),
    "optimizer.repartition_file_scans": ("true", "bool"),
    "optimizer.repartition_joins": ("true", "bool"),
    "optimizer.repartition_sorts": ("true", "bool"),
    "optimizer.repartition_windows": ("true", "bool"),
    "optimizer.skip_failed_rules": ("false", "bool"),
    "optimizer.top_down_join_key_reordering": ("true", "bool"),
    "sql_parser.dialect": ("generic", "string"),
    "sql_parser.enable_ident_normalization": ("true", "bool"),
    "sql_parser.parse_float_as_decimal": ("false", "bool"),
    "sql_parser.support_varchar_with_length": ("true", "bool"),
}

# Descriptions for SHOW ... VERBOSE — ours, focused on what the key does
# IN THIS ENGINE (the reference renders its own doc text here).
_DESCRIPTIONS = {
    "catalog.default_catalog": "Catalog name used in information_schema displays",
    "catalog.default_schema": "Schema name used in information_schema displays",
    "catalog.information_schema": "Whether information_schema SQL is available",
    "catalog.has_header": "Default CSV header behavior for CREATE EXTERNAL TABLE",
    "execution.batch_size": "Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch)",
    "execution.coalesce_batches": "Coalesce small partitions (AQE coalescePartitions)",
    "execution.target_partitions": "Shuffle parallelism (spark.sql.shuffle.partitions)",
    "execution.time_zone": "Session time zone (spark.sql.session.timeZone)",
    "execution.enable_recursive_ctes": "Whether WITH RECURSIVE is allowed",
    "execution.parquet.compression": "Parquet write compression codec",
    "optimizer.prefer_hash_join": "Prefer hash join over sort-merge join",
    "sql_parser.parse_float_as_decimal": "Type decimal literals as DECIMAL instead of DOUBLE",
}


def _normalize_tz(v: str) -> str:
    """'+08' / '+0800' → '+08:00' (the reference's Arrow timezone parser
    accepts these short offset spellings; Spark's ZoneId wants hh:mm)."""
    m = re.fullmatch(r"([+-])(\d{2})(?::?(\d{2}))?", v)
    if m:
        return f"{m.group(1)}{m.group(2)}:{m.group(3) or '00'}"
    return v


class Settings:
    """Per-SessionContext DataFusion-style settings store with Spark
    conf side-effects for the keys that map onto real engine behavior."""

    def __init__(self, spark):
        self.spark = spark
        self._values: dict[str, str | None] = {}
        for key, (default, _typ) in _REGISTRY.items():
            self._values[key] = default(spark) if callable(default) else default

    # -- lookup ----------------------------------------------------------

    @staticmethod
    def _suffix(key: str) -> str:
        """'datafusion.EXECUTION.batch_size' → 'execution.batch_size'
        (key lookup is case-insensitive in the reference)."""
        k = key.lower()
        if not k.startswith("datafusion."):
            raise ValueError(
                "Invalid or Unsupported Configuration: could not find config "
                f'namespace for key "{key}"'
            )
        suffix = k[len("datafusion."):]
        if suffix not in _REGISTRY:
            raise ValueError(
                "Invalid or Unsupported Configuration: could not find config "
                f'namespace for key "{key}"'
            )
        return suffix

    def is_known(self, key: str) -> bool:
        return key.lower().removeprefix("datafusion.") in _REGISTRY

    def get(self, key: str) -> str | None:
        return self._values[self._suffix(key)]

    def get_bool(self, key: str) -> bool:
        return self.get(key) == "true"

    def get_int(self, key: str) -> int:
        return int(self.get(key))

    # -- typed parse + set ----------------------------------------------

    def set(self, key: str, raw: str) -> None:
        suffix = self._suffix(key)
        typ = _REGISTRY[suffix][1]
        raw = raw.strip()
        if (raw[:1] in "'\"") and raw[-1:] == raw[:1]:
            raw = raw[1:-1]
        value = self._parse(suffix, typ, raw)
        self._values[suffix] = value
        self._apply(suffix, value)

    @staticmethod
    def _parse(suffix: str, typ: str, raw: str) -> str | None:
        if typ.startswith("opt_") and raw.upper() == "NULL":
            return None
        base = typ.removeprefix("opt_")
        if base == "bool":
            if raw.lower() in ("true", "false"):
                return raw.lower()
            raise ValueError(f"Error parsing {raw} as bool")
        if base == "usize":
            body = raw[1:] if raw[:1] == "+" else raw
            if body.startswith("-"):
                raise ValueError(f"Error parsing {raw} as usize")
            if not body.isdigit():
                if re.fullmatch(r"\d+\.\d+", body):
                    # the reference surfaces the underlying Rust parse error
                    raise ValueError("External error: invalid digit found in string")
                raise ValueError(f"Error parsing {raw} as usize")
            if int(body) > _U64_MAX:
                # Rust's u64::from_str overflows here
                raise ValueError(f"Error parsing {raw} as usize")
            return str(int(body))
        if base == "f64":
            try:
                return str(float(raw))
            except ValueError:
                raise ValueError(f"Error parsing {raw} as f64") from None
        return raw

    # -- Spark conf side-effects ----------------------------------------

    def _apply(self, suffix: str, value: str | None) -> None:
        conf = self.spark.conf
        if suffix == "execution.target_partitions" and int(value) > 0:
            conf.set("spark.sql.shuffle.partitions", value)
        elif suffix == "execution.batch_size" and int(value) > 0:
            conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", value)
        elif suffix == "execution.time_zone":
            try:
                conf.set("spark.sql.session.timeZone", _normalize_tz(value))
            except Exception:
                # the reference accepts the SET and fails at expression
                # evaluation for unparseable zones — keep the stored value
                pass
        elif suffix == "execution.coalesce_batches":
            conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled",
                "true" if value == "true" else "false",
            )
        elif suffix == "optimizer.prefer_hash_join":
            conf.set(
                "spark.sql.join.preferSortMergeJoin",
                "false" if value == "true" else "true",
            )
        elif suffix == "execution.parquet.compression" and value:
            codec = re.sub(r"\(.*\)$", "", value)  # zstd(3) → zstd
            if codec in ("zstd", "snappy", "gzip", "lz4", "brotli", "none",
                         "uncompressed", "lzo"):
                conf.set("spark.sql.parquet.compression.codec",
                         "uncompressed" if codec == "none" else codec)

    # -- display ---------------------------------------------------------

    def rows(self) -> list[tuple[str, str]]:
        """(name, value) rows for SHOW ALL / df_settings — NULL-valued
        options display the string NULL, like the reference."""
        return [
            (f"datafusion.{k}", "NULL" if v is None else v)
            for k, v in sorted(self._values.items())
        ]

    def describe(self, suffix: str) -> str:
        return _DESCRIPTIONS.get(
            suffix, f"DataFusion configuration option datafusion.{suffix}"
        )

    def verbose_rows(self) -> list[tuple[str, str, str]]:
        return [
            (name, value, self.describe(name.removeprefix("datafusion.")))
            for name, value in self.rows()
        ]
