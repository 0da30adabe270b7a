"""Object-store registration (datafusion-cli/src/object_storage.rs parity)
and CREATE OR REPLACE TABLE swap semantics (sql/src/statement.rs
or_replace: the old table must survive a failing replacement)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.context import (  # noqa: E402
    SessionContext,
    _resolve_object_store_location,
)


def test_s3_location_scheme_and_per_bucket_credentials(spark):
    opts = {
        "aws.access_key_id": "AKIDEXAMPLE",
        "aws.secret_access_key": "SECRETEXAMPLE",
        "aws.region": "eu-central-1",
        "aws.endpoint": "http://localhost:9000",
        "aws.allow_http": "true",
        "format.has_header": "true",  # non-store option must be ignored
    }
    path = _resolve_object_store_location(spark, "s3://bkt-a/data/t.parquet", opts)
    assert path == "s3a://bkt-a/data/t.parquet"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.bucket.bkt-a.access.key") == "AKIDEXAMPLE"
    assert hconf.get("fs.s3a.bucket.bkt-a.secret.key") == "SECRETEXAMPLE"
    assert hconf.get("fs.s3a.bucket.bkt-a.endpoint.region") == "eu-central-1"
    assert hconf.get("fs.s3a.bucket.bkt-a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.bucket.bkt-a.connection.ssl.enabled") == "false"
    # a second bucket's credentials must not clobber the first's
    _resolve_object_store_location(
        spark, "s3://bkt-b/x", {"aws.access_key_id": "K2", "aws.secret_access_key": "S2"}
    )
    assert hconf.get("fs.s3a.bucket.bkt-a.access.key") == "AKIDEXAMPLE"
    assert hconf.get("fs.s3a.bucket.bkt-b.access.key") == "K2"


def test_oss_requires_endpoint_and_gs_passthrough(spark):
    with pytest.raises(ValueError, match="endpoint"):
        _resolve_object_store_location(spark, "oss://b/x", {})
    assert (
        _resolve_object_store_location(
            spark, "oss://b/x", {"aws.endpoint": "http://oss.example"}
        )
        == "s3a://b/x"
    )
    assert _resolve_object_store_location(spark, "gs://b/x", {}) == "gs://b/x"
    # local paths and file:// URLs pass through untouched
    assert _resolve_object_store_location(spark, "/tmp/x.parquet", None) == "/tmp/x.parquet"
    assert _resolve_object_store_location(spark, "file:///tmp/x", None) == "file:///tmp/x"


def test_create_external_table_file_scheme(spark, sf_dir):
    ctx = SessionContext(spark)
    ctx.sql(
        "CREATE EXTERNAL TABLE ext_region_file STORED AS PARQUET "
        f"LOCATION 'file://{os.path.join(sf_dir, 'region.parquet')}'"
    )
    assert ctx.sql("SELECT count(*) AS n FROM ext_region_file").first().n == 5
    ctx.deregister_table("ext_region_file")


def test_create_or_replace_table_preserves_old_on_failure(spark):
    ctx = SessionContext(spark)
    ctx.spark.sql("DROP TABLE IF EXISTS cor_t")
    ctx.sql("CREATE TABLE cor_t AS SELECT 1 AS a")
    assert ctx.sql("SELECT a FROM cor_t").first().a == 1
    # a failing replacement must leave the original table readable
    with pytest.raises(Exception):
        ctx.sql("CREATE OR REPLACE TABLE cor_t AS SELECT * FROM no_such_table_xyz")
    assert ctx.sql("SELECT a FROM cor_t").first().a == 1
    # a succeeding replacement swaps the contents
    ctx.sql("CREATE OR REPLACE TABLE cor_t AS SELECT 2 AS a, 'x' AS b")
    row = ctx.sql("SELECT a, b FROM cor_t").first()
    assert (row.a, row.b) == (2, "x")
    # temp name must not leak
    assert not ctx.table_exist("cor_t__cor_new")
    ctx.spark.sql("DROP TABLE IF EXISTS cor_t")
