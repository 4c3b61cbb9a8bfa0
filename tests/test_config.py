"""INI config front end: the reference's entry shape
(config.py:89-156, archiver_sample.ini) must drive Archiver.run()
end-to-end — section interpolation, boolean coercion, canonical-where
translation, {now} freezing, dry-run."""

from __future__ import annotations

import glob
from datetime import datetime

import pytest

from osarchiver_spark.operators.archive import Archiver
from osarchiver_spark.plans.config import (
    ConfigError,
    load_config,
    parse_retention_months,
)
from osarchiver_spark.sources.parquet import load_table

INI = """
[DEFAULT]
enable=false
archive_data=true
delete_data=false
deleted_column=o_orderdate
retention=36 MONTH
where=${deleted_column} <= SUBDATE('{now}', INTERVAL ${retention})

[archiver:orders]
src=orders_src
dst=file_archiver, db_archiver
enable=true

[archiver:disabled_one]
src=orders_src
enable=false

[src:orders_src]
backend=parquet
directory={SF}
now=2001-12-01T00:00:00
primary_keys=orders:o_orderkey
tables=orders

[dst:file_archiver]
backend=file
directory={OUT}/files
formats=csv,sql

[dst:db_archiver]
backend=parquet
directory={OUT}/arch
"""


def _render(sf_dir: str, out: str) -> str:
    return INI.replace("{SF}", sf_dir).replace("{OUT}", out)


def test_parse_retention():
    assert parse_retention_months("12 MONTH") == 12
    assert parse_retention_months("2 YEAR") == 24
    with pytest.raises(ConfigError):
        parse_retention_months("7 DAY")


def test_load_config_shape(sf_small, tmp_path):
    archivers = load_config(text=_render(sf_small, str(tmp_path)))
    assert len(archivers) == 1  # disabled archiver skipped
    a = archivers[0]
    assert a.name == "orders" and a.src_name == "orders_src"
    # canonical SUBDATE where -> engine retention; ExtendedInterpolation
    # resolved ${deleted_column}/${retention} from DEFAULT
    assert a.spec.retention_months == 36 and a.where_sql is None
    assert a.spec.now == datetime(2001, 12, 1)
    assert not a.spec.delete_data  # boolean coercion from DEFAULT
    assert [t.name for t in a.spec.tables] == ["orders"]
    assert a.spec.tables[0].primary_key == "o_orderkey"
    assert len(a.sinks) == 3  # csv + sql + parquet archive


def test_config_drives_archiver_end_to_end(spark, sf_small, tmp_path):
    cfg = tmp_path / "archiver.ini"
    cfg.write_text(_render(sf_small, str(tmp_path)))
    (a,) = load_config(path=str(cfg))
    results = Archiver(a.spec, a.sinks).run(a.dataframes(spark))
    assert results[0].error is None
    orders = load_table(spark, sf_small, "orders")
    expect = orders.filter("o_orderdate <= timestamp'1998-12-01 00:00:00'").count()
    assert results[0].archived_rows == expect > 0
    # every configured format materialized
    assert glob.glob(str(tmp_path / "files" / "*" / "orders.csv" / "part-*"))
    assert glob.glob(str(tmp_path / "files" / "*" / "orders.sql" / "part-*"))
    archived = spark.read.parquet(str(tmp_path / "arch" / "orders"))
    assert archived.count() == expect


def test_config_dry_run_writes_nothing(spark, sf_small, tmp_path):
    (a,) = load_config(text=_render(sf_small, str(tmp_path)), dry_run=True)
    results = Archiver(a.spec, a.sinks).run(a.dataframes(spark))
    assert results[0].dry_run and results[0].archived_rows > 0
    assert glob.glob(str(tmp_path / "**" / "part-*"), recursive=True) == []


def test_cli_end_to_end(spark, sf_small, tmp_path, capsys):
    from osarchiver_spark.main import run

    cfg = tmp_path / "archiver.ini"
    cfg.write_text(_render(sf_small, str(tmp_path)))
    assert run(["--config", str(cfg), "--dry-run"]) == 0


def test_custom_where_is_spark_sql(spark, sf_small, tmp_path):
    ini = _render(sf_small, str(tmp_path)).replace(
        "where=${deleted_column} <= SUBDATE('{now}', INTERVAL ${retention})",
        "where=o_orderstatus = 'F' AND o_orderdate <= timestamp'{now}'",
    )
    (a,) = load_config(text=ini)
    assert a.where_sql == "o_orderstatus = 'F' AND o_orderdate <= timestamp'2001-12-01 00:00:00'"
    dfs = a.dataframes(spark)
    assert dfs["orders"].filter("o_orderstatus <> 'F'").count() == 0
