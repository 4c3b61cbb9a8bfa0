from __future__ import annotations

from datetime import datetime

import pytest

from osarchiver_spark.plans.naming import (
    SelfOverwriteError,
    render_suffix,
    resolve_archive_path,
)


def test_date_templating():
    now = datetime(2001, 12, 1, 10, 30, 0)
    assert render_suffix("_{date}", now) == "_2001-12-01_10-30-00"


def test_disjoint_paths_ok():
    out = resolve_archive_path("/data/src/orders", "/data/archive", "orders", "_arch")
    assert out == "/data/archive/orders_arch"


def test_self_overwrite_rejected():
    with pytest.raises(SelfOverwriteError):
        resolve_archive_path("/data/src/orders", "/data/src", "orders")
    with pytest.raises(SelfOverwriteError):  # archive root inside source
        resolve_archive_path("/data/src", "/data/src/arch", "orders")


def test_csv_sink_compression(spark, sf_small, tmp_path):
    # S15: compression is a writer codec, not a post-hoc shutil pass
    import glob

    from osarchiver_spark.sinks.base import CsvSink
    from osarchiver_spark.sources.parquet import load_table

    orders = load_table(spark, sf_small, "orders")
    CsvSink(str(tmp_path), compression="gzip").write("orders", orders)
    parts = glob.glob(str(tmp_path / "orders.csv" / "part-*.csv.gz"))
    assert parts, "expected gzip-compressed csv parts"
