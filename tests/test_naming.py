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
    parts = glob.glob(str(tmp_path / "*" / "orders.csv" / "part-*.csv.gz"))
    assert parts, "expected gzip-compressed csv parts under the dated run dir"


def test_file_sinks_do_not_clobber_previous_runs(spark, sf_small, tmp_path):
    # run N+1 must not overwrite run N's archive (those rows are gone
    # from the source after the delete step)
    import glob
    from datetime import datetime

    from osarchiver_spark.sinks.base import CsvSink
    from osarchiver_spark.sources.parquet import load_table

    orders = load_table(spark, sf_small, "orders").limit(10)
    sink = CsvSink(str(tmp_path))
    sink.begin_run(datetime(2001, 1, 1))
    sink.write("orders", orders)
    sink.begin_run(datetime(2001, 2, 1))
    sink.write("orders", orders)
    runs = glob.glob(str(tmp_path / "*" / "orders.csv"))
    assert len(runs) == 2, runs
