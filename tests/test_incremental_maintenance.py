"""Cross-run incremental watermarks + archive compaction."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osarchiver_spark.operators.archive import Archiver
from osarchiver_spark.operators.maintenance import compact_parquet_dir, data_file_stats
from osarchiver_spark.plans.jobspec import ArchiveJobSpec, TableSpec
from osarchiver_spark.plans.watermark import WatermarkStore
from osarchiver_spark.sinks.base import ParquetArchiveSink
from osarchiver_spark.sources.parquet import load_table

T1 = datetime(1996, 1, 1)
T2 = datetime(1998, 1, 1)


def _spec(now, delete=False):
    return ArchiveJobSpec(
        tables=[TableSpec("orders", "o_orderkey", deleted_column="o_orderdate")],
        retention_months=0,
        now=now,
        delete_data=delete,
        archive_data=True,
    )


def test_watermark_bounds_second_run(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders")
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    sink1 = ParquetArchiveSink(str(tmp_path / "arch"), primary_keys={"orders": "o_orderkey"})

    r1 = Archiver(_spec(T1), [sink1], watermarks=wm).run({"orders": orders})
    n1 = r1[0].archived_rows
    assert n1 == orders.filter(F.col("o_orderdate") <= F.lit(T1)).count() > 0
    assert wm.get("orders") == T1

    # run 2 archives ONLY the (T1, T2] window — no re-scan of history
    r2 = Archiver(_spec(T2), [sink1], watermarks=wm).run({"orders": orders})
    n2 = r2[0].archived_rows
    expect2 = orders.filter(
        (F.col("o_orderdate") > F.lit(T1)) & (F.col("o_orderdate") <= F.lit(T2))
    ).count()
    assert n2 == expect2 > 0
    assert wm.get("orders") == T2
    # the two runs are disjoint and together equal the plain <= T2 set
    assert n1 + n2 == orders.filter(F.col("o_orderdate") <= F.lit(T2)).count()
    # and the lower bound reaches the scan as a pushed filter
    # (explain("formatted") prints scan metadata untruncated, unlike
    # executedPlan().toString() whose PushedFilters line is capped at
    # spark.sql.maxMetadataStringLength)
    import contextlib
    import io

    pred = (F.col("o_orderdate") <= F.lit(T2)) & (F.col("o_orderdate") > F.lit(T1))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        orders.filter(pred).explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThan(o_orderdate" in plan and "LessThanOrEqual(o_orderdate" in plan


def test_failed_sink_leaves_watermark(spark, sf_small, tmp_path):
    class Boom:
        def begin_run(self, now):
            pass

        def write(self, table, df):
            raise RuntimeError("sink down")

    orders = load_table(spark, sf_small, "orders")
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    res = Archiver(_spec(T1), [Boom()], watermarks=wm).run({"orders": orders})
    assert res[0].error is not None
    assert wm.get("orders") is None  # next run re-covers the window


def test_watermark_is_monotonic(tmp_path):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    wm.advance("t", T2)
    wm.advance("t", T1)  # stale advance must not move it backwards
    assert wm.get("t") == T2


def test_compaction_preserves_rows(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders")
    path = str(tmp_path / "many")
    orders.repartition(64).write.parquet(path)
    before, _ = data_file_stats(spark, path)
    assert before == 64
    b, a = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert (b, a) == (64, 1)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert back.join(orders, "o_orderkey", "left_anti").count() == 0
    # idempotent: already compact -> no rewrite
    assert compact_parquet_dir(spark, path, target_bytes=1 << 30) == (1, 1)


def test_restore_roundtrip(spark, sf_small, tmp_path):
    """archive -> delete -> restore puts every archived row back;
    a second restore is a no-op (idempotent, like the sinks)."""
    from osarchiver_spark.operators.restore import restore_candidates, restore_report

    orders = load_table(spark, sf_small, "orders")
    cutoff = datetime(1996, 1, 1)
    archived = orders.filter(F.col("o_orderdate") <= F.lit(cutoff))
    remaining = orders.filter(
        (F.col("o_orderdate") > F.lit(cutoff)) | F.col("o_orderdate").isNull()
    )
    n_arch, n_rem = archived.count(), remaining.count()
    assert n_arch > 0 and n_arch + n_rem == orders.count()

    todo = restore_candidates(archived, remaining, "o_orderkey")
    assert todo.count() == n_arch
    restored = remaining.unionByName(todo)
    assert restored.count() == orders.count()
    assert restored.join(orders, "o_orderkey", "left_anti").count() == 0

    # idempotent: second pass selects nothing
    assert restore_candidates(archived, restored, "o_orderkey").count() == 0

    # windowed restore touches only the window
    lo, hi = datetime(1995, 1, 1), datetime(1995, 7, 1)
    win = restore_candidates(archived, remaining, "o_orderkey", "o_orderdate", (lo, hi))
    expect = archived.filter(
        (F.col("o_orderdate") > F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    ).count()
    assert win.count() == expect > 0

    rep = restore_report(archived, restored, "o_orderkey").collect()[0]
    assert rep["restorable"] == 0 and rep["already_in_source"] == n_arch


def test_watermark_concurrent_advances_keep_all_tables(tmp_path):
    """Parallel table threads advance the shared store concurrently;
    no entry may be lost to a read-modify-write race."""
    from concurrent.futures import ThreadPoolExecutor

    wm = WatermarkStore(str(tmp_path / "wm.json"))
    tables = [f"t{i}" for i in range(24)]
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: wm.advance(t, T1), tables))
    for t in tables:
        assert wm.get(t) == T1, f"lost concurrent advance for {t}"


def test_compact_partitioned_store_preserves_layout_and_content(
    spark, sf_small, tmp_path
):
    """The serving-store compaction (operators/maintenance.py::
    compact_partitioned_store): after N per-drop appends each cid dir
    holds N small files; compaction must collapse them WITHOUT
    disturbing the hive layout, the row content, or the probe
    results — and compact_parquet_dir's global rewrite is exactly
    what it must NOT do (that would flatten cid= dirs and kill
    PartitionFilters pruning)."""
    import os

    from pyspark.sql import functions as F

    from osarchiver_spark.operators.ivf import (
        ivf_index,
        ivf_topk_indexed,
        kmeans_fit,
    )
    from osarchiver_spark.operators.maintenance import compact_partitioned_store
    from osarchiver_spark.sources.parquet import load_table

    emb = load_table(spark, sf_small, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
    store = str(tmp_path / "store")
    for d in range(4):  # 4 drop-shaped appends -> >=4 files per cell
        drop = ivf_index(
            emb.filter(F.col("vec_id") % 4 == d), "vec_id", "embedding", cents
        )
        drop.write.mode("overwrite" if d == 0 else "append").partitionBy(
            "cid"
        ).parquet(store)

    read = lambda: spark.read.parquet(store).withColumn(
        "cid", F.col("cid").cast("int")
    )
    rows_before = sorted(
        (r.neighbor_id, r.cid, tuple(r.v)) for r in read().collect()
    )
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    topk = lambda: sorted(
        map(
            tuple,
            ivf_topk_indexed(
                read(), queries, "vec_id", "embedding", cents, k=5, nprobe=2
            ).collect(),
        )
    )
    topk_before = topk()

    b, a = compact_partitioned_store(spark, store, "cid", target_bytes=1 << 30)
    assert b >= 16 and a == 4, (b, a)  # one file per cell at huge target
    # hive layout intact: cid=* dirs, no flat part files
    dirs = {n for n in os.listdir(store) if n.startswith("cid=")}
    assert len(dirs) == 4
    assert not any(n.endswith(".parquet") for n in os.listdir(store))
    # content + serving results identical
    assert (
        sorted((r.neighbor_id, r.cid, tuple(r.v)) for r in read().collect())
        == rows_before
    )
    assert topk() == topk_before
    # idempotent: already compact -> no rewrite
    assert compact_partitioned_store(spark, store, "cid", target_bytes=1 << 30) == (4, 4)


def test_compact_partitioned_store_keeps_band_sort(spark, sf_small, tmp_path):
    """Compacting the MinHash band index must preserve the band_key
    intra-file ordering its row-group min/max skipping relies on."""
    from pyspark.sql import functions as F

    from osarchiver_spark.operators.dedup import minhash_lsh_index
    from osarchiver_spark.operators.maintenance import compact_partitioned_store
    from osarchiver_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents")
    idx = str(tmp_path / "bands")
    for d in range(3):
        minhash_lsh_index(
            docs.filter(F.col("doc_id") % 3 == d), "doc_id", "text"
        ).withColumn("part", F.col("band_idx")).write.mode(
            "overwrite" if d == 0 else "append"
        ).partitionBy("part").parquet(idx)

    rows_before = sorted(map(tuple, spark.read.parquet(idx).drop("part").collect()))
    b, a = compact_partitioned_store(
        spark, idx, "part", target_bytes=1 << 30, sort_within=["band_key"]
    )
    assert a < b
    assert sorted(map(tuple, spark.read.parquet(idx).drop("part").collect())) == rows_before
    # per-file ordering: within every output file band_key is sorted
    import glob

    for f in glob.glob(f"{idx}/part=*/*.parquet"):
        keys = [r.band_key for r in spark.read.parquet(f).select("band_key").collect()]
        assert keys == sorted(keys), f


def test_compact_partitioned_store_handles_escaped_and_null_values(
    spark, tmp_path
):
    """Hive percent-escapes special chars in partition dir names
    ('a:b' -> 'a%3Ab') and writes nulls to __HIVE_DEFAULT_PARTITION__;
    the mapping join must decode/null-match both — a miss would
    silently drop rows and the swap guard would (correctly) refuse,
    so this pins both the decode AND that compaction still completes."""
    from osarchiver_spark.operators.maintenance import compact_partitioned_store

    rows = [
        (i, v)
        for i, v in enumerate(
            ["a:b", "a:b", "x y", "x y", "plain", "plain", None, None]
        )
    ]
    df = spark.createDataFrame(rows, "id int, grp string")
    store = str(tmp_path / "store")
    for _ in range(2):  # two appends -> 2 files per partition
        df.write.mode("append").partitionBy("grp").parquet(store)

    read = lambda: spark.read.parquet(store)
    before_rows = sorted((r.id, r.grp) for r in read().collect())
    b, a = compact_partitioned_store(spark, store, "grp", target_bytes=1 << 30)
    assert a < b
    assert sorted((r.id, r.grp) for r in read().collect()) == before_rows


def test_compact_partitioned_store_per_partition_compactness(spark, tmp_path):
    """The already-compact early-return is per partition: a fragmented
    cell must trigger a rewrite even when the GLOBAL file count nets
    out against an over-provisioned sibling."""
    from osarchiver_spark.operators.maintenance import compact_partitioned_store

    df_a = spark.createDataFrame([(i, "a") for i in range(30)], "id int, grp string")
    df_b = spark.createDataFrame([(i, "b") for i in range(30)], "id int, grp string")
    store = str(tmp_path / "store")
    # grp=a: 3 small files; grp=b: 1 file
    for _ in range(3):
        df_a.coalesce(1).write.mode("append").partitionBy("grp").parquet(store)
    df_b.coalesce(1).write.mode("append").partitionBy("grp").parquet(store)

    b, a = compact_partitioned_store(spark, store, "grp", target_bytes=1 << 30)
    assert (b, a) == (4, 2), (b, a)  # grp=a collapsed to one file
    # second call: everything compact, no rewrite
    assert compact_partitioned_store(spark, store, "grp", target_bytes=1 << 30) == (2, 2)


def test_compact_partitioned_store_splits_to_exact_file_counts(spark, tmp_path):
    """The exact-task-placement shuffle (r10 ADVICE item 2): when a
    partition needs nf > 1 output files, each (partition, salt) group
    must land in its OWN task — exactly nf files per partition, none
    a salt-collision merge of ~2 groups. Pinned with a target that
    forces 4 files for the big partition and 1 for the small one."""
    import glob
    import os

    from osarchiver_spark.operators.maintenance import compact_partitioned_store

    big = spark.createDataFrame(
        [(i, "big", "x" * 64) for i in range(4000)], "id int, grp string, pad string"
    )
    small = spark.createDataFrame(
        [(i, "small", "x" * 64) for i in range(100)], "id int, grp string, pad string"
    )
    store = str(tmp_path / "store")
    for d in range(8):  # fragment: 8 appends -> 8 files per partition
        big.filter(big.id % 8 == d).coalesce(1).write.mode("append").partitionBy(
            "grp"
        ).parquet(store)
    small.coalesce(1).write.mode("append").partitionBy("grp").parquet(store)

    # pick a target = 1/4 of grp=big's bytes -> plan: big=4 files, small=1
    def part_stats(p):
        files = [
            f
            for f in glob.glob(f"{store}/grp={p}/*")
            if not os.path.basename(f).startswith(("_", "."))
        ]
        return len(files), sum(os.path.getsize(f) for f in files)

    _, big_bytes = part_stats("big")
    target = -(-big_bytes // 4)

    before_rows = sorted(
        (r.id, r.grp) for r in spark.read.parquet(store).collect()
    )
    b, a = compact_partitioned_store(spark, store, "grp", target_bytes=target)
    n_big, bytes_big = part_stats("big")
    n_small, _ = part_stats("small")
    assert (n_big, n_small) == (4, 1), (b, a, n_big, n_small)
    # no salt-collision merge: every file stays near target (<=1.5x
    # covers encoding variance; a merged 2-group file would be ~2x)
    for f in glob.glob(f"{store}/grp=big/*"):
        if os.path.basename(f).startswith(("_", ".")):
            continue
        assert os.path.getsize(f) <= target * 1.5, (os.path.getsize(f), target)
    assert (
        sorted((r.id, r.grp) for r in spark.read.parquet(store).collect())
        == before_rows
    )
    # idempotent at the same target: per-partition counts AND max file
    # size both pass -> no rewrite
    assert compact_partitioned_store(spark, store, "grp", target_bytes=target) == (5, 5)


def test_compact_partitioned_store_retriggers_on_oversized_file(spark, tmp_path):
    """A partition whose file COUNT meets the plan but holds one
    oversized file (the exact wound a pre-fix salt collision left)
    must still re-trigger: the early-exit checks max file size, not
    just counts."""
    import glob
    import os

    from osarchiver_spark.operators.maintenance import compact_partitioned_store

    df = spark.createDataFrame(
        [(i, "g", "x" * 64) for i in range(4000)], "id int, grp string, pad string"
    )
    store = str(tmp_path / "store")
    # one big file + one sliver: 2 files
    df.filter(df.id < 3900).coalesce(1).write.mode("append").partitionBy(
        "grp"
    ).parquet(store)
    df.filter(df.id >= 3900).coalesce(1).write.mode("append").partitionBy(
        "grp"
    ).parquet(store)
    files = [
        f
        for f in glob.glob(f"{store}/grp=g/*")
        if not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in files)
    big = max(os.path.getsize(f) for f in files)
    # target such that plan = 2 files but the big file alone is >1.5x
    target = -(-total // 2)
    assert big > target * 1.5, "fixture must present an oversized file"

    b, a = compact_partitioned_store(spark, store, "grp", target_bytes=target)
    assert b == 2, b
    for f in glob.glob(f"{store}/grp=g/*"):
        if os.path.basename(f).startswith(("_", ".")):
            continue
        assert os.path.getsize(f) <= target * 1.5


def test_compact_splits_duplicate_heavy_partition(spark, tmp_path):
    """All-duplicate rows share one content hash; the ordinal-mixed
    salt must still spread them across the planned file count (a
    content-only salt would land them in ONE >target file no rewrite
    could ever split — and the oversized-file early-exit would then
    re-trigger a futile full rewrite on every maintenance cycle)."""
    import glob
    import os

    from osarchiver_spark.operators.maintenance import compact_partitioned_store

    df = spark.createDataFrame(
        [(7, "g", "x" * 64)] * 4000, "id int, grp string, pad string"
    )
    store = str(tmp_path / "store")
    df.coalesce(1).write.partitionBy("grp").parquet(store)
    files = lambda: [
        f
        for f in glob.glob(f"{store}/grp=g/*")
        if not os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(os.path.getsize(f) for f in files())
    target = -(-total // 4)

    b, a = compact_partitioned_store(spark, store, "grp", target_bytes=target)
    out = files()
    assert len(out) == 4, (b, a, len(out))
    # NOTE: no per-file byte assertion here — 4000 identical rows
    # RLE-compress below parquet's per-file metadata floor, so sizes
    # are all overhead at this scale; the split itself (4 real files,
    # impossible under a content-only salt) is the property under test
    assert spark.read.parquet(store).count() == 4000
    rows_per_file = [spark.read.parquet(f).count() for f in out]
    assert all(n > 0 for n in rows_per_file), rows_per_file
