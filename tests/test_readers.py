"""Ingest-layer readers (SURVEY.md §2.1 S1-S7) against temp CSV/TSV
fixtures shaped like the reference's benchmark files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from efficient_llm_data_wrangling_spark.sources import readers as R


def _write(path: str, content: str) -> str:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(content)
    return path


def test_read_blocked_pairs_joins_and_serializes(spark, tmp_path):
    pairs = _write(
        str(tmp_path / "pairs.csv"),
        "ltable_id,rtable_id,label\n1,10,1\n2,20,0\n",
    )
    table_a = spark.createDataFrame(
        [(1, "alpha", None), (2, "beta", "x")], "id long, name string, extra string"
    )
    table_b = spark.createDataFrame(
        [(10, "ALPHA"), (20, "GAMMA")], "id long, name string"
    )
    out = R.read_blocked_pairs(spark, pairs, table_a, table_b).collect()
    by_pair = {(r["ltable_id"], r["rtable_id"]): r for r in out}
    assert by_pair[(1, 10)]["label_str"] == "Yes"
    assert by_pair[(2, 20)]["label_str"] == "No"
    # keyed serialization with nan token for the NULL, A then B halves
    assert by_pair[(1, 10)]["text"] == "name: alpha ^ extra: nan ^ name: ALPHA"


def test_read_imputation_split_excludes_target(spark, tmp_path):
    split = _write(
        str(tmp_path / "train.csv"),
        "id,city,state,zip\n1,austin,tx,78701\n2,boston,,02101\n",
    )
    out = R.read_imputation_split(spark, split, impute_col="state").collect()
    rows = {r["text"]: r["label_str"] for r in out}
    assert rows["city: austin ^ zip: 78701"] == "tx\n"
    # null target serializes through the label with the reference's \n suffix
    assert "city: boston ^ zip: 02101" in rows


def test_read_csv_dir_with_filename_column(spark, tmp_path):
    d = tmp_path / "errs"
    d.mkdir()
    _write(str(d / "hospital_1_zip_code.csv"), "Zip_Code,is_clean\n78701,1\n")
    _write(str(d / "hospital_2_city.csv"), "City,is_clean\naustin,0\n")
    out = R.read_csv_dir_with_filename_column(spark, str(d))
    got = {r["task_col"] for r in out.select("task_col").distinct().collect()}
    assert got == {"zip_code", "city"}
    # columns lowercased (reference data_utils.py:163)
    assert "is_clean" in out.columns


def test_read_transformation_file_instruction_and_rows(spark, tmp_path):
    path = _write(
        str(tmp_path / "t.txt"),
        "// convert date formats\n01/02/2003\t\t2003-01-02\n\n04/05/2006\t\t2006-04-05\n",
    )
    df, instruction = R.read_transformation_file(spark, path)
    assert instruction == "convert date formats"
    rows = {r["text"]: r["label_str"] for r in df.collect()}
    assert rows == {"01/02/2003": "2003-01-02", "04/05/2006": "2006-04-05"}


def test_read_instruction(tmp_path):
    _write(str(tmp_path / "instruction.txt"), "// do the thing\n")
    assert R.read_instruction(str(tmp_path)) == "do the thing"
    assert R.read_instruction(str(tmp_path / "missing")) is None


def test_write_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out_dir = str(tmp_path / "out.parquet")
    R.write_parquet(df, out_dir)
    back = spark.read.parquet(out_dir)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-layout write + equality filter ⇒ directory-level pruning:
    the scan's PartitionFilters carries the predicate and only the
    matching partition's files are read."""
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    R.write_parquet(orders, out, partition_by=["o_orderstatus"])
    statuses = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2  # hive layout materialized

    back = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    expected = orders.filter("o_orderstatus = 'F'").count()
    assert back.count() == expected


def test_write_max_records_per_file_bounds_file_rows(spark, tmp_path):
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "bounded")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").coalesce(1)
    R.write_parquet(orders, out, max_records_per_file=500)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name())
        .count()
        .collect()
    )
    assert len(per_file) > 1
    assert max(r["count"] for r in per_file) <= 500


def test_compact_parquet_dir_reduces_file_count(spark, tmp_path):
    from tests.conftest import SF_SMOKE

    frag = str(tmp_path / "fragmented")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orders.repartition(64).write.parquet(frag)  # 64 small files
    n_small = sum(f.endswith(".parquet") for f in os.listdir(frag))
    assert n_small == 64

    compacted = str(tmp_path / "compacted")
    n = R.compact_parquet_dir(spark, frag, compacted, target_bytes_per_file=10 * 1024 * 1024)
    n_out = sum(f.endswith(".parquet") for f in os.listdir(compacted))
    assert n_out == n < 64
    assert spark.read.parquet(compacted).count() == orders.count()


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    out = str(tmp_path / "docs.jsonl")
    df = spark.createDataFrame(
        [(1, "hello world", 11), (2, 'quote " and \\ slash', 19), (3, None, 0)],
        "doc_id long, text string, n long",
    )
    R.write_jsonl(df, out)
    back = R.read_jsonl(spark, out, "doc_id long, text string, n long")
    got = {r["doc_id"]: (r["text"], r["n"]) for r in back.collect()}
    assert got == {1: ("hello world", 11), 2: ('quote " and \\ slash', 19), 3: (None, 0)}


def test_orc_roundtrip_preserves_values_and_pushes_down(spark, tmp_path):
    """ORC sink → source roundtrip is value-exact, and the ORC scan
    gets the same filter pushdown parquet does (vectorized reader)."""
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from efficient_llm_data_wrangling_spark.sources.readers import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(F.col("o_totalprice") > 100000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "GreaterThan(o_totalprice" in plan


def test_permissive_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Malformed JSONL lines must surface in _corrupt_record — never
    fail the read, never vanish."""
    from pyspark.sql import types as T

    from efficient_llm_data_wrangling_spark.sources.readers import read_jsonl_permissive

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "txt": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "txt": "also ok"}\n'
        '{"id": "not-a-number", "txt": "type clash"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("txt", T.StringType())]
    )
    df = read_jsonl_permissive(spark, str(p), schema)
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped
    clean = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in clean} == {1, 2}
    assert len(bad) == 2  # syntax error + type clash both quarantined
    assert any("not json" in r["_corrupt_record"] for r in bad)


def test_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """Range-clustered layout: per-file [min,max] of the cluster key
    (read from parquet footers, no data scan) must be pairwise disjoint
    — the physical property that makes footer-stats skipping work."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from efficient_llm_data_wrangling_spark.sources.readers import (
        write_parquet_clustered,
    )
    from tests.conftest import SF_SMOKE

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = tmp_path / "orders_clustered"
    write_parquet_clustered(orders, str(out), "o_totalprice", n_files=8)

    ranges = []
    for f in Path(out).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_totalprice"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # actually produced multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # disjoint key slices


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """Re-writing one partition in dynamic mode must replace exactly
    that partition; static overwrite would truncate the whole table."""
    from efficient_llm_data_wrangling_spark.sources.readers import (
        overwrite_partitions_dynamic,
    )
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "orders_dyn")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    overwrite_partitions_dynamic(orders, out, ["o_orderstatus"])
    before = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(out).groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert len(before) >= 2

    patch = (
        orders.filter("o_orderstatus = 'F'")
        .limit(10)
        .withColumn("o_totalprice", F.lit(1.0))
    )
    overwrite_partitions_dynamic(patch, out, ["o_orderstatus"])
    after = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(out).groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert after["F"] == 10  # rewritten partition replaced
    for k, v in before.items():
        if k != "F":
            assert after[k] == v  # siblings untouched


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Batches written with progressively wider schemas read back as
    the union schema with NULLs for pre-existence rows; incompatible
    type clashes on a shared column name fail fast instead of
    coercing."""
    from efficient_llm_data_wrangling_spark.sources.readers import read_parquet_evolved

    base = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        f"{base}/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{base}/batch=2")

    df = read_parquet_evolved(spark, base)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5

    # plain read (no mergeSchema) picks ONE footer and can silently
    # drop the late column — the explicit reader exists because the
    # default is a data-loss trap
    plain = spark.read.parquet(base)
    assert "score" not in plain.columns or set(plain.columns) == set(df.columns)

    # irreconcilable type clash on the same name -> loud failure
    spark.createDataFrame([("oops",)], "score string").write.parquet(f"{base}/batch=3")
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_parquet_evolved(spark, base).collect()


def test_read_binary_files_rows_and_glob_pruning(spark, tmp_path):
    """binaryFile source: one row per file with exact bytes, and
    pathGlobFilter prunes non-matching files at listing time."""
    from efficient_llm_data_wrangling_spark.sources.readers import read_binary_files

    blobs = {"a.img": b"\x89PNG\x00fake-a", "b.img": b"\x89PNG\x00fake-bb", "c.txt": b"not an image"}
    d = tmp_path / "blobs"
    d.mkdir()
    for name, content in blobs.items():
        (d / name).write_bytes(content)
    all_rows = read_binary_files(spark, str(d)).collect()
    assert {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in all_rows} == blobs
    assert all(r["length"] == len(bytes(r["content"])) for r in all_rows)
    imgs = read_binary_files(spark, str(d), glob="*.img").collect()
    assert sorted(r["path"].rsplit("/", 1)[-1] for r in imgs) == ["a.img", "b.img"]
