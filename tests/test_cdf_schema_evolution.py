"""Pinned CDF-stream behavior across schema-evolution commits (VERDICT
r13 item 3): the stream schema is pinned at start; a commit that widens
/retypes the schema while the stream RUNS fails it LOUDLY at that
version with a restart message (delta-spark's behavior without
schemaTrackingLocation — never a silent column drop or a deep Arrow
crash); a RESTARTED stream re-pins the evolved schema and replays
everything, NULL-backfilling files written under older schemas."""

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from aws_glue_data_lake_spark.deltacompat import DeltaTableWriter
from aws_glue_data_lake_spark.lake import LakeTable


def _start(spark, fmt, path, out, ckpt, tag, **opts):
    feed = spark.readStream.format(fmt).option("path", path)
    for k, v in opts.items():
        feed = feed.option(k, v)
    return (
        feed.load()
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out)
        )
        .queryName(f"cdf_evo_{tag}")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )


def test_lake_cdf_fails_loudly_at_mid_stream_add_column(
    spark, tmp_path
):
    from aws_glue_data_lake_spark.lakecdf import register_lake_cdf_source

    register_lake_cdf_source(spark)
    t = LakeTable(str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    out, ckpt = str(tmp_path / "rows"), str(tmp_path / "ckpt")
    q = _start(spark, "lake_cdf", t.path, out, ckpt, "live")
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 1
        # mid-stream widening: mergeSchema append commits a wider schema
        t.append(
            spark.createDataFrame(
                [(2, "b", 9.0)], "k long, v string, score double"
            ),
            merge_schema=True,
        )
        with pytest.raises(
            StreamingQueryException, match="schema changed"
        ):
            q.processAllAvailable()
    finally:
        q.stop()
    # a RESTARTED stream re-pins the NEW schema and replays everything;
    # the pre-evolution file NULL-backfills
    out2, ckpt2 = str(tmp_path / "rows2"), str(tmp_path / "ckpt2")
    q2 = _start(spark, "lake_cdf", t.path, out2, ckpt2, "fresh")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {
        (r["k"], r["v"], r["score"])
        for r in spark.read.parquet(out2).collect()
    }
    assert got == {(1, "a", None), (2, "b", 9.0)}


def test_delta_cdf_fails_loudly_at_mid_stream_add_column(
    spark, tmp_path
):
    from aws_glue_data_lake_spark.deltacompat import (
        register_delta_cdf_source,
    )

    register_delta_cdf_source(spark)
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    out, ckpt = str(tmp_path / "rows"), str(tmp_path / "ckpt")
    q = _start(spark, "delta_cdf", path, out, ckpt, "dlive")
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 1
        w.add_column("score", "double")  # metaData commit, mid-stream
        w.append(spark.createDataFrame(
            [(2, "b", 9.0)], "k long, v string, score double"
        ))
        with pytest.raises(
            StreamingQueryException, match="schema changed"
        ):
            q.processAllAvailable()
    finally:
        q.stop()
    # fresh stream on the evolved table: new pinned schema, full
    # replay, pre-evolution file NULL-backfilled — including the
    # metaData-bearing v0 (an OLDER SUBSET schema is not a failure)
    out2, ckpt2 = str(tmp_path / "rows2"), str(tmp_path / "ckpt2")
    q2 = _start(spark, "delta_cdf", path, out2, ckpt2, "dfresh")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {
        (r["k"], r["v"], r["score"])
        for r in spark.read.parquet(out2).collect()
    }
    assert got == {(1, "a", None), (2, "b", 9.0)}


def test_delta_cdf_readchangefeed_replays_evolution_with_backfill(
    spark, tmp_path
):
    """readChangeFeed flows through the same planning: a fresh stream
    over an already-evolved table replays pre-evolution change files
    with NULL backfill instead of an Arrow column error."""
    from aws_glue_data_lake_spark.deltacompat import (
        register_delta_cdf_source,
    )

    register_delta_cdf_source(spark)
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    w.set_property("delta.enableChangeDataFeed", "true")
    w.add_column("score", "double")
    w.append(spark.createDataFrame(
        [(2, "b", 9.0)], "k long, v string, score double"
    ))
    out, ckpt = str(tmp_path / "rows"), str(tmp_path / "ckpt")
    q = _start(
        spark, "delta_cdf", path, out, ckpt, "rcf",
        readChangeFeed="true",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["k"], r["score"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, None, "insert"), (2, 9.0, "insert")}
