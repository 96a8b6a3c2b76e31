"""Iceberg DECLARED sort orders (VERDICT r13 item 4):
``set_sort_order`` / ``ALTER TABLE … WRITE ORDERED BY`` stamps a real
``sort-orders`` entry + ``default-sort-order-id`` (metadata-only);
subsequent appends cluster each staged file by the order and stamp
``data_file.sort_order_id`` (spec field 140); compact() re-clusters by
the declared order instead of erasing it; a FOREIGN table's declared
order carries verbatim through every commit."""

import json
import os

import pytest

from aws_glue_data_lake_spark.avrolite import read_container
from aws_glue_data_lake_spark.icebergcompat import (
    IcebergTableReader,
    IcebergTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _meta(path):
    return IcebergTableReader(path)._metadata()


def _tip_data_entries(path):
    """data_file dicts of the CURRENT snapshot's data manifests;
    __new marks entries ADDED BY the tip snapshot itself (carried
    manifests keep their own commit's statuses/ids)."""
    meta = _meta(path)
    tip = meta["current-snapshot-id"]
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == tip
    )
    _, manifests, _ = read_container(snap["manifest-list"])
    out = []
    for m in manifests:
        if m.get("content", 0) != 0:
            continue
        _, entries, _ = read_container(m["manifest_path"])
        out.extend(
            e["data_file"]
            | {"__new": e["status"] == 1 and e["snapshot_id"] == tip}
            for e in entries
        )
    return out


def test_set_sort_order_metadata_and_sorted_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(3, "c", 1.0)], "k long, v string, score double"
    ))
    w.set_sort_order(["k"], descending=["k"])
    meta = _meta(path)
    assert meta["default-sort-order-id"] == 1
    (order,) = [
        o for o in meta["sort-orders"] if o["order-id"] == 1
    ]
    assert order["fields"] == [{
        "transform": "identity",
        "source-id": 1,
        "direction": "desc",
        "null-order": "nulls-first",
    }]
    # re-declaring the identical order REUSES the id
    w.set_sort_order(["k"], descending=["k"])
    assert len(_meta(path)["sort-orders"]) == 2  # order 0 + order 1
    # appends cluster each file and stamp sort_order_id
    import random

    rows = [(i, f"v{i}", float(i)) for i in range(200)]
    random.Random(7).shuffle(rows)
    w.append(spark.createDataFrame(
        rows, "k long, v string, score double"
    ).coalesce(2))
    import pyarrow.parquet as pq

    stamped = [
        d for d in _tip_data_entries(path)
        if d["__new"]  # ADDED by this append
    ]
    assert stamped and all(d["sort_order_id"] == 1 for d in stamped)
    for d in stamped:
        ks = pq.read_table(d["file_path"], columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks, reverse=True), (
            f"file {d['file_path']} not clustered desc"
        )
    # rows are intact
    got = sorted(
        r["k"] for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == sorted([3] + list(range(200)))
    # validation
    with pytest.raises(ValueError, match="unknown column"):
        w.set_sort_order(["nope"])
    with pytest.raises(ValueError, match="not in the order"):
        w.set_sort_order(["k"], descending=["v"])


def test_compact_preserves_declared_clustering(spark, tmp_path):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(i % 7, i) for i in range(100)], "k long, v long"
    ).repartition(4))
    w.set_sort_order(["k"])
    w.compact(spark)
    import pyarrow.parquet as pq

    datas = [d for d in _tip_data_entries(path) if d["__new"]]
    assert datas and all(d["sort_order_id"] == 1 for d in datas)
    for d in datas:
        ks = pq.read_table(d["file_path"], columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)
    # z-order keeps its interleaved layout: spec has no z-order sort
    # transform, so those files honestly stay unstamped
    w.compact(spark, zorder_by=["k", "v"])
    datas2 = [d for d in _tip_data_entries(path) if d["__new"]]
    assert all(d["sort_order_id"] is None for d in datas2)
    # the declared order survives in metadata either way
    assert _meta(path)["default-sort-order-id"] == 1


def test_foreign_declared_order_carries_verbatim(spark, tmp_path):
    """A foreign table declaring write.sort-order (here: a bucket
    transform this writer cannot apply) keeps it through commits —
    other engines must still see the clustering contract."""
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    mdir = os.path.join(path, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = int(f.read())
    mp = os.path.join(mdir, f"v{v}.metadata.json")
    meta = json.load(open(mp))
    foreign = {
        "order-id": 5,
        "fields": [{
            "transform": "bucket[8]", "source-id": 1,
            "direction": "asc", "null-order": "nulls-last",
        }],
    }
    meta["sort-orders"] = [{"order-id": 0, "fields": []}, foreign]
    meta["default-sort-order-id"] = 5
    with open(mp, "w") as f:
        json.dump(meta, f)
    w.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    meta2 = _meta(path)
    assert meta2["default-sort-order-id"] == 5
    assert foreign in meta2["sort-orders"]
    # a non-identity order is carried, not applied: no stamp
    added = [d for d in _tip_data_entries(path) if d["__new"]]
    assert all(d["sort_order_id"] is None for d in added)


def test_sql_write_ordered_by_and_facade_guard(spark, tmp_path):
    path = str(tmp_path / "t")
    t = open_table(path, "iceberg").create(
        spark.createDataFrame([(1, "a", 2.0)],
                              "k long, v string, score double")
    )
    sql(spark, "ALTER TABLE t WRITE ORDERED BY (score DESC, k)",
        tables={"t": t})
    meta = _meta(path)
    (order,) = [
        o for o in meta["sort-orders"]
        if o["order-id"] == meta["default-sort-order-id"]
    ]
    assert [(f["source-id"], f["direction"]) for f in order["fields"]] \
        == [(3, "desc"), (1, "asc")]
    with pytest.raises(NotImplementedError, match="Iceberg"):
        open_table(str(tmp_path / "d"), "delta").create(
            spark.createDataFrame([(1,)], "k long")
        ).set_sort_order(["k"])
