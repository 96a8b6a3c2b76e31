"""Maintenance statements added round 14: RESTORE TABLE ... TO
VERSION/TIMESTAMP AS OF (facade restore on all three formats),
VACUUM ... DRY RUN (report, delete nothing — every format), and
SHOW TBLPROPERTIES (property map as a relation)."""

import os

import pytest

from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _mk(spark, tmp_path, fmt):
    t = open_table(str(tmp_path / fmt), fmt).create(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    return t


@pytest.mark.parametrize("fmt", ["delta", "lake"])
def test_restore_sql_by_version(spark, tmp_path, fmt):
    t = _mk(spark, tmp_path, fmt)
    # version numbering differs (delta creates at v0, lake at v1):
    # find the 3-row version, restore to it
    target = next(
        h["version"] for h in t.history()
        if t.read(spark, version=h["version"]).count() == 3
    )
    pre_tip = max(h["version"] for h in t.history())
    sql(
        spark,
        f"RESTORE TABLE t TO VERSION AS OF {target}",
        tables={"t": t},
    )
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 3]
    # restore is a NEW commit: the rolled-past state is still there
    assert sorted(
        r["k"] for r in t.read(spark, version=pre_tip).collect()
    ) == [1, 2, 3, 4]


def test_restore_iceberg_by_snapshot_id(spark, tmp_path):
    t = _mk(spark, tmp_path, "iceberg")
    hist = t.history()  # newest first or oldest? use ids directly
    ids = [h["snapshot_id"] if "snapshot_id" in h else h.get("version")
           for h in hist]
    # pick the snapshot with 3 rows: replay until count==3
    target = None
    for sid in ids:
        if t.read(spark, version=sid).count() == 3:
            target = sid
            break
    assert target is not None
    sql(
        spark,
        f"RESTORE TABLE t TO VERSION AS OF {target}",
        tables={"t": t},
    )
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 3]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_vacuum_dry_run_deletes_nothing(spark, tmp_path, fmt):
    t = _mk(spark, tmp_path, fmt)
    t.compact(spark, target_files=1)  # orphan the pre-compact files
    df = sql(spark, "VACUUM t RETAIN 1 VERSIONS DRY RUN",
             tables={"t": t})
    would = [r["path"] for r in df.collect()]
    # dry run reported work but did none: every live + historical
    # file still present, full history still readable
    for p in would:
        ap = p if os.path.isabs(p) else os.path.join(t.path, p)
        assert os.path.exists(ap), f"DRY RUN deleted {p}"
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        1, 2, 3, 4,
    ]
    # the real vacuum then deletes exactly what the dry run reported
    deleted = t.vacuum(keep=1)
    assert sorted(deleted) == sorted(would)
    assert deleted, f"{fmt}: expected the older files to be collectable"


def test_show_tblproperties(spark, tmp_path):
    t = _mk(spark, tmp_path, "delta")
    t.set_property("custom.owner", "pipeline-a")
    t.set_property("delta.checkpointInterval", "7")
    props = {
        r["key"]: r["value"]
        for r in sql(
            spark, "SHOW TBLPROPERTIES t", tables={"t": t}
        ).collect()
    }
    assert props["custom.owner"] == "pipeline-a"
    assert props["delta.checkpointInterval"] == "7"
    one = sql(
        spark, "SHOW TBLPROPERTIES t ('custom.owner')", tables={"t": t}
    ).collect()
    assert [(r["key"], r["value"]) for r in one] == [
        ("custom.owner", "pipeline-a")
    ]
    # lake: no free-form store -> empty relation, loud on set
    tl = open_table(str(tmp_path / "l"), "lake").create(
        spark.createDataFrame([(1,)], "k long")
    )
    assert sql(
        spark, "SHOW TBLPROPERTIES tl", tables={"tl": tl}
    ).count() == 0
