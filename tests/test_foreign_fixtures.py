"""Golden foreign-written fixtures (VERDICT r7 item 2): the compat
readers run against COMMITTED bytes under tests/fixtures/foreign/ —
hand-assembled from the public Delta PROTOCOL.md and Iceberg table spec
by scripts/gen_foreign_fixtures.py with an INDEPENDENT encoder stack
(literal JSON, struct-packed DV bytes, a self-contained Avro encoder,
Java writer record schemas with nullable unions and map-as-array
bounds) — and must produce these hardcoded rows. A self-consistent
misreading of either spec that round-trips through our own writers
fails here."""

import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "foreign")
DELTA = os.path.join(FIXTURES, "delta_golden")
ICEBERG = os.path.join(FIXTURES, "iceberg_golden")


def test_fixture_bytes_are_committed_and_stable():
    """The fixtures are committed BYTES, not regenerated per run: pin a
    few byte-level facts so an accidental regeneration with different
    content shows up as a diff here, not just in git status."""
    dv = os.path.join(
        DELTA, "deletion_vector_00010203-0405-0607-0809-0a0b0c0d0e0f.bin"
    )
    with open(dv, "rb") as f:
        blob = f.read()
    assert blob[0] == 1  # format version byte
    # data starts after int32 BE size: little-endian magic 1681511377
    import struct

    (size,) = struct.unpack(">i", blob[1:5])
    assert struct.unpack("<I", blob[5:9])[0] == 1681511377
    assert len(blob) == 1 + 4 + size + 4
    # avro containers declare deflate
    with open(os.path.join(ICEBERG, "metadata", "snap-3003.avro"),
              "rb") as f:
        head = f.read(4096)
    assert head[:4] == b"Obj\x01" and b"deflate" in head


def test_delta_golden_reads_expected_rows(spark):
    """3-commit foreign Delta log: partitioned create, partition
    overwrite (remove+add), then a DELETE as a reader-v3 deletion vector
    whose .bin bytes were struct-packed from the protocol document.
    Expected live rows: k=1,3 (k=2 tombstoned by the DV) + k=6,7 (f1
    replaced by f2)."""
    from aws_glue_data_lake_spark.deltacompat import DeltaTableReader

    r = DeltaTableReader(DELTA)
    assert r.latest_version() == 2
    got = sorted(
        (x["k"], x["v"], x["part"]) for x in r.to_df(spark).collect()
    )
    assert got == [(1, 10, "a"), (3, 30, "a"), (6, 60, "b"), (7, 70, "b")]
    # version time travel against the same bytes
    v0 = sorted(
        (x["k"], x["part"]) for x in r.to_df(spark, version=0).collect()
    )
    assert v0 == [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")]
    v1 = sorted(x["k"] for x in r.to_df(spark, version=1).collect())
    assert v1 == [1, 2, 3, 6, 7]
    # stats from the foreign add actions feed data skipping
    snap = r.snapshot()
    f0 = next(p for p, _, _ in snap.files if p.endswith("f0.parquet"))
    assert snap.stats[f0]["minValues"]["k"] == 1
    assert snap.stats[f0]["nullCount"] == {"k": 0, "v": 0}
    # timestamp time travel uses the foreign commitInfo timestamps
    assert sorted(
        x["k"]
        for x in r.to_df(spark, timestamp_ms=1700000000500).collect()
    ) == [1, 2, 3, 4, 5]


def test_delta_golden_changes_feed(spark):
    """The CDF-less change feed over plain add/remove commits: v1 is an
    unreplayable rewrite (add+remove without cdc) and must fail loudly,
    not fake a diff."""
    from aws_glue_data_lake_spark.deltacompat import (
        DeltaProtocolError,
        DeltaTableReader,
    )

    with pytest.raises(DeltaProtocolError, match="cdc"):
        DeltaTableReader(DELTA).changes(spark).collect()


def test_iceberg_golden_reads_expected_rows(spark):
    """Foreign Iceberg v2 tree (Java Avro schemas, deflate codec,
    absolute file:// URIs, null-seq inheritance, `partitions` summaries):
    snapshot 3003 = data (k=1..5) minus a position delete (a.parquet row
    1 -> k=2) minus an equality delete (k=4, seq gate 3 > data seq 1)."""
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader

    if not os.path.isdir(ICEBERG):
        pytest.skip("fixture not generated")
    meta = json.load(
        open(os.path.join(ICEBERG, "metadata", "v3.metadata.json"))
    )
    if meta["location"] != ICEBERG:
        pytest.skip(
            "committed Iceberg fixture embeds absolute URIs for "
            f"{meta['location']}; repo relocated — regenerate with "
            "scripts/gen_foreign_fixtures.py"
        )
    r = IcebergTableReader(ICEBERG)
    got = sorted(
        (x["k"], x["v"], x["part"]) for x in r.to_df(spark).collect()
    )
    assert got == [(1, 10, "a"), (3, 30, "a"), (5, 50, "b")]
    # snapshot time travel through the same committed bytes
    s1 = sorted(x["k"] for x in r.to_df(spark, snapshot_id=3001).collect())
    assert s1 == [1, 2, 3, 4, 5]
    s2 = sorted(x["k"] for x in r.to_df(spark, snapshot_id=3002).collect())
    assert s2 == [1, 3, 4, 5]
    # branch ref resolution from metadata refs
    sref = sorted(x["k"] for x in r.to_df(spark, ref="main").collect())
    assert sref == [1, 3, 5]
    # manifest partition pruning on the identity spec
    sb = sorted(
        x["k"]
        for x in r.to_df(spark, partition_filter={"part": "b"}).collect()
    )
    assert sb == [5]
    # the Java-schema bounds (array<record{key,value}>, little-endian
    # longs) decode into per-file column stats
    snap = r.snapshot()
    fa = next(p for p, _ in snap.files if p.endswith("a.parquet"))
    assert snap.col_stats[fa]["k"] == {
        "count": 3, "nulls": 0, "min": 1, "max": 3
    }
    # null entry seq inherited from the manifest-list entry (seq 1)
    assert snap.file_seqs[fa] == 1


def test_iceberg_golden_history_and_timestamp(spark):
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader

    meta = json.load(
        open(os.path.join(ICEBERG, "metadata", "v3.metadata.json"))
    )
    if meta["location"] != ICEBERG:
        pytest.skip("repo relocated — regenerate fixtures")
    r = IcebergTableReader(ICEBERG)
    hist = r.history()
    assert [h["snapshot_id"] for h in hist] == [3003, 3002, 3001]
    assert r.snapshot_id_at_timestamp(1700000001500) == 3001
    assert r.snapshot_id_at_timestamp(1700000003000) == 3003


def test_iceberg_v3_golden_field_ids_and_puffin_dv(spark):
    """The v3 golden tree composes every round-8 read path over committed
    bytes: format-version 3 metadata, parquet files with FIELD IDS whose
    physical column name predates a rename (only ID resolution reads
    real values), and a puffin deletion vector located by the manifest's
    content_offset. Expected: k=1,3 tombstoned, 'amount' (renamed from
    amount_old) carries real values."""
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader

    v3 = os.path.join(FIXTURES, "iceberg_v3_golden")
    meta = json.load(open(os.path.join(v3, "metadata", "v2.metadata.json")))
    if meta["location"] != v3:
        pytest.skip("repo relocated — regenerate fixtures")
    r = IcebergTableReader(v3)
    got = sorted(
        (x["k"], x["amount"], x["flag"])
        for x in r.to_df(spark).collect()
    )
    # column 'flag' (id 3) was added after the data file with a v3
    # initial-default of 9: the pre-column file must read 9, not null
    assert got == [(2, 200, 9), (4, 400, 9)]
    # pre-DV snapshot: rename still resolves, nothing deleted
    s1 = sorted(
        (x["k"], x["amount"])
        for x in r.to_df(spark, snapshot_id=7001).collect()
    )
    assert s1 == [(1, 100), (2, 200), (3, 300), (4, 400)]
    # changelog across the DV snapshot
    feed = r.changes(spark)
    dels = sorted(
        x["k"] for x in feed.where("_change_type = 'delete'").collect()
    )
    assert dels == [1, 3]


def test_iceberg_mixed_formats_golden_reads(spark):
    """Mixed-data-format golden tree: parquet + ORC + Avro data files in
    one manifest (spec allows per-file formats), a position-delete file
    tombstoning one ORC row and one Avro row. The Avro container was
    encoded by the generator's own encoder (not avrolite); position =
    record order within each file."""
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader

    mixed = os.path.join(FIXTURES, "iceberg_mixed_golden")
    meta = json.load(
        open(os.path.join(mixed, "metadata", "v2.metadata.json"))
    )
    if meta["location"] != mixed:
        pytest.skip("repo relocated — regenerate fixtures")
    r = IcebergTableReader(mixed)
    got = sorted((x["k"], x["v"]) for x in r.to_df(spark).collect())
    # ORC pos 0 (k=3) and Avro pos 1 (k=6) tombstoned
    assert got == [(1, 10), (2, 20), (4, 40), (5, 50)]
    # pre-delete snapshot still reads all six rows from all 3 formats
    pre = sorted(
        (x["k"], x["v"])
        for x in r.to_df(spark, snapshot_id=8001).collect()
    )
    assert pre == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (6, 60)]


def test_delta_variant_vacuum_protocol_check_golden_reads(spark):
    """Spark-4-era foreign table: readerFeatures
    [vacuumProtocolCheck, variantType] — both scan-inert — plus a
    VARIANT column whose parquet bytes were hand-packed from
    parquet-format VariantEncoding.md (unshredded metadata/value binary
    pair, no VARIANT logical-type annotation). A reader gate that
    refuses unknown-but-inert features refuses this readable table; a
    variant mis-decode shows up in variant_get values."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import DeltaTableReader

    r = DeltaTableReader(os.path.join(FIXTURES, "delta_variant_golden"))
    df = r.to_df(spark)
    assert [f.dataType.typeName() for f in df.schema.fields] == [
        "long",
        "variant",
    ]
    got = sorted(
        (x["k"], x["a"], x["tag"])
        for x in df.select(
            "k",
            F.try_variant_get("payload", "$.a", "int").alias("a"),
            F.try_variant_get("payload", "$.tag", "string").alias("tag"),
        ).collect()
    )
    assert got == [
        (1, 1, "odd"),
        (2, 2, "even"),
        (3, 3, "odd"),
        (4, 4, "even"),
    ]


def test_unknown_reader_feature_still_refused(spark):
    """The gate stays loud for features it has never heard of, proving
    the vacuumProtocolCheck/variantType/variantShredding acceptance
    didn't silently become accept-everything. (variantShredding itself
    moved to the supported set in round 12 — Spark 4 reassembles the
    shredded layout natively; see test_variant_shredded_golden.)"""
    import shutil
    import tempfile

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaProtocolError,
        DeltaTableReader,
    )

    src = os.path.join(FIXTURES, "delta_variant_golden")
    with tempfile.TemporaryDirectory() as td:
        dst = os.path.join(td, "t")
        shutil.copytree(src, dst)
        cf = os.path.join(dst, "_delta_log", f"{0:020d}.json")
        lines = []
        with open(cf) as f:
            for ln in f:
                d = json.loads(ln)
                if "protocol" in d:
                    d["protocol"]["readerFeatures"].append(
                        "futureLayoutFeature"
                    )
                lines.append(json.dumps(d))
        with open(cf, "w") as f:
            f.write("\n".join(lines) + "\n")
        with pytest.raises(
            DeltaProtocolError, match="futureLayoutFeature"
        ):
            DeltaTableReader(dst).to_df(spark)


def test_variant_shredded_golden(spark):
    """variantShredding (round-12, VERDICT r11 item 4): the hand-packed
    shredded twin of the variant fixture must REASSEMBLE — typed_value
    subcolumns merge with the residual value object across every
    conforming path: full shred, shred + residual field, absent field,
    non-object scalar, field-level type-mismatch residual. A mis-merge
    shows up in to_json AND in variant_get (which Spark pushes into the
    shredded scan — both evaluation paths pinned); a reader that
    refuses the feature never gets here."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import DeltaTableReader

    r = DeltaTableReader(
        os.path.join(FIXTURES, "delta_variant_shredded_golden")
    )
    df = r.to_df(spark)
    assert [f.dataType.typeName() for f in df.schema.fields] == [
        "long",
        "variant",
    ]
    got = sorted(
        (x["k"], x["js"], x["a"], x["tag"])
        for x in df.select(
            "k",
            F.to_json("payload").alias("js"),
            F.try_variant_get("payload", "$.a", "string").alias("a"),
            F.try_variant_get("payload", "$.tag", "string").alias(
                "tag"
            ),
        ).collect()
    )
    assert got == [
        (1, '{"a":1,"tag":"odd"}', "1", "odd"),
        (2, '{"a":2,"b":7,"tag":"even"}', "2", "even"),
        (3, '{"tag":"only"}', None, "only"),
        (4, "5", None, None),
        (5, '{"a":"str-a"}', "str-a", None),
    ]


def test_variant_shredded_table_accepts_unshredded_append(
    spark, tmp_path
):
    """Shredding is a PER-FILE choice: appending an ordinary
    (unshredded) variant batch into the shredded table is spec-valid,
    and both generations read back through one scan."""
    import shutil

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    src = os.path.join(FIXTURES, "delta_variant_shredded_golden")
    dst = str(tmp_path / "t")
    shutil.copytree(src, dst)
    DeltaTableWriter(dst).append(
        spark.createDataFrame([(6,)], "k long").select(
            "k",
            F.parse_json(F.lit('{"a": 6, "tag": "new"}')).alias(
                "payload"
            ),
        )
    )
    got = sorted(
        (x["k"], x["a"])
        for x in DeltaTableReader(dst)
        .to_df(spark)
        .select(
            "k",
            F.try_variant_get("payload", "$.a", "string").alias("a"),
        )
        .collect()
    )
    assert got == [
        (1, "1"), (2, "2"), (3, None), (4, None), (5, "str-a"),
        (6, "6"),
    ]


def test_iceberg_v3_row_lineage_golden_reads(spark):
    """v3 ROW LINEAGE tolerance (VERDICT r9 item 6): a spec-v3 writer
    stamps next-row-id / snapshot first-row-id / manifest-list
    first_row_id (520) / data-file first_row_id (146). A scan may ignore
    all of them — but must not choke on the extra Avro/JSON fields or
    leak them as data columns; the incremental changes() feed must also
    be unaffected."""
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader

    lin = os.path.join(FIXTURES, "iceberg_v3_lineage_golden")
    meta = json.load(
        open(os.path.join(lin, "metadata", "v2.metadata.json"))
    )
    if meta["location"] != lin:
        pytest.skip("repo relocated — regenerate fixtures")
    assert meta["next-row-id"] == 5  # lineage is really in the bytes
    r = IcebergTableReader(lin)
    df = r.to_df(spark)
    assert df.columns == ["k", "v"]  # no lineage leakage into the scan
    got = sorted((x["k"], x["v"]) for x in df.collect())
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    # time travel to the first lineage-stamped snapshot
    pre = sorted(
        x["k"] for x in r.to_df(spark, snapshot_id=9001).collect()
    )
    assert pre == [1, 2, 3]
    # the changelog still replays the appends cleanly
    feed = r.changes(spark, start_snapshot_id=9002)
    ins = sorted(
        x["k"]
        for x in feed.where("_change_type = 'insert'").collect()
    )
    assert ins == [4, 5]
    # and the lineage SURFACES on request: explicit file first_row_id
    # for f1 (ids 0..2), manifest-inherited for f2's null id (3..4)
    rl = sorted(
        (x["k"], x["_row_id"], x["_last_updated_sequence_number"])
        for x in r.row_lineage(spark).collect()
    )
    assert rl == [
        (1, 0, 1),
        (2, 1, 1),
        (3, 2, 1),
        (4, 3, 2),
        (5, 4, 2),
    ]
