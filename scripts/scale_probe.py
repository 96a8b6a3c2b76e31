"""Scale-stress probe (VERDICT r5 #4): run the cap/state-machinery query
families at sf0.1 and at the ~10× slab (scripts/gen_scale_slab.py) in ONE
session per scale, and report:

- per-query wall seconds at both scales + the slab/base ratio (the slab
  carries 10× the rows, so ratio ≤ ~10 = linear-or-better; the probe
  flags anything above --max-ratio as superlinear);
- bucket-cap drop rates for the MinHash-LSH bands and both embedding
  banding schemes (how much work the _MAX_BUCKET guard actually sheds);
- streaming state rows (max across micro-batches, from the progress
  telemetry of a representative run).

Prints one JSON document; paste the summary into BASELINE.md.

Usage: python scripts/scale_probe.py [--base /root/testdata/sf0.1]
       [--slab .slab/x10] [--max-ratio 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Probe order is fixed; first dedup query pays the memoized minhash
#: sketch build at each scale (same attribution at both scales).
PROBE_QUERIES = (
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_global",
    "text_decontaminate_overlap",
    "streaming_tumbling_counts",
    "streaming_stateful_user_stats",
    "streaming_stream_join_funnel",
    "streaming_stream_join_funnel_tight",
    # round-6 additions with non-trivial scale shapes
    "text_common_passages",
    "text_repetition_signals",
    "window_gap_sessionization",
    "cdc_scd2_history",
    "sample_sequence_packing",
    "q21_sole_late_shipper",
    # round-6c additions with non-trivial scale shapes
    "funnel_user_conversion",
    "text_dup_block_fraction",
    "text_heavy_hitters_mg",
    "window_trailing_zscore_anomalies",
    "streaming_dedup_then_tumbling",
    "streaming_scd2_foreachbatch",
    "dedup_minhash_recall",
    # round-6d additions with non-trivial scale shapes
    "emb_gram_matrix",
    "sim_quantized_recall",
    "text_pmi_bigrams",
    "agg_theta_sketch_setops",
    "streaming_transform_with_state",
    "streaming_tws_list_state_median",
    "streaming_tws_event_timers",
    # round-6e additions with non-trivial scale shapes
    "window_attribution_linear",
    "graph_pagerank_trade",
    "agg_kll_quantile_rollup",
    "lake_deletion_vector_state",
    "lake_zorder_pruned_scan",
    "streaming_lake_cdf_feed",
    "multimodal_audio_decode_stats",
    "sample_temperature_mix",
    # round-6f additions with non-trivial scale shapes
    "events_path_triples",
    "dedup_bloom_gram_prefilter",
    "dedup_semdedup",
    "sim_rag_context_pack",
    "lake_incremental_mv_state",
    # round-6g additions with non-trivial scale shapes
    "sim_pq_adc_topk",
    "streaming_stream_join_semi",
    "lake_restore_version_state",
    "window_ewma_smoothing",
    "sim_ivfpq_topk",
    "streaming_two_sink_medallion",
    "join_interval_overlap",
    "lake_partition_evolution_state",
)


def cap_stats(spark, sf_dir: str) -> dict:
    """Fraction of band keys the _MAX_BUCKET cap drops, per scheme."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from aws_glue_data_lake_spark.queries import dedup as dd
    from aws_glue_data_lake_spark.queries.base import t

    out = {}

    # Pre-cap minhash band table: same construction as dd._minhash_bands
    # minus the _cap_buckets call, so the measured drop rate is exactly
    # what the cap sheds in production.
    sk = dd._minhash_sketch(spark, sf_dir)
    band_key = lambda j: F.md5(  # noqa: E731 — mirrors _minhash_bands
        F.concat_ws(
            "|",
            F.element_at("m", 3 * j + 1),
            F.element_at("m", 3 * j + 2),
            F.element_at("m", 3 * j + 3),
        )
    )
    pre = sk.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(dd._N_BANDS - 1)), band_key)
        ).alias("band_idx", "band_key"),
    )
    w = Window.partitionBy("band_idx", "band_key")
    counted = pre.withColumn("n", F.count("*").over(w))
    total, dropped, maxb = counted.agg(
        F.count("*"),
        F.sum((F.col("n") > dd._MAX_BUCKET).cast("long")),
        F.max("n"),
    ).first()
    out["minhash_bands"] = {
        "keys": total, "dropped": int(dropped or 0),
        "drop_rate": round((dropped or 0) / max(total, 1), 6),
        "max_bucket": maxb,
    }

    for with_label, tag in ((True, "embedding_per_label"),
                            (False, "embedding_global")):
        e = t(spark, sf_dir, "embeddings")
        nv = e.select(
            "vec_id", "label", "embedding",
            F.sqrt(dd.ddot(F.col("embedding"), F.col("embedding"))).alias("norm"),
        )

        def bucket(i: int, p: int):
            scaled = F.element_at("embedding", i).cast("double") / F.col("norm")
            return F.floor(
                (scaled + ((p >> (i - 1)) & 1) * dd._BAND_W) / (2 * dd._BAND_W)
            )

        keys = nv.select(
            "vec_id", "label",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(p).alias("p"),
                        *[bucket(i, p).alias(f"b{i}")
                          for i in range(1, dd._N_BAND_DIMS + 1)],
                    )
                    for p in range(dd._N_PHASES)
                ])
            ).alias("k"),
        ).select("vec_id", "label", "k.*")
        key_cols = ((["label"] if with_label else []) + ["p"]
                    + [f"b{i}" for i in range(1, dd._N_BAND_DIMS + 1)])
        w = Window.partitionBy(*key_cols)
        counted = keys.withColumn("n", F.count("*").over(w))
        total, dropped, maxb = counted.agg(
            F.count("*"),
            F.sum((F.col("n") > dd._MAX_BUCKET).cast("long")),
            F.max("n"),
        ).first()
        out[tag] = {
            "keys": total, "dropped": int(dropped or 0),
            "drop_rate": round((dropped or 0) / max(total, 1), 6),
            "max_bucket": maxb,
        }
    return out


def state_rows(spark, sf_dir: str) -> dict:
    """Max state rows across micro-batches for a representative stateful
    stream (tumbling counts), from the progress telemetry."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.queries.streaming_queries import (
        _replay_batches_dir,  # staged fixture reuse
    )
    from aws_glue_data_lake_spark.streaming.pipelines import (
        read_staged_batches_stream,
    )

    stage = _replay_batches_dir(spark, sf_dir)
    stream = read_staged_batches_stream(spark, stage)
    agg = (
        stream.withWatermark("event_time", "40 days")
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation",
                os.path.join(stage, "probe_ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = 0
    for p in q.recentProgress:
        for op in p.get("stateOperators") or []:
            rows = max(rows, op.get("numRowsTotal", 0))
    return {"tumbling_agg_max_state_rows": rows}


def cdc_pipeline(spark, sf_dir: str) -> dict:
    """The FULL scripts/run_cdc_job.py path (VERDICT r6 item 8): full load
    then three incremental batches over a lake table, batches sliced at
    event-time quantiles so each incremental clears the watermark. Returns
    wall seconds per phase plus per-commit file-pruning counters read from
    the manifest delta log (adds/removes vs carried files — the proof the
    merge is file-pruned copy-on-write, not a table rewrite)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.lake import LakeTable
    from aws_glue_data_lake_spark.queries.cdc_queries import _OP_CASE_SQL
    from aws_glue_data_lake_spark.tables import load_table, ts_us_col

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_cdc_job import run_job

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("op", F.expr(_OP_CASE_SQL)).withColumn(
        "__us", ts_us_col(ev)
    )
    cuts = ev.approxQuantile("__us", [0.7, 0.8, 0.9], 0.001)
    work = tempfile.mkdtemp(prefix="cdc_probe_")
    out: dict = {"phases": {}}
    try:
        slices = [
            ("full", F.col("__us") <= cuts[0]),
            ("inc1", (F.col("__us") > cuts[0]) & (F.col("__us") <= cuts[1])),
            ("inc2", (F.col("__us") > cuts[1]) & (F.col("__us") <= cuts[2])),
            ("inc3", F.col("__us") > cuts[2]),
        ]
        table_path = os.path.join(work, "t")
        for tag, cond in slices:
            src = os.path.join(work, f"batch_{tag}")
            ev.where(cond).drop("__us").write.parquet(src)
            t0 = time.perf_counter()
            r = run_job(spark, src, table_path, ["user_id"], "ts")
            out["phases"][tag] = {
                "s": round(time.perf_counter() - t0, 3),
                "mode": r["mode"],
                "rows": r["rows"],
            }
        t = LakeTable(table_path)
        pruning = []
        for v in t._manifest_versions():
            raw = t._load_manifest(v)
            snap = t.snapshot(v)
            pruning.append(
                {
                    "version": v,
                    "adds": len(raw.get("adds", raw.get("files", []))),
                    "removes": len(raw.get("removes", [])),
                    "total_files": len(snap.files),
                    "form": "delta" if "adds" in raw else "full",
                }
            )
        out["pruning"] = pruning
        out["total_s"] = round(
            sum(p["s"] for p in out["phases"].values()), 3
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def interop_pipeline(spark, sf_dir: str) -> dict:
    """The compat-layer MERGE/CDF paths at scale (VERDICT r7 item 5):
    full-load events into a REAL Delta table (CDF on) and a REAL Iceberg
    table, run three key-banded incremental MERGEs against each (Delta =
    copy-on-write with add.stats file pruning; Iceberg = merge-on-read,
    one equality-delete + data snapshot), then replay each table's full
    row-level change feed. Returns per-phase wall seconds plus the Delta
    per-merge rewrite counters (files removed vs carried — the proof the
    CoW merge is file-pruned) and the Iceberg snapshot/delete-file
    counts (the proof MoR writes O(batch))."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )
    from aws_glue_data_lake_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # key-banded batches: files are event_id-clustered by the ranged full
    # load, so each merge should rewrite ONLY the files overlapping its
    # narrow update band (the add.stats pruning proof) while the new-key
    # tail inserts without touching anything
    q = ev.approxQuantile(
        "event_id",
        [0.60, 0.61, 0.63, 0.64, 0.66, 0.67, 0.70, 0.80, 0.90],
        0.001,
    )
    cuts = q[6:]
    full = ev.where(F.col("event_id") <= cuts[0]).repartitionByRange(
        16, "event_id"
    )
    batches = [
        ev.where(
            (F.col("event_id") > lo) & (F.col("event_id") <= hi)
        ).unionByName(
            # update band inside the loaded key range: forces a
            # copy-on-write rewrite of the (few) overlapping files
            ev.where(
                (F.col("event_id") > q[2 * i])
                & (F.col("event_id") <= q[2 * i + 1])
            ).withColumn("value", F.col("value") * 2)
        )
        for i, (lo, hi) in enumerate(
            zip(cuts, cuts[1:] + [float("inf")])
        )
    ]
    work = tempfile.mkdtemp(prefix="interop_probe_")
    out: dict = {"delta": {}, "iceberg": {}}
    try:
        # ---- Delta: CoW merges under CDF --------------------------------
        dpath = os.path.join(work, "delta")
        dw = DeltaTableWriter(dpath)
        t0 = time.perf_counter()
        dw.create(full)
        dw.set_change_data_feed(True)
        for b in batches:
            dw.merge(spark, b, keys=["event_id"])
        out["delta"]["merge_s"] = round(time.perf_counter() - t0, 3)
        # per-merge rewrite counters straight from the commit JSONs
        rewrites = []
        log = os.path.join(dpath, "_delta_log")
        for name in sorted(os.listdir(log)):
            if not name.endswith(".json"):
                continue
            adds = removes = 0
            with open(os.path.join(log, name)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "add" in a and a["add"].get("dataChange", True):
                        adds += 1
                    elif "remove" in a:
                        removes += 1
            rewrites.append(
                {"version": int(name.split(".")[0]), "adds": adds,
                 "removes": removes}
            )
        snap = DeltaTableReader(dpath).snapshot()
        out["delta"]["commits"] = rewrites
        out["delta"]["total_files"] = len(snap.files)
        t0 = time.perf_counter()
        out["delta"]["cdf_rows"] = DeltaTableReader(dpath).changes(
            spark
        ).count()
        out["delta"]["cdf_s"] = round(time.perf_counter() - t0, 3)
        # ---- Iceberg: MoR merges ----------------------------------------
        ipath = os.path.join(work, "iceberg")
        iw = IcebergTableWriter(ipath)
        t0 = time.perf_counter()
        iw.create(full)
        for b in batches:
            iw.merge(b, keys=["event_id"])
        out["iceberg"]["merge_s"] = round(time.perf_counter() - t0, 3)
        isnap = IcebergTableReader(ipath).snapshot()
        out["iceberg"]["data_files"] = len(isnap.files)
        out["iceberg"]["eq_delete_files"] = len(isnap.eq_deletes)
        t0 = time.perf_counter()
        out["iceberg"]["changelog_rows"] = IcebergTableReader(
            ipath
        ).changes(spark).count()
        out["iceberg"]["changelog_s"] = round(time.perf_counter() - t0, 3)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def writepaths_pipeline(spark, sf_dir: str) -> dict:
    """Round-9 write paths at scale (VERDICT r9 item 7): (a) MERGE into
    a columnMapping=name Delta table — physical-name staging +
    field-ID-stamped files — must keep the same add.stats file-range
    pruning as the unmapped path (remove counters prove 1-of-N rewrite);
    (b) Iceberg v3 delete_where — the puffin DV writer — must cost
    O(matched rows), proven by timing a NARROW and a WIDE delete at both
    scales and reporting per-deleted-row cost."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )
    from aws_glue_data_lake_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    q = ev.approxQuantile("event_id", [0.70, 0.71, 0.80], 0.001)
    full = ev.where(F.col("event_id") <= q[2]).repartitionByRange(
        16, "event_id"
    )
    band = (
        ev.where((F.col("event_id") > q[0]) & (F.col("event_id") <= q[1]))
        .withColumn("value", F.col("value") * 2)
    )
    work = tempfile.mkdtemp(prefix="writepaths_probe_")
    out: dict = {"delta_colmap": {}, "iceberg_v3_dv": {}}
    try:
        # ---- (a) columnMapping MERGE: physical staging + pruning -------
        dpath = os.path.join(work, "colmap")
        log = os.path.join(dpath, "_delta_log")
        os.makedirs(log)
        fields = [
            ("event_id", "long"), ("user_id", "long"),
            ("event_type", "string"), ("value", "double"),
        ]
        schema_string = _json.dumps({
            "type": "struct",
            "fields": [
                {"name": n, "type": ty, "nullable": True,
                 "metadata": {"delta.columnMapping.id": i + 1,
                              "delta.columnMapping.physicalName":
                              f"col-{i + 1}"}}
                for i, (n, ty) in enumerate(fields)
            ],
        })
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            f.write(_json.dumps({"protocol": {
                "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
            f.write(_json.dumps({"metaData": {
                "id": "probe-cm",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string, "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }}) + "\n")
        dw = DeltaTableWriter(dpath)
        t0 = time.perf_counter()
        dw.append(full)
        out["delta_colmap"]["load_s"] = round(time.perf_counter() - t0, 3)
        files_before = len(DeltaTableReader(dpath).snapshot().files)
        t0 = time.perf_counter()
        dw.merge(spark, band, keys=["event_id"])
        out["delta_colmap"]["merge_s"] = round(
            time.perf_counter() - t0, 3
        )
        adds = removes = 0
        with open(os.path.join(log, f"{2:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                a = _json.loads(line)
                if "add" in a and a["add"].get("dataChange", True):
                    adds += 1
                elif "remove" in a:
                    removes += 1
        out["delta_colmap"]["files_before_merge"] = files_before
        out["delta_colmap"]["merge_removes"] = removes
        out["delta_colmap"]["merge_adds"] = adds
        out["delta_colmap"]["pruned"] = removes < files_before
        # ---- (b) v3 DV write cost: narrow vs wide DELETE ----------------
        ipath = os.path.join(work, "ice3")
        iw = IcebergTableWriter(ipath)
        iw.create(full, format_version=3)
        narrow = f"event_id > {q[0]} AND event_id <= {q[1]}"
        wide = f"event_id > {q[1]} AND event_id <= {q[2]}"
        n_narrow = full.where(narrow).count()
        n_wide = full.where(wide).count()
        t0 = time.perf_counter()
        iw.delete_where(spark, narrow)
        s_narrow = time.perf_counter() - t0
        t0 = time.perf_counter()
        iw.delete_where(spark, wide)
        s_wide = time.perf_counter() - t0
        snap = IcebergTableReader(ipath).snapshot()
        out["iceberg_v3_dv"].update({
            "narrow_rows": n_narrow, "narrow_s": round(s_narrow, 3),
            "wide_rows": n_wide, "wide_s": round(s_wide, 3),
            "dv_blobs": len(snap.dv_deletes or []),
            "us_per_deleted_row_narrow": round(
                s_narrow * 1e6 / max(n_narrow, 1), 2),
            "us_per_deleted_row_wide": round(
                s_wide * 1e6 / max(n_wide, 1), 2),
        })
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def rowtracking_pipeline(spark, sf_dir: str) -> dict:
    """Round-11 write paths at scale: row-tracking enablement + an
    id-preserving UPDATE on an ENABLED table. Contracts probed:
    (a) set_row_tracking backfill is METADATA-ONLY — wall time tracks
    the file count, not the row count (10× rows in the same 16 files
    must cost ~the same); (b) UPDATE rewrites only the files its
    predicate matches (remove counters) and every surviving row keeps
    its stable id (sum/count checksum over the untouched band via
    row_lineage, one scan per side)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    q = ev.approxQuantile("event_id", [0.70, 0.71, 0.80], 0.001)
    full = ev.where(F.col("event_id") <= q[2]).repartitionByRange(
        16, "event_id"
    )
    work = tempfile.mkdtemp(prefix="rowtracking_probe_")
    out: dict = {}
    try:
        path = os.path.join(work, "rt")
        w = DeltaTableWriter(path)
        t0 = time.perf_counter()
        w.create(full)
        out["load_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        w.set_row_tracking(True)
        out["enable_backfill_s"] = round(time.perf_counter() - t0, 3)
        r = DeltaTableReader(path)
        files_before = len(r.snapshot().files)
        untouched = f"event_id > {q[1]}"

        def checksum():
            row = (
                DeltaTableReader(path)
                .row_lineage(spark)
                .where(untouched)
                .agg(
                    F.sum("_row_id").alias("s"),
                    F.count("*").alias("n"),
                )
                .first()
            )
            return (row["s"], row["n"])

        before = checksum()
        t0 = time.perf_counter()
        w.update_where(
            spark,
            f"event_id > {q[0]} AND event_id <= {q[1]}",
            {"value": "value * 2"},
        )
        out["update_s"] = round(time.perf_counter() - t0, 3)
        after = checksum()
        removes = 0
        v = DeltaTableReader(path).snapshot().version
        with open(
            os.path.join(path, "_delta_log", f"{v:020d}.json")
        ) as f:
            for line in f:
                if line.strip() and "remove" in json.loads(line):
                    removes += 1
        out.update(
            {
                "files_before_update": files_before,
                "update_removes": removes,
                "pruned": removes < files_before,
                "untouched_rows": before[1],
                "ids_preserved": before == after,
            }
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def uniform_pipeline(spark, sf_dir: str) -> dict:
    """UniForm sync at scale (round 12; diffed sync round 13).
    Contracts probed: (a) a PURE-APPEND sync costs O(added) —
    appending the same tiny batch to a table 2× the size must cost
    ~the same wall time (prior manifests carry verbatim, no manifest
    reads); (b) a REMOVE-BEARING sync is MANIFEST-DIFFED — a tiny
    delete on the 2× table must cost ~the same as on the 1× table
    (untouched manifests carry verbatim; only affected ones rewrite,
    O(affected), never O(live files)); (c) the Iceberg view stays
    row-identical to the Delta view throughout (count + sum checksum,
    one scan per side)."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader
    from aws_glue_data_lake_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("k"),
        F.col("user_id").cast("long").alias("u"),
        (F.col("user_id") % 8).cast("long").alias("part"),
    )
    q = ev.approxQuantile("k", [0.5], 0.001)[0]
    full = ev.where(F.col("k") <= q).repartitionByRange(16, "k")
    tiny = ev.where(F.col("k") > q).limit(1000)
    work = tempfile.mkdtemp(prefix="uniform_probe_")
    out: dict = {}
    try:
        path = os.path.join(work, "u")
        log = os.path.join(path, "_delta_log")
        os.makedirs(log)
        schema_string = _json.dumps({
            "type": "struct",
            "fields": [
                {"name": n, "type": "long", "nullable": True,
                 "metadata": {
                     "delta.columnMapping.id": i + 1,
                     "delta.columnMapping.physicalName": f"col-{i + 1}",
                 }}
                for i, n in enumerate(("k", "u", "part"))
            ],
        })
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            for a in [
                {"protocol": {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping"],
                    "writerFeatures": ["columnMapping",
                                       "icebergCompatV2"],
                }},
                {"metaData": {
                    "id": "u", "format": {
                        "provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": ["part"],
                    "configuration": {
                        "delta.columnMapping.mode": "id",
                        "delta.columnMapping.maxColumnId": "3",
                        "delta.enableIcebergCompatV2": "true",
                        "delta.universalFormat.enabledFormats":
                            "iceberg",
                    },
                    "createdTime": 0,
                }},
            ]:
                f.write(_json.dumps(a) + "\n")
        def manifest_count() -> int:
            r = IcebergTableReader(path)
            meta = r._metadata()
            tip = next(
                s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"]
            )
            from aws_glue_data_lake_spark.avrolite import (
                read_container,
            )

            _, mls, _ = read_container(
                tip["manifest-list"].removeprefix("file://")
            )
            return len(mls)

        w = DeltaTableWriter(path)
        t0 = time.perf_counter()
        w.append(full)
        out["initial_load_sync_s"] = round(time.perf_counter() - t0, 3)
        files_small = len(DeltaTableReader(path).snapshot().files)
        t0 = time.perf_counter()
        w.append(tiny)
        out["tiny_append_small_table_s"] = round(
            time.perf_counter() - t0, 3
        )
        # remove-bearing sync on the SMALL table: delete one tiny key
        # range (touches ~1 file -> rewrites ~1 manifest)
        lo = full.agg(F.min("k")).first()[0]
        t0 = time.perf_counter()
        w.delete_where(spark, f"k <= {lo}")
        out["tiny_delete_small_table_s"] = round(
            time.perf_counter() - t0, 3
        )
        # double the table, then the SAME tiny append must cost ~same
        w.append(full.withColumn("k", F.col("k") + F.lit(10 ** 12)))
        files_big = len(DeltaTableReader(path).snapshot().files)
        t0 = time.perf_counter()
        w.append(tiny.withColumn("k", F.col("k") + F.lit(2 * 10 ** 12)))
        out["tiny_append_big_table_s"] = round(
            time.perf_counter() - t0, 3
        )
        out["append_scale_ratio"] = round(
            out["tiny_append_big_table_s"]
            / max(out["tiny_append_small_table_s"], 1e-9),
            2,
        )
        # manifest-DIFFED remove-bearing sync (round 13): the same
        # tiny delete on the 2x table must cost ~the same — untouched
        # manifests carry verbatim, O(affected) not O(live files)
        mcount_before = manifest_count()
        lo2 = 10 ** 12 + lo
        t0 = time.perf_counter()
        w.delete_where(spark, f"k > {10 ** 12} AND k <= {lo2}")
        out["tiny_delete_big_table_s"] = round(
            time.perf_counter() - t0, 3
        )
        out["delete_scale_ratio"] = round(
            out["tiny_delete_big_table_s"]
            / max(out["tiny_delete_small_table_s"], 1e-9),
            2,
        )
        out["manifests_before_diff_delete"] = mcount_before
        out["manifests_after_diff_delete"] = manifest_count()
        t0 = time.perf_counter()
        w.delete_where(spark, f"k <= {q * 0.1}")  # broad CoW delete
        out["cow_delete_broad_sync_s"] = round(
            time.perf_counter() - t0, 3
        )
        d = DeltaTableReader(path).to_df(spark).agg(
            F.count("*"), F.sum("k")).first()
        i = IcebergTableReader(path).to_df(spark).agg(
            F.count("*"), F.sum("k")).first()
        out.update({
            "files_small": files_small,
            "files_big": files_big,
            "views_identical": tuple(d) == tuple(i),
        })
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--slab",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".slab", "x10"),
    )
    ap.add_argument("--max-ratio", type=float, default=12.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="probe only these registry queries (skips the cap/state/"
        "cdc/interop pipelines) — for incremental per-round probes",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from aws_glue_data_lake_spark.queries import all_queries

    os.environ["SPARK_GRAFT_NO_REORDER"] = "1"
    result: dict = {"base": args.base, "slab": args.slab, "timings": {}}

    for scale, sf_dir in (("base", args.base), ("slab", args.slab)):
        spark = (
            SparkSession.builder.appName(f"scale-probe-{scale}")
            .master(f"local[{args.cpus}]")
            .config("spark.driver.memory", "16g")
            .config("spark.sql.shuffle.partitions", "32")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        queries = all_queries()
        for name in (args.only or PROBE_QUERIES):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).limit(200_000).collect()
            result["timings"].setdefault(name, {})[scale] = round(
                time.perf_counter() - t0, 3)
        if args.only:
            spark.stop()
            continue
        result[f"cap_stats_{scale}"] = cap_stats(spark, sf_dir)
        result[f"state_{scale}"] = state_rows(spark, sf_dir)
        cdc = cdc_pipeline(spark, sf_dir)
        result[f"cdc_pipeline_{scale}"] = cdc
        result["timings"].setdefault("cdc_full_pipeline", {})[scale] = cdc[
            "total_s"
        ]
        interop = interop_pipeline(spark, sf_dir)
        result[f"interop_{scale}"] = interop
        for key, secs in (
            ("delta_cow_merges", interop["delta"]["merge_s"]),
            ("delta_cdf_replay", interop["delta"]["cdf_s"]),
            ("iceberg_mor_merges", interop["iceberg"]["merge_s"]),
            ("iceberg_changelog_replay", interop["iceberg"]["changelog_s"]),
        ):
            result["timings"].setdefault(key, {})[scale] = secs
        wp = writepaths_pipeline(spark, sf_dir)
        result[f"writepaths_{scale}"] = wp
        for key, secs in (
            ("delta_colmap_merge", wp["delta_colmap"]["merge_s"]),
            ("iceberg_v3_dv_delete",
             wp["iceberg_v3_dv"]["narrow_s"]
             + wp["iceberg_v3_dv"]["wide_s"]),
        ):
            result["timings"].setdefault(key, {})[scale] = secs
        rt = rowtracking_pipeline(spark, sf_dir)
        result[f"rowtracking_{scale}"] = rt
        for key, secs in (
            ("rowtracking_enable_backfill", rt["enable_backfill_s"]),
            ("rowtracking_update", rt["update_s"]),
        ):
            result["timings"].setdefault(key, {})[scale] = secs
        uni = uniform_pipeline(spark, sf_dir)
        result[f"uniform_{scale}"] = uni
        result["timings"].setdefault("uniform_tiny_append_sync", {})[
            scale
        ] = uni["tiny_append_big_table_s"]
        spark.stop()

    superlinear = {}
    for name, t in result["timings"].items():
        ratio = round(t["slab"] / max(t["base"], 1e-9), 2)
        t["ratio"] = ratio
        if ratio > args.max_ratio:
            superlinear[name] = ratio
    result["superlinear"] = superlinear
    result["verdict"] = "FAIL" if superlinear else "PASS"
    print(json.dumps(result, indent=1))
    return 1 if superlinear else 0


if __name__ == "__main__":
    raise SystemExit(main())
