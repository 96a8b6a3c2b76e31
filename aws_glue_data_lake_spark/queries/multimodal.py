"""Multimodal columns (north star; SURVEY.md §7 Phase 4): image/audio/video
as opaque ``binary`` payloads with typed metadata, plus Arrow-batched
feature extraction via ``mapInPandas``.

The pipeline always uses a deterministic fake decode (raw bytes as uint8
samples) so output is reproducible whether or not codecs are installed;
``decode_media(..., use_real_codec=True)`` opts into a real decode (PIL
for image when installed; stdlib-wave WAV/PCM for audio) and raises only
when no codec is wired for the media type. The Spark-side plumbing is
real and tested: binary column schema, typed metadata struct, Arrow batch transfer,
per-batch vectorized feature extraction, and the partition layout a media
pipeline needs.

The fixture has no binary table, so the media table derives
deterministically from ``documents``: payload = UTF-8 bytes of ``text``
(an opaque blob as far as the pipeline is concerned), media_type cycles by
doc_id, and metadata (width/height/duration) is derived from payload size
— all reproducible in DuckDB, which makes even the *plumbing* query
oracle-checkable. Only the Pandas feature extraction is rows-only (NumPy
byte math is not SQL).

Scale notes (100 TB): media payloads dominate bytes; the rules are (a)
never shuffle payloads — extract features first, shuffle the small feature
rows; (b) mapInPandas streams Arrow batches, so executor memory is bounded
by batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not file
size; (c) metadata-only predicates (media_type, n_bytes) prune before any
decode runs.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aws_glue_data_lake_spark.queries.base import Registry, t

REGISTRY = Registry()
_q = REGISTRY.query

_MEDIA_TYPES = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: (doc_id, media_type, payload binary,
    meta struct<width,height,duration_ms>). The payload is treated as an
    opaque blob from here on."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n = F.length(payload)
    media_type = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (n % 640).cast("bigint").alias("width"),
            (n % 480).cast("bigint").alias("height"),
            (n * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Plumbing query (oracle-checked): binary payloads carry exact bytes —
# sizes, digests, and typed metadata survive the binary column round-trip.
# ---------------------------------------------------------------------------
@_q(
    "multimodal_binary_metadata",
    oracle="""
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         -- DuckDB md5() lacks a BLOB overload; md5(text) hashes the same
         -- UTF-8 bytes the payload carries, so digests still line up.
         md5(text) AS payload_md5,
         OCTET_LENGTH(ENCODE(text)) AS n
  FROM documents
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n) AS BIGINT) AS total_bytes,
       CAST(MIN(n) AS BIGINT) AS min_bytes,
       CAST(MAX(n) AS BIGINT) AS max_bytes,
       CAST(COUNT(DISTINCT payload_md5) AS BIGINT) AS n_distinct_payloads,
       CAST(SUM(n % 640) AS BIGINT) AS width_sum,
       CAST(SUM(n * 10) AS BIGINT) AS duration_ms_sum
FROM media
GROUP BY media_type
ORDER BY media_type
""",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    n = F.length("payload")
    return (
        m.groupBy("media_type")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(n).cast("bigint").alias("total_bytes"),
            F.min(n).cast("bigint").alias("min_bytes"),
            F.max(n).cast("bigint").alias("max_bytes"),
            F.countDistinct(F.md5("payload")).cast("bigint").alias(
                "n_distinct_payloads"
            ),
            F.sum(F.col("meta.width")).cast("bigint").alias("width_sum"),
            F.sum(F.col("meta.duration_ms")).cast("bigint").alias(
                "duration_ms_sum"
            ),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# Decode stub + Arrow-batched feature extraction (rows-only check).
# ---------------------------------------------------------------------------
def _real_codec_available() -> bool:
    # Probe ONCE per process and cache: a *failed* import is not cached in
    # sys.modules, so probing per row re-scans sys.path on every call —
    # measured at ~10ms/row, which dwarfed the actual byte math.
    global _HAS_PIL
    if _HAS_PIL is None:
        try:
            import PIL.Image  # noqa: F401 — probe only

            _HAS_PIL = True
        except ImportError:
            _HAS_PIL = False
    return _HAS_PIL


_HAS_PIL: bool | None = None


#: Y4M chroma subsampling → bytes per pixel numerator/denominator
#: (frame bytes = W*H*num//den). C420 family variants (jpeg/mpeg2/paldv)
#: share the 4:2:0 layout.
_Y4M_PLANES = {
    "mono": (1, 1),
    "420": (3, 2),
    "420jpeg": (3, 2),
    "420mpeg2": (3, 2),
    "420paldv": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
}


def _decode_y4m(payload: bytes):
    """Real video decode for the uncompressed YUV4MPEG2 container (the
    format ffmpeg/mjpegtools pipe raw video through): parse the stream
    header for geometry and chroma mode, then concatenate every FRAME's
    raw planar YUV bytes into one uint8 sample array — the per-pixel
    analogue of the WAV path's PCM samples. Pure stdlib; compressed
    codecs (h264 etc.) would slot in behind the same seam."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "no real codec available for this video container "
            "(only uncompressed YUV4MPEG2 is wired)"
        )
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", errors="replace")
    width = height = None
    chroma = "420jpeg"  # the Y4M default when no C tag is present
    for tag in header.split(" ")[1:]:
        if tag.startswith("W"):
            width = int(tag[1:])
        elif tag.startswith("H"):
            height = int(tag[1:])
        elif tag.startswith("C"):
            chroma = tag[1:]
    if not width or not height:
        raise ValueError(f"Y4M header missing geometry: {header!r}")
    if chroma not in _Y4M_PLANES:
        raise NotImplementedError(f"unsupported Y4M chroma mode: {chroma}")
    num, den = _Y4M_PLANES[chroma]
    frame_bytes = width * height * num // den
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M frame marker missing")
        start = fnl + 1
        if start + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload[start:start + frame_bytes],
                                    dtype=np.uint8))
        pos = start + frame_bytes
    if not frames:
        return np.empty(0, dtype=np.uint8)
    return np.concatenate(frames)


def decode_media(media_type: str, payload: bytes, *, use_real_codec: bool = False):
    """Decode an opaque payload into a sample array.

    The pipeline always uses the deterministic fake (raw bytes as uint8
    samples) so results are reproducible regardless of which codecs happen
    to be installed — installing Pillow must not change query output. A
    real decode runs only when explicitly requested, and raises if the
    codec is absent so the gap stays explicit. Wired real codecs:

    - ``image`` → PIL (when installed; absent in the base container);
    - ``audio`` → WAV/PCM via the stdlib ``wave`` module (always
      available): frames decode to int16/uint8 samples. ffmpeg-backed
      formats would slot in behind the same gate;
    - ``video`` → uncompressed YUV4MPEG2 (pure stdlib parse; raw planar
      YUV frame bytes as uint8 samples). Other containers raise — the
      seam is the contract, compressed codecs plug in behind it.
    """
    import numpy as np

    if use_real_codec:
        if media_type == "image" and _real_codec_available():
            import io

            import PIL.Image

            return np.asarray(PIL.Image.open(io.BytesIO(payload))).ravel()
        if media_type == "audio":
            import io
            import wave

            with wave.open(io.BytesIO(payload)) as w:
                width = w.getsampwidth()
                frames = w.readframes(w.getnframes())
            if width == 2:
                return np.frombuffer(frames, dtype=np.int16)
            if width == 1:
                return np.frombuffer(frames, dtype=np.uint8)
            raise NotImplementedError(
                f"unsupported WAV sample width: {width} bytes"
            )
        if media_type == "video":
            return _decode_y4m(payload)
        raise NotImplementedError(
            f"no real codec available for media_type={media_type!r}"
        )
    return np.frombuffer(payload, dtype=np.uint8)


_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_samples", LongType()),
        StructField("sample_mean", DoubleType()),
        StructField("sample_std", DoubleType()),
    ]
)


def make_extract_samples(use_real_codec: bool = False):
    """mapInPandas kernel factory over ``decode_media``: per-item decode
    (a real codec is inherently per-payload), NumPy-vectorized stats per
    item. Unlike ``extract_features`` (fake-decode-specialized, whole-
    batch vectorized), this is the generic slot real image/audio decoders
    plug into — same schema either way, so flipping the flag changes the
    decode, not the pipeline shape."""

    def extract_samples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                samples = decode_media(
                    mtype, bytes(payload), use_real_codec=use_real_codec
                ).astype(np.float64)
                n = samples.size
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": mtype,
                        "n_samples": n,
                        "sample_mean": float(samples.mean()) if n else 0.0,
                        "sample_std": float(samples.std()) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _SAMPLE_SCHEMA])

    return extract_samples


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_std", DoubleType()),
        StructField("entropy", DoubleType()),
        StructField("histogram8", ArrayType(DoubleType())),
    ]
)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out.

    Truly batch-vectorized: the whole Arrow batch's payloads are decoded
    into ONE flat uint8 array (the fake decode is byte-identity, so the
    concatenation IS the decode), and every per-item statistic — sum,
    sum-of-squares, 8-bucket histogram — is a single ``np.bincount`` over
    a row-index vector. No Python statement executes per row; cost is
    O(total bytes) in NumPy regardless of row count.
    """
    import numpy as np

    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        n = len(payloads)
        if n == 0:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in _FEATURE_SCHEMA}
            )
            continue
        lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row_idx = np.repeat(np.arange(n), lengths)
        flat_f = flat.astype(np.float64)
        sums = np.bincount(row_idx, weights=flat_f, minlength=n)
        sumsq = np.bincount(row_idx, weights=flat_f * flat_f, minlength=n)
        denom = np.maximum(lengths, 1)
        mean = sums / denom
        var = np.maximum(sumsq / denom - mean * mean, 0.0)
        # 8-bucket histogram for ALL rows at once: bucket ids 0..7 packed
        # into one bincount key per (row, bucket).
        hist = np.bincount(
            row_idx * 8 + (flat >> 5), minlength=n * 8
        ).reshape(n, 8)
        p = hist / denom[:, None]
        plogp = np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": lengths,
                "byte_mean": mean,
                "byte_std": np.sqrt(var),
                "entropy": -plogp.sum(axis=1),
                "histogram8": list(p),
            }
        )


# The fake decode is byte-identity, so the whole feature kernel IS
# SQL-expressible: hex() the payload, lateral-unnest byte positions, and
# every statistic is an exact integer sum (SUM(b), SUM(b*b), per-bucket
# counts) divided in double — bit-identical to the kernel's float64
# `exact-int / n` divisions. Only log2 ulps and the 8-term entropy sum
# order can differ between NumPy and DuckDB (~1e-15), vastly inside the
# ROUND(·, 6) slack.
_HIST_TERMS_SQL = ",\n         ".join(
    f"SUM(CASE WHEN b // 32 = {k} THEN 1 ELSE 0 END) AS h{k}" for k in range(8)
)
_ENTROPY_SQL = " + ".join(
    f"(CASE WHEN h{k} > 0 THEN (h{k} / CAST(n_bytes AS DOUBLE))"
    f" * LOG2(h{k} / CAST(n_bytes AS DOUBLE)) ELSE 0 END)"
    for k in range(8)
)
_HIST_COLS_SQL = ",\n       ".join(
    f"ROUND(h{k} / CAST(n_bytes AS DOUBLE), 6) AS hist_{k}" for k in range(8)
)

_FEATURE_ORACLE = f"""
WITH img AS (
  SELECT doc_id, hex(ENCODE(text)) AS h,
         OCTET_LENGTH(ENCODE(text)) AS n
  FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
),
bytes AS (
  SELECT doc_id, n,
         strpos('0123456789ABCDEF', substr(h, 2 * i - 1, 1)) * 16
         + strpos('0123456789ABCDEF', substr(h, 2 * i, 1)) - 17 AS b
  -- list-typed generate_series under UNNEST: the table-function form
  -- rejects lateral (per-row) bounds, the list form doesn't
  FROM img, UNNEST(generate_series(1, n)) AS g(i)
),
feat AS (
  SELECT doc_id, MAX(n) AS n_bytes, SUM(b) AS s, SUM(b * b) AS ss,
         {_HIST_TERMS_SQL}
  FROM bytes GROUP BY doc_id
),
m AS (
  SELECT *, CAST(s AS DOUBLE) / n_bytes AS mean FROM feat
)
SELECT doc_id, 'image' AS media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
       ROUND(mean, 6) AS byte_mean,
       ROUND(SQRT(GREATEST(CAST(ss AS DOUBLE) / n_bytes - mean * mean, 0)), 6)
         AS byte_std,
       ROUND(-({_ENTROPY_SQL}), 6) AS entropy,
       {_HIST_COLS_SQL}
FROM m
ORDER BY doc_id
"""


@_q("multimodal_feature_extract", oracle=_FEATURE_ORACLE)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media featurization: metadata predicates prune first
    (only 'image' items reach the decoder), then mapInPandas streams
    payload batches through the (stubbed) decoder into small feature rows —
    the shuffle-the-features-not-the-bytes pattern."""
    m = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    # Size the decode parallelism to PAYLOAD BYTES, not to cores: each
    # mapInPandas partition costs a Python worker (spawn + numpy/pandas
    # import on first use), so a ~1 MB fixture corpus across 32 workers is
    # pure startup overhead (measured 9.5 s cold / 4.3 s warm → 2.1 s cold
    # at bytes-sized parallelism), while at real scale the same rule
    # yields cores×many partitions of ~16 MB each. The parquet file size
    # bounds the payload volume without running a job.
    est_bytes = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    par = min(
        spark.sparkContext.defaultParallelism, max(1, est_bytes // (16 << 20))
    )
    feats = (
        m.select("doc_id", "media_type", "payload")
        .repartition(par)
        .mapInPandas(extract_features, schema=_FEATURE_SCHEMA)
    )
    # Registered output flattens histogram8 to scalar columns: the driver's
    # rows-only canonicalizer sorts a pandas frame, and Python lists are
    # unhashable there; the array form stays available via extract_features
    # for composition (tests/test_multimodal.py covers it).
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_std", 6).alias("byte_std"),
        F.round("entropy", 6).alias("entropy"),
        *[
            F.round(F.col("histogram8")[i], 6).alias(f"hist_{i}")
            for i in range(8)
        ],
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling plumbing: treat each video payload as fixed-size frames
# (1 KiB stand-ins for decoded frames) and emit every Nth frame index with
# its byte offsets — the explode(sequence(...)) pattern a real video
# pipeline uses to fan one blob out to per-frame rows BEFORE the (stubbed)
# per-frame decode. Pure arithmetic on sizes, so fully oracle-checkable.
# ---------------------------------------------------------------------------
_FRAME_BYTES = 1024
_SAMPLE_EVERY = 4


@_q(
    "multimodal_frame_sample",
    oracle=f"""
WITH media AS (
  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n
  FROM documents
  WHERE ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] = 'video'
), frames AS (
  SELECT doc_id, n,
         CAST(CEIL(n * 1.0 / {_FRAME_BYTES}) AS BIGINT) AS n_frames
  FROM media
)
SELECT doc_id,
       CAST(u.f AS BIGINT) AS frame_idx,
       CAST(u.f * {_FRAME_BYTES} AS BIGINT) AS byte_start,
       CAST(LEAST((u.f + 1) * {_FRAME_BYTES}, n) AS BIGINT) AS byte_end
FROM frames, UNNEST(generate_series(0, CAST(n_frames - 1 AS BIGINT), {_SAMPLE_EVERY})) AS u(f)
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).where(F.col("media_type") == "video")
    n = F.length("payload").cast("bigint")
    n_frames = F.ceil(n * 1.0 / _FRAME_BYTES).cast("bigint")
    return (
        m.select("doc_id", n.alias("n"), n_frames.alias("n_frames"))
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col("n_frames") - 1,
                    F.lit(_SAMPLE_EVERY).cast("bigint"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * _FRAME_BYTES).cast("bigint").alias("byte_start"),
            F.least(
                (F.col("frame_idx") + 1) * _FRAME_BYTES, F.col("n")
            ).cast("bigint").alias("byte_end"),
        )
        .orderBy("doc_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# REAL audio decode round-trip (oracle-checked, no stub): stage 1 encodes
# genuine RIFF/WAV payloads (mono 16-bit PCM, stdlib `wave` writer) whose
# samples are closed-form arithmetic in (doc_id, i); stage 2 is a
# separate mapInPandas pass that parses the BYTES back with the stdlib
# reader and reports per-file stats. Because the samples are arithmetic,
# the DuckDB oracle recomputes the decoded stats in SQL without ever
# seeing a WAV — the hash certifies that real bytes went through a real
# parser and came back exact. Both stages are Arrow-batched; payloads
# stay inside the executor (never collected), which is the only layout
# that survives 100 TB of media.
# ---------------------------------------------------------------------------
@_q(
    "multimodal_audio_decode_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 100 + doc_id % 200 AS n
  FROM documents WHERE doc_id < 200
),
s AS (
  SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS i FROM d
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(SUM((31 * doc_id + 17 * i) % 2001 - 1000) AS BIGINT) AS sum_samples,
       CAST(MAX(ABS((31 * doc_id + 17 * i) % 2001 - 1000)) AS BIGINT) AS max_abs
FROM s
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def encode_wav(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 100 + doc_id % 200
                samples = ((31 * doc_id + 17 * np.arange(n)) % 2001 - 1000).astype(
                    "<i2"
                )
                buf = io.BytesIO()
                w = wave.open(buf, "wb")
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(samples.tobytes())
                w.close()
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": payloads})

    def decode_wav(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                r = wave.open(io.BytesIO(bytes(payload)), "rb")
                n = r.getnframes()
                rate = r.getframerate()
                samples = np.frombuffer(r.readframes(n), dtype="<i2").astype("int64")
                r.close()
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": n,
                        "sample_rate": rate,
                        "sum_samples": int(samples.sum()),
                        "max_abs": int(np.abs(samples).max()),
                    }
                )
            yield pd.DataFrame(out)

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id")
    encoded = d.mapInPandas(encode_wav, "doc_id BIGINT, wav BINARY")
    decoded = encoded.mapInPandas(
        decode_wav,
        "doc_id BIGINT, n_samples BIGINT, sample_rate BIGINT, "
        "sum_samples BIGINT, max_abs BIGINT",
    )
    return decoded.orderBy("doc_id")


# ---------------------------------------------------------------------------
# REAL image decode round-trip, same contract as the WAV query: stage 1
# writes genuine 24-bit uncompressed BMP files (hand-built BITMAPFILE/
# INFOHEADER via struct — pure stdlib, including the 4-byte row padding
# the format requires), pixels closed-form in (doc_id, x, y); stage 2
# re-parses the BYTES (header offsets, bottom-up row order, padding) and
# reports dimensions plus channel sums. The oracle recomputes the pixel
# arithmetic in SQL — a real binary format crossed the executor boundary
# twice and still hashed exact.
# ---------------------------------------------------------------------------
@_q(
    "multimodal_image_decode_stats",
    oracle="""
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 7 AS h
  FROM documents WHERE doc_id < 150
),
px AS (
  SELECT doc_id, w, h, x.x, y.y,
         (doc_id + 7 * x.x + 13 * y.y) % 256 AS r,
         (2 * doc_id + 5 * x.x + 3 * y.y) % 256 AS g,
         (3 * doc_id + 11 * x.x + y.y) % 256 AS b
  FROM d,
       LATERAL (SELECT UNNEST(generate_series(0, w - 1)) AS x) AS x,
       LATERAL (SELECT UNNEST(generate_series(0, h - 1)) AS y) AS y
)
SELECT doc_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(SUM(r) AS BIGINT) AS r_sum,
       CAST(SUM(g) AS BIGINT) AS g_sum,
       CAST(SUM(b) AS BIGINT) AS b_sum
FROM px
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def encode_bmp(batches):
        import struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 13, 3 + doc_id % 7
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                r = (doc_id + 7 * xs + 13 * ys) % 256
                g = (2 * doc_id + 5 * xs + 3 * ys) % 256
                b = (3 * doc_id + 11 * xs + ys) % 256
                # BGR byte order, bottom-up rows, rows padded to 4 bytes
                bgr = np.stack(
                    [b, g, r], axis=-1
                ).astype("uint8")  # (h, w, 3)
                row_bytes = w * 3
                pad = (-row_bytes) % 4
                rows = []
                for y in range(h - 1, -1, -1):  # bottom-up
                    rows.append(bgr[y].tobytes() + b"\x00" * pad)
                pixel_data = b"".join(rows)
                pixel_offset = 14 + 40
                file_size = pixel_offset + len(pixel_data)
                header = struct.pack(
                    "<2sIHHI", b"BM", file_size, 0, 0, pixel_offset
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                    2835, 2835, 0, 0,
                )
                payloads.append(header + pixel_data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bmp": payloads})

    def decode_bmp(batches):
        import struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
                data = bytes(payload)
                magic, _fsize, _r1, _r2, off = struct.unpack("<2sIHHI", data[:14])
                assert magic == b"BM"
                (_hsz, w, h, _planes, bpp) = struct.unpack("<IiiHH", data[14:30])
                assert bpp == 24
                row_bytes = w * 3
                pad = (-row_bytes) % 4
                rows = []
                for i in range(h):
                    s = off + i * (row_bytes + pad)
                    rows.append(
                        np.frombuffer(data[s : s + row_bytes], dtype="uint8")
                        .reshape(w, 3)
                    )
                img = np.stack(rows[::-1])  # back to top-down (h, w, 3) BGR
                sums = img.astype("int64").sum(axis=(0, 1))
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "r_sum": int(sums[2]),
                        "g_sum": int(sums[1]),
                        "b_sum": int(sums[0]),
                    }
                )
            yield pd.DataFrame(out)

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150).select("doc_id")
    encoded = d.mapInPandas(encode_bmp, "doc_id BIGINT, bmp BINARY")
    decoded = encoded.mapInPandas(
        decode_bmp,
        "doc_id BIGINT, width BIGINT, height BIGINT, "
        "r_sum BIGINT, g_sum BIGINT, b_sum BIGINT",
    )
    return decoded.orderBy("doc_id")


# ---------------------------------------------------------------------------
# REAL video decode round-trip — the video leg of the codec triptych
# (WAV audio / BMP image / Y4M video), same contract: stage 1 encodes
# genuine YUV4MPEG2 streams whose pixel bytes are closed-form arithmetic
# in (doc_id, i); stage 2 re-parses the BYTES with the engine's Y4M
# decoder (_decode_y4m — stream header, chroma geometry, per-FRAME planar
# reads) and reports per-stream stats the DuckDB oracle recomputes in SQL
# without ever seeing a video. Both stages Arrow-batched; payloads never
# leave the executors.
# ---------------------------------------------------------------------------
_Y4M_W, _Y4M_H = 16, 8
_Y4M_FRAME_BYTES = _Y4M_W * _Y4M_H * 3 // 2  # C420: Y + U/4 + V/4


@_q(
    "multimodal_video_decode_stats",
    oracle=f"""
WITH d AS (
  SELECT doc_id, 1 + doc_id % 4 AS nf
  FROM documents WHERE doc_id < 100
),
s AS (
  SELECT doc_id, nf,
         UNNEST(generate_series(0, nf * {_Y4M_FRAME_BYTES} - 1)) AS i
  FROM d
)
SELECT doc_id,
       CAST(MAX(nf) AS BIGINT) AS n_frames,
       CAST(MAX(nf) * {_Y4M_FRAME_BYTES} AS BIGINT) AS n_bytes,
       CAST(SUM((7 * doc_id + 3 * i) % 256) AS BIGINT) AS sum_bytes,
       CAST(MAX((7 * doc_id + 3 * i) % 256) AS BIGINT) AS max_byte
FROM s
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w, h, fb = _Y4M_W, _Y4M_H, _Y4M_FRAME_BYTES

    def encode_y4m(batches):
        import numpy as np
        import pandas as pd

        header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nf = 1 + doc_id % 4
                pix = ((7 * doc_id + 3 * np.arange(nf * fb)) % 256).astype(
                    np.uint8
                )
                parts = [header]
                for f in range(nf):
                    parts.append(b"FRAME\n")
                    parts.append(pix[f * fb : (f + 1) * fb].tobytes())
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "video": payloads})

    def decode_y4m_stats(batches):
        import numpy as np
        import pandas as pd

        from aws_glue_data_lake_spark.queries.multimodal import _decode_y4m

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["video"]):
                samples = _decode_y4m(bytes(payload)).astype(np.int64)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_frames": len(samples) // fb,
                        "n_bytes": len(samples),
                        "sum_bytes": int(samples.sum()),
                        "max_byte": int(samples.max()),
                    }
                )
            yield pd.DataFrame(out)

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100).select("doc_id")
    encoded = d.mapInPandas(encode_y4m, "doc_id BIGINT, video BINARY")
    decoded = encoded.mapInPandas(
        decode_y4m_stats,
        "doc_id BIGINT, n_frames BIGINT, n_bytes BIGINT, "
        "sum_bytes BIGINT, max_byte BIGINT",
    )
    return decoded.orderBy("doc_id")


# --------------------------------------------------------------------------
# Perceptual block-hash image dedup — the multimodal twin of the text
# near-dup family: images are encoded as REAL 24-bit BMPs (pixels keyed
# on doc_id % 37, so ~37 distinct images recur across 200 docs — genuine
# duplicate groups), decoded in an Arrow-batched stage, and hashed with
# a 4-bit block-mean signature (each quadrant's luminance mean vs the
# global mean — blockhash/aHash family). All hash bits come from exact
# int64 cross-multiplied comparisons (sum_q·n_total ≥ sum_total·n_q), so
# Python's signature equals the oracle's closed-form pixel arithmetic
# bit for bit. Output: duplicate groups per (dims, hash) with the
# distinct-content count as the collision diagnostic — at 100 TB the
# signature is the shuffle key and full images never co-locate.
# --------------------------------------------------------------------------
# Arrow-batched BMP encode / block-hash stages shared by
# dedup_image_blockhash and pipeline_multimodal_curation.
def _bmp_encode(batches):
    import struct

    import numpy as np
    import pandas as pd

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            key = int(doc_id) % 37
            w, h = 4 + key % 13, 3 + key % 7
            xs = np.arange(w)[None, :]
            ys = np.arange(h)[:, None]
            r = (key + 7 * xs + 13 * ys) % 256
            g = (2 * key + 5 * xs + 3 * ys) % 256
            b = (3 * key + 11 * xs + ys) % 256
            bgr = np.stack([b, g, r], axis=-1).astype("uint8")
            row_bytes = w * 3
            pad = (-row_bytes) % 4
            rows = [
                bgr[y].tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            ]
            pixel_data = b"".join(rows)
            off = 54
            header = struct.pack(
                "<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off
            ) + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                2835, 2835, 0, 0,
            )
            payloads.append(header + pixel_data)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "bmp": payloads})

def _bmp_blockhash(batches):
    import struct

    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["bmp"]):
            data = bytes(payload)
            magic, _sz, _r1, _r2, off = struct.unpack("<2sIHHI", data[:14])
            assert magic == b"BM"
            _hsz, w, h, _pl, bpp = struct.unpack("<IiiHH", data[14:30])
            assert bpp == 24
            row_bytes = w * 3
            pad = (-row_bytes) % 4
            rows = [
                np.frombuffer(
                    data[off + i * (row_bytes + pad):][:row_bytes],
                    dtype="uint8",
                ).reshape(w, 3)
                for i in range(h)
            ]
            img = np.stack(rows[::-1]).astype("int64")  # (h, w, 3) BGR
            lum = img.sum(axis=-1)  # r+g+b per pixel
            st, ct = int(lum.sum()), w * h
            hx, hy = w // 2, h // 2
            quads = [
                lum[:hy, :hx], lum[:hy, hx:], lum[hy:, :hx], lum[hy:, hx:]
            ]
            bits = 0
            for weight, qd in zip((8, 4, 2, 1), quads):
                s, c = int(qd.sum()), qd.size
                if s * ct >= st * c:
                    bits += weight
            out.append((int(doc_id), w, h, bits))
        yield pd.DataFrame(
            out, columns=["doc_id", "width", "height", "hash"]
        )


#: Shared block-hash CTE pyramid (keyed pixels -> quadrant sums ->
#: 4-bit signature), reused by dedup_image_blockhash and the
#: curation composition.
_BLOCKHASH_CTES = """k AS (
  SELECT doc_id, doc_id % 37 AS key,
         4 + (doc_id % 37) % 13 AS w,
         3 + (doc_id % 37) % 7 AS h
  FROM documents WHERE doc_id < 200
),
px AS (
  SELECT doc_id, key, w, h, x.x, y.y,
         (key + 7 * x.x + 13 * y.y) % 256
         + (2 * key + 5 * x.x + 3 * y.y) % 256
         + (3 * key + 11 * x.x + y.y) % 256 AS lum,
         CASE WHEN x.x < w // 2 THEN 0 ELSE 1 END AS qx,
         CASE WHEN y.y < h // 2 THEN 0 ELSE 1 END AS qy
  FROM k,
       LATERAL (SELECT UNNEST(generate_series(0, w - 1)) AS x) AS x,
       LATERAL (SELECT UNNEST(generate_series(0, h - 1)) AS y) AS y
),
q AS (
  SELECT doc_id, key, w, h, qx, qy,
         CAST(SUM(lum) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
  FROM px GROUP BY 1, 2, 3, 4, 5, 6
),
g AS (
  SELECT doc_id, key, w, h,
         CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(c) AS BIGINT) AS ct
  FROM q GROUP BY 1, 2, 3, 4
),
bits AS (
  SELECT q.doc_id, q.key, q.w, q.h,
         CAST(SUM(CASE WHEN q.s * g.ct >= g.st * q.c
                       THEN CASE
                         WHEN q.qy = 0 AND q.qx = 0 THEN 8
                         WHEN q.qy = 0 AND q.qx = 1 THEN 4
                         WHEN q.qy = 1 AND q.qx = 0 THEN 2
                         ELSE 1 END
                       ELSE 0 END) AS BIGINT) AS hash
  FROM q JOIN g ON g.doc_id = q.doc_id
  GROUP BY 1, 2, 3, 4
)"""


@_q(
    "dedup_image_blockhash",
    oracle="""
WITH {ctes}
SELECT CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, hash,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_contents,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM bits
GROUP BY w, h, hash
HAVING COUNT(*) > 1
ORDER BY width, height, hash
""".format(ctes=_BLOCKHASH_CTES),
)
def dedup_image_blockhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id")
    )
    bmps = d.mapInPandas(_bmp_encode, "doc_id long, bmp binary")
    hashed = bmps.mapInPandas(
        _bmp_blockhash, "doc_id long, width long, height long, hash long"
    )
    return (
        hashed.withColumn("key", F.col("doc_id") % 37)
        .groupBy("width", "height", "hash")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.countDistinct("key").cast("bigint").alias("n_contents"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where(F.col("n_images") > 1)
        .orderBy("width", "height", "hash")
    )


# --------------------------------------------------------------------------
# Audio energy-fingerprint dedup — the audio twin of dedup_image_blockhash
# (the multimodal near-dup pair complete): clips are encoded as REAL WAV
# files (samples keyed on doc_id % 29, so ~29 distinct clips recur across
# 200 docs), decoded with the stdlib parser, and fingerprinted by a 4-bit
# segment-energy signature — each quarter's Σsample² against the clip
# mean, compared by exact int64 cross-multiplication, the skeleton of
# chromaprint-style audio hashing. Oracle recomputes the signature from
# the closed-form sample formula; duplicate groups and the hash-collision
# diagnostic are both hash-verified. Scale: the 4-bit+length signature is
# the shuffle key; raw audio never co-locates.
# --------------------------------------------------------------------------
@_q(
    "dedup_audio_fingerprint",
    oracle="""
WITH k AS (
  SELECT doc_id, doc_id % 29 AS key, 100 + (doc_id % 29) % 200 AS n
  FROM documents WHERE doc_id < 200
),
smp AS (
  SELECT doc_id, key, n, i.i,
         ((31 * key + 17 * i.i) % 2001 - 1000) AS s,
         (i.i * 4) // n AS seg
  FROM k, LATERAL (SELECT UNNEST(generate_series(0, n - 1)) AS i) AS i
),
q AS (
  SELECT doc_id, key, n, seg,
         CAST(SUM(s * s) AS BIGINT) AS e, CAST(COUNT(*) AS BIGINT) AS c
  FROM smp GROUP BY 1, 2, 3, 4
),
g AS (
  SELECT doc_id, CAST(SUM(e) AS BIGINT) AS et, CAST(SUM(c) AS BIGINT) AS ct
  FROM q GROUP BY 1
),
bits AS (
  SELECT q.doc_id, q.key, q.n,
         CAST(SUM(CASE WHEN q.e * g.ct >= g.et * q.c
                       THEN CASE q.seg WHEN 0 THEN 8 WHEN 1 THEN 4
                                       WHEN 2 THEN 2 ELSE 1 END
                       ELSE 0 END) AS BIGINT) AS hash
  FROM q JOIN g ON g.doc_id = q.doc_id
  GROUP BY 1, 2, 3
)
SELECT CAST(n AS BIGINT) AS n_samples, hash,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_contents,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM bits
GROUP BY n, hash
HAVING COUNT(*) > 1
ORDER BY n_samples, hash
""",
)
def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def encode(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                key = int(doc_id) % 29
                n = 100 + key % 200
                samples = (
                    (31 * key + 17 * np.arange(n)) % 2001 - 1000
                ).astype("<i2")
                buf = io.BytesIO()
                w = wave.open(buf, "wb")
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(samples.tobytes())
                w.close()
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": payloads})

    def decode_fp(batches):
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                r = wave.open(io.BytesIO(bytes(payload)), "rb")
                n = r.getnframes()
                s = np.frombuffer(r.readframes(n), dtype="<i2").astype(
                    "int64"
                )
                r.close()
                seg = (np.arange(n) * 4) // n
                et, ct = int((s * s).sum()), n
                bits = 0
                for weight, j in zip((8, 4, 2, 1), range(4)):
                    m = seg == j
                    e, c = int((s[m] * s[m]).sum()), int(m.sum())
                    if e * ct >= et * c:
                        bits += weight
                out.append((int(doc_id), n, bits))
            yield pd.DataFrame(out, columns=["doc_id", "n_samples", "hash"])

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id")
    )
    wavs = d.mapInPandas(encode, "doc_id long, wav binary")
    fps = wavs.mapInPandas(decode_fp, "doc_id long, n_samples long, hash long")
    return (
        fps.withColumn("key", F.col("doc_id") % 29)
        .groupBy("n_samples", "hash")
        .agg(
            F.count("*").cast("bigint").alias("n_clips"),
            F.countDistinct("key").cast("bigint").alias("n_contents"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where(F.col("n_clips") > 1)
        .orderBy("n_samples", "hash")
    )


# --------------------------------------------------------------------------
# Multimodal curation composition — the end-to-end slice of a paired
# text+image corpus build: (1) image near-dup removal (block-hash groups,
# keep lowest doc_id — shared stages with dedup_image_blockhash), then
# (2) a text length gate on the survivors, reported per source with doc
# and char accounting at every stage. The composition is the point: the
# dedup keep-set is computed on the image modality and applied to the
# text rows — the cross-modal filter every CLIP-style dataset build runs.
# Survivor selection joins on the tiny (dims, hash, keep_doc_id) group
# table, so the corpus never self-joins.
# --------------------------------------------------------------------------
_CUR_MIN_CHARS = 200
_CUR_MAX_CHARS = 2500


@_q(
    "pipeline_multimodal_curation",
    oracle="""
WITH {ctes},
keeps AS (
  SELECT MIN(doc_id) AS doc_id FROM bits GROUP BY w, h, hash
),
staged AS (
  SELECT d.source, d.n_chars,
         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS kept_dedup,
         CASE WHEN k.doc_id IS NOT NULL
               AND d.n_chars BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END
           AS kept_final
  FROM documents d LEFT JOIN keeps k ON k.doc_id = d.doc_id
  WHERE d.doc_id < 200
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_input,
       CAST(SUM(kept_dedup) AS BIGINT) AS n_after_imgdedup,
       CAST(SUM(kept_final) AS BIGINT) AS n_after_quality,
       CAST(SUM(CASE WHEN kept_final = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_final
FROM staged
GROUP BY source
ORDER BY source
""".format(ctes=_BLOCKHASH_CTES, lo=_CUR_MIN_CHARS, hi=_CUR_MAX_CHARS),
)
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    bmps = d.select("doc_id").mapInPandas(
        _bmp_encode, "doc_id long, bmp binary"
    )
    hashed = bmps.mapInPandas(
        _bmp_blockhash, "doc_id long, width long, height long, hash long"
    )
    keeps = (
        hashed.groupBy("width", "height", "hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .withColumn("kept", F.lit(1))
    )
    staged = d.join(F.broadcast(keeps), "doc_id", "left").select(
        "source",
        "n_chars",
        F.coalesce("kept", F.lit(0)).alias("kept_dedup"),
        F.when(
            F.col("kept").isNotNull()
            & F.col("n_chars").between(_CUR_MIN_CHARS, _CUR_MAX_CHARS),
            1,
        )
        .otherwise(0)
        .alias("kept_final"),
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_input"),
            F.sum("kept_dedup").cast("bigint").alias("n_after_imgdedup"),
            F.sum("kept_final").cast("bigint").alias("n_after_quality"),
            F.sum(
                F.when(F.col("kept_final") == 1, F.col("n_chars")).otherwise(0)
            )
            .cast("bigint")
            .alias("chars_final"),
        )
        .orderBy("source")
    )
