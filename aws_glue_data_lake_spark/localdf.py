"""Driver-local metadata DataFrames without the 32-slice tax.

``spark.createDataFrame(list)`` parallelizes the rows over
``defaultParallelism`` slices regardless of size, so every metadata-sized
frame (file maps, DV descriptors, version maps, snapshot listings) pays
one Python-worker task per core — measured ~0.3-1.3 s per job on
``local[32]`` for a 5-row frame, and 2-3× on every broadcast built from
one (optimization guide §2.4/§4: the rows already live on the driver;
shipping them through 32 pickle partitions is pure scheduling overhead).

``local_df`` parallelizes with a slice count derived from the row count
instead: metadata frames stay single-slice locally, while a 100 TB
table's million-entry file map still fans out (one slice per ~64k rows)
so downstream zips/joins aren't funneled through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Rows per slice before a driver-local frame gains parallelism. Metadata
#: rows are small (a path + a handful of longs); 64k rows per task keeps
#: tasks in the ~10 MB range.
_ROWS_PER_SLICE = 65_536


def local_df(
    spark: SparkSession,
    rows,
    schema,
    slices: int | None = None,
) -> DataFrame:
    """``createDataFrame`` for driver-local rows with size-derived slicing.

    ``slices`` overrides the derived count (e.g. a file-path frame feeding
    a ``mapInPandas`` reader wants one slice per concurrent file read).
    Empty input returns the plain empty-local-relation frame (no job).
    """
    if not isinstance(rows, (list, tuple)):
        rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if slices is None:
        slices = min(
            1 + (len(rows) - 1) // _ROWS_PER_SLICE,
            spark.sparkContext.defaultParallelism,
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
