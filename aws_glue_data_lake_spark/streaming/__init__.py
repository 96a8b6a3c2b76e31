"""Structured Streaming surface (SURVEY.md §2.10, §7 Phase 5).

The reference is batch micro-incremental — its "stream" is a CDC table plus
a destination-max-date watermark (icberg/iceberg_tables.py:131-133). This
package is the streaming generalization: file-source ``readStream`` over the
same fixtures, event-time watermarks, tumbling/session windows, and
``foreachBatch`` wrapping the batch CDC merge (operators/cdc.py) for
sink-side upserts.
"""

from aws_glue_data_lake_spark.streaming.pipelines import (
    read_events_stream,
    run_available_now,
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "session_window_agg",
    "tumbling_window_agg",
]
