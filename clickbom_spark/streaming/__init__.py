from clickbom_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)
from clickbom_spark.streaming.pipeline import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory_sink,
    write_foreach_batch,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "read_events_stream",
    "dedup_within_watermark",
    "run_to_memory_sink",
    "write_foreach_batch",
]
