from crawler_pyspider_spark.streaming.counters import (  # noqa: F401
    stream_running_counts,
    stream_windowed_counters,
)
