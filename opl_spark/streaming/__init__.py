from opl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    sessionize,
    windowed_counts,
)
