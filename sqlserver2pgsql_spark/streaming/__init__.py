from .jobs import (
    event_stream_schema,
    foreach_batch_upsert,
    run_stream_to_memory,
    sessionized_stream,
    stream_events,
    windowed_event_agg,
)

__all__ = [
    "event_stream_schema",
    "foreach_batch_upsert",
    "run_stream_to_memory",
    "sessionized_stream",
    "stream_events",
    "windowed_event_agg",
]
