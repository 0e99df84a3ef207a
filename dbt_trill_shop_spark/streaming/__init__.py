from .events import (
    run_stream_to_memory,
    sessionize_stream,
    stream_dedup_events,
    stream_events,
    weekly_event_counts_stream,
)

__all__ = [
    "stream_events",
    "weekly_event_counts_stream",
    "sessionize_stream",
    "stream_dedup_events",
    "run_stream_to_memory",
]
