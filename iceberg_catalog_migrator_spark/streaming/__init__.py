from .jobs import (
    events_stream,
    hourly_counts_stream,
    run_stream_to_memory,
    session_window_stream,
    stateful_user_counter_stream,
    stream_dedup,
)

__all__ = [
    "events_stream",
    "hourly_counts_stream",
    "run_stream_to_memory",
    "session_window_stream",
    "stateful_user_counter_stream",
    "stream_dedup",
]
