from .jobs import (
    stream_append_clean,
    stream_dedup,
    stream_session_counts,
    stream_stateful_counter,
    stream_windowed_counts,
    run_available_now,
)

__all__ = [
    "run_available_now",
    "stream_append_clean",
    "stream_dedup",
    "stream_session_counts",
    "stream_stateful_counter",
    "stream_windowed_counts",
]
