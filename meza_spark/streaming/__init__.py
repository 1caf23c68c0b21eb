from .ops import (
    foreach_batch_sink, read_stream, session_window_agg, sliding_window_agg, stream_dedupe,
    stream_cusum, stream_fill_running, stream_session_paths, stream_static_join, stream_stream_join,
    tumbling_window_agg,
    write_stream,
)

__all__ = [
    "read_stream", "write_stream", "tumbling_window_agg",
    "sliding_window_agg", "session_window_agg", "stream_dedupe",
    "stream_fill_running", "stream_static_join",
    "foreach_batch_sink", "stream_stream_join", "stream_cusum",
    "stream_session_paths",
]
