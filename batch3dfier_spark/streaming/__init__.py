from .events import (  # noqa: F401
    hourly_counts,
    read_event_stream,
    run_stream_to_df,
    user_running_totals,
)
