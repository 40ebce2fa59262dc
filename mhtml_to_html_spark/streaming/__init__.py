from .ingest import (  # noqa: F401
    stream_events_windowed,
    stream_split_archives,
    stream_dedup_events,
    stream_sessionize,
)
