from .events import read_event_stream, sessionize_stream, windowed_event_counts  # noqa: F401
