from .events import session_windows, streaming_windowed_counts

__all__ = ["session_windows", "streaming_windowed_counts"]
