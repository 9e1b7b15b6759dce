from .ingest import (
    TRANSCRIPT_SCHEMA,
    conversation_progress,
    stream_index_transcripts,
    streaming_role_stats,
    transcript_stream,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "conversation_progress",
    "stream_index_transcripts",
    "streaming_role_stats",
    "transcript_stream",
]
