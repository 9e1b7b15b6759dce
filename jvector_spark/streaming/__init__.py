from .ingest import (
    TRANSCRIPT_SCHEMA,
    conversation_progress,
    flush_staged,
    staged_docs,
    stream_index_transcripts,
    streaming_role_stats,
    transcript_stream,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "conversation_progress",
    "flush_staged",
    "staged_docs",
    "stream_index_transcripts",
    "streaming_role_stats",
    "transcript_stream",
]
