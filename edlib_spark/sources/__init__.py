from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA, synth_transcripts, transcripts_path,
    ensure_transcripts_parquet, SCALES,
)
