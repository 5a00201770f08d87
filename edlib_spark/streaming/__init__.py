from .scorer import score_pair_stream, run_stream_scoring  # noqa: F401
