"""Structured Streaming ingest — the streaming analog of the
reference's write/lock protocol (SURVEY §2.6/§3.4)."""
