"""Declared correctness queries (SURVEY §5.3) and the relational
query surface (SURVEY §2.7 gap list) built on the engine API."""
