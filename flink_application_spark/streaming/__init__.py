"""Structured Streaming layer (SURVEY §7.2 M3).

The operator library in ``operators/`` is batch/stream-agnostic
(DataFrame → DataFrame); this package adds the stream-only pieces:
session-window dedup state, sink policies (console / partitioned
parquet with trigger + checkpoint), and the end-to-end streaming
enrichment pipeline mirroring the reference job topology.
"""
