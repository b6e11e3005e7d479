"""Source/sink registry — batch and streaming readers behind one API.

SURVEY §2.1: Kafka CSV source (S1), JDBC scans (S2/S3), partitioned
parquet sink (S4), console sink (S5), rate source (S7), Kafka sink
(S8), seeded generator (S9). Kafka/JDBC endpoints are config builders
plus file-backed fakes so tests run hermetically (no broker/DB in the
test container).
"""
