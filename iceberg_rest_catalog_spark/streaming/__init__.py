"""Structured Streaming operators over the ``events`` append table.

The reference models tables as append-only snapshot logs (optimistic commits
— reference api/handlers/tables.go:150-227); Structured Streaming over a
file source is the Spark-native consumption of exactly that log: each
micro-batch corresponds to a set of newly committed files.
"""
