"""Sources: Kafka stream, file-stream test mode, batch CSV/parquet.

One decode path serves both modes (SURVEY.md §1.3): the wire format is
JSON objects against the canonical tweet schema; batch CSVs declare
explicit schemas instead of the reference's inferSchema + positional
rename loop.
"""
