"""Source and sink builders (SURVEY.md §2A): Kafka stream source/sink with the
declared JSON envelopes, file sources (parquet/csv/json/binaryFile), a
file-based stream replay for tests, and the JDBC connector kept optional.
"""
