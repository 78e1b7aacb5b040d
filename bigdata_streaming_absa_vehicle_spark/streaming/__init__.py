"""Structured-streaming surface (SURVEY.md §2I): event-time windows with
watermarks, stateful dedup, arbitrary state, idempotent sinks, and the two
reference pipelines (ABSA reviews, vehicle frames) as streaming graphs.
"""
