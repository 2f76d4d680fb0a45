"""Structured Streaming layer: ingest, event-time windows, stateful dedup."""
