"""Structured Streaming surface: incremental weather ingestion
(file source + AvailableNow + foreachBatch upsert) and event-stream
analytics (watermarked windowed aggregation, session windows)."""
