"""Structured Streaming surface: envelope stream replay, watermarked
windows, stateful dedup, session windows."""
