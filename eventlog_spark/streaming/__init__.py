"""Structured Streaming surface: log tail/replay + watermarked windows."""
