"""Structured Streaming extension (events table)."""
