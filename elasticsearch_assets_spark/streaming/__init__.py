"""Structured Streaming surface (SURVEY.md §2.9): the reference's persistent
mode re-expressed as watermarked tumbling windows."""
