"""Structured Streaming surface — net-new capability (the reference has
no streaming at all, SURVEY §2.7): windowed aggregations with
watermarks, streaming dedup, and a stateful sessionizer, over the
``events`` table schema."""
