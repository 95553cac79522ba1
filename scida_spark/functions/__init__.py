"""Data-pipeline functions: text analysis, dedup, similarity, multimodal.

Net-new capability beyond the reference (SURVEY §7 phase 7): the
operators a large-scale training-data pipeline needs, built on the same
DataFrame-handle model and designed for 100 TB inputs.
"""
