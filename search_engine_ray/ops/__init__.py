"""Operator ring: relational ops (reference parity, SURVEY.md §2.2),
plus the large-scale training-data operators (dedup, ANN, text
analysis, multimodal plumbing) that make the engine useful at 100 TB.
"""
