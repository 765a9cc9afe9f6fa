"""Composable DataFrame operators.

Each module re-expresses one family from SURVEY.md §2 as lazy,
partition-aware DataFrame transforms (no driver collect on the data
path), plus the large-scale training-data operators the reference never
had (dedup, similarity search, text analysis, multimodal plumbing).
"""
