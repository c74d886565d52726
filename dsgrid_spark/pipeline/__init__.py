"""Large-scale training-data pipeline operators (beyond the reference).

Deduplication, similarity search, text analysis, and multimodal column
plumbing — all on the same DataFrame substrate as the dimensional engine.
"""
