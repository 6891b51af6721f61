"""Large-scale training-data pipeline operators over Ray Data.

Beyond the reference's encode/decode operators: the operations a 100 TB
web-text corpus pipeline needs around the compression engine — exact and
near deduplication, similarity search over embeddings, text analysis,
and multimodal column plumbing. Each operator is a streaming Dataset
transform (map_batches-first, shuffles only where semantically required)
and is exposed through `__ray_entry__.queries()`.
"""

from . import cdc, dedup, html, lm, multimodal, similarity, textstats

__all__ = ["cdc", "dedup", "html", "lm", "multimodal", "similarity",
           "textstats"]
