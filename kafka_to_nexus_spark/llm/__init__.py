"""Scale extras for large training-data pipelines (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column plumbing.

These ride entirely on standard Spark operators (built-in functions, hash
aggregation, broadcast joins, Arrow-batched Pandas UDFs where vectorized
Python is genuinely needed) and are designed for the 100 TB path:
no driver-side loops, no O(n²) stages without candidate pruning.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
