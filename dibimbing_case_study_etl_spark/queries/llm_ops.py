"""North-star LLM-data-pipeline queries (dedup, similarity search,
text analysis, multimodal) over the ``documents`` and ``embeddings`` tables.

Filled in by operators/{dedup,similarity,multimodal}.py and functions/text.py.
"""

from __future__ import annotations
