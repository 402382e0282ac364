"""Engine operators: the pieces Spark doesn't ship as a single call.

- ``merge_upsert``  : keyed upsert over plain Parquet (reference's ON CONFLICT).
- ``dedup_window``  : latest-per-key dedup (reference's W1 window).
- ``quality``       : declarative DQ checks (reference's normalize assertions).
- ``dedup``         : exact + near-duplicate detection family (north star).
- ``similarity``    : embedding similarity search (north star).
- ``multimodal``    : binary-column plumbing with stubbed decoders (north star).
"""
