"""The medallion weather pipeline: extract → normalize → L1 → L2."""
