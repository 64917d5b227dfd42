"""Engine operators: data quality, SCD merges, and the 100 TB-scale
extension suite (dedup, similarity search, text analysis, multimodal)."""
