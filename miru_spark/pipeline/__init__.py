"""Large-scale training-data pipeline ops: dedup, similarity, text, multimodal."""
