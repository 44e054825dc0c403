"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing."""
