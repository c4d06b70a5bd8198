"""Multimodal (binary) column operators: Arrow-batched UDF plumbing."""
