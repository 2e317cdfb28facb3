"""Large-scale data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing."""

from . import dedup, multimodal, similarity, text  # noqa: F401
