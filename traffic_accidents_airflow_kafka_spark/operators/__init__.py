"""Large-scale data-pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing."""

from . import dedup, graph, multimodal, sampling, similarity, text  # noqa: F401
