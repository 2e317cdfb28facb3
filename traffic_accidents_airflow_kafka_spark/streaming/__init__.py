"""Structured Streaming surface: sources, window aggregates, availableNow
runner, Kafka payload contracts (``core``), and the 7-topic publisher
(``publisher``)."""

from . import core, publisher  # noqa: F401
