"""Sources and sinks: parquet table access (``tables``), the write path
(``sinks``), and the optional JDBC interop connector (``jdbc``)."""

from . import jdbc, sinks, tables  # noqa: F401
