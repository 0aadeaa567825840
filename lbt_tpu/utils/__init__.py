"""Logging / metrics utilities."""

from lbt_tpu.utils.logging import MetricsWriter, get_logger  # noqa: F401
