from . import asof_join, filters, quality, range_join, skew  # noqa: F401
