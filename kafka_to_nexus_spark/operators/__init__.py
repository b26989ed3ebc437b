from . import asof_join, filters, quality, range_join  # noqa: F401
