from . import filters, quality  # noqa: F401
