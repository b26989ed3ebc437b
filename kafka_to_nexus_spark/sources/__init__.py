from . import fixtures  # noqa: F401
