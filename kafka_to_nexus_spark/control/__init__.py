from . import commands  # noqa: F401
