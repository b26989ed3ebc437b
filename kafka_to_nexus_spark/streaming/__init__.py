from . import job, stateful  # noqa: F401
