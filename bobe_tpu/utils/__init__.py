from . import core, log, seed  # noqa: F401
