from . import problem  # noqa: F401
