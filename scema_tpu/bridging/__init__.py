from . import bridge  # noqa: F401
