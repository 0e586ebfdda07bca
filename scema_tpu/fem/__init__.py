from . import mesh  # noqa: F401
from . import shapes  # noqa: F401
