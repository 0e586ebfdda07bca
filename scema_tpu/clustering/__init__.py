from . import spline  # noqa: F401
from . import similarity  # noqa: F401
from . import reduction  # noqa: F401
