from . import units  # noqa: F401
from . import box as boxmod  # noqa: F401
from . import engine  # noqa: F401
