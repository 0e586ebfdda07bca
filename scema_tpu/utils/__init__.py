from . import tensors  # noqa: F401
from . import io_tensors  # noqa: F401
