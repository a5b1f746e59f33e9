from . import mesh  # noqa: F401
from . import halo  # noqa: F401
from . import bitmerge  # noqa: F401
