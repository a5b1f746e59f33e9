from . import pnm  # noqa: F401
from . import bitplanes  # noqa: F401
from . import mosaic  # noqa: F401
from . import rand48  # noqa: F401
