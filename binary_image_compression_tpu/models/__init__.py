from . import compress  # noqa: F401
from . import bsvd  # noqa: F401
from . import ref_parity  # noqa: F401
from . import codec  # noqa: F401
from . import archive  # noqa: F401
