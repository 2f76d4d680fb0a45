"""Named query plans — the engine's public query surface.

Importing this package populates the registry from every query module; the
driver contract (``__spark_entry__.py``) re-exports ``QUERIES`` / ``ORACLE``.
"""

from .registry import ORACLE, QUERIES, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import semistructured  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import nutrition  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
