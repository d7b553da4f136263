"""Broadcast model state: CDB (concept database) and Vocab (word vectors).

Built once on the driver (or loaded from a Parquet artifact directory),
shipped to annotate actors via ``ray.put`` and pinned per actor in
``__init__`` — the Ray-native analogue of the reference duplicating the CDB
into every forked worker (/root/reference/medcat/cat.py:1642-1690).
"""

from medcat_ray.state.cdb import CDB, prepare_name  # noqa: F401
from medcat_ray.state.vocab import Vocab  # noqa: F401
