"""medcat_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the query / data-processing capabilities of CogStack/MedCAT
(vocabulary-driven NER+L, context-vector disambiguation, relation/triple
emission) as idiomatic Ray Data pipelines: ``ray.data.Dataset`` →
``map_batches`` over Arrow batches, actor pools for stateful stages
(CDB/Vocab pinned once per actor), groupby/aggregate shuffles for the wide
steps, per-partition lineage for resumability.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the caller (bench.py, tests/conftest.py, the driver).
"""

__version__ = "0.1.0"

from medcat_ray.config import EngineConfig  # noqa: F401
