"""Ray Data stages: batch transforms (stateless tasks) and actor-pool
stages (stateful, model pinned per actor) for the KG pipeline."""

from medcat_ray.stages.annotate import AnnotateStage, extract_text_batch  # noqa: F401
from medcat_ray.stages.triples import (  # noqa: F401
    explode_entities, gen_triple_rows, partial_triple_counts)
