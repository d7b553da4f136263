"""Pure (Ray-free) document-level core: the annotator that stages wrap."""

from medcat_ray.core.annotator import DocAnnotator, Entity  # noqa: F401
