"""RayPipe declarative composition (pipelines/compose.py) — the
reference's Pipe.add_* extension surface (medcat/pipe.py:78-186)."""

import pyarrow as pa
import pytest

import ray.data as rd

from medcat_ray.pipelines.compose import RayPipe
from medcat_ray.stages.meta import MetaRule


@pytest.fixture(scope="module")
def annotated_corpus(ray_session, fixture_models, tmp_path_factory):
    from medcat_ray.fixtures import make_pages_corpus
    cdb, vocab = fixture_models
    d = tmp_path_factory.mktemp("compose_pages")
    make_pages_corpus(str(d), n_pages=40, seed=3, cdb=cdb,
                      rows_per_file=20)
    return str(d), cdb, vocab


def _make_shout_count():
    # nested so cloudpickle serializes it BY VALUE — Ray workers cannot
    # import the tests/ module
    def _shout_count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.count_substring_regex(
            pc.fill_null(batch["text"], ""), pattern=r"[A-Z]{2,}")
        return batch.append_column("n_shouts", n.cast(pa.int64()))
    return _shout_count


def test_pipe_matches_manual_chain(annotated_corpus):
    pages_dir, cdb, vocab = annotated_corpus
    import ray
    from medcat_ray.stages.annotate import AnnotateStage, \
        extract_text_batch
    from medcat_ray.stages.meta import meta_annotate
    models = ray.put((cdb, vocab))
    rules = [MetaRule("Negation", ["no", "not", "denies"],
                      "Negated", "Affirmed")]

    def read():
        return rd.read_parquet(pages_dir, columns=["url", "html"]) \
            .map_batches(extract_text_batch, batch_format="pyarrow")

    _shout_count = _make_shout_count()
    pipe = (RayPipe(models=models, key_column="url")
            .add_component(_shout_count)
            .add_annotator(concurrency=1)
            .add_meta_cat(rules, concurrency=1))
    got = pipe.run(read()).to_pandas().sort_values("url") \
        .reset_index(drop=True)

    manual = read().map_batches(_shout_count, batch_format="pyarrow") \
        .map_batches(AnnotateStage,
                     fn_constructor_kwargs=dict(
                         models=models, config=None, key_column="url",
                         keep_columns=("text",)),
                     batch_format="pyarrow", batch_size=128,
                     concurrency=1, num_cpus=1)
    manual = meta_annotate(manual, rules=rules, concurrency=1) \
        .to_pandas().sort_values("url").reset_index(drop=True)

    # the custom component's column is consumed by AnnotateStage's
    # projection (keep_columns) in both paths; entity + meta payloads
    # must agree exactly
    assert list(got.columns) == list(manual.columns)
    import json

    def dump(s):
        enc = lambda o: o.tolist() if hasattr(o, "tolist") else str(o)  # noqa: E731
        return s.apply(lambda v: json.dumps(v, sort_keys=True,
                                            default=enc)).tolist()

    assert got["url"].tolist() == manual["url"].tolist()
    assert got["n_ents"].tolist() == manual["n_ents"].tolist()
    assert dump(got["ents"]) == dump(manual["ents"])
    assert dump(got["meta_anns"]) == dump(manual["meta_anns"])
    assert got["n_ents"].sum() > 0


def test_pipe_custom_component_task_pool(ray_session):
    ds = rd.from_items([{"url": f"u{i}", "text": f"SOME text {i} OK"}
                        for i in range(10)])
    out = (RayPipe().add_component(_make_shout_count()).run(ds)).to_pandas()
    assert (out["n_shouts"] >= 2).all()


def test_pipe_requires_stages(ray_session):
    with pytest.raises(ValueError):
        RayPipe().run(rd.from_items([{"x": 1}]))


def test_pipe_requires_models_for_annotator():
    with pytest.raises(ValueError):
        RayPipe().add_annotator()


def test_pipe_rel_cat_stage(annotated_corpus):
    pages_dir, cdb, vocab = annotated_corpus
    import ray
    from medcat_ray.stages.annotate import extract_text_batch
    from medcat_ray.stages.rel_model import LearnedRelModel
    models = ray.put((cdb, vocab))
    ds = rd.read_parquet(pages_dir, columns=["url", "html"]) \
        .map_batches(extract_text_batch, batch_format="pyarrow")
    pipe = (RayPipe(models=models, key_column="url")
            .add_annotator(concurrency=1)
            .add_rel_cat(LearnedRelModel({"related": 0, "none": 1}),
                         window=120, concurrency=1))
    out = pipe.run(ds).to_pandas()
    assert {"subj_cui", "obj_cui", "pred"} <= set(out.columns)
