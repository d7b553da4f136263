"""Model-creation + entity-linking scenario parity.

Reproduces the reference's model_creator end-to-end scenarios
(/root/reference/tests/test_entity_linking.py:14-141: build CDB from a
concept CSV, build a Vocab + word vectors from a raw text corpus, train
unsupervised, then assert linking behavior for lemmatization, diacritics
and uppercase-abbreviation handling) with our OWN fixture data exhibiting
the same phenomena.  This is the real-English-text evidence behind the
P/R >= 0.95 north rule that the frozen docs CDB can't provide.
"""

import io
import csv

import pytest

from medcat_ray.config import EngineConfig
from medcat_ray.core.annotator import DocAnnotator
from medcat_ray.state.cdb import CDB

CONCEPT_CSV = """cui,name,ontologies,name_status,type_ids,description
CT000001,Glioma,MTH,P,T191,Neoplastic Process
CT000001,Glial tumour,MTH,A,T191,Neoplastic Process
CT000002,Brain Glioma,MTH,P,T191,Neoplastic Process
CT000002,Glioma of brain,MTH,A,T191,Neoplastic Process
CT000003,Seizure,MTH,P,T033,Finding
CT000004,Fall,MTH,P,T033,Finding
CT000005,Sjögren's Syndrome,MTH,P,T047,Disease or Syndrome
CT000006,ALS,MTH,A,T047,Disease or Syndrome
CT000007,Riluzole,MTH,A,T109,Organic Chemical
CT000008,Radiosurgery,MTH,P,T061,Therapeutic or Preventive Procedure
CT000009,Weakness,MTH,P,T033,Finding
"""

# Hand-written wikipedia-style training corpus (our own text).
CORPUS = [
    "A glioma is a tumour that arises from glial cells in the brain or "
    "spine. A brain glioma is graded by its cell type and aggressiveness. "
    "Patients with a glioma often present with a seizure or with "
    "progressive weakness of one side of the body.",
    "Seizure control matters because a seizure during recovery can cause "
    "a fall with serious injury. Older patients are afraid of falling "
    "after their first seizure, and weakness increases the risk of a "
    "fall at home.",
    "Sjögren's syndrome is an autoimmune disease. Sjögren's syndrome "
    "commonly causes dry eyes and dry mouth, and weakness or fatigue "
    "may accompany it.",
    "ALS is a progressive disease of the motor neurons. Riluzole is "
    "used to slow the progression of ALS, and weakness of the limbs is "
    "usually the first sign of ALS.",
    "Radiosurgery delivers focused radiation to a brain glioma in a "
    "single session. After radiosurgery some patients report a mild "
    "seizure, but most recover fully.",
]

CFG = EngineConfig(diacritics=True, check_upper_case_names=True,
                   spell_check=False,
                   # model_creator scenario config empties the POS gate
                   # (reference tests/model_creator/medcat.txt:
                   # cat.preprocessing.do_not_normalize = {}) so that
                   # "falling" lemmatizes to "fall"
                   do_not_normalize=frozenset())


@pytest.fixture(scope="module")
def models(ray_session):
    import ray.data as rd
    from medcat_ray.pipelines.train import (apply_training,
                                            train_unsupervised_distributed)
    from medcat_ray.pipelines.vocab_builder import make_vocab

    cdb = CDB(CFG)
    cdb.add_concept_rows(csv.DictReader(io.StringIO(CONCEPT_CSV)),
                         full_build=True)
    corpus = rd.from_items([{"doc_id": i, "text": t}
                            for i, t in enumerate(CORPUS)])
    vocab = make_vocab(corpus, cdb, CFG, dim=64, window=5, min_count=1)
    result = train_unsupervised_distributed(corpus, (cdb, vocab), CFG,
                                            concurrency=2)
    apply_training(cdb, result)
    return cdb, vocab


def _cuis(models, text):
    cdb, vocab = models
    ann = DocAnnotator(cdb, vocab, CFG)
    return [e["cui"] for e in ann.annotate(text)]


def test_vocab_built_from_corpus(models):
    _, vocab = models
    assert "glioma" in vocab
    assert vocab.word2cnt["seizure"] >= 5
    # corpus words got trained vectors; CDB-only words joined with count 1
    assert vocab.vec("glioma") is not None
    assert "radiosurgery" in vocab


def test_entity_linking_basic(models):
    # ref TestEntityLinking.test_entity_linking: expected CUIs found,
    # over-general CUI not found for the more specific mention
    text = ("Common treatments include radiosurgery. A brain glioma "
            "often presents with a seizure and weakness.")
    cuis = _cuis(models, text)
    for expected in ("CT000008", "CT000002", "CT000003", "CT000009"):
        assert expected in cuis
    # "brain glioma" must link the 2-token concept, not bare Glioma
    assert "CT000001" not in cuis


def test_lemmatization_not_required(models):
    # ref TestLemmatization.test_lemmatization_not_required
    assert "CT000004" in _cuis(models, "In the event of a fall")


def test_lemmatization_required(models):
    # ref TestLemmatization.test_lemmatization_required: "falling" links
    # to Fall only through token normalization
    assert "CT000004" in _cuis(models,
                               "The patient is afraid of falling.")


def test_diacritics_in_cdb(models):
    # ref TestDiacritics.test_diacritics_in_cdb
    cdb, _ = models
    assert "sjögren" in cdb.cui2snames["CT000005"]


def test_diacritics_in_text(models):
    # ref TestDiacritics.test_diacritics_in_text
    text = ("Sjögren's syndrome is a disorder characterized by dry eyes "
            "and dry mouth.")
    assert "CT000005" in _cuis(models, text)


def test_uppercase_abbreviation_in_sentence(models):
    # ref TestCheckUpperCaseNames.test_uppercase_abbreviation_in_sentence
    assert "CT000006" in _cuis(
        models, "Progression of ALS has an effect on mobility.")


def test_uppercase_abbreviation_start_sentence(models):
    assert "CT000006" in _cuis(models, "ALS groups have been identified.")


def test_lowercase_non_abbreviation_not_linked(models):
    # ref test_lowercase_non_abbreviation_*: the lowercase form of an
    # uppercase-only name must not link
    assert _cuis(models, "The als should not be linked here.") == []
    assert _cuis(models, "Als should not be linked either.") == []


def test_uppercase_non_abbreviation(models):
    # ref test_uppercase_non_abbreviation: an all-caps mention of a
    # non-abbreviation name still links
    assert "CT000007" in _cuis(
        models, "RILUZOLE is a drug used to slow disease progression.")


# Held-out hand-labeled sentences (OUR OWN text) for the P/R floor.
# Coverage axes: lemma variants (gliomas/seizures/falls/falling/tumours),
# diacritics (Sjögren's), uppercase abbreviations (ALS vs als/Als),
# multi-token names incl. an embedded stopword (brain glioma, glial
# tumour, glioma of brain), case variants, and negative lookalikes
# (rainfall, waterfall, ALSO, gliomatosis, weakly).
GOLD_DOCS = [
    ("A glioma can cause a seizure and progressive weakness.",
     [("glioma", "CT000001"), ("seizure", "CT000003"),
      ("weakness", "CT000009")]),
    ("Radiosurgery is an option for a brain glioma in older adults.",
     [("Radiosurgery", "CT000008"), ("brain glioma", "CT000002")]),
    ("ALS progresses from weakness to loss of mobility.",
     [("ALS", "CT000006"), ("weakness", "CT000009")]),
    ("Riluzole slows ALS but cannot prevent a fall at home.",
     [("Riluzole", "CT000007"), ("ALS", "CT000006"),
      ("fall", "CT000004")]),
    ("After falling twice the patient developed a seizure disorder.",
     [("falling", "CT000004"), ("seizure", "CT000003")]),
    ("Sjögren's syndrome often coexists with weakness and fatigue.",
     [("Sjögren's syndrome", "CT000005"), ("weakness", "CT000009")]),
    ("Gliomas are graded by how quickly the cells divide.",
     [("Gliomas", "CT000001")]),
    ("Two seizures in one week prompted an urgent scan.",
     [("seizures", "CT000003")]),
    ("Repeated falls at home may signal growing weakness.",
     [("falls", "CT000004"), ("weakness", "CT000009")]),
    ("A glial tumour was found on the left side.",
     [("glial tumour", "CT000001")]),
    ("Glial tumours vary widely in growth rate.",
     [("Glial tumours", "CT000001")]),
    ("Imaging confirmed a glioma of brain origin.",
     [("glioma of brain", "CT000002")]),
    ("The brain glioma shrank after radiosurgery.",
     [("brain glioma", "CT000002"), ("radiosurgery", "CT000008")]),
    ("Weakness on one side can follow a seizure.",
     [("Weakness", "CT000009"), ("seizure", "CT000003")]),
    ("Riluzole is generally well tolerated.",
     [("Riluzole", "CT000007")]),
    ("RILUZOLE was prescribed at the usual dose.",
     [("RILUZOLE", "CT000007")]),
    ("The als should not be linked here.", []),
    ("Als should not be linked either.", []),
    ("ALSO is not an abbreviation for the disease.", []),
    ("Heavy rainfall delayed the clinic visit.", []),
    ("A waterfall photo hung in the waiting room.", []),
    ("The patient spoke weakly but clearly.", []),
    ("Gliomatosis is a different radiological pattern.", []),
    ("ALS and Sjögren's syndrome are distinct diseases.",
     [("ALS", "CT000006"), ("Sjögren's syndrome", "CT000005")]),
    ("A seizure rarely follows radiosurgery.",
     [("seizure", "CT000003"), ("radiosurgery", "CT000008")]),
    ("Falling is the most feared complication of weakness.",
     [("Falling", "CT000004"), ("weakness", "CT000009")]),
    ("The glioma recurred two years after radiosurgery.",
     [("glioma", "CT000001"), ("radiosurgery", "CT000008")]),
    ("Seizure frequency decreased on the new regimen.",
     [("Seizure", "CT000003")]),
    ("A fall fractured her wrist last winter.",
     [("fall", "CT000004")]),
    ("Weakness of grip was the first sign of ALS.",
     [("Weakness", "CT000009"), ("ALS", "CT000006")]),
    ("Sjögren's syndrome may precede other autoimmune disease.",
     [("Sjögren's syndrome", "CT000005")]),
    ("Dry eyes are typical of Sjögren's syndrome.",
     [("Sjögren's syndrome", "CT000005")]),
    ("He described one seizure and two falls.",
     [("seizure", "CT000003"), ("falls", "CT000004")]),
    ("The brain glioma displaced the ventricle.",
     [("brain glioma", "CT000002")]),
    ("Radiosurgery spares the surrounding tissue.",
     [("Radiosurgery", "CT000008")]),
    ("Untreated gliomas cause progressive weakness.",
     [("gliomas", "CT000001"), ("weakness", "CT000009")]),
    ("Riluzole does not reverse existing weakness.",
     [("Riluzole", "CT000007"), ("weakness", "CT000009")]),
    ("ALS was confirmed after a year of testing.",
     [("ALS", "CT000006")]),
    ("A seizure during recovery can cause a fall.",
     [("seizure", "CT000003"), ("fall", "CT000004")]),
    ("Her weakness improved with physiotherapy.",
     [("weakness", "CT000009")]),
    ("The glial tumour infiltrated nearby tissue.",
     [("glial tumour", "CT000001")]),
    ("Another seizure occurred despite treatment.",
     [("seizure", "CT000003")]),
    ("No fall was reported during the stay.",
     [("fall", "CT000004")]),
    ("A brain glioma may present with seizures.",
     [("brain glioma", "CT000002"), ("seizures", "CT000003")]),
    ("Fatigue and weakness accompany Sjögren's syndrome.",
     [("weakness", "CT000009"), ("Sjögren's syndrome", "CT000005")]),
    ("The seizure lasted under a minute.",
     [("seizure", "CT000003")]),
    ("Falls increase sharply with age.",
     [("Falls", "CT000004")]),
    ("Glioma growth was stable on riluzole.",
     [("Glioma", "CT000001"), ("riluzole", "CT000007")]),
    ("After radiosurgery the seizures stopped.",
     [("radiosurgery", "CT000008"), ("seizures", "CT000003")]),
    ("Progressive weakness preceded the ALS diagnosis.",
     [("weakness", "CT000009"), ("ALS", "CT000006")]),
]


def _gold_starts(text, gold):
    """All occurrences of each gold surface, longest surfaces claiming
    their character ranges first (honest overlap labeling: a 'glioma'
    inside a labeled 'brain glioma' is not a separate mention)."""
    claimed = []
    out = set()
    for surface, cui in sorted(gold, key=lambda g: -len(g[0])):
        start = 0
        while True:
            i = text.find(surface, start)
            if i < 0:
                break
            span = (i, i + len(surface))
            if not any(a < span[1] and span[0] < b for a, b in claimed):
                claimed.append(span)
                out.add((i, cui))
            start = i + 1
    return out


def test_real_text_precision_recall_floor(models):
    """North-rule evidence on real English text: annotate 50 held-out
    sentences with the corpus-trained models and score P/R against
    hand-labeled gold mentions (start+CUI match).  The frozen floor is
    the north rule's >= 0.95."""
    assert len(GOLD_DOCS) >= 50
    cdb, vocab = models
    from medcat_ray.core.annotator import DocAnnotator
    ann = DocAnnotator(cdb, vocab, CFG)

    tp = fp = fn = 0
    mismatches = []
    for text, gold in GOLD_DOCS:
        pred = {(e["start"], e["cui"]) for e in ann.annotate(text)}
        gold_set = _gold_starts(text, gold)
        tp += len(pred & gold_set)
        fp += len(pred - gold_set)
        fn += len(gold_set - pred)
        if pred != gold_set:
            mismatches.append((text, sorted(pred), sorted(gold_set)))
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    assert tp + fn >= 60          # the gold set is substantial
    assert precision >= 0.95, (precision, tp, fp, fn, mismatches[:5])
    assert recall >= 0.95, (recall, tp, fp, fn, mismatches[:5])
