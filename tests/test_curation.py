"""curation_gate (pipeline/curation.py): each leg and the composed
decision on a hand-built corpus."""
import pytest

from dataops_testgen_spark.pipeline.curation import curation_gate

TRAIN = [
    (100, "spam buy cheap pills now buy", "spam"),
    (101, "cheap pills buy cheap", "spam"),
    (102, "meeting notes agenda project", "ham"),
    (103, "project meeting tomorrow agenda notes", "ham"),
]

DOCS = [
    (1, "project meeting agenda notes for the team"),    # keeper
    (2, "project meeting agenda notes for the team"),    # exact dup of 1
    (3, "1234 5678 9012 3456 7890 1234"),                # fails alpha ratio
    (4, "buy cheap pills now cheap buy pills"),          # classified spam
]


@pytest.fixture(scope="module")
def gate(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    out = curation_gate(docs, train, allowed_langs=["ham"],
                        required_flags=["alpha_ratio_ok"])
    return {r["id"]: r for r in out.collect()}


def test_gate_legs(gate):
    assert gate[1]["quality_ok"] and gate[1]["is_canonical"]
    assert gate[1]["pred_lang"] == "ham" and gate[1]["keep"]
    # exact duplicate: identical text, higher id -> not canonical
    assert gate[2]["quality_ok"] and not gate[2]["is_canonical"]
    assert not gate[2]["keep"]
    # digits-only doc fails the quality leg
    assert not gate[3]["quality_ok"] and not gate[3]["keep"]
    # spam-classified doc fails the language/model leg
    assert gate[4]["pred_lang"] == "spam" and not gate[4]["keep"]
    assert len(gate) == len(DOCS)


def test_gate_rejects_bad_params(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        curation_gate(docs, train, allowed_langs=[])
    with pytest.raises(ValueError):
        curation_gate(docs, train, allowed_langs=["ham"],
                      required_flags=["not_a_flag"])
