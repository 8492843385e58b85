"""Naive Bayes classifier (pipeline/classify.py): learning on a separable
corpus, exact score parity with an independent plain-Python NB, OOV/prior
fallbacks, and the vocab cap."""
import math

import pytest

from dataops_testgen_spark.pipeline.classify import (nb_predict, nb_score,
                                                     nb_train)

TRAIN = [
    (0, "spam buy cheap pills now buy", "spam"),
    (1, "cheap pills buy cheap", "spam"),
    (2, "meeting notes agenda project", "ham"),
    (3, "project meeting tomorrow agenda notes", "ham"),
    (4, "buy pills cheap spam offer", "spam"),
    (5, "agenda for the project meeting", "ham"),
]
TEST = [
    (10, "buy cheap pills"),
    (11, "project meeting agenda"),
    (12, "cheap offer now"),
    (13, "zzz qqq www"),          # fully out-of-vocabulary
    (14, ""),                      # empty text
]


def _python_nb(train, test, alpha=1.0):
    """Independent reference: per-(id, label) log-posterior, prior-seeded
    term-sorted fold — the exact arithmetic the operator promises."""
    from collections import Counter, defaultdict

    counts = defaultdict(Counter)
    doc_ct = Counter()
    for _, text, label in train:
        doc_ct[label] += 1
        counts[label].update(text.lower().split())
    vocab = sorted({t for c in counts.values() for t in c})
    n = sum(doc_ct.values())
    out = {}
    for did, text in test:
        tf = Counter(t for t in text.lower().split() if t in vocab)
        for label in counts:
            total = sum(counts[label].values())
            denom = float(total) + alpha * len(vocab)
            score = math.log(doc_ct[label] / float(n))
            for term in sorted(tf):
                c = counts[label].get(term, 0)
                score += tf[term] * math.log((float(c) + alpha) / denom)
            out[(did, label)] = score
    return out


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id: long, text: string, label: string")
    return nb_train(train, label_col="label")


def test_nb_learns_separable_labels(spark, model):
    cond, priors = model
    test = spark.createDataFrame(TEST[:3], "doc_id: long, text: string")
    pred = {r["id"]: r["label"]
            for r in nb_predict(test, cond, priors).collect()}
    assert pred == {10: "spam", 11: "ham", 12: "spam"}


def test_nb_scores_match_python_reference(spark, model):
    cond, priors = model
    test = spark.createDataFrame(TEST, "doc_id: long, text: string")
    got = {(r["id"], r["label"]): r["score"]
           for r in nb_score(test, cond, priors).collect()}
    want = _python_nb(TRAIN, TEST)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_nb_oov_and_empty_docs_fall_back_to_priors(spark, model):
    cond, priors = model
    test = spark.createDataFrame(TEST, "doc_id: long, text: string")
    pri = {r["label"]: r["log_prior"] for r in priors.collect()}
    rows = nb_score(test, cond, priors).collect()
    for r in rows:
        if r["id"] in (13, 14):
            assert r["score"] == pytest.approx(pri[r["label"]])
    # every doc gets exactly one row per label
    from collections import Counter
    per_doc = Counter(r["id"] for r in rows)
    assert per_doc == {d: len(pri) for d, *_ in TEST}
    # argmax of prior-only docs is the majority label (tie -> alphabetical)
    pred = {r["id"]: r["label"]
            for r in nb_predict(test, cond, priors).collect()}
    best = max(sorted(pri), key=lambda lb: pri[lb])
    assert pred[13] == best and pred[14] == best


def test_nb_max_vocab_caps_model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id: long, text: string, label: string")
    cond, priors = nb_train(train, label_col="label", max_vocab=3)
    kept = {r["term"] for r in cond.select("term").distinct().collect()}
    assert len(kept) == 3
    # top-3 corpus-frequency terms: buy(4) cheap(5) ... compute expected
    from collections import Counter
    c = Counter(t for _, text, _ in TRAIN for t in text.lower().split())
    want = {t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]}
    assert kept == want
    # scoring still runs and covers all docs
    test = spark.createDataFrame(TEST, "doc_id: long, text: string")
    assert nb_predict(test, cond, priors).count() == len(TEST)


def test_nb_rejects_bad_params(spark):
    train = spark.createDataFrame(TRAIN, "doc_id: long, text: string, label: string")
    with pytest.raises(ValueError):
        nb_train(train, label_col="label", alpha=0.0)
    with pytest.raises(ValueError):
        nb_train(train, label_col="label", max_vocab=0)


def test_nb_label_with_tokenless_seed_keeps_prior(spark):
    """A label whose every seed doc is empty/whitespace must still exist
    in the model (prior + smoothed unseen mass) — the textbook NB
    formulation, and what the plain-Python reference does."""
    train = [(0, "apple banana", "a"), (1, " ", "b"), (2, "", "b")]
    test = [(10, "apple"), (11, "")]
    tr = spark.createDataFrame(train, "doc_id: long, text: string, label: string")
    cond, priors = nb_train(tr, label_col="label")
    assert {r["label"] for r in priors.collect()} == {"a", "b"}
    te = spark.createDataFrame(test, "doc_id: long, text: string")
    got = {(r["id"], r["label"]): r["score"]
           for r in nb_score(te, cond, priors).collect()}
    want = _python_nb(train, test)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # prior-only argmax: 'b' has the majority prior
    pred = {r["id"]: r["label"]
            for r in nb_predict(te, cond, priors).collect()}
    assert pred[11] == "b"


def test_nb_property_parity_with_python_reference(spark):
    """Property: for random small corpora (empty docs, unseen words,
    single-label strata all included), every (doc, label) score matches
    the independent plain-Python NB."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["ab", "cd", "ef", "gh", "ij"])
    doc = st.lists(words, min_size=0, max_size=5).map(" ".join)
    labels = st.sampled_from(["x", "y", "z"])

    @settings(max_examples=8, deadline=None)
    @given(train=st.lists(st.tuples(doc, labels), min_size=1, max_size=6)
           .filter(lambda t: any(txt.strip() for txt, _ in t)),
           test=st.lists(doc, min_size=1, max_size=4))
    def check(train, test):
        train_rows = [(i, t, lb) for i, (t, lb) in enumerate(train)]
        test_rows = [(100 + i, t) for i, t in enumerate(test)]
        tr = spark.createDataFrame(
            train_rows, "doc_id: long, text: string, label: string")
        te = spark.createDataFrame(test_rows, "doc_id: long, text: string")
        cond, priors = nb_train(tr, label_col="label")
        got = {(r["id"], r["label"]): r["score"]
               for r in nb_score(te, cond, priors).collect()}
        want = _python_nb(train_rows, test_rows)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12), k

    check()
