"""Distributed BPE (pipeline/bpe.py) vs an independent plain-Python BPE
(Sennrich et al. 2016 algorithm 1, same tiebreak)."""
import pytest

from dataops_testgen_spark.pipeline.bpe import EOW, bpe_segment, bpe_train

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower"),
    (2, "newest newest newest newest newest newest"),
    (3, "widest widest widest"),
]


def _python_bpe(texts, n_merges):
    from collections import Counter

    freq = Counter()
    for t in texts:
        freq.update(t.lower().split())
    words = {w: list(w) + [EOW] for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == a
                        and syms[j + 1] == b):
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = bpe_train(df, n_merges=12, materialize_every=3)
    want = _python_bpe([t for _, t in CORPUS], 12)
    assert got == want and len(got) >= 8
    # the classic example: 'est</w>' forms early from newest/widest
    assert ("es", "t") in got or ("e", "st") in got


def test_bpe_train_matches_python_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe_train(docs, n_merges=10)
    want = _python_bpe(
        [r["text"] for r in docs.select("text").collect() if r["text"]],
        10)
    assert got == want and len(got) == 10


def test_bpe_segment_roundtrip(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(df, n_merges=12, materialize_every=3)
    seg = {r["id"]: r for r in bpe_segment(df, merges).collect()}
    for did, text in CORPUS:
        toks = seg[did]["tokens"]
        # segmentation is lossless: concatenation restores words + markers
        assert "".join(toks) == "".join(
            w + EOW for w in text.lower().split())
        assert seg[did]["n_tokens"] == len(toks)
    # with zero merges every char + EOW is its own token
    plain = {r["id"]: r["n_tokens"]
             for r in bpe_segment(df, []).collect()}
    for did, text in CORPUS:
        ws = text.lower().split()
        assert plain[did] == sum(len(w) + 1 for w in ws)
    # merges strictly shrink token counts on this corpus
    assert all(seg[d]["n_tokens"] < plain[d] for d, _ in CORPUS)


def test_bpe_rejects_bad_params(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)
