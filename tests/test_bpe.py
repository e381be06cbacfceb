"""BPE tokenizer training/encoding (sparkgraft/bpe.py): verified
against an independent naive implementation and the classic worked
example; the Arrow encoder must agree with the pure-function segmenter
and reproduce training-time segmentations."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sparkgraft.bpe import bpe_encode_udf, bpe_segment_word, learn_bpe_merges


def naive_bpe(word_freqs: dict[str, int], num_merges: int):
    """Textbook BPE (Sennrich et al.) — written independently of the
    library code path on purpose."""
    vocab = {}
    for w, f in word_freqs.items():
        sym = list(w)
        sym[-1] += "</w>"
        vocab[tuple(sym)] = f
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = f
        vocab = new
    return merges


def test_learn_bpe_matches_naive_reference(spark):
    corpus = [
        (1, "low low low low low"),
        (2, "lower lower newest newest newest newest newest newest"),
        (3, "widest widest widest new new"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = learn_bpe_merges(df, num_merges=10)

    freqs = Counter()
    for _, text in corpus:
        freqs.update(text.split())
    assert merges == naive_bpe(dict(freqs), 10)
    # the classic signal: 'est</w>' forms within the first few merges
    # (newest x6 + widest x3 make 'es','est','est</w>' dominant)
    joined = {a + b for a, b in merges}
    assert "est</w>" in joined


def test_bpe_encode_udf_matches_pure_segmenter(spark):
    corpus = [(1, "low lower lowest low low"), (2, "newest newest wide")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = learn_bpe_merges(df, num_merges=8)

    from sparkgraft.text import tokens

    enc = bpe_encode_udf(merges)
    out = {
        r.doc_id: list(r.units)
        for r in df.select(
            "doc_id", enc(tokens("text")).alias("units")
        ).collect()
    }
    for doc_id, text in corpus:
        expect = []
        for w in text.lower().split():
            expect.extend(bpe_segment_word(w, merges))
        assert out[doc_id] == expect
    # units reconstruct the original words exactly
    for doc_id, text in corpus:
        rejoined = "".join(out[doc_id]).replace("</w>", " ").strip()
        assert rejoined == " ".join(text.lower().split())


def test_bpe_empty_and_null_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, num_merges=5)
    # single-char word: only merge candidate is the marker attach —
    # already fused, so no pairs exist and training stops early
    assert merges == []
    assert bpe_segment_word("", merges) == []

    from sparkgraft.text import tokens

    enc = bpe_encode_udf(merges)
    out = {
        r.doc_id: r.units
        for r in df.select("doc_id", enc(tokens("text")).alias("units")).collect()
    }
    assert list(out[3]) == ["a</w>"]
    assert list(out[1]) == []  # empty text -> empty token array -> no units
