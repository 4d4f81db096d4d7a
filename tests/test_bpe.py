"""Distributed BPE training: the Spark loop must learn the IDENTICAL
merge sequence as an independent pure-Python reference implementation
(same frequency counts, same deterministic tie-break), and the merge
application must survive regex-special symbols."""

from collections import Counter

from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.bpe import (
    EOW,
    apply_merge,
    bpe_encode_words,
    bpe_train,
    pair_counts,
    word_counts,
    _init_symbols,
)


def _ref_bpe(texts, n_merges, min_count=2):
    """Textbook BPE (Sennrich 2016 fig. 1), written independently of
    the operator: dict-of-lists symbol state, greedy left-to-right
    merge, tie-break = lexicographically smallest (left, right) among
    the max-frequency pairs."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) + [EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        top = max(pc.values())
        if top < min_count:
            break
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


_CORPUS = [
    "low low low lower lower lowest",
    "new newer newer newest newest newest",
    "wide wider widest low new",
    "low lower newer wide wide wide",
]


def test_bpe_train_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    stats = {}
    got = bpe_train(docs, n_merges=10, stats=stats)
    want, _ = _ref_bpe(_CORPUS, 10)
    assert got == want
    assert stats["n_merges"] == len(got) > 0


def test_bpe_train_early_stops_on_min_count(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once -> nothing reaches min_count=2
    assert bpe_train(docs, n_merges=5, min_count=2) == []


def test_bpe_encode_words_replays_merges(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10)
    _, ref_syms = _ref_bpe(_CORPUS, 10)
    words = word_counts(docs)
    enc = {r.word: list(r.pieces) for r in bpe_encode_words(words, merges).collect()}
    assert enc == ref_syms
    # pieces always reassemble losslessly
    for w, pieces in enc.items():
        assert "".join(pieces) == w + EOW


def test_bpe_merge_survives_regex_special_symbols(spark):
    """Crawl text contains regex metacharacters; \\Q-quoting must keep
    the merge literal — '$.' merging with '|\\' etc. never throws or
    mismatches the reference."""
    texts = ["$$ $$ $$ .. .. |\\ |\\ |\\ a$ a$"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = bpe_train(docs, n_merges=6, min_count=2)
    want, ref_syms = _ref_bpe(texts, 6)
    assert got == want
    enc = {
        r.word: list(r.pieces)
        for r in bpe_encode_words(word_counts(docs), got).collect()
    }
    assert enc == ref_syms


def test_pair_counts_is_one_vocab_aggregation(spark):
    """The per-round cost: pair counting explodes the VOCABULARY
    relation, not the corpus — the plan aggregates (partial + final)
    over the word-counts subplan with no extra corpus scan."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    pc = pair_counts(_init_symbols(word_counts(docs)))
    plan = pc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1  # corpus read exactly once
    rows = {(r.left, r.right): r.weight for r in pc.collect()}
    ref = Counter()
    wc = Counter(w for t in _CORPUS for w in t.split(" ") if w)
    for w, n in wc.items():
        s = list(w) + [EOW]
        for i in range(len(s) - 1):
            ref[(s[i], s[i + 1])] += n
    assert rows == dict(ref)


def test_apply_merge_regex_anchors(spark):
    """Merging (a, a) in 'a a a a' must behave like the greedy
    left-to-right reference: two merges, not a cascading re-merge."""
    df = spark.createDataFrame([("a a a a",), ("x a a",), ("a ax a",)], "syms string")
    got = [r.syms for r in apply_merge(df.withColumn("n", F.lit(1)), "a", "a").collect()]
    assert got == ["aa aa", "x aa", "a ax a"]


def test_bpe_train_local_and_distributed_paths_identical(spark):
    """The adaptive split (VERDICT r7 #3): auto mode collects the
    model-sized vocabulary and runs the merge loop in-process; forced
    distributed mode runs the per-round Spark jobs.  Both must learn
    the IDENTICAL merge sequence — including on regex-special symbols,
    where the local path's plain list compare and the distributed
    path's \\Q-quoted regexp_replace could plausibly diverge."""
    texts = _CORPUS + ["$$ $$ $$ .. .. |\\ |\\ |\\ a$ a$ low low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    s_local, s_dist = {}, {}
    local = bpe_train(docs, n_merges=14, stats=s_local)
    dist = bpe_train(docs, n_merges=14, stats=s_dist, mode="distributed")
    assert s_local["mode"] == "local" and s_dist["mode"] == "distributed"
    assert local == dist == _ref_bpe(texts, 14)[0]
    assert len(local) == 14


def test_bpe_train_vocab_threshold_boundary(spark):
    """auto mode keys on the measured vocabulary row count: exactly at
    local_threshold the loop runs in-process, one below it stays
    distributed — same merges either way."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    n_vocab = word_counts(docs).count()
    s_at, s_below = {}, {}
    at = bpe_train(docs, n_merges=6, stats=s_at, local_threshold=n_vocab)
    below = bpe_train(
        docs, n_merges=6, stats=s_below, local_threshold=n_vocab - 1
    )
    assert s_at["mode"] == "local"
    assert s_below["mode"] == "distributed"
    assert at == below == _ref_bpe(_CORPUS, 6)[0]


def test_bpe_train_local_early_stops_on_min_count(spark):
    """The in-process loop honors the same < min_count early stop."""
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    stats = {}
    assert bpe_train(docs, n_merges=5, min_count=2, stats=stats) == []
    assert stats["mode"] == "local"


def test_corpus_fertility_matches_reference_and_broadcasts(spark):
    """corpus_fertility: per-doc words/pieces under the learned model
    must equal the pure-Python reference segmentation applied per
    occurrence — proving the encode-once-per-distinct-word broadcast
    join is equivalent to re-encoding the corpus — and the join must
    BE a broadcast (no shuffle on the corpus side)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.bpe import corpus_fertility

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=8)
    _, ref_syms = _ref_bpe(_CORPUS, 8)
    got = {r.doc_id: r for r in corpus_fertility(docs, merges).collect()}
    for i, t in enumerate(_CORPUS):
        words = [w for w in t.split(" ") if w]
        n_pieces = sum(len(ref_syms[w]) for w in words)
        assert got[i].n_words == len(words)
        assert got[i].n_pieces == n_pieces
        assert got[i].fertility_ppm == 1_000_000 * n_pieces // len(words)
    plan = corpus_fertility(docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
