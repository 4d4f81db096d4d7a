"""Library-level text-analysis operators."""

from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import (
    identify_language,
    rolling_fingerprint,
    token_stats,
)


def test_identify_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat"),
            (2, "der hund ist ein tier und das ist gut"),
            (3, "le chat est dans la maison pour que"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.lang_pred, r.lang_score) for r in identify_language(df).collect()}
    assert out[1][0] == "en" and out[1][1] > 0.3
    assert out[2][0] == "de"
    assert out[3][0] == "fr"
    assert out[4] == ("und", 0.0)


def test_identify_language_with_declared_prior(spark):
    """The <html lang=...> prior (VERDICT r8 #5): a declared profiled
    language WINS on short/ambiguous documents, is OVERRIDDEN when the
    stopword statistics strongly disagree (integer margin), and
    null/unprofiled declarations fall back to the pure heuristic."""
    df = spark.createDataFrame(
        [
            # short + ambiguous (one weak 'le' hit -> heuristic says
            # fr): the declared 'en' prior flips it
            (1, "le weekend shopping list", "en"),
            # zero hits anywhere ('und' without a prior): declaration
            # wins outright
            (2, "xyzzy qwerty plugh", "de"),
            # unambiguous German text declared 'en': 6 de hits >=
            # 2*0 + 2 -> the heuristic overrides the declaration
            (3, "der hund ist ein tier und das ist gut", "en"),
            # region subtag + case noise normalizes to the bare code
            (4, "the cat is on the mat", "EN-us"),
            # unprofiled declaration -> pure heuristic
            (5, "the cat is on the mat", "xx"),
            # no declaration -> pure heuristic
            (6, "le chat est dans la maison pour que", None),
        ],
        ["doc_id", "text", "declared"],
    )
    out = {
        r.doc_id: (r.lang_pred, r.lang_score)
        for r in identify_language(df, prior_col="declared").collect()
    }
    base = {
        r.doc_id: r.lang_pred for r in identify_language(df).collect()
    }
    assert base[1] == "fr" and out[1][0] == "en"  # prior flips it
    assert base[2] == "und" and out[2] == ("de", 0.0)
    assert base[3] == "de" and out[3][0] == "de"  # strong stats win
    assert out[4][0] == "en" and out[4][1] > 0.3
    assert out[5][0] == base[5] == "en"
    assert out[6][0] == base[6] == "fr"
    # the score is always the CHOSEN language's hit ratio
    assert out[1][1] == 0.0  # 'en' has no hits in doc 1


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello world, antidisestablishment!")], ["doc_id", "text"])
    r = token_stats(df).collect()[0]
    assert r.n_words == 3
    # pieces: hell|o  worl|d|,  anti|dise|stab|lish|ment|!  -> 11
    assert r.n_pieces == 11


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], ["doc_id", "text"]
    )
    fp = {r.doc_id: r.fingerprint for r in rolling_fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # reordering changes the fingerprint


def test_redact_pii_and_counts(spark):
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 555 123 4567"),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "no pii here at all"),
            (4, "a@b.io a@b.io twice"),
        ],
        ["doc_id", "text"],
    )
    counts = pii_counts(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("clean"),
            *[c.alias(n) for n, c in counts.items()],
        ).collect()
    }
    assert out[1].clean == "mail me at <EMAIL> or call <PHONE>"
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 0)
    assert out[2].clean == "server <IP> and <IP> are up"
    assert out[2].n_ipv4 == 2
    assert out[3].clean == "no pii here at all"
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    # global replacement: every occurrence, not just the first
    assert out[4].clean == "<EMAIL> <EMAIL> twice"
    assert out[4].n_email == 2


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "solo")], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1,4,7,10 -> sizes 4,4,4,1
    sizes = [r.n_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)]
    assert sizes == [4, 4, 4, 1]
    assert [r.chunk_idx for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [0, 1, 2, 3]
    # chunk_size > stride => consecutive chunks share chunk_size-stride tokens;
    # total emitted token slots exceed the 10 source tokens
    assert sum(sizes) == 13
    # single-token doc: exactly one chunk of one token
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 1
    # deterministic content hash: same text => same hash
    df2 = spark.createDataFrame([(3, " ".join(words))], ["doc_id", "text"])
    h1 = {r.chunk_idx: r.chunk_hash for r in by_doc[1]}
    h2 = {
        r.chunk_idx: r.chunk_hash
        for r in chunk_documents(df2, chunk_size=4, stride=3).collect()
    }
    assert h1 == h2


def test_cms_estimate_unseen_tokens_are_zero(spark):
    """Probing tokens absent from the sketch yields estimate 0 (their
    cells are simply unset), and an empty sketch estimates 0 for
    everything — never null, never an error."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import cms_estimate, cms_sketch

    toks = spark.createDataFrame([("a",), ("a",), ("b",)], "token string")
    sketch = cms_sketch(toks, d=2, w=32)
    est = {
        r.token: r.cms_estimate
        for r in cms_estimate(
            spark.createDataFrame([("a",), ("zzz",)], "token string"),
            sketch,
            d=2,
            w=32,
        ).collect()
    }
    assert est["a"] >= 2 and est["zzz"] >= 0
    empty_sketch = cms_sketch(spark.createDataFrame([], "token string"), d=2, w=32)
    est2 = cms_estimate(
        spark.createDataFrame([("a",)], "token string"), empty_sketch, d=2, w=32
    ).collect()
    assert est2[0].cms_estimate == 0


def test_bm25_ranks_exact_matches_first_and_handles_absent_terms(spark, tmp_path):
    """BM25 sanity on a controlled corpus: a document containing all of
    a query's terms outranks one containing a subset; documents with
    no query term produce NO row (never a zero-score row); and a query
    whose terms are entirely absent from the corpus yields no rows
    rather than erroring (df table is empty for those terms)."""
    import semantic_similarity_system_using_aws_mapreduce_spark.workload.text as txt

    docs = spark.createDataFrame(
        [
            (1, "spark window agg spark window", "en", "s", 10),
            (2, "spark only here with filler words abc", "en", "s", 10),
            (3, "nothing relevant at all", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "bm25_docs")
    docs.write.parquet(out_dir + "/documents.parquet")

    orig = txt.BM25_QUERIES
    orig_terms = txt._BM25_TERMS
    try:
        txt.BM25_QUERIES = [(0, "spark window"), (1, "zzz_absent")]
        txt._BM25_TERMS = [
            (q, t) for q, s in txt.BM25_QUERIES for t in dict.fromkeys(s.split())
        ]
        rows = txt.q_bm25_search(spark, out_dir).collect()
    finally:
        txt.BM25_QUERIES = orig
        txt._BM25_TERMS = orig_terms

    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    # query 0: doc 1 (both terms, repeated) above doc 2 (one term); doc 3 absent
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    assert [r.doc_id for r in q0] == [1, 2]
    assert q0[0].bm25 > q0[1].bm25 > 0
    # query 1: no term exists anywhere -> no rows, no error
    assert 1 not in by_q


def test_bm25_matches_pure_python_reference_on_random_corpora(spark, tmp_path):
    """Differential check: the Spark BM25 pipeline must reproduce an
    independent pure-Python implementation (same idf variant, same
    micro-quantization) on seeded random corpora — scores AND top-k
    ranking, across several vocabulary/length regimes."""
    import math
    import random

    import semantic_similarity_system_using_aws_mapreduce_spark.workload.text as txt

    def py_bm25(docs, queries, k1=1.2, b=0.75, topk=5):
        toks = {d: t.split() for d, t in docs}
        toks = {d: [w for w in t if w] for d, t in toks.items()}
        n = len(toks)
        sum_dl = sum(len(t) for t in toks.values())
        out = {}
        for q_id, q in queries:
            terms = list(dict.fromkeys(q.split()))
            scores = {}
            for d, t in toks.items():
                s_micro = 0
                hit = False
                for term in terms:
                    tf = t.count(term)
                    if tf == 0:
                        continue
                    df = sum(1 for tt in toks.values() if term in tt)
                    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                    tfn = (tf * (k1 + 1.0)) / (
                        tf + k1 * ((1.0 - b) + b * len(t) * n / sum_dl)
                    )
                    s_micro += int(
                        math.floor(idf * tfn * 1_000_000 + 0.5)
                    )  # HALF_UP on positives
                    hit = True
                if hit:
                    scores[d] = s_micro
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
            out[q_id] = [
                (rank + 1, d, round(s / 1_000_000.0, 6))
                for rank, (d, s) in enumerate(ranked)
            ]
        return out

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(30)]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40))))
            for i in range(25)
        ]
        queries = [(0, "tok1 tok2"), (1, "tok3 tok3 tok4 tok5")]

        out_dir = str(tmp_path / f"bm25_rand_{trial}")
        spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(out_dir + "/documents.parquet")

        orig_q, orig_t = txt.BM25_QUERIES, txt._BM25_TERMS
        try:
            txt.BM25_QUERIES = queries
            txt._BM25_TERMS = [
                (q, t) for q, s in queries for t in dict.fromkeys(s.split())
            ]
            rows = txt.q_bm25_search(spark, out_dir).collect()
        finally:
            txt.BM25_QUERIES, txt._BM25_TERMS = orig_q, orig_t

        got = {}
        for r in rows:
            got.setdefault(r.q_id, []).append((r.rank, r.doc_id, r.bm25))
        for q in got:
            got[q].sort()
        want = py_bm25(docs, queries)
        want = {q: v for q, v in want.items() if v}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_gopher_rules_flags(spark):
    """Each Gopher rule fires on a crafted violation and passes on a
    clean natural-English document; all arithmetic integer-exact."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import gopher_rules

    clean = (
        "the quick brown fox jumps over a lazy dog and that dog must have "
        "been asleep with all four paws tucked neatly beneath its warm body "
        "while evening light faded slowly over quiet fields of ripe corn "
        "and farmers walked home to rest before another long summer day "
        "with the last birds calling out from tall old trees"
    )
    assert len([t for t in clean.split(" ") if t]) >= 50
    rows = {
        1: clean,                                  # passes everything
        2: "short doc only",                       # word count
        3: " ".join(["a"] * 60),                   # mean word len < 3 (and stops)
        4: " ".join(["#tag"] * 30 + ["the", "be", "to"] + ["word"] * 30),  # symbols
        5: " ".join(["12345"] * 60) + " the be",   # alpha ratio
        6: " ".join(["plain"] * 60),               # no stop words
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].keep == 1 and all(
        got[1][c] == 1
        for c in ("ok_word_count", "ok_word_len", "ok_symbols", "ok_alpha", "ok_stopwords")
    )
    assert got[2].ok_word_count == 0 and got[2].keep == 0
    assert got[3].ok_word_len == 0 and got[3].keep == 0
    assert got[4].ok_symbols == 0 and got[4].keep == 0
    assert got[5].ok_alpha == 0 and got[5].keep == 0
    assert got[6].ok_stopwords == 0 and got[6].keep == 0
    # zero-shuffle map-side plan: no Exchange anywhere
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_main_content_strips_template_furniture(spark):
    """jusText-shaped block extractor: nav/aside/footer (short,
    link-dense blocks) are stripped while the long low-link-density
    body survives — per-page boilerplate removal that corpus-level
    paragraph dedup can't do for a template that appears once."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import main_content

    body = (
        "the quick brown fox jumps over the lazy dog again and again "
        "in the wide summer meadow beside a slow river"
    )
    page = (
        '<html><head><title>T</title><style>p{color:red}</style></head><body>'
        '<nav><a href="/">Home</a> <a href="/cat">Catalog</a> '
        '<a href="/login">Sign in</a></nav>'
        "<h1>Short heading</h1>"
        f'<p>{body}</p>'
        '<p>A second real paragraph with enough characters to clear the '
        "minimum block length and no links at all inside it.</p>"
        '<aside><a href="/ad">Sponsored offer</a> '
        '<a href="/deals">Daily deals</a> shop</aside>'
        '<footer><a href="/about">About</a> <a href="/tos">Terms</a> '
        "(c) example</footer></body></html>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    row = main_content(df).collect()[0]
    assert body in row.main_text
    assert "second real paragraph" in row.main_text
    for furniture in ("Home", "Catalog", "Sign in", "Sponsored", "About", "Terms"):
        assert furniture not in row.main_text
    assert row.n_good_blocks == 2
    assert 0 < row.boilerplate_ppm < 1_000_000
    assert row.good_chars < row.total_chars
    # exact integer ppm
    assert row.boilerplate_ppm == (
        1_000_000 * (row.total_chars - row.good_chars) // row.total_chars
    )
    # map-side only: no Exchange in the plan
    plan = main_content(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_main_content_link_density_and_length_rules(spark):
    """A long block fails on link density alone; a short linkless
    block fails on length alone; boundary arithmetic is the integer
    cross-multiply (no FP ratios)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import main_content

    long_linky = (
        '<p>'
        + " ".join(f'<a href="/x{i}">anchor text number {i}</a>' for i in range(8))
        + "</p>"
    )
    cases = {
        1: long_linky,                      # long but ~100% link density
        2: "<p>tiny</p>",                   # short, linkless
        3: "<p></p><div></div>",            # empty blocks only
        4: None,                            # null page
    }
    df = spark.createDataFrame(
        list(cases.items()), "doc_id long, html string"
    )
    got = {r.doc_id: r for r in main_content(df).collect()}
    assert got[1].n_good_blocks == 0 and got[1].main_text == ""
    assert got[1].boilerplate_ppm == 1_000_000
    assert got[2].n_good_blocks == 0 and got[2].n_blocks == 1
    assert got[3].n_blocks == 0 and got[3].boilerplate_ppm == 0
    assert got[4].main_text is None and got[4].boilerplate_ppm == 0


def test_main_content_entities_and_comments(spark):
    """Entity decode runs per block (same chain as html_to_text) and
    comments/script/style never leak into block text or skew the
    density arithmetic."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import main_content

    page = (
        "<body><!-- hidden comment full of <a href=x>links</a> -->"
        "<script>var a = '<p>not text</p>';</script>"
        "<p>Tom &amp; Jerry say &quot;hello&quot; &lt;twice&gt; and keep "
        "talking long enough to clear the minimum length rule.</p></body>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    row = main_content(df).collect()[0]
    assert 'Tom & Jerry say "hello" <twice>' in row.main_text
    assert "hidden comment" not in row.main_text
    assert "not text" not in row.main_text
