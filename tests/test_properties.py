"""Property-based differential tests (SURVEY.md §5): hypothesis
generates corpora mixing well-formed and malformed rows; the Spark
parser+counter must agree exactly with the independent pure-Python
oracle of the reference's semantics.

Known deliberate engine-vs-reference divergences are kept out of the
generator (documented in sources/biarcs.py):
  * counts > 2^31 (reference Integer.parseInt would crash; engine uses
    longs by design),
  * counts/indices with surrounding whitespace (Spark cast trims,
    Java's parseInt throws) — tokens can't contain spaces anyway, and
    padded count fields don't occur in the corpus format.
"""


from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_similarity_system_using_aws_mapreduce_spark.operators.counts import corpus_counts
from semantic_similarity_system_using_aws_mapreduce_spark.sources.biarcs import read_biarcs, token_emissions

from reference_oracle import step1_counts

words = st.sampled_from(
    ["dogs", "ran", "Meetings", "a", "in", "x1", "#", "ties", "for", "été"]
)
pos = st.sampled_from(["NN", "VBD", "IN", "FW", "#"])
dep = st.sampled_from(["nsubj", "dep", "prep", "ROOT", "meetings"])


@st.composite
def token(draw):
    kind = draw(st.integers(0, 9))
    w = draw(words)
    if kind == 0:
        return w  # no slashes -> dropped
    if kind == 1:
        return f"{w}/{draw(pos)}"  # 2 parts -> dropped
    if kind == 2:
        return f"{w}/{draw(pos)}/{draw(dep)}/x"  # bad pointer
    if kind == 3:
        return f"{w}/{draw(pos)}/{draw(dep)}/{draw(st.integers(5, 9))}"  # OOB-ish
    if kind == 4:
        # negative pointer: both sides must DROP (reference catches
        # ArrayIndexOutOfBounds; a naive oracle would wrap via Python
        # negative indexing)
        return f"{w}/{draw(pos)}/{draw(dep)}/{draw(st.integers(-3, -1))}"
    # well-formed, pointer 0..4
    return f"{w}/{draw(pos)}/{draw(dep)}/{draw(st.integers(0, 4))}"


@st.composite
def line(draw):
    kind = draw(st.integers(0, 9))
    toks = " ".join(draw(st.lists(token(), min_size=1, max_size=4)))
    head = draw(words)
    count = draw(st.integers(1, 10_000))
    if kind == 0:
        return f"{head}\t{toks}"  # too few fields
    if kind == 1:
        return f"{head}\t{toks}\tNOTNUM\t2000,1"  # bad count
    if kind == 2:
        return f"{head}\t{toks}\t{count}\t2000,{count}\t"  # trailing tab
    if kind == 3:
        return ""  # empty line
    return f"{head}\t{toks}\t{count}\t2000,{count}"


@settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ", "5")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(line(), min_size=1, max_size=60))
def test_counts_agree_with_oracle(spark, tmp_path_factory, lines):
    path = tmp_path_factory.mktemp("prop") / "corpus.txt"
    path.write_text("\n".join(lines) + "\n")
    expected, expected_total = step1_counts(lines)

    counts = corpus_counts(token_emissions(read_biarcs(spark, str(path))))
    lex = {r.lexeme: r.l_count for r in counts.lexeme_counts.collect()}
    feat = {r.feature: r.f_count for r in counts.feature_counts.collect()}
    pair = {(r.lexeme, r.feature): r.lf_count for r in counts.pair_counts.collect()}

    assert lex == {k[1]: v for k, v in expected.items() if k[0] == "l"}
    assert feat == {k[1]: v for k, v in expected.items() if k[0] == "f"}
    assert pair == {(k[1], k[2]): v for k, v in expected.items() if k[0] == "lf"}

    totals = counts.totals.collect()[0]
    engine_total = totals.L if totals.L is not None else 0
    assert engine_total == expected_total
    # conservation: sum of pair counts == total emissions weight
    assert sum(pair.values()) == expected_total
