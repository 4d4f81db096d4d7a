"""Explicit StructTypes for every logical relation in the pipeline.

The reference has no schema objects at all — every stage re-parses
whitespace-delimited text and silently drops rows with the wrong field
arity (SURVEY.md §1.2; reference Step1.java:32-34, Step2.java:30-32,
Step3.java:31-33, Step4.java:131-133).  Here every relation has a typed
schema; permissive parsing happens once, at ingest.

Counts are LongType throughout: the reference parses counts with
``Integer.parseInt`` (Step1.java:97) which overflows at corpus scale —
a bug this engine fixes by design.
"""

from __future__ import annotations

from pyspark.sql import types as T

# R0 `corpus` — one row per syntactic n-gram (reference Step1.java:19-20).
TOKEN = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("pos", T.StringType()),
        T.StructField("dep", T.StringType()),
        T.StructField("head_idx", T.IntegerType()),
    ]
)

CORPUS = T.StructType(
    [
        T.StructField("head_word", T.StringType()),
        T.StructField("tokens", T.ArrayType(TOKEN)),
        T.StructField("total_count", T.LongType()),
        # Parsed away by the reference (only fields[2] is read,
        # Step1.java:36); kept as an optional column here.
        T.StructField("counts_by_year", T.MapType(T.IntegerType(), T.LongType())),
    ]
)

# R1 `counts` — three relations instead of the reference's tagged union
# (the `l <lex>` / `f <feat>` / `lf <lex> <feat>` key encoding of
# Step1.java:63-70 exists only because MapReduce allows one shuffle per job).
LEXEME_COUNTS = T.StructType(
    [
        T.StructField("lexeme", T.StringType()),
        T.StructField("l_count", T.LongType()),
    ]
)

FEATURE_COUNTS = T.StructType(
    [
        T.StructField("feature", T.StringType()),
        T.StructField("f_count", T.LongType()),
    ]
)

PAIR_COUNTS = T.StructType(
    [
        T.StructField("lexeme", T.StringType()),
        T.StructField("feature", T.StringType()),
        T.StructField("lf_count", T.LongType()),
    ]
)

# R3 `assoc` — association measures (reference Step3.java:96-98).
ASSOC = T.StructType(
    [
        T.StructField("lexeme", T.StringType()),
        T.StructField("feature", T.StringType()),
        T.StructField("assoc_freq", T.DoubleType()),
        T.StructField("assoc_prob", T.DoubleType()),
        T.StructField("assoc_pmi", T.DoubleType()),
        T.StructField("assoc_ttest", T.DoubleType()),
    ]
)

# R5 `gold_standard` — labelled word pairs (reference Step4.java:97-107).
GOLD_STANDARD = T.StructType(
    [
        T.StructField("word1", T.StringType()),
        T.StructField("word2", T.StringType()),
        T.StructField("related", T.BooleanType()),
    ]
)

# R4 `pair_vectors` — 24 named doubles, order = the reference's ARFF
# attribute order (Step5.java:80-86): association measure major,
# similarity measure minor.
ASSOC_MEASURES = ["freq", "prob", "pmi", "ttest"]
SIM_MEASURES = [
    "dist_manhattan",
    "dist_euclidean",
    "sim_cosine",
    "sim_jaccard",
    "sim_dice",
    "sim_js",
]
VECTOR_COLUMNS = [f"{a}_{s}" for a in ASSOC_MEASURES for s in SIM_MEASURES]

PAIR_VECTORS = T.StructType(
    [
        T.StructField("word1", T.StringType()),
        T.StructField("word2", T.StringType()),
        T.StructField("is_related", T.BooleanType()),
        *[T.StructField(c, T.DoubleType()) for c in VECTOR_COLUMNS],
    ]
)

# Driver fixture tables (/root/testdata/sf*/): FIXTURES.md §B.
FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
