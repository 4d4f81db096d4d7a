"""Training-data curation runner — the end-to-end CLI a data team
would actually point at a raw corpus, composing the engine's curation
operators into the standard funnel:

    ingest -> quality gate -> exact dedup -> near-dedup (MinHash/LSH
    clusters) -> optional benchmark decontamination -> leakage-safe
    train/val/test split -> token-budget shard materialization

    python -m semantic_similarity_system_using_aws_mapreduce_spark.run_curation DOCS OUTDIR
        [--format parquet|orc|jsonl|csv|wet|warc] [--eval-docs PATH]
        [--min-tokens 24] [--min-ttr 0.35] [--contam-overlap 5]
        [--shard-budget 2048] [--no-shards]
        [--dedup min-id|keep-newest]

DOCS needs (doc_id, text[, lang, source, ...]); extra columns ride
through untouched.  Writes to OUTDIR:

    curated.parquet/   survivors, partitioned by split, with
                       group_id (dedup-cluster rep) and split columns
    rejects.parquet/   every dropped doc with its drop stage
    shards/            (unless --no-shards) one parquet file per
                       (split, shard) under a token budget
    manifest.json      per-stage funnel counts + shard manifest

Every decision is hash-deterministic (md5 buckets, min-id survivors),
so re-running on the same snapshot reproduces byte-identical outputs —
the audit property the per-operator docstrings promise, delivered
end-to-end.  Scale notes: each stage is the operator's documented
100 TB plan; the funnel counts come from one aggregation over the
staged relation, not per-stage driver actions.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import (
    lsh_candidates,
    minhash_signatures,
    ngram_contamination,
    shingle_hashes,
    tokens,
)
from semantic_similarity_system_using_aws_mapreduce_spark.operators.graph import connected_components
from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import MOJIBAKE_MAX_PERMILLE
from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import (
    SPLIT_TRAIN_PERMILLE,
    SPLIT_VAL_PERMILLE,
    cluster_split,
)
from semantic_similarity_system_using_aws_mapreduce_spark.session import get_spark
from semantic_similarity_system_using_aws_mapreduce_spark.sources.jsonl import read_csv_documents, read_jsonl_documents
from semantic_similarity_system_using_aws_mapreduce_spark.sources.sinks import write_training_shards


def _read(
    spark: SparkSession, path: str, fmt: str, url_dedup: bool = False
) -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "jsonl":
        return read_jsonl_documents(spark, path)[0]
    if fmt == "csv":
        return read_csv_documents(spark, path)[0]
    if fmt == "wet":
        from semantic_similarity_system_using_aws_mapreduce_spark.sources.warc import read_warc, wet_documents

        return wet_documents(read_warc(spark, path), url_dedup=url_dedup)[0]
    if fmt == "warc":
        from semantic_similarity_system_using_aws_mapreduce_spark.sources.warc import read_warc, warc_text_documents

        return warc_text_documents(read_warc(spark, path))[0]
    raise ValueError(f"unknown --format {fmt!r}")


def curate(
    spark: SparkSession,
    docs: DataFrame,
    outdir: str,
    eval_docs: DataFrame | None = None,
    min_tokens: int = 24,
    min_ttr: float = 0.35,
    contam_overlap: int = 5,
    shard_budget: int = 2048,
    shards: bool = True,
    domain_quota_k: int | None = None,
    gopher: bool = False,
    main_content: bool = False,
    mojibake_max_permille: int | None = MOJIBAKE_MAX_PERMILLE,
    lang_id: bool = False,
    dedup_mode: str = "min-id",
) -> dict:
    if dedup_mode not in ("min-id", "keep-newest"):
        raise ValueError(f"unknown dedup_mode {dedup_mode!r}")
    if dedup_mode == "keep-newest" and "fetched_at" not in docs.columns:
        raise ValueError(
            "--dedup keep-newest needs a 'fetched_at' column (the "
            "WARC/WET readers supply it from WARC-Date)"
        )
    os.makedirs(outdir, exist_ok=True)

    # optional language identification filling the docs shape's lang
    # column where the reader left it null (the WET/WARC readers do —
    # sources/warc.py): the stopword-profile heuristic, consuming the
    # crawl path's declared <html lang=...> prior when the column is
    # present (operators/text_analysis.identify_language: declaration
    # wins unless the statistics strongly disagree).  Map-side column
    # expressions; labeled rows keep their label.
    if lang_id:
        from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import identify_language

        prior = "html_lang" if "html_lang" in docs.columns else None
        had_lang = "lang" in docs.columns
        docs = identify_language(docs, prior_col=prior)
        filled = (
            F.coalesce(F.col("lang"), F.col("lang_pred"))
            if had_lang
            else F.col("lang_pred")
        )
        docs = docs.withColumn("lang", filled).drop("lang_pred", "lang_score")

    # optional block-level boilerplate strip (operators/text_analysis.
    # main_content, jusText-shaped) BEFORE every gate: substitute the
    # furniture-stripped main_text wherever the page yielded at least
    # one good block (small legitimate pages keep the full text).
    # Raw-WARC docs already carry the columns (sources/warc.py);
    # other formats compute them here — map-side column expressions
    # either way, so the strip costs no extra pass or shuffle and the
    # downstream gates/dedup judge the content, not the template.
    if main_content:
        if "main_text" not in docs.columns:
            from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import (
                main_content as _mc_op,
            )

            docs = _mc_op(docs, html_col="text")
        # a good block is >= min_chars long, so "any good block" ==
        # non-empty main_text — the one condition both the raw-WARC
        # columns (main_text + boilerplate_ppm only) and the freshly
        # computed ones satisfy; null main_text (null page) keeps text
        docs = docs.withColumn(
            "text",
            F.when(
                F.length("main_text") > 0, F.col("main_text")
            ).otherwise(F.col("text")),
        ).drop("main_text", "n_blocks", "n_good_blocks", "total_chars", "good_chars")

    # --- stage columns (all map-side except where noted) ------------
    toks = tokens(F.col("text"))
    staged = docs.withColumn("_toks", toks).withColumn(
        "_n_toks", F.size("_toks")
    ).withColumn(
        "_ttr",
        F.when(
            F.size("_toks") > 0,
            F.size(F.array_distinct("_toks")) / F.size("_toks"),
        ).otherwise(F.lit(0.0)),
    )
    quality_ok = (F.col("_n_toks") >= min_tokens) & (F.col("_ttr") >= min_ttr)
    # mojibake gate: the WARC readers count U+FFFD replacements from
    # the non-throwing charset decode into n_repl (sources/warc.py);
    # a page whose replacement density exceeds the threshold is
    # undecoded binary or a wrong-charset decode, not trainable text.
    # Integer cross-multiplied (the gopher_rules convention), map-side,
    # applied only where the ingest path supplies the column.
    if mojibake_max_permille is not None and "n_repl" in docs.columns:
        mojibake_ok = F.coalesce(F.col("n_repl"), F.lit(0)) * 1000 <= (
            F.lit(mojibake_max_permille)
            * F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1))
        )
    else:
        mojibake_ok = F.lit(True)
    # optional Gopher rule gate (operators/text_analysis.gopher_rules —
    # byte-identical rules via the shared flag expressions), map-side
    # like the basic quality gate, so it runs BEFORE any shuffle and
    # rejected rows never reach the dedup stages.  NOTE: Gopher's own
    # word-count floor is 50, stricter than the default min_tokens=24.
    if gopher:
        from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import gopher_keep_col

        staged = staged.withColumn("_gopher_ok", gopher_keep_col("_toks"))
        gopher_ok = F.col("_gopher_ok")
    else:
        gopher_ok = F.lit(True)
    staged = staged.drop("_toks")

    # exact dedup.  min-id (default): the smallest doc_id survives
    # per content digest; keep-newest (--dedup keep-newest, r10 —
    # crawl semantics for re-crawled corpora): the newest fetch
    # survives, ties broken by greatest id — max(struct(ts, id)), the
    # exact survivor the oracled operator picks
    # (operators/dedup.exact_dedup_keep_newest, q_dedup_keep_newest;
    # struct comparison puts null timestamps last).  SHAPE (r10,
    # replacing a row_number window): aggregate the one survivor id
    # per digest, then join it back.  Both routes shuffle the staged
    # relation by digest once, but the window form SORTS each
    # digest's whole copy set in one task — the hot-key pathology the
    # url_dedup docstring warns about (a crawler-trap page's millions
    # of identical copies) — while the aggregate collapses the hot
    # digest map-side via partial aggregation and the join back
    # merely streams the copies through a join, no per-key sort, no
    # per-key memory.
    if dedup_mode == "keep-newest":
        pick = F.max(
            F.struct(F.col("fetched_at").alias("f"), F.col("doc_id").alias("d"))
        )["d"]
    else:
        pick = F.min("doc_id")
    # null texts form their own digest group (the window form's null
    # partition did the same) — a bare md5(null) key would silently
    # drop those rows at the inner join
    staged = staged.withColumn(
        "_digest", F.coalesce(F.md5("text"), F.lit("__null_text__"))
    )
    keepers = staged.groupBy("_digest").agg(pick.alias("_keep_id"))
    # Persist HERE, not after the near-dup join (r12): everything
    # above (tokenize + array_distinct TTR + digest aggregate + join
    # back) is the funnel's per-row heavy lifting, and it used to run
    # TWICE — once under the near-dup chain's materialization
    # (components' edge count / the LSH probe) and again under the
    # funnel-count action that materialized the old post-join persist.
    # Everything BELOW this cache is a broadcast-sized comp join plus
    # map-side stage columns, cheap to replay per consumer action.
    # Same cache budget as before: one corpus-wide relation.
    staged = staged.join(keepers, "_digest").persist()
    exact_ok = F.col("doc_id") == F.col("_keep_id")

    # near-dedup clusters over the quality+exact survivors only — the
    # expensive stage never sees rows an earlier (cheaper) stage drops
    survivors0 = staged.filter(
        quality_ok & mojibake_ok & gopher_ok & exact_ok
    ).select("doc_id", "text")
    # distinct=False: min-signatures are duplicate-blind, so the
    # per-(doc_id, h) dedup exchange is skipped (r12); the
    # decontamination call below keeps the distinct — its n_shingles
    # counts DISTINCT n-grams per doc
    sigs = minhash_signatures(shingle_hashes(survivors0, distinct=False))
    comp = connected_components(lsh_candidates(sigs)).withColumnRenamed(
        "node", "doc_id"
    )
    staged = staged.join(comp, "doc_id", "left").withColumn(
        "_group", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    near_ok = F.col("doc_id") == F.col("_group")  # cluster rep survives

    # optional benchmark decontamination (broadcast eval shingle probe).
    # Persisted: it is a NARROW per-doc relation consumed by every
    # downstream action (funnel agg + both writes), and since the r12
    # early persist those actions replay everything below the base
    # cache — without this the shingle probe would run once per action.
    contam_cache = None
    if eval_docs is not None:
        contam_cache = ngram_contamination(
            shingle_hashes(survivors0), shingle_hashes(eval_docs), contam_overlap
        ).select("doc_id", "contaminated").persist()
        staged = staged.join(contam_cache, "doc_id", "left").withColumn(
            "_contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    else:
        staged = staged.withColumn("_contaminated", F.lit(False))

    # optional per-domain frequency capping, applied LAST (to the
    # otherwise-kept set): each source keeps its domain_quota_k
    # largest surviving documents (operators/sampling.domain_quota's
    # two-phase salted top-k), ordered by the token count stage 1
    # already computed — schema-independent, no reliance on n_chars
    if domain_quota_k:
        from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import domain_quota

        if "source" not in docs.columns:
            raise ValueError("--domain-quota needs a 'source' column")
        pre_kept = (
            quality_ok
            & mojibake_ok
            & gopher_ok
            & exact_ok
            & near_ok
            & ~F.col("_contaminated")
        )
        # persisted for the same narrow-relation-many-actions reason
        # as the contamination column above (r12)
        winners = domain_quota(
            staged.filter(pre_kept).select("doc_id", "source", "_n_toks"),
            domain_quota_k,
            "source",
            "doc_id",
            "_n_toks",
        ).select("doc_id", F.lit(True).alias("_in_quota")).persist()
        staged = staged.join(winners, "doc_id", "left")
        over_quota = pre_kept & F.col("_in_quota").isNull()
    else:
        winners = None
        over_quota = F.lit(False)

    # leakage-safe split: the ONE shared rule (operators/sampling.
    # cluster_split) applied to the dedup-cluster representative —
    # byte-identical to q_leakage_safe_split's assignment
    base = staged  # the persisted pre-near-dup relation (unpersist below)
    staged = (
        staged.withColumn(
            "_stage",
            F.when(~quality_ok, "quality")
            .when(~mojibake_ok, "mojibake")
            .when(~gopher_ok, "gopher")
            .when(~exact_ok, "exact_dup")
            .when(~near_ok, "near_dup")
            .when(F.col("_contaminated"), "contaminated")
            .when(over_quota, "over_quota")
            .otherwise("kept"),
        )
        .withColumn("split", cluster_split(F.col("_group")))
        .withColumn("group_id", F.col("_group"))
    )

    funnel = {
        r["_stage"]: r["n"]
        for r in staged.groupBy("_stage").agg(F.count("*").alias("n")).collect()
    }

    carry = [c for c in docs.columns] + ["group_id", "split"]
    kept = staged.filter(F.col("_stage") == "kept").select(*carry)
    kept.write.mode("overwrite").partitionBy("split").parquet(
        f"{outdir}/curated.parquet"
    )
    (
        staged.filter(F.col("_stage") != "kept")
        .select(*docs.columns, F.col("_stage").alias("drop_stage"))
        .write.mode("overwrite")
        .parquet(f"{outdir}/rejects.parquet")
    )

    manifest: dict = {
        "funnel": funnel,
        "n_input": sum(funnel.values()),
        "n_kept": funnel.get("kept", 0),
        "split_permille": {"train": SPLIT_TRAIN_PERMILLE, "val": SPLIT_VAL_PERMILLE},
    }
    if shards and manifest["n_kept"] > 0:
        shard_manifest = write_training_shards(
            spark.read.parquet(f"{outdir}/curated.parquet"),
            f"{outdir}/shards",
            budget_tokens=shard_budget,
            part_col="split",
        )
        manifest["shards"] = [r.asDict() for r in shard_manifest.collect()]
    base.unpersist()
    if contam_cache is not None:
        contam_cache.unpersist()
    if winners is not None:
        winners.unpersist()
    with open(f"{outdir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("docs")
    ap.add_argument("outdir")
    ap.add_argument("--format", default="parquet", choices=["parquet", "orc", "jsonl", "csv", "wet", "warc"])
    ap.add_argument("--eval-docs", default=None)
    ap.add_argument("--min-tokens", type=int, default=24)
    ap.add_argument("--min-ttr", type=float, default=0.35)
    ap.add_argument("--contam-overlap", type=int, default=5)
    ap.add_argument("--shard-budget", type=int, default=2048)
    ap.add_argument("--no-shards", action="store_true")
    ap.add_argument(
        "--domain-quota",
        type=int,
        default=None,
        help="keep at most K surviving docs per source (quality-ordered "
        "frequency capping; the over-quota rows land in rejects)",
    )
    ap.add_argument(
        "--dedup",
        default="min-id",
        choices=["min-id", "keep-newest"],
        help="exact-dedup survivor rule: 'min-id' (default, "
        "deterministic smallest id) or 'keep-newest' (crawl "
        "semantics: the newest fetch per content digest survives, "
        "keyed on the readers' fetched_at / WARC-Date — for "
        "re-crawled corpora where the latest copy's metadata should "
        "win)",
    )
    ap.add_argument(
        "--url-dedup",
        action="store_true",
        help="(--format wet) keep one record per canonical target URL "
        "before any content pass — the crawl pipeline's cheapest dedup",
    )
    ap.add_argument(
        "--gopher",
        action="store_true",
        help="apply the Gopher rule-based quality gate (word-count "
        "bounds incl. the 50-word floor, mean word length, symbol/"
        "alpha ratios, stop-word presence) as a map-side reject stage",
    )
    ap.add_argument(
        "--mojibake-max-permille",
        type=int,
        default=MOJIBAKE_MAX_PERMILLE,
        help="reject pages whose U+FFFD replacement density (n_repl "
        "per 1000 chars, counted by the WARC charset decode) exceeds "
        "this; -1 disables; no-op for inputs without an n_repl column",
    )
    ap.add_argument(
        "--lang-id",
        action="store_true",
        help="fill null lang labels via stopword-profile language "
        "identification, consuming the crawl path's declared <html "
        "lang=...> prior when present (declaration wins unless the "
        "statistics strongly disagree)",
    )
    ap.add_argument(
        "--main-content",
        action="store_true",
        help="strip per-page template furniture (jusText-shaped block "
        "text/link-density scoring) before every gate: pages keep "
        "their main_text wherever at least one good block exists",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="curation")
    eval_docs = (
        _read(spark, args.eval_docs, args.format) if args.eval_docs else None
    )
    manifest = curate(
        spark,
        _read(spark, args.docs, args.format, url_dedup=args.url_dedup),
        args.outdir,
        eval_docs=eval_docs,
        min_tokens=args.min_tokens,
        min_ttr=args.min_ttr,
        contam_overlap=args.contam_overlap,
        shard_budget=args.shard_budget,
        shards=not args.no_shards,
        domain_quota_k=args.domain_quota,
        gopher=args.gopher,
        main_content=args.main_content,
        lang_id=args.lang_id,
        dedup_mode=args.dedup,
        mojibake_max_permille=(
            None
            if args.mojibake_max_permille < 0
            else args.mojibake_max_permille
        ),
    )
    print(json.dumps(manifest, default=str))


if __name__ == "__main__":
    main()
