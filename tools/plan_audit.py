"""Physical-plan audit: one line per registry query.

Flags the plan smells that matter at 100 TB:
  BNL   — BroadcastNestedLoopJoin / CartesianProduct present
  NOPUSH— parquet scan with no PushedFilters while the query filters
  PYUDF — Python row-at-a-time UDF (BatchEvalPython) in the plan
  WIN   — partition-less Window (global sort funnel) outside the
          whitelist of declared-global sites
Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# queries where a cross/BNL join is the declared algorithm (exact
# all-pairs baselines with a broadcast side), not an accident.
# q68/q77/q85/q95/q97: crossJoin of ONE-ROW full aggregates (corpus doc
# count / total-vs-orphan report counts / WASDE landmark cells / corpus
# token total) — the scalar-subquery broadcast pattern; the "loop" side
# is 1 row.
EXPECTED_BNL = {"q22_geo_knn_top3", "q23_haversine_threshold", "q35_embedding_topk",
                "q48_embedding_near_dup", "q68_tfidf_topterms", "q77_data_quality",
                "q85_pipeline_wasde", "q95_pipeline_wasde2",
                "q97_unigram_logprob", "q120_bigram_logprob",
                "q128_importance_resampling", "q130_temperature_mix",
                "q144_pmi_collocations", "q146_psi_drift", "q155_hits",
                "q161_curation_dag_v2",
                # q162: one-row crossJoin(broadcast(min-date)) attaching
                # the day-spine start — the same whitelisted
                # scalar-subquery pattern as q97/q120/q161 (the BNL loop
                # side is exactly 1 row).
                "q162_dau_wau",
                # q167: one-row crossJoin(broadcast(N/avgdl aggregate))
                # feeding the BM25 idf/length normalization — the same
                # scalar-subquery broadcast pattern as q68/q97.
                "q167_bm25_retrieval",
                # q241: the final readout crossJoins TWO one-row
                # aggregates (the sketch estimate and the exact
                # Σ f_A·f_B) — a 1×1 product, the same whitelisted
                # scalar pattern as q162/q167.
                "q241_cms_join_size",
                # q187: inherits q167's one-row N/avgdl broadcast through
                # bm25_scores (the sparse ranker inside the RRF fusion).
                "q187_hybrid_rrf",
                # q191: the brute-force side of the recall evaluation IS
                # the declared exact baseline — crossJoin(broadcast(
                # bounded query table)) scoring every (query, vector)
                # pair is the definition of ground truth the IVF path is
                # measured against (same class as q35/q48's exact-topk
                # baselines).
                "q191_ann_recall",
                # q195: brute Hamming over 32-bit codes against the
                # broadcast 1%-sampled query side — the declared exact
                # baseline within SRP code space (q35/q191's class);
                # the production candidate generator is the banded
                # bucket equi-join (lsh_topk).
                "q195_srp_hamming",
                # q198: the isotonic minimax lattice's range self-joins
                # (j ≤ b, k ≥ b) run over the ≤ n_bins=10-row bin
                # frame — a config-constant-bounded triple, not a
                # corpus-scale cross join (the corpus-scale work is
                # the single bounded bin aggregate upstream).
                "q198_isotonic_calibration",
                # q200: inherits q198's bounded isotonic lattice (the
                # capstone calibrates the trained model's probability
                # deciles — same ≤ 10-row frame).
                "q200_ml_curation_capstone",
                # q214: two one-row scalar broadcasts per profiled key
                # (the per-key stats and percentile frames) — the same
                # whitelisted scalar-subquery pattern as q97/q162/q167.
                "q214_key_skew_profile",
                # q256: per candidate pair the report row crossJoins
                # TWO one-row aggregates (lhs distinct count x contained
                # count) -- six 1x1 products, the q241/q162 scalar
                # class; the corpus-scale work is the distinct+semi-join
                # upstream of each pair.
                "q256_inclusion_profile",
                # q261: three q241-class estimate rows (each already a
                # whitelisted 1x1 scalar product) plus the in-plan
                # argmin broadcast back over the 3-row candidate table
                # -- bounded planner state, not corpus rows.
                "q261_join_order_advisor",
                # q262: the readout crossJoins three one-row count
                # aggregates (q241/q162's scalar class); the fact
                # stream itself rides a semi-join, never a BNL.
                "q262_bloom_join_filter",
                # q274: the one-row law_violations aggregate
                # crossJoins onto the 10-row delta summary (q241's
                # 1x1 scalar class); every data-path join in the
                # delta algebra and the law check is an equi/full-
                # outer join on keys or value tuples.
                "q274_join_view_delta",
                # q271: three bounded crossJoins — the one-row
                # min/max bounds scalar onto the key stream (q162's
                # exact pattern), the one-row match-count aggregate
                # onto the |preds| literal table, and the
                # |preds| x 2*n_files zone lattice (KB) — never
                # corpus x corpus.
                "q271_zonemap_advisor",
                # q276: inherits bloom_semi_filter's bounded-bitset
                # broadcast (the q240/q262 class — the Bloom word
                # table, ceil(m_bits/63) rows, crossJoins onto the
                # DISTINCT probe keys); the fact stream itself rides
                # the semi-join and three broadcast hash joins.
                "q276_planner_capstone",
                # q277: per candidate dim the advisor crossJoins the
                # one-row flat-byte total onto the one-row KMV readout
                # (1x1), then the |dims|-row decision table onto the
                # one-row fact byte total — q241/q162's bounded scalar
                # class; the corpus-scale work is the per-dim
                # kmv_build groupBy and the byte-sum aggregates, all
                # map-side-combined single passes.
                "q277_join_strategy",
                # q290: inherits q277's scalar class and crossJoins
                # the one-row executed-join aggregate onto the
                # 3-row decision table; the executed fact stream
                # rides three equi-joins under the advised hints.
                "q290_strategy_capstone",
                # q278: inherits q271's bounded lattice with MEASURED
                # zones — the preds × (≤128 footer-derived zone rows)
                # crossJoin plus the one-row match-count scalar onto
                # the |preds| literal table; the corpus-scale work is
                # the two layout writes (hash-shuffle repartitions)
                # and one read-back aggregate, plus the fid
                # derivation's one-row bounds broadcast (q162's
                # pattern). Never corpus × corpus.
                "q278_zonemap_executed",
                # q279: q278's class in two dimensions — the
                # |preds| x (≤ 2 layouts · n_files · 2 cols)
                # footer-zone lattice (KB, an equi-join on col=dim
                # plus the bounded groupBy) and the one-row
                # match-count scalar onto the |preds| literal table;
                # corpus-scale work is the two layout writes and one
                # read-back aggregate.
                "q279_zorder_executed",
                # q284: q271's bounded class at 4 layouts — the
                # one-row six-scalar bounds broadcast onto the key
                # stream, the |preds| x 4*n_files zone lattice (KB),
                # and the one-row argmin broadcast back over the
                # 4-row cost table (q261's pattern).
                "q284_layout_workload",
                # q286: two one-row scalar broadcasts (the total
                # Neyman weight and the leftover count) onto the
                # |strata|-row allocation lattice — q241/q162's
                # bounded class; corpus-scale work is one moment
                # groupBy and a per-stratum rank window.
                "q286_neyman_allocation",
                # q287: the readout crossJoins three one-row funnel
                # step counts — q241/q162's scalar class; each step
                # is a map-side-combined min-agg chained by user-key
                # equi-joins.
                "q287_funnel_conversion",
                # q280: the |preds| x |buckets| selectivity lattice —
                # a literal table crossJoined onto the broadcast
                # bucket AGGREGATE (≤ a few thousand rows at
                # digits=3, bounded by the rq geometry, never corpus
                # rows) plus the one-row exact-count scalar; the
                # corpus-scale work is rq_build's map-side-combined
                # pass and the conditional-sum aggregate.
                "q280_histogram_selectivity",
                # q268: the |classes| x |domain| EMD lattice is a
                # geometry-bounded crossJoin of two AGGREGATES (never
                # corpus rows) plus the one-row (N, m) scalar
                # broadcast — the q198/q256 bounded-lattice class;
                # the corpus-scale work is three map-side-combined
                # groupBys upstream.
                "q268_t_closeness_audit",
                # q289 needs no entry for the same reason as q267
                # below: its OUTPUT plan is |steps| literal rows (the
                # executed prefix chain's counts are scalar
                # aggregates during construction, audited by their
                # own equi-join shapes).
                # q267 needs no entry: since the batched-estimate
                # rework its OUTPUT plan is |decisions| literal rows
                # (the eager planner holds its sketch statistics; the
                # corpus work happens in equi-join/groupBy jobs during
                # construction, audited by their own shapes).
                # q258: the readout crossJoins three one-row
                # aggregates (exact totals + the two state checksums)
                # onto the one-row F2 estimate -- q248's scalar class;
                # the streamed state itself is |k|-bounded.
                "q258_stream_ams_f2",
                # q283: the readout crossJoins two one-row checksum
                # aggregates onto the one-row quantile walk — q258's
                # scalar class; the streamed state is bucket-geometry
                # bounded (a few thousand rows at digits=3).
                "q283_stream_rq_quantiles",
                # q231: one-row crossJoin(broadcast(min/max-day bounds))
                # building the global day spine — q162's exact pattern
                # (the BNL loop side is 1 row; the spine is |types| ×
                # |days|, series-bounded, never raw rows).
                "q231_cusum_changepoint",
                # q240: bloom_contains crossJoins the ONE-ROW geometry
                # scalar (max word index + geom tag) onto the probe
                # stream — the q162/q167 scalar-broadcast pattern; the
                # filter words themselves ride a broadcast EQUI-join.
                "q240_bloom_decontamination",
                # q243: range_plan crossJoins the ONE-ROW total-count
                # aggregate onto the parts-row bucket spine for the
                # balance ratio — q241's exact 1×parts scalar pattern.
                "q243_range_partition_plan",
                # q245: the equality proof crossJoins TWO one-row
                # counter-table checksums (maintained vs rebuilt) onto
                # the probe rows — q241's 1×1 scalar pattern.
                "q245_cms_cdc_forget",
                # q246: same two one-row checksum scalars, rq family.
                "q246_rq_cdc_forget",
                # q248: same two one-row checksum scalars (streamed
                # vs direct-build counter tables).
                "q248_stream_cms_freq",
                # q249: the bucket-pair product is a crossJoin of two
                # GEOMETRY-bounded bucket tables (≤ a few thousand
                # rows each at digits=3 regardless of corpus — q198's
                # lattice class), plus q241-class one-row scalars;
                # the exact baseline runs the banded equi-join shape,
                # not a corpus cross join.
                "q249_band_join_bounds"}

# queries where a GLOBAL (partition-less) window is the declared
# semantics on a bounded/pre-aggregated frame — e.g. a global top-k over
# an already-reduced result — not a scale bug. Keep this list justified.
# q76: vocab-id enumeration (row_number) over the min-df-PRUNED
#      vocabulary — an aggregate result, not the corpus (see docstring).
# q187: rank assignment over TakeOrdered 20-row shortlists and the
#       fused sort over a <= 40-row frame — bounded by construction
#       (the corpus-scale work is the upstream BM25/cosine scoring,
#       which uses no global window).
# q194: cumulative-negatives window over the 6-dp score-bin frame —
#       bounded by the 1e-6 GRID (≤ 1,000,001 rows for a [0,1] score),
#       not the corpus; the corpus-scale work is the upstream bin
#       aggregation, which shuffles on the bin key.
# q198: cumulative counts over the same ≤ n_bins bin frame as q194's
#       whitelisted window (grid-bounded, not corpus-bounded).
# q214: cumulative over the frequency-of-frequencies histogram — an
#       aggregate OF an aggregate, bounded by distinct multiplicity
#       values (a few hundred rows at any key cardinality), q76's
#       aggregate-result class.
EXPECTED_GLOBAL_WIN: set[str] = {
    "q76_vocabulary",
    "q187_hybrid_rrf",
    "q194_model_eval",
    "q198_isotonic_calibration",
    # q200 inherits q198's bin-frame window (grid-bounded).
    "q200_ml_curation_capstone",
    "q214_key_skew_profile",
    # q244: the grand-total rollup level runs rq_quantiles' cumulative
    # walk with no partition columns — over the BUCKET table (≤ a few
    # thousand rows at digits=3, bounded by the sketch geometry, never
    # the corpus; the corpus-scale work is rq_build's map-side-combined
    # bucket aggregation). q194's aggregate-frame class.
    "q244_quantile_rollup",
    # q286: the largest-remainder apportionment ranks the |strata|-row
    # allocation lattice (3 rows) — q76's aggregate-result class.
    "q286_neyman_allocation",
    # q283: the rq_quantiles cumulative walk over the STREAMED bucket
    # table — q244's exact class (bucket-geometry bounded, ≤ a few
    # thousand rows at digits=3, never the corpus; the corpus-scale
    # work is the per-batch map-side-combined bucket folds).
    "q283_stream_rq_quantiles",
}


def global_windows(plan: str) -> int:
    """Count partition-less Window execs in a physical-plan string.

    A `Window` line prints `Window [exprs], [partition], [order]`, but
    BOTH trailing specs are optional: a partitioned-unordered window
    (`count(*) OVER (PARTITION BY k)`) prints two groups and a global
    ORDERED window (`row_number() OVER (ORDER BY x)`) ALSO prints two —
    so the group count alone can't distinguish them. Disambiguate by
    content: an ordering group contains `ASC`/`DESC` sort directions, a
    partition group never does. Bracket groups are parsed by depth so
    commas inside windowspecdefinition(...) don't fool the split.
    """
    n = 0
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*()]*(?:Running)?Window(?:Exec)?\s+\[", line)
        if not m:
            continue
        depth = 0
        groups: list[str] = []
        for ch in line[m.end() - 1:]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0:
                groups[-1] += ch
        is_order = [
            bool(re.search(r" (ASC|DESC) ", g)) for g in groups[1:]
        ]
        # global iff no non-ordering spec group follows the exprs
        if all(is_order):
            n += 1
    return n


def main() -> int:
    from __spark_entry__ import queries
    from gpi_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    bad = 0
    for name, fn in queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = []
        if ("BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan):
            flags.append("BNL" if name in EXPECTED_BNL else "BNL!")
        if "BatchEvalPython" in plan:
            flags.append("PYUDF")
        gwin = global_windows(plan)
        if gwin:
            flags.append("WIN" if name in EXPECTED_GLOBAL_WIN else "WIN!")
        n_scan = plan.count("FileScan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        n_ex = plan.count("Exchange")
        n_codegen = plan.count("WholeStageCodegen")
        mark = " ".join(flags) or "ok"
        if "!" in mark or "PYUDF" in mark:
            bad += 1
        print(
            f"{mark:6s} {name}: scans={n_scan} pushedFilterScans={pushed} "
            f"exchanges={n_ex} codegenSpans={n_codegen}"
        )
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
