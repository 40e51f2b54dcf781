"""Audit headline-query physical plans AT SCALE (sf0.1 / sf1).

The per-commit plan gates (tests/test_plans.py) bind at sf0.001,
where AQE broadcasts nearly everything — assertions like "no
SortMergeJoin" there are toy-scale facts. This tool re-derives the
plans against the large generated points and checks the classes that
must hold at ANY scale:

- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only at the allowlisted 1-row/tiny-side
  sites;
- no BatchEvalPython (row-at-a-time Python) in any hot path;
- every parquet scan that evaluates data filters still PUSHES them
  into the reader (pushdown must not silently break at scale);
- partial aggregation still precedes the exchange wherever the
  sf0.001 plan had it.

Join-strategy CHANGES vs the sf0.001 baseline (broadcast → sort-merge
or shuffled-hash) are RECORDED, not forbidden: above the broadcast
threshold they are exactly what Spark should do.

With ``--execute`` each query is additionally run to completion
(noop write) so the FINAL adaptive plan — after AQE's runtime
re-planning — is captured instead of the static estimate.

Usage:
  python tools/plan_scale_audit.py                      # sf1, static
  python tools/plan_scale_audit.py --execute            # sf1, final AQE
  python tools/plan_scale_audit.py --sf /root/testdata/sf0.1
Writes PLANS_sf1.md (or PLANS_sf01.md for the sf0.1 point).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_SF = "/root/testdata/sf0.001"

#: BNLJ sites whose broadcast side is provably tiny (1-row scalar
#: aggregates / fixed small pools) — same list as tests/test_plans.py.
ALLOWED_BNL = {
    "q53_funnel", "s06_semantic_dedup", "s03_batch_topk",
    "q63_null_safe_join", "q67_similarity_join", "d10_bloom_prefilter",
    "t23_bigram_lift", "t30_hll_shards", "t34_hist_quantile",
    "s10_hybrid_rrf", "s12_mmr_rerank",
    "t43_kmv_overlap",  # sketch (S*K) x source list (S): non-equi
    # pair-tagging by construction, both sides sketch-sized (S^2*K)
    "t44_coverage_curve",  # crossJoin of the 1-row corpus total
    "s16_range_search",  # corpus x broadcast 3-row query set: scoring
    # every corpus row against every query IS the range scan (the
    # s03 batch-topk rationale)
    "g01_pagerank",  # crossJoin of the 1-row node-count aggregate
    # (folds n into the rank constants without a driver count job)
}


def classify(plan: str) -> dict:
    """Scale-posture fingerprint of one formatted/executed plan string."""
    n_exchange = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
    scans_no_pushdown = 0
    scans_pushed = 0
    n_scans = 0
    seen: set[str] = set()
    for seg in plan.split("Scan parquet")[1:]:
        # one plan node per line: the remainder of the scan's own line
        # carries the COMPLETE spec (Location, DataFilters,
        # PushedFilters, ReadSchema), so two scans of the same relation
        # that differ only past a fixed prefix stay distinct
        head = seg.split("\n", 1)[0]
        # count DISTINCT scan specs: a persisted relation's plan text
        # embeds the same FileScan once per AQE initial/final copy and
        # once per consumer branch — raw occurrence counts then drift
        # with plan-text layout across scales, not with actual I/O
        if head in seen:
            continue
        seen.add(head)
        n_scans += 1
        if "PushedFilters: [" in head and "PushedFilters: []" not in head:
            scans_pushed += 1
        if (
            "DataFilters: [" in head
            and "DataFilters: []" not in head
            and "PushedFilters: []" in head
            and "PartitionFilters: []" in head
        ):
            scans_no_pushdown += 1
    return {
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "batch_eval_python": "BatchEvalPython" in plan,
        "scans_pushed": scans_pushed,
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "exchanges": n_exchange - plan.count("ReusedExchange"),
        "partial_agg": ("partial_" in plan),
        "scans": n_scans,
        "scans_no_pushdown": scans_no_pushdown,
    }


def killers(name: str, c: dict, base: dict | None) -> list[str]:
    """The scale-killer class: violations that must be ZERO at any sf."""
    out = []
    if c["cartesian"]:
        out.append("CartesianProduct")
    if c["bnlj"] and name not in ALLOWED_BNL:
        out.append("BroadcastNestedLoopJoin (not allowlisted)")
    if c["batch_eval_python"]:
        out.append("BatchEvalPython row-Python UDF")
    # Pushability is expression-static (decided at planning from the
    # predicate shape, never from file stats), so a scan evaluating
    # data filters without pushdown is fine when the predicate is
    # inherently non-pushable (regexp/size/split over the column —
    # parquet can't skip on those; ReadSchema still prunes), and the
    # raw non-pushed count is shape-dependent (a broadcast→SMJ flip
    # can duplicate a scan). The regression that matters: the query
    # pushed filters at sf0.001 but pushes NONE at scale, or a
    # previously-clean query gained non-pushed scans.
    if base is not None:
        if base["scans_pushed"] > 0 and c["scans_pushed"] == 0:
            out.append(
                f"pushdown lost: {base['scans_pushed']} pushed scan(s) at "
                "sf0.001 → 0 here"
            )
        if base["scans_no_pushdown"] == 0 and c["scans_no_pushdown"] > 0:
            out.append(
                f"{c['scans_no_pushdown']} non-pushed scan(s) appeared "
                "(none at sf0.001)"
            )
    if base is not None and base["partial_agg"] and not c["partial_agg"]:
        out.append("partial aggregation lost vs sf0.001")
    return out


def plan_of(fn, spark, sf_dir: str, execute: bool) -> str:
    df = fn(spark, sf_dir)
    if execute:
        df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads import queries
    from bench import HEADLINE

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.scaledata/sf1")
    ap.add_argument("--execute", action="store_true",
                    help="run each query so the FINAL adaptive plan is audited")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset (e.g. the "
                         "flip-prone families for an sf10 audit)")
    args = ap.parse_args()
    tail = args.sf.rstrip("/").rsplit("/", 1)[-1]
    label = tail if tail.startswith("sf") else "sf1"
    label = {"sf0.1": "sf01"}.get(label, label)
    out_path = args.out or f"/root/repo/PLANS_{label}.md"

    spark = build_session(app_name="plan-scale-audit")
    qs = queries()
    names = [n for n in HEADLINE if not n.startswith("st")]
    if args.only:
        want = {q.strip() for q in args.only.split(",")}
        unknown = want - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        names = sorted(n for n in want if not n.startswith("st"))

    rows, flips, killed, errors = [], [], [], []
    t_total = time.time()
    for name in names:
        try:
            base_c = classify(plan_of(qs[name], spark, BASELINE_SF, False))
            plan = plan_of(qs[name], spark, args.sf, args.execute)
            c = classify(plan)
        except Exception as exc:  # noqa: BLE001 - keep sweeping
            errors.append((name, str(exc)[:120]))
            continue
        ks = killers(name, c, base_c)
        if ks:
            killed.append((name, ks, plan))
        # join-strategy flip: fewer broadcasts / new shuffle joins at
        # scale than the sf0.001 static plan had — expected above the
        # broadcast threshold, recorded for review
        if c["smj"] + c["shj"] > base_c["smj"] + base_c["shj"]:
            flips.append(
                (name,
                 f"sf0.001 {base_c['bhj']}BHJ/{base_c['smj']}SMJ/{base_c['shj']}SHJ"
                 f" → {label} {c['bhj']}BHJ/{c['smj']}SMJ/{c['shj']}SHJ")
            )
        rows.append((name, c, ks))
        spark.catalog.clearCache()

    md = [
        f"# PLANS_{label} — headline-query plan audit at `{args.sf}`",
        "",
        f"Generated by `tools/plan_scale_audit.py`"
        f"{' with --execute (final AQE plans)' if args.execute else ' (static plans)'}"
        f" in {time.time()-t_total:.0f}s. Baseline for comparisons: `{BASELINE_SF}`.",
        "",
        "Scale-killer classes checked (must be zero): CartesianProduct,",
        "non-allowlisted BroadcastNestedLoopJoin, BatchEvalPython,",
        "filter pushdown LOST vs the sf0.001 plan (pushability is",
        "expression-static, so a pushed filter must stay pushed at any",
        "scale), partial aggregation lost vs the sf0.001 plan. Scans",
        "whose predicate is inherently non-pushable (regexp/size/split",
        "expressions over a text column) are recorded in the",
        "no-pushdown column but are not failures — parquet cannot skip",
        "on them and their ReadSchema is still pruned; their COUNT can",
        "change when a join flip duplicates a scan. Join-strategy",
        "flips (broadcast → sort-merge/shuffled-hash) are recorded,",
        "not forbidden — above the broadcast threshold they are",
        "correct.",
        "",
        f"**Result: {len(killed)} scale-killer hits over {len(rows)} queries"
        f" ({len(flips)} recorded join flips, {len(errors)} errors).**",
        "",
        "| query | BHJ | SMJ | SHJ | exchanges | partial-agg | scans (pushed/non-pushed) | killers |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, c, ks in rows:
        md.append(
            f"| {name} | {c['bhj']} | {c['smj']} | {c['shj']} | "
            f"{c['exchanges']} | {'y' if c['partial_agg'] else '-'} | "
            f"{c['scans']} ({c['scans_pushed']}/{c['scans_no_pushdown']}) | "
            f"{'; '.join(ks) if ks else '—'} |"
        )
    if flips:
        md += ["", "## Join-strategy flips vs sf0.001 (recorded)", ""]
        md += [f"- **{n}**: {d}" for n, d in flips]
    if errors:
        md += ["", "## Errors", ""]
        md += [f"- **{n}**: {e}" for n, e in errors]
    if killed:
        md += ["", "## Scale-killer plans (full text)", ""]
        for name, ks, plan in killed:
            md += [f"### {name} — {'; '.join(ks)}", "", "```", plan, "```", ""]
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(md) + "\n")
    print(f"wrote {out_path}: {len(killed)} killers, {len(flips)} flips, "
          f"{len(errors)} errors over {len(rows)} queries")
    return 1 if (killed or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
