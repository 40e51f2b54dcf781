"""Scaling decades for d22's candidate gate (VERDICT r8 item 4).

d22's cost model is "the shingle-Jaccard candidate gate bounds the
Levenshtein verifier": the O(len_a x len_b) edit distance only ever
runs on the candidate pair list, and the df-capped posting lists keep
that list sub-quadratic in corpus size. Round 8 measured this at
sf0.01 only. This probe re-derives it across decades:

per scale point (sf0.01 / sf0.1 / sf1 / sf10) it records
- ``n_docs``               — corpus size,
- ``cand_pairs``           — pairs that REACH the verifier (the
                             jaccard_pairs output at tau=0.02 under
                             the d22 df cap — exactly d22's gate),
- ``cand_wall_s``          — wall to materialize the candidate list,
- ``full_wall_s``          — wall for the complete edit-verified
                             run (gate + Levenshtein verify + rel_e6
                             screen), so ``full - cand`` bounds the
                             verifier's own cost,
- pairwise exponents ``k_pairs`` / ``k_full`` between adjacent
  points (pairs ~ docs^k; the claim to validate is k_pairs <= ~1 —
  sub-quadratic by a decade — and k_full <= ~1).

Replica scaling note: gen_scaled's affine text cipher keeps replica
shingle spaces near-disjoint, so candidate pairs should grow ~R (one
sub-corpus's pairs per replica), i.e. k ~ 1 — the same constant-
dup-rate construction the substring family's decades use.

Prints one JSON line and merges a ``d22`` section into SCALING.md by
hand (the numbers land in the printed JSON; the md table is edited by
the round notes).

Usage: python tools/d22_verifier_probe.py [--best-of 2] [--points s001,s01,s1,s10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

POINTS = [
    ("s001", "/root/testdata/sf0.01", 0.01),
    ("s01", "/root/testdata/sf0.1", 0.1),
    ("s1", "/root/repo/.scaledata/sf1", 1.0),
    ("s10", "/root/repo/.scaledata/sf10", 10.0),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--points", default="s001,s01,s1,s10")
    args = ap.parse_args()
    want = set(args.points.split(","))

    from arc_jupyter_spark.operators import dedup
    from arc_jupyter_spark.session import build_session
    from arc_jupyter_spark.workloads.llmops import (
        _D03_MAX_DF, _D22_CAND_TAU,
    )

    spark = build_session(app_name="d22-verifier-probe")
    out: dict[str, dict] = {}
    prev = None
    for label, sf_dir, size in POINTS:
        if label not in want:
            continue
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            print(f"skip {label}: {sf_dir} missing")
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()

        def cand_frame():
            return dedup.jaccard_pairs(
                docs, "doc_id", "text", shingle_len=3,
                threshold=_D22_CAND_TAU, block_col="source",
                max_doc_freq=_D03_MAX_DF,
            ).select("id_a", "id_b")

        def timed(mk):
            best_wall, got = None, None
            for _ in range(args.best_of):
                spark.catalog.clearCache()
                t0 = time.time()
                n = mk().count()
                w = time.time() - t0
                if best_wall is None or w < best_wall:
                    best_wall, got = w, n
            return got, round(best_wall, 3)

        cand_pairs, cand_wall = timed(cand_frame)
        full_rows, full_wall = timed(lambda: dedup.edit_verified_pairs(
            docs, "doc_id", "text", shingle_len=3,
            candidate_threshold=_D22_CAND_TAU, block_col="source",
            max_doc_freq=_D03_MAX_DF, max_rel_e6=1_000_000,
        ))
        rec = {
            "n_docs": n_docs, "cand_pairs": cand_pairs,
            "cand_wall_s": cand_wall, "verified_rows": full_rows,
            "full_wall_s": full_wall,
            "verifier_wall_s": round(max(full_wall - cand_wall, 0.0), 3),
        }
        if prev is not None:
            ds = math.log(size / prev[0])
            rec["k_pairs"] = round(
                math.log(max(cand_pairs, 1) / max(prev[1]["cand_pairs"], 1))
                / ds, 2)
            rec["k_full"] = round(
                math.log(max(full_wall, 1e-3)
                         / max(prev[1]["full_wall_s"], 1e-3)) / ds, 2)
        prev = (size, rec)
        out[label] = rec
        print(json.dumps({label: rec}))
    print(json.dumps({"d22": out, "loadavg": os.getloadavg()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
