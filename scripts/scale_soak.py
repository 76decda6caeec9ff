"""Scale-soak: measure the heavy tier's work-counter GROWTH.

Every "safe at 100 TB" claim in the dedup/ANN spine rests on a shape
argument (banded joins, bucket pruning, cluster-bounded quadratics).
This harness converts the prose into measurement (round-10 verdict
#3): it replicates the sf0.1 corpus at THREE scales (1×, MID×, R×)
with similarity-destroying perturbations (so true near-dup density
stays constant and pair counts must grow LINEARLY), runs the heavy
queries at each scale, and records per-counter growth EXPONENTS
against a declared near-linear bound in ``counters_scale.json``.
``tests/test_counters_scale.py`` asserts the committed artifact — a
future operator change that re-quadratizes a join fails the test at
the next regeneration.

Why exponents over plain ratios: Spark legitimately changes plan
SHAPE across scales (a shingle-set join broadcasts at 5k docs and
shuffle-joins at 50k — the first soak run measured a 2006× byte
"blowup" that was this one-time step, linear on both sides of it).
The exponent is fitted per counter on the two scale pairs
(1×→MID, MID×→R) and the MINIMUM is bounded: a step transition
contaminates at most one pair (its other fit is clean ≈1), while a
real quadratic shows e≈2 on BOTH pairs and is caught. That first run
also caught a true quadratic — fixed-width LSH bucketing in
``embedding_near_duplicates_lsh`` grew candidate records exactly
100× at 10× corpus; its bit width now scales with N (the fix this
artifact regression-guards).

Replica construction (deterministic; replica 0 is the original):
- documents: ids offset by r*stride; every TOKEN suffixed with ~r<r>
  so cross-replica shingle/term overlap is zero — near-dup pairs,
  posting lists, and shingle keys all grow exactly linearly.
- embeddings: ids offset; each component's SIGN flipped by
  xxhash64(vec_id, pos, r) — norms, value distribution, and
  within-replica geometry preserved; cross-replica cosine decorrelated
  (expected ~0), so embedding near-dup pairs stay linear.
- all other tables: symlinked from the base sf dir (the heavy tier
  does not read them).
- query_vectors is unchanged by construction (``vec_id <
  N_QUERY_VECTORS`` selects only replica-0 rows), so per-query search
  cost isolates CORPUS growth.

Usage:
    python scripts/scale_soak.py [--replicas 10] [--base SF_DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Near-linear exponent ceiling: band constants, metadata jobs, and
# AQE re-planning perturb counters by constant factors (exponent
# noise at 2.5× scale steps); a quadratic stage shows e≈2 on every
# clean pair, far outside this.
MAX_EXPONENT = 1.35
# Counters whose growth is bounded; structural counts (exchanges,
# scans) are recorded but not bounded — AQE may legally re-plan.
BOUNDED = ("rows_read", "shuffle_records", "shuffle_bytes")
# Exponents over tiny absolute counters are noise (a 200-row partial
# doubling is not a scale signal); below this largest-scale value a
# counter passes unconditionally.
ABS_FLOOR = 10_000
MID = 4  # the intermediate scale

# The heavy tier: every query here is DESIGNED linear-or-better in
# corpus size (banded LSH self-joins, shingle-keyed joins, bucket- or
# graph-pruned search, single-pass curation). semantic_dedup runs as
# the operator with cluster count scaled to hold ~125 docs/cluster —
# the SemDeDup recipe's own linearity condition (the registry's
# 16-cluster setting is an oracle FIXTURE pinned for the SQL twin,
# saturated at both of these scales).
HEAVY = [
    "dedup_exact",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "near_dup_clusters",
    "span_dedup",
    "ngram_jaccard_neighbors",
    "embedding_near_duplicates_lsh",
    "corpus_curation",
    "bm25_topk",
    "bm25_topk_indexed",
    "decontamination_bloom",
    "flagship_topk",
    "ann_signlsh_topk_indexed",
    "ann_hnsw_vendored_indexed",
    "ann_hnsw_vendored_lifecycle",
    # traindata spine (r10 verdict #5): token-weighted selection and
    # packing carry the same 100 TB claims as the dedup spine
    "sequence_packing",
    "dsir_select",
    "token_budget_select",
    # hybrid/rerank spine (r11 verdict #7): multi-arm retrieval +
    # fusion/rerank carry a "Q·depth per arm, corpus-scale-free
    # fusion" cost claim — measured here instead of asserted. The
    # arms themselves (BM25/TF-IDF posting joins, exact scan) are
    # corpus-linear; the fusion/rerank tail must NOT grow with the
    # corpus beyond the arms' candidate generation.
    "hybrid_rrf3_topk",
    "rerank_cross_encoder",
    "late_interaction_topk",
]


def build_replica(spark, base: str, out: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    from inside_vectordb_spark import io as eio

    os.makedirs(out, exist_ok=True)
    docs = eio.load_table(spark, base, "documents")
    emb = eio.load_table(spark, base, "embeddings")
    doc_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    vec_stride = emb.agg(F.max("vec_id")).first()[0] + 1

    d_parts = []
    e_parts = []
    for r in range(replicas):
        if r == 0:
            d_parts.append(docs)
            e_parts.append(emb)
            continue
        salt = F.lit(f"~r{r}")
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * doc_stride)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_remove(
                            F.split(F.col("text"), r"[ \t\n\f\r]+"), ""
                        ),
                        lambda t: F.concat(t, salt),
                    ),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * vec_stride)).alias("vec_id"),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        * F.when(
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i, F.lit(r)), 2
                            )
                            == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    d_all, e_all = d_parts[0], e_parts[0]
    for p in d_parts[1:]:
        d_all = d_all.unionByName(p)
    for p in e_parts[1:]:
        e_all = e_all.unionByName(p)
    d_all.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e_all.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    for t in eio.TABLES:
        if t in ("documents", "embeddings"):
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base, f"{t}.parquet"), link)
    with open(os.path.join(out, "_replica_meta.json"), "w") as f:
        json.dump({"base": base, "replicas": replicas}, f)


def _semdedup_soak(spark, sf_dir: str):
    """The production-path SemDeDup (cluster count ∝ corpus) as a
    soak subject — ~125 docs/cluster at every scale."""
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.semdedup import semantic_dedup_dropped

    emb = eio.load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    return semantic_dedup_dropped(
        emb, threshold=0.35, n_clusters=max(16, math.ceil(n / 125))
    )


def _hnsw_filtered_grouped_soak(spark, sf_dir: str):
    """The r12 grouped per-query-equality filter search on the stored
    graph (similarity_join's predicated hnsw route). The 100 TB claim
    under measurement: ONE graph scan per partition with the id→value
    mapping broadcast alongside — so rows_read tracks the graph
    (linear in corpus) and shuffle stays the Q·k partial merge (flat),
    with NO per-value fan-out term. Reuses the vendored-index artifact
    the ann_hnsw_vendored_indexed subject builds at each scale."""
    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark import io as eio
    from inside_vectordb_spark.operators.hnsw_index import (
        ann_hnsw_topk_indexed,
        ensure_hnsw_index,
    )
    from pyspark.sql import functions as F

    c = eio.load_table(spark, sf_dir, "embeddings")
    art = mio.art_path("hnsw_vendored", sf_dir)
    ensure_hnsw_index(
        c, art, dim=64, m=16, ef_construction=100, n_parts=4, seed=42
    )
    return ann_hnsw_topk_indexed(
        spark,
        eio.query_vectors(spark, sf_dir),
        art,
        k=10,
        ef_search=128,
        query_filter_col="label",
        corpus_filter_df=c.select("vec_id", "label"),
    )


def _dedup_stream_soak(spark, sf_dir: str) -> dict:
    """Streaming exact dedup (r10 verdict #5) with STATE observability:
    the memory-sink drain hides per-batch work from plan counters, so
    this subject reads the query-progress stream instead and maps it
    onto the bounded counter keys — rows_read = total input rows
    across micro-batches, shuffle_records = peak dropDuplicates
    state-store rows, shuffle_bytes = peak state memory. Linear state
    growth IS the 100 TB claim for this operator."""
    from inside_vectordb_spark.streaming import (
        distinct_content_stream,
        read_table_stream,
        run_to_memory,
    )

    prog: list[dict] = []
    run_to_memory(
        distinct_content_stream(read_table_stream(spark, sf_dir, "documents")),
        output_mode="append",
        progress=prog,
    )
    rows_in = sum(int(p.get("numInputRows", 0)) for p in prog)
    state_rows = state_bytes = 0
    for p in prog:
        for so in p.get("stateOperators") or []:
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
            state_bytes = max(state_bytes, int(so.get("memoryUsedBytes", 0)))
    return {
        "rows_read": rows_in,
        "shuffle_records": state_rows,
        "shuffle_bytes": state_bytes,
        "exchanges": 0,
        "scans": 0,
        "progress_batches": len(prog),
    }


def measure(spark, sf_dir: str) -> dict:
    from inside_vectordb_spark.plans.audit import work_counters
    from inside_vectordb_spark.registry import QUERIES

    out = {}
    subjects = {name: QUERIES[name] for name in HEAVY}
    subjects["semantic_dedup_scaled"] = _semdedup_soak
    subjects["hnsw_filtered_grouped"] = _hnsw_filtered_grouped_soak
    subjects["dedup_exact_stream_state"] = _dedup_stream_soak
    for name, fn in subjects.items():
        t0 = time.perf_counter()
        res = fn(spark, sf_dir)
        # a subject may return ready-made counters (streaming state
        # metrics) instead of a DataFrame for the plan auditor
        w = res if isinstance(res, dict) else work_counters(res)
        w["wall_sec"] = round(time.perf_counter() - t0, 3)
        out[name] = w
        print(f"[soak] {sf_dir} {name}: {w}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="counters_scale.json")
    args = ap.parse_args()

    from inside_vectordb_spark import _meta_io as mio
    from inside_vectordb_spark.session import get_spark

    spark = get_spark(app_name="scale-soak")
    base_name = os.path.basename(args.base.rstrip("/"))
    scales = [1, MID, args.replicas]
    dirs = {1: args.base}
    for r in scales[1:]:
        rep_dir = os.path.join(
            mio.artifacts_root(), "scale", f"x{r}_{base_name}"
        )
        if not os.path.exists(os.path.join(rep_dir, "_replica_meta.json")):
            print(f"[soak] building {r}x replica at {rep_dir}", file=sys.stderr)
            build_replica(spark, args.base, rep_dir, r)
        dirs[r] = rep_dir

    measured = {r: measure(spark, dirs[r]) for r in scales}
    result = {
        "base": args.base,
        "scales": scales,
        "max_exponent": MAX_EXPONENT,
        "bounded_counters": list(BOUNDED),
        "abs_floor": ABS_FLOOR,
        "queries": {},
    }
    pairs = list(zip(scales, scales[1:]))  # (1, MID), (MID, R)
    all_ok = True
    for name in measured[1]:
        exponents = {}
        ok = True
        for c in BOUNDED:
            vals = {r: measured[r][name].get(c, 0) for r in scales}
            es = []
            for lo, hi in pairs:
                if vals[lo] and vals[hi]:
                    es.append(
                        math.log(vals[hi] / vals[lo]) / math.log(hi / lo)
                    )
            # min over the pairs: a one-time plan-shape step (e.g.
            # broadcast→shuffle join) contaminates at most one pair;
            # a real superlinear stage is superlinear on both
            e = round(min(es), 3) if es else None
            exponents[c] = e
            if (
                vals[scales[-1]] >= ABS_FLOOR
                and e is not None
                and e > MAX_EXPONENT
            ):
                ok = False
        result["queries"][name] = {
            "counters": {str(r): measured[r][name] for r in scales},
            "exponents": exponents,
            "ok": ok,
        }
        all_ok &= ok
        print(f"[soak] {name}: exponents {exponents} ok={ok}", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"soak_ok": all_ok, "queries": len(result["queries"])}))
    spark.stop()
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
