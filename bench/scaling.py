"""Scaling-efficiency evidence (BASELINE.json north rule; BASELINE.md
protocol): run the IDENTICAL index-build job on the IDENTICAL
deterministic synthetic input at several parallelism levels — each in
its own fresh JVM — and write the FULL multi-level curve (walls,
docs/sec, per-doubling and N→4N efficiencies, per-stage walls) to
BENCH/BASELINE.md in one shot. Pass iff N→4N efficiency ≥ 0.8.

Usage: python bench/scaling.py [n_pages] [level ...]
  defaults: 120000 pages, levels 2 4 8 16.
After the build levels, the LARGEST level's JVM also times the three
query paths (TAAT / single-group WAND / chunk-parallel WAND, 50
queries) against its built index — the at-scale query-path comparison
the chunk-parallel low-side range pruning is for.

Measurement notes (documented in BENCH/BASELINE.md):
- Each level runs in a fresh JVM; the FIRST build in each JVM is an
  unmeasured warmup, the second (fresh output dir, same input) is the
  measured run. This sandbox is a Firecracker microVM where first-touch
  page faults are ~100x normal cost and serialize VM-wide (measured in
  round 1) — warmup measures steady-state engine throughput instead of
  the hypervisor's page-fault path. Both levels get identical treatment.
- N=4 vs 4N=16 because the box exposes 32 vCPUs with ~29 effective
  cores (measured): 8→32 cannot exceed ~0.9 efficiency by hardware,
  while 4→16 leaves headroom to attribute the result to the engine.
- The input is sized so the N-core measured run is ≥ 60 s (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from aarhus_spark.session import get_spark
from aarhus_spark.operators.build import build_index
from aarhus_spark.sources.io import read_pages

cores = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
bench_queries = len(sys.argv) > 4 and sys.argv[4] == "queries"
spark = get_spark("scaling", master=f"local[{{cores}}]",
                  shuffle_partitions=4 * cores,
                  extra={{"spark.local.dir": "/dev/shm/aarhus_shuffle"}})
spark.sparkContext.setLogLevel("ERROR")
pages = read_pages(spark, src)

# warmup build (unmeasured): faults in JVM heap, python worker arenas,
# page cache — identical treatment at both levels
shutil.rmtree(out + "_warm", ignore_errors=True)
build_index(spark, pages, out + "_warm", n_partitions=4 * cores, n_buckets=4 * cores)
shutil.rmtree(out + "_warm", ignore_errors=True)

# best of 3 measured builds: VM noise (serialized page faults, shared
# disk) is strictly one-sided — it only ever slows a run down
walls = []
for rep in range(3):
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    stats = build_index(spark, pages, out, n_partitions=4 * cores, n_buckets=4 * cores)
    walls.append(time.time() - t0)
wall = min(walls)
# per-stage walls of the LAST measured build (metrics.jsonl holds only
# that build: the output dir is recreated per rep) — quantifies the
# fixed-stage share of the residual scaling slope
stages = {{}}
with open(os.path.join(out, "metrics.jsonl")) as f:
    for line in f:
        m = json.loads(line)
        stages[m["stage"]] = round(m["wall_s"], 2)
result = {{"cores": cores, "wall_s": wall, "walls": walls,
           "n_docs": stats["N"], "docs_per_sec": stats["N"] / wall,
           "stage_walls_last_rep": stages}}
if bench_queries:
    from aarhus_spark.operators.search import (search_taat, search_wand,
                                               search_wand_ranges, search_topk)
    from aarhus_spark.sources.fixtures import gen_queries
    import pandas as pd
    qdf = spark.createDataFrame(gen_queries(pd.DataFrame()))
    qb = {{}}
    for name, fn in [
        ("search_taat_50q", lambda: search_taat(spark, out, qdf).count()),
        ("search_wand_50q", lambda: search_wand(spark, out, qdf).count()),
        ("search_wand_ranges_50q",
         lambda: search_wand_ranges(spark, out, qdf, n_ranges=8).count()),
        ("search_topk_auto_50q", lambda: search_topk(spark, out, qdf).count()),
    ]:
        best = None
        for rep in range(3):             # warmup is rep 0; best-of-3
            t0 = time.time()
            fn()
            w = time.time() - t0
            best = w if best is None or w < best else best
        qb[name] = round(best, 3)
    result["query_bench"] = qb
print(json.dumps(result))
spark.stop()
"""


def run_level(cores: int, src: str, workdir: str, bench_queries: bool = False) -> dict:
    out = os.path.join(workdir, f"idx_{cores}")
    code = RUNNER.format(repo=REPO)
    # 20g: the fragment-stage sort must fit task execution memory (no
    # spill); malloc pinning: python workers never return arena pages to
    # the kernel, so after warmup no first-touch faults remain (this
    # sandbox serializes faults VM-wide — DESIGN.md §6); both applied
    # identically at both levels.
    env = {**os.environ,
           "AARHUS_DRIVER_MEM": "20g",
           "AARHUS_ARROW_BATCH": "65536",   # fewer Arrow batches = fewer
           # allocation bursts through the serialized fault path
           "MALLOC_TRIM_THRESHOLD_": "-1",
           "MALLOC_MMAP_THRESHOLD_": "1073741824",
           "MALLOC_TOP_PAD_": "134217728"}
    argv = [sys.executable, "-c", code, str(cores), src, out]
    if bench_queries:
        argv.append("queries")
    res = subprocess.run(argv, capture_output=True, text=True,
                         timeout=7200, env=env)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-3000:])
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    levels = [int(a) for a in sys.argv[2:]] or [2, 4, 8, 16]
    workdir = tempfile.mkdtemp(prefix="aarhus_scaling_")
    # AARHUS_SCALING_SRC: reuse an already-generated pages dir (the
    # generator is deterministic for a given n_pages, so this is a pure
    # resume seam after an interrupted run — it changes no measurement)
    src_env = os.environ.get("AARHUS_SCALING_SRC")
    if src_env and os.path.exists(os.path.join(src_env, "_SUCCESS")):
        src = src_env
    else:
        src = os.path.join(workdir, "pages")
        # deterministic synthetic input via the distributed generator
        gen = subprocess.run(
            [sys.executable, "-c", (
                "import sys; sys.path.insert(0, %r)\n"
                "from aarhus_spark.session import get_spark\n"
                "from aarhus_spark.sources.fixtures import gen_pages_spark\n"
                "spark = get_spark('gen', master='local[24]')\n"
                "spark.sparkContext.setLogLevel('ERROR')\n"
                "gen_pages_spark(spark, %d, partitions=64)"
                ".write.mode('overwrite').parquet(%r)\n"
                "spark.stop()" % (REPO, n_pages, src)
            )], capture_output=True, text=True, timeout=3600)
        if gen.returncode != 0:
            raise RuntimeError(gen.stderr[-3000:])

    # AARHUS_SCALING_SKIP_QUERIES=1: builds-only run (the gate metric
    # is the BUILD efficiency; the query bench at the largest level is
    # the informational extra and costs ~an hour at 1M docs)
    skip_q = os.environ.get("AARHUS_SCALING_SKIP_QUERIES") == "1"
    results: dict[int, dict] = {}
    for i, lv in enumerate(levels):
        # query-path bench piggybacks on the LARGEST level's built index
        results[lv] = run_level(lv, src, workdir,
                                bench_queries=(lv == max(levels)
                                               and not skip_q))
        print(json.dumps({f"local{lv}": results[lv]}), flush=True)

    # per-doubling + N→4N efficiencies over the measured curve
    doublings = [(a, b) for a, b in zip(levels, levels[1:]) if b == 2 * a]
    quads = [(a, b) for a in levels for b in levels if b == 4 * a]
    eff4 = {f"{a}->{b}": round(
        (results[b]["docs_per_sec"] / results[a]["docs_per_sec"]) / 4.0, 4)
        for a, b in quads}
    # the gate is CONSERVATIVE: every measured N→4N pair must clear 0.8
    # (min, not the most favorable pair — cherry-picking the best pair
    # would overstate the evidence; both extremes are reported)
    headline = min(eff4.values()) if eff4 else None
    best4 = max(eff4.values()) if eff4 else None
    result = {"n_pages": n_pages,
              "levels": {lv: results[lv] for lv in levels},
              "efficiency_n_to_4n": eff4,
              "min_eff_4x": headline, "max_eff_4x": best4,
              "pass": headline is not None and headline >= 0.8}
    print(json.dumps(result, indent=1))

    sys.path.insert(0, REPO)
    from aarhus_spark import __version__ as engine_version
    from aarhus_spark.config import FORMAT_VERSION
    lines = [
        "# BENCH/BASELINE — measured scaling evidence "
        f"(engine {engine_version}, index format v{FORMAT_VERSION})",
        "",
        f"Protocol: BASELINE.md + bench/scaling.py docstring — identical",
        f"build job, identical seed-42 input of {n_pages} synthetic pages",
        f"({results[levels[0]]['n_docs']} docs after dedup), one fresh JVM per",
        "parallelism level, one unmeasured warmup build then BEST OF 3",
        "measured builds per JVM, shuffle dir on tmpfs. This Firecracker",
        "sandbox serializes first-touch page faults VM-wide and its",
        "shared-disk noise is strictly one-sided; warmup + best-of-3 remove",
        "both identically at every level (BENCH/ENVIRONMENT.md has the",
        "measured controls).",
        "",
        "| level | wall_s (best of 3) | docs/sec | per-doubling efficiency |",
        "| --- | --- | --- | --- |",
    ]
    prev = None
    for lv in levels:
        r = results[lv]
        dbl = ""
        if prev is not None and lv == 2 * prev:
            e = (r["docs_per_sec"] / results[prev]["docs_per_sec"]) / 2.0
            dbl = f"{e:.3f} ({prev}→{lv})"
        lines.append(f"| local[{lv}] | {r['wall_s']:.1f} | "
                     f"{r['docs_per_sec']:.0f} | {dbl} |")
        prev = lv
    lines += ["", "| pair (N → 4N) | efficiency = (T_4N/T_N)/4 | vs target |",
              "| --- | --- | --- |"]
    for pair, e in eff4.items():
        verdict = "PASS (≥ 0.8)" if e >= 0.8 else "FAIL (< 0.8)"
        lines.append(f"| {pair.replace('->', ' → ')} | {e:.3f} | {verdict} |")
    lines += ["", "Raw measured walls:"]
    for lv in levels:
        lines.append(f"- local[{lv}]: {results[lv]['walls']}")
    lines += ["", "Per-stage walls (last measured rep per level, seconds):", ""]
    stage_names = list(results[levels[0]].get("stage_walls_last_rep", {}))
    lines.append("| stage | " + " | ".join(f"local[{lv}]" for lv in levels) + " |")
    lines.append("| --- |" + " --- |" * len(levels))
    for sname in stage_names:
        row = [f"{results[lv]['stage_walls_last_rep'].get(sname, '')}" for lv in levels]
        lines.append(f"| {sname} | " + " | ".join(row) + " |")
    qb = results[max(levels)].get("query_bench")
    if qb:
        lines += ["", f"Query paths at the local[{max(levels)}] index "
                      f"({results[max(levels)]['n_docs']} docs, 50 queries, "
                      "best of 3):", ""]
        for k, v in qb.items():
            lines.append(f"- {k}: {v} s")
    lines += ["", "Per-stage metrics (tokens/sec, postings/bucket, wall) are in",
              "each index's `metrics.jsonl` / `manifests/` (S5/S6 sinks).", ""]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
