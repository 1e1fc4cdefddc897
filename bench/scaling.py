"""Scaling-efficiency evidence (BASELINE.json north rule; BASELINE.md
protocol): run the IDENTICAL index-build job on the IDENTICAL
deterministic synthetic input at two parallelism levels (local[8] vs
local[32]) in separate JVMs, report docs/sec at both plus
efficiency = (throughput_32 / throughput_8) / 4, and write
BENCH/BASELINE.md. Pass iff efficiency ≥ 0.8.

Usage: python bench/scaling.py [n_pages]     (default sized so the
8-core run is ≥ 60 s; adjust upward on faster machines)

Implementation notes: each measurement is a fresh `spark-submit`-style
subprocess (fresh JVM — no warm-cache bleed between levels); the input
corpus is generated once to parquet and read by both runs; the
measured wall is the build job only (session startup excluded).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from aarhus_spark.session import get_spark
from aarhus_spark.operators.build import build_index
from aarhus_spark.sources.io import read_pages

cores = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
spark = get_spark("scaling", master=f"local[{{cores}}]",
                  shuffle_partitions=max(2 * cores, 8))
spark.sparkContext.setLogLevel("ERROR")
pages = read_pages(spark, src)
t0 = time.time()
stats = build_index(spark, pages, out, n_partitions=2 * cores, n_buckets=2 * cores)
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall_s": wall, "n_docs": stats["N"],
                   "docs_per_sec": stats["N"] / wall}}))
spark.stop()
"""


def run_level(cores: int, src: str, workdir: str) -> dict:
    out = os.path.join(workdir, f"idx_{cores}")
    code = RUNNER.format(repo=REPO)
    res = subprocess.run(
        [sys.executable, "-c", code, str(cores), src, out],
        capture_output=True, text=True, timeout=3600,
    )
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-3000:])
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    workdir = tempfile.mkdtemp(prefix="aarhus_scaling_")

    # deterministic synthetic input, generated once, read by both runs
    gen = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r);\n"
            "from aarhus_spark.session import get_spark\n"
            "from aarhus_spark.sources.fixtures import gen_pages\n"
            "import sys as s\n"
            "spark = get_spark('gen', master='local[16]')\n"
            "spark.createDataFrame(gen_pages(%d)).repartition(32)"
            ".write.mode('overwrite').parquet(%r)\n"
            "spark.stop()" % (REPO, n_pages, os.path.join(workdir, "pages"))
        )], capture_output=True, text=True, timeout=3600)
    if gen.returncode != 0:
        raise RuntimeError(gen.stderr[-3000:])
    src = os.path.join(workdir, "pages")

    r8 = run_level(8, src, workdir)
    r32 = run_level(32, src, workdir)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {"n_pages": n_pages, "local8": r8, "local32": r32,
              "scaling_efficiency": round(eff, 4), "pass": eff >= 0.8}
    print(json.dumps(result, indent=1))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Protocol: BASELINE.md (identical build job, identical seed-42 input of
{n_pages} synthetic pages, two parallelism levels, fresh JVM each).

| level | wall_s | docs | docs/sec |
| --- | --- | --- | --- |
| local[8]  | {r8['wall_s']:.1f} | {r8['n_docs']} | {r8['docs_per_sec']:.1f} |
| local[32] | {r32['wall_s']:.1f} | {r32['n_docs']} | {r32['docs_per_sec']:.1f} |

**scaling efficiency (N→4N cores) = (t32/t8)/4 = {eff:.3f}** —
{"PASS (≥ 0.8)" if eff >= 0.8 else "FAIL (< 0.8)"} per BASELINE.json.

Per-stage metrics (tokens/sec, postings/bucket, wall) are in each
index's `metrics.jsonl` / `manifests/` (S5/S6 sinks).
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
