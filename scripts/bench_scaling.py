"""Scaling-efficiency evidence (north rule: throughput efficiency ≥ 0.8 from
N to 4N executors; sandbox proxy = local[8] vs local[32]).

Packages ie_spark as a zip, launches scripts/kg_job.py twice via
``spark-submit --py-files`` at the two parallelism levels on identical
input, and writes the throughputs + efficiency to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "ie_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "ie_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_level(cores: int, zpath: str, tmp: str, convs: int) -> dict:
    out = os.path.join(tmp, f"kg{cores}.json")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    cmd = [spark_submit, "--master", f"local[{cores}]",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zpath,
           os.path.join(REPO, "scripts", "kg_job.py"),
           "--convs", str(convs), "--out", out]
    subprocess.run(cmd, check=True, capture_output=True, text=True,
                   cwd=REPO, timeout=1200)
    with open(out) as f:
        return json.loads(f.read())


def main() -> None:
    convs = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "2500"))
    levels = (8, 32)
    with tempfile.TemporaryDirectory() as tmp:
        zpath = make_zip(tmp)
        r_lo = run_level(levels[0], zpath, tmp, convs)
        r_hi = run_level(levels[1], zpath, tmp, convs)
    ratio = r_hi["turns_per_sec"] / r_lo["turns_per_sec"]
    eff = ratio / (levels[1] / levels[0])
    md = f"""# BENCH_SCALING — KG extraction throughput, N vs 4N parallelism

Same job (`scripts/kg_job.py`, deterministic synthetic transcript corpus of
{r_lo['turns']} turns), launched with `spark-submit --py-files ie_spark.zip`
at two parallelism levels on identical input (sandbox proxy for N vs 4N
executors — the extraction stage has no shuffle, so the proxy is faithful):

| master | turns | wall (s) | turns/sec |
|---|---|---|---|
| local[{levels[0]}] | {r_lo['turns']} | {r_lo['sec']} | {r_lo['turns_per_sec']} |
| local[{levels[1]}] | {r_hi['turns']} | {r_hi['sec']} | {r_hi['turns_per_sec']} |

speedup {levels[0]}→{levels[1]} cores: **{ratio:.2f}×** over a 4× core
increase → scaling efficiency **{eff:.2f}** (target ≥ 0.8).
"""
    out_path = os.path.join(REPO, "BENCH_SCALING.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"lo": r_lo, "hi": r_hi,
                      "speedup": round(ratio, 3),
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
