"""Same-box frozen-code A/B for flagged bench keys — the committed
adjudication protocol (SCALING.md: driver bench seconds are NOT
cross-round comparable; code A/B before calling any delta a
regression).

Usage:
    python tools/adjudicate_flagged.py <git-rev> q_key1 [q_key2 ...]
    python tools/adjudicate_flagged.py <git-rev> --cdc

Creates a worktree at <git-rev>, times the given registry keys (3 runs
each, noop-forced) in a fresh solo Spark session per tree — OLD tree
first, then the working tree — and prints both sample sets side by
side.  ``--cdc`` instead times the three engine-path entries via
bench._bench_cdc.  Run SOLO (no concurrent Spark/pytest on the box);
for a suspect where session position matters, re-run with the trees
in the opposite order (pass ``--reverse``) before concluding.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
root = sys.argv[1]
keys = json.loads(sys.argv[2])
cdc = sys.argv[3] == "1"
sys.path.insert(0, root)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
from ydb_cdc_processor_spark.session import get_spark
spark = get_spark("adjudicate-ab")
spark.sparkContext.setLogLevel("ERROR")
from ydb_cdc_processor_spark.registry import QUERIES
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def force(df): df.write.format("noop").mode("overwrite").save()
QUERIES["q_project_retype"](spark, SF).limit(10).count()  # warm-up
out = {}
for k in keys:
    samples = []
    for _ in range(3):
        t0 = time.perf_counter(); force(QUERIES[k](spark, SF))
        samples.append(round(time.perf_counter() - t0, 3))
    out[k] = samples
if cdc:
    import importlib
    bench = importlib.import_module("bench")
    bench.SF_DIR = SF
    t = {}
    bench._bench_cdc(spark, t)
    out.update({k: bench.SAMPLES.get(k, [v]) for k, v in t.items()})
print("RESULT " + json.dumps(out))
"""


def _run_tree(root: str, keys: list[str], cdc: bool) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py",
                                     delete=False) as fh:
        fh.write(_WORKER)
        script = fh.name
    try:
        env = dict(os.environ, PYTHONPATH=root)
        out = subprocess.run(
            [sys.executable, script, root, json.dumps(keys),
             "1" if cdc else "0"],
            capture_output=True, text=True, env=env, cwd="/tmp",
            timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise SystemExit(f"{root}: no RESULT line\n{out.stderr[-2000:]}")
    finally:
        os.unlink(script)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if not args:
        raise SystemExit(__doc__)
    rev = args.pop(0)
    cdc = "--cdc" in args
    reverse = "--reverse" in args
    keys = [a for a in args if not a.startswith("--")]
    wt = tempfile.mkdtemp(prefix="abtree_")
    os.rmdir(wt)
    subprocess.run(["git", "-C", ROOT, "worktree", "add", wt, rev],
                   check=True, capture_output=True)
    try:
        trees = [("old:" + rev, wt), ("new:worktree", ROOT)]
        if reverse:
            trees.reverse()
        results = {}
        for tag, root in trees:
            print(f"-- timing {tag} ({root}) ...", flush=True)
            results[tag] = _run_tree(root, keys, cdc)
        tags = [t for t, _ in trees]
        all_keys = sorted(set().union(*(results[t] for t in tags)))
        print(f"\n{'key':32s} " + "  ".join(f"{t:>28s}" for t in tags)
              + "   best-ratio(new/old)")
        for k in all_keys:
            vals = {t: results[t].get(k) for t in tags}
            olds = results.get("old:" + rev, {}).get(k)
            news = results.get("new:worktree", {}).get(k)
            ratio = (f"{min(news) / min(olds):.2f}x"
                     if olds and news and min(olds) else "-")
            print(f"{k:32s} "
                  + "  ".join(f"{str(vals[t]):>28s}" for t in tags)
                  + f"   {ratio}")
    finally:
        subprocess.run(["git", "-C", ROOT, "worktree", "remove",
                        "--force", wt], capture_output=True)


if __name__ == "__main__":
    main()
