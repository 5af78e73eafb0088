"""A/B a session-conf candidate over a bench subset, interleaved.

Runs tools/bench_subset.py twice per arm (B A B A — conf arm first so
any box-warming bias favors the BASELINE), each arm in a fresh process
(session confs cannot change inside a live JVM), and prints per-key
medians-of-arms plus totals.  The conf goes through the
SPARK_GRAFT_EXTRA_CONF passthrough bench_subset already honors.

Usage:
    python tools/conf_ab.py '{"spark.sql.x":"true"}' --runs 3 name ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_arm(extra: str | None, runs: int, names: list[str]) -> dict:
    env = dict(os.environ)
    if extra:
        env["SPARK_GRAFT_EXTRA_CONF"] = extra
    else:
        env.pop("SPARK_GRAFT_EXTRA_CONF", None)
    out = subprocess.run(
        [sys.executable, "tools/bench_subset.py", "--runs", str(runs),
         *names],
        capture_output=True, text=True, env=env, check=True).stdout
    res = {}
    for line in out.splitlines():
        line = line.strip()
        if line.startswith('{"query"'):
            d = json.loads(line)
            res[d["query"]] = d["sec"]
    return res


def main() -> None:
    conf = sys.argv[1]
    args = sys.argv[2:]
    runs = 1
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args
    # discarded warm-up arm: the FIRST process of a session pays cold
    # page-cache / JIT costs that neither arm should absorb (measured:
    # arm-1 totals run 10-25% above arms 2-4 with identical code)
    warm = run_arm(None, 1, names)
    print(f"# warm-up arm (discarded): total {sum(warm.values()):.1f}s",
          flush=True)
    arms = []          # (label, result)
    for label, extra in (("conf", conf), ("base", None),
                         ("conf", conf), ("base", None)):
        res = run_arm(extra, runs, names)
        arms.append((label, res))
        print(f"# arm {label}: total "
              f"{sum(res.values()):.1f}s  {json.dumps(res)}", flush=True)
    for name in names:
        c = min(r[name] for l, r in arms if l == "conf")
        b = min(r[name] for l, r in arms if l == "base")
        flag = " <<<" if c > 1.15 * b else (" >>>" if b > 1.15 * c else "")
        print(f"{name:36s} conf {c:7.2f}  base {b:7.2f}  "
              f"ratio {c / b:5.2f}{flag}")
    ct = sum(min(r[n] for l, r in arms if l == "conf") for n in names)
    bt = sum(min(r[n] for l, r in arms if l == "base") for n in names)
    print(f"{'TOTAL (best-of-arms)':36s} conf {ct:7.2f}  base {bt:7.2f}  "
          f"ratio {ct / bt:5.2f}")


if __name__ == "__main__":
    main()
