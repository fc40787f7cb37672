"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, evidenced as local[8] vs local[32]
on identical input).

Runs bench.py at both levels via subprocess (fresh JVM each, so parallelism
is honest), computes efficiency = (thr_4N / thr_N) / 4 on the encode stage,
and appends the results table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench at local[{cpus}] produced no JSON:\n{out.stderr[-3000:]}")


def main() -> None:
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "60000"))
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n4 = 4 * n
    r_n = run(n, rows)
    r_n4 = run(n4, rows)
    thr_n = r_n["extras"]["encode_tokens_per_sec"]
    thr_n4 = r_n4["extras"]["encode_tokens_per_sec"]
    eff = thr_n4 / thr_n / (n4 / n)
    dec_eff = (
        r_n4["extras"]["decode_tokens_per_sec"]
        / r_n["extras"]["decode_tokens_per_sec"]
        / (n4 / n)
    )
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        "",
        f"## Scaling run {stamp} (identical input: {r_n['extras']['n_tokens']:,} tokens)",
        "",
        "| parallelism | encode tokens/s | decode tokens/s | bytes/token |",
        "| --- | --- | --- | --- |",
        f"| local[{n}] (N) | {thr_n:,.0f} | {r_n['extras']['decode_tokens_per_sec']:,.0f} | {r_n['extras']['bytes_per_token']} |",
        f"| local[{n4}] (4N) | {thr_n4:,.0f} | {r_n4['extras']['decode_tokens_per_sec']:,.0f} | {r_n4['extras']['bytes_per_token']} |",
        "",
        f"**Encode scaling efficiency N->4N: {eff:.3f}** (target >= 0.8); decode: {dec_eff:.3f}",
        "",
    ]
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write("\n".join(lines))
    print(json.dumps({"eff_encode": round(eff, 3), "eff_decode": round(dec_eff, 3),
                      "thr_n": thr_n, "thr_4n": thr_n4}))


if __name__ == "__main__":
    main()
