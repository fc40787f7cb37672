"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, evidenced at two local parallelism
levels on identical input).

This sandbox's vCPUs are noisy (observed 2-4x run-to-run variance from
neighbor load — see BENCH/BASELINE.md analysis), so the harness runs the two
levels INTERLEAVED for ``SPARK_GRAFT_SCALE_REPEATS`` rounds and scores each
level by its best observed throughput — the standard counter to time-varying
noise. Efficiency = (best_thr_4N / best_thr_N) / 4 on the encode stage.

Env: SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_BENCH_ROWS,
SPARK_GRAFT_SCALE_REPEATS (default 3). Appends results to BENCH/BASELINE.md.
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
    env["SPARK_GRAFT_BENCH_QUERIES"] = "0"  # scaling measures encode/decode only
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") != "0":
        # Pin the WHOLE process tree (JVM included) to `cpus` CPUs: local[N]
        # alone caps task slots but leaves shuffle/Tungsten/GC threads
        # unrestricted, which inflates the N baseline (see the note in
        # BENCH/BASELINE.md). Pinning models executors honestly: the 4N
        # config really gets 4x the hardware of the N config.
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    out = subprocess.run(
        cmd,
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
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    n4 = 4 * n

    runs: dict[int, list[dict]] = {n: [], n4: []}
    for r in range(repeats):
        for lvl in (n, n4):
            res = run(lvl, rows)
            runs[lvl].append(res)
            print(
                f"round {r + 1} local[{lvl}]: "
                f"enc {res['extras']['encode_tokens_per_sec']:,.0f} tok/s "
                f"dec {res['extras']['decode_tokens_per_sec']:,.0f} tok/s",
                file=sys.stderr,
            )

    def best(lvl: int, key: str) -> float:
        return max(r["extras"][key] for r in runs[lvl])

    thr_n = best(n, "encode_tokens_per_sec")
    thr_n4 = best(n4, "encode_tokens_per_sec")
    dec_n = best(n, "decode_tokens_per_sec")
    dec_n4 = best(n4, "decode_tokens_per_sec")
    eff = thr_n4 / thr_n / (n4 / n)
    dec_eff = dec_n4 / dec_n / (n4 / n)
    ntok = runs[n][0]["extras"]["n_tokens"]
    bpt = runs[n][0]["extras"]["bytes_per_token"]

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    pinned = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") != "0"
    pin_note = (
        "taskset-pinned: each level's WHOLE process tree gets exactly its CPU count"
        if pinned
        else "unpinned local[N]"
    )
    lines = [
        "",
        f"## Scaling run {stamp} (identical input: {ntok:,} tokens; "
        f"best of {repeats} interleaved rounds per level; {pin_note})",
        "",
        "| parallelism | encode tokens/s | decode tokens/s | bytes/token |",
        "| --- | --- | --- | --- |",
        f"| local[{n}] (N) | {thr_n:,.0f} | {dec_n:,.0f} | {bpt} |",
        f"| local[{n4}] (4N) | {thr_n4:,.0f} | {dec_n4:,.0f} | {bpt} |",
        "",
        f"**Encode scaling efficiency N->4N: {eff:.3f}** (target >= 0.8); decode: {dec_eff:.3f}",
        "",
    ]
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write("\n".join(lines))
    print(
        json.dumps(
            {
                "eff_encode": round(eff, 3),
                "eff_decode": round(dec_eff, 3),
                "thr_n": thr_n,
                "thr_4n": thr_n4,
                "all_runs": {
                    str(k): [r["extras"]["encode_tokens_per_sec"] for r in v]
                    for k, v in runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
