"""Scaling-efficiency evidence: same job, same input, N vs 4N cores.

The north rule's two-cluster-size criterion (N -> 4N executors, efficiency
>= 0.8) is evidenced in this sandbox by running bench.py in fresh JVMs at
local[N] and local[4N] on identical input (task directive). Writes/updates
BENCH/BASELINE.md. Usage:  python tools/scaling_bench.py [N] (default 8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, img_scale: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_IMG_SCALE=img_scale,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    for ln in out.stderr.splitlines():  # per-stage timings, for the record
        if ln.startswith("[bench]"):
            print(f"  cpus={cpus} {ln}", file=sys.stderr)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # IMG_SCALE=8: same footprints at 8x the pixel resolution per axis, so the
    # job is decode-compute-bound (the tiny sf0.1 thumbnails finish in ~7
    # single-core seconds — any core count looks identical on that)
    img_scale = os.environ.get("SPARK_GRAFT_IMG_SCALE", "8")
    # run 4N FIRST: it materializes the (scaled) images table with all cores;
    # the N run then reads the identical cached layout
    hi = run(4 * n, sf_dir, img_scale)
    lo = run(n, sf_dir, img_scale)
    t_lo, t_hi = lo["value"], hi["value"]
    ips_lo, ips_hi = lo["images_per_sec"], hi["images_per_sec"]
    eff = round((ips_hi / ips_lo) / 4.0, 3)

    lines = [
        "# BENCH — measured numbers (this engine)",
        "",
        f"Input: materialized images table from `{sf_dir}` "
        f"({lo['n_images']} images at IMG_SCALE={img_scale} — same footprints, "
        f"{img_scale}x pixel resolution per axis), identical for both runs.",
        "",
        "## Scaling efficiency (north rule: >= 0.8 from N to 4N)",
        "",
        "| cores | pipeline sec | images/sec |",
        "|---|---|---|",
        f"| local[{n}] (N) | {t_lo} | {ips_lo} |",
        f"| local[{4 * n}] (4N) | {t_hi} | {ips_hi} |",
        "",
        f"**Scaling efficiency = (ips_4N / ips_N) / 4 = {eff}**",
        "",
        "## Per-operator seconds at 4N",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for q, s in hi["queries"].items():
        lines.append(f"| {q} | {s} |")
    lines += [
        "",
        "Pipeline = scan materialized images parquet -> decode-meta Arrow UDF ->",
        "chunk/tile explode -> footprint cell cover -> broadcast join with points",
        "-> per-cell aggregate. Synthesis time excluded "
        f"(one-time, {hi['synth_sec_excluded']}s when cold).",
        "",
        f"Raw: N={json.dumps(lo)}",
        f"Raw: 4N={json.dumps(hi)}",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n": n, "eff": eff, "ips_lo": ips_lo, "ips_hi": ips_hi}))


if __name__ == "__main__":
    main()
