#!/bin/bash
# spark-submit CDC-consumer probe (kill + resume + compaction guard) — see
# tools/submit_cdc.py for the scenario; ships aira_spark as a --py-files zip.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/cdc_out}"
MASTER="${SPARK_MASTER:-local[8]}"
cd "$REPO"
rm -f /tmp/aira_spark.zip
python - <<'PY'
import zipfile, os
with zipfile.ZipFile("/tmp/aira_spark.zip", "w") as z:
    for root, _, files in os.walk("aira_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
PY
exec /opt/spark/bin/spark-submit --master "$MASTER" \
    --conf spark.sql.shuffle.partitions=16 \
    --conf spark.sql.adaptive.enabled=true \
    --py-files /tmp/aira_spark.zip \
    tools/submit_cdc.py "$SF_DIR" "$OUT"
