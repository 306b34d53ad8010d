#!/bin/bash
# spark-submit --py-files evidence run (north rule). The aira_spark package
# ships as a zip to executors exactly as it would on a real cluster.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/submit_out}"
MASTER="${SPARK_MASTER:-local[8]}"
cd "$REPO"
rm -f /tmp/aira_spark.zip
python - <<'PY'
import shutil, zipfile, os
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
    tools/submit_pipeline.py "$SF_DIR" "$OUT"
