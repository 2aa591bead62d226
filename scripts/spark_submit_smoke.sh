#!/usr/bin/env bash
# spark-submit --py-files packaging smoke (BASELINE.json north rule:
# "runs via spark-submit --py-files").  Zips the package, moves to a
# CLEAN scratch dir (no repo on sys.path anywhere), submits the smoke
# job, and checks the PASS marker.  Exit 0 = green.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/fps_submit_XXXX)"
trap 'rm -rf "$WORK"' EXIT

# package zip: import root must be the package dir itself
(cd "$REPO" && python - "$WORK/fastparquet_spark.zip" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("fastparquet_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("zipped", out)
EOF
)
cp "$REPO/scripts/spark_submit_smoke.py" "$WORK/"

cd "$WORK"   # clean cwd: fastparquet_spark is importable ONLY via the zip
OUTPUT=$("${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
    --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=8 \
    --py-files fastparquet_spark.zip \
    spark_submit_smoke.py "$WORK/out" 2>&1) || {
        echo "$OUTPUT" | tail -40; exit 1; }
echo "$OUTPUT" | grep "SMOKE-PASS" || { echo "$OUTPUT" | tail -40; exit 1; }
