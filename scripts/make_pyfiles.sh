#!/usr/bin/env bash
# Package geedim_spark for spark-submit --py-files distribution.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/geedim_spark.zip
python - << 'EOF'
import zipfile, pathlib
root = pathlib.Path("geedim_spark")
with zipfile.ZipFile("dist/geedim_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("dist/geedim_spark.zip written")
EOF
