#!/usr/bin/env bash
# Build the --py-files artifact: dist/docrawl_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/docrawl_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/docrawl_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "docrawl_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/docrawl_spark.zip")
EOF
