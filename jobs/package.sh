#!/bin/sh
# Package prec_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/prec_spark.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/prec_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("prec_spark/**/*.py")):
        z.write(p, p.as_posix())
print("dist/prec_spark.zip written")
PY
