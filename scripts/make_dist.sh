#!/bin/sh
# Package kgx for spark-submit --py-files. Usage: sh scripts/make_dist.sh [out.zip]
set -e
cd "$(dirname "$0")/.."
out="${1:-dist/kgx.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
python - "$out" <<'PY'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("kgx"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(f"wrote {out}")
PY
