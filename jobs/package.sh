#!/bin/sh
# Build the --py-files artifact for spark-submit.
#   sh jobs/package.sh  ->  dist/qwery_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/qwery_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/qwery_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('qwery_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote dist/qwery_spark.zip')
"
