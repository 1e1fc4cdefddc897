#!/bin/sh
# Package the engine for spark-submit --py-files (BASELINE.json:6).
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip aarhus_spark -x '*__pycache__*'
echo "wrote $(pwd)/engine.zip"
