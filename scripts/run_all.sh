#!/bin/sh
# Train all four shipped experiments sequentially (reference run.sh:1-5).
set -e
cd "$(dirname "$0")/.."
for cfg in jspsr_r8_img jspsr_r8_img_msk jspsr_r3_img jspsr_r3_img_msk; do
    python -m jspsr_tpu.cli.main --config "configs/${cfg}.yml" "$@"
done
