#!/bin/sh
# One-command on-TPU 3-phase CLI smoke (VERDICT r3 #4): fabricate the tiny
# static-world Replica scene, run the FULL run/segment/eval CLI on the real
# chip, and print the metrics. Exercises donation + bucket regrowth +
# active_rows growth + checkpoint IO on real hardware.
#
# IMPORTANT: do not set PYTHONPATH (the axon TPU plugin does not register
# with it set) and do not run concurrently with another TPU client.
#
#   sh scripts/tpu_cli_smoke.sh [workdir]
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/ovo_tpu_cli_smoke}
mkdir -p "$WORK"
cd "$WORK"
JAX_PLATFORMS=cpu PYTHONPATH="$REPO" python "$REPO/scripts/make_smoke_scene.py" \
    --scene tinyroom2 --root "$WORK/data/input"
DISABLE_WANDB=true python "$REPO/run_eval.py" --dataset_name Replica \
    --scenes tinyroom2 --experiment_name tpu_smoke --run --segment --eval
echo "smoke artifacts under $WORK/data/output/Replica/tpu_smoke/tinyroom2"
