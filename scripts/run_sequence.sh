#!/usr/bin/env bash
# One-command dataset run + ATE evaluation (the moment real data is mounted,
# the BASELINE.md 5%-ATE gate is this script).
#
#   scripts/run_sequence.sh euroc /data/EuRoC/MH_01_easy [SPEED] [OUT_DIR]
#   scripts/run_sequence.sh tumvi /data/TUM-VI/room1     [SPEED] [OUT_DIR]
#   scripts/run_sequence.sh uma   /data/UMA/seq          [SPEED] [OUT_DIR]
#
# SPEED is the playback realtime factor: 0 = as fast as possible (default,
# throughput benchmarking), 1 = real time, 4 = the paper's 4x experiment.
# Ground truth is auto-discovered from the standard dataset layouts
# (EuRoC: mav0/state_groundtruth_estimate0/data.csv; TUM-VI: dso/gt_imu.csv
# or mav0/mocap0/data.csv).
set -euo pipefail

KIND="${1:?kind: euroc|tumvi|uma}"
DATA="${2:?dataset sequence directory}"
SPEED="${3:-0}"
OUT="${4:-./run_out}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

case "$KIND" in
  euroc) CFG="$REPO/configs/euroc.yaml";  VOC_NAME=voc_euroc_9x3.npz ;;
  tumvi) CFG="$REPO/configs/tumvi.yaml";  VOC_NAME=voc_tum_9x3.npz ;;
  uma)   CFG="$REPO/configs/uma.yaml";    VOC_NAME=voc_tum_9x3.npz ;;
  *) echo "unknown kind $KIND" >&2; exit 2 ;;
esac
# TUM-VI 1024 sequences: pass CFG override via env
CFG="${CONFIG:-$CFG}"
VOC="${VOC:-$REPO/assets/$VOC_NAME}"
WEIGHTS="${WEIGHTS:-$REPO/assets/ppg_weights.npz}"
EXTRA=()
[ "$KIND" = uma ] && EXTRA+=(--no-loop-closing)  # reference UMA ActiveLoop: 0

# ground-truth discovery
GT="${GT:-}"
if [ -z "$GT" ]; then
  for cand in "$DATA/mav0/state_groundtruth_estimate0/data.csv" \
              "$DATA/dso/gt_imu.csv" \
              "$DATA/mav0/mocap0/data.csv"; do
    [ -f "$cand" ] && GT="$cand" && break
  done
fi
[ -n "$GT" ] && EXTRA+=(--eval-gt "$GT")

mkdir -p "$OUT"
cd "$REPO"
python -m ppg_slam_tpu.cli.mono_inertial "$KIND" "$VOC" "$CFG" "$WEIGHTS" \
  "$DATA" --out-dir "$OUT" --realtime-factor "$SPEED" "${EXTRA[@]}"

echo "trajectories in $OUT; re-evaluate anytime with:"
echo "  python -m ppg_slam_tpu.cli.evaluate $OUT/CameraTrajectory.txt \"\$GT\" --rpe 1.0"
