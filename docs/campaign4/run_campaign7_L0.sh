#!/bin/sh
# Campaign 7 (pre-registered in docs/ROUND4_NOTES.md BEFORE any leg ran):
# TNS recall recovery. TNS enters the SHIP GUARD only (never training,
# mining, calibration-fit or candidate selection): gate = TNS TP >= 4
# AND FP <= 2 on the 8-face Haar GT.
#
# L0 (calibration-only): recalibrate the PROMOTED model with small-scale
# anchor replicas (inter-eye 24,30 px) in the spare pool. Adopt iff
# panel777 recall >= 0.8342 AND FP <= 0.725 AND anchors 3TP/0FN/FP<=13
# AND the TNS gate passes.
# L1 (retrain): campaign-4 flags + --texture_noise 0.03, seeds 91-96.
# Guard for L1: n=200 seed-999 recall >= 0.705, FP <= 0.835, anchors
# 3TP/0FN/FP <= 13, attrs >= 5/9, AND the TNS gate.
set -x
cd /root/repo
C7=/tmp/c7
rm -rf "$C7"
mkdir -p "$C7"

# ---------- L0: calibration-only ----------
cp -r SavedNetworksTPU "$C7/L0"
timeout 3600 python tools/calibrate_ladder.py --model "$C7/L0" \
  --bg_budget 2.0 --anchor_small_ie 24,30 --write > "$C7/L0_calib.log" 2>&1
echo "L0 calib rc=$?"
timeout 2400 python tools/eval_synth.py --pipeline_dir="$C7/L0" --n 48 \
  --seed 777 --json docs/campaign4/c7_L0_panel777.json \
  > "$C7/L0_panel.log" 2>&1
echo "L0 panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$C7/L0" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/c7_L0_anchors.json > "$C7/L0_anchors.log" 2>&1
echo "L0 anchors rc=$?"
timeout 1200 pfa-detect --pipeline_dir="$C7/L0" \
  --coordinates_filename=data/tns_group_gt.txt --smallest_face=0.1 \
  /root/reference/sample_images/TNS-Group.jpg "$C7/L0_tns_out.txt" \
  > "$C7/L0_tns.log" 2>&1
echo "L0 tns rc=$?"
echo C7_L0_DONE

