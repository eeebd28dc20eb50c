#!/bin/sh
# Campaign 7 L1 (pre-registered; see run_campaign7_L0.sh header).
# EXTRA_CALIB is set by the operator to "--calib_anchor_small_ie 24,30"
# iff L0 was ADOPTED by its declared rule, else empty.
set -x
cd /root/repo
C7=/tmp/c7
mkdir -p "$C7"
# ---------- L1: mined + texture_noise 0.03, K=6 ----------
cp -r SavedNetworksTPU "$C7/L1"
timeout 14400 pfa-train --out_dir "$C7/L1" --reuse pose,eye,age \
  --num_faces 300 --mined_negatives docs/campaign3/mined_r4.txt \
  --mined_frac 0.25 --disc_seeds 91,92,93,94,95,96 \
  --calib_bg_budget 2.0 --texture_noise 0.03 $EXTRA_CALIB > "$C7/L1_train.log" 2>&1
echo "L1 train rc=$?"
cp "$C7/L1/disc_selection.json" docs/campaign4/c7_L1_selection.json
timeout 3600 python tools/eval_synth.py --pipeline_dir="$C7/L1" \
  --n 200 --seed 999 --json docs/campaign4/c7_L1_panel999_200.json \
  > "$C7/L1_panel.log" 2>&1
echo "L1 panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$C7/L1" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/c7_L1_anchors.json > "$C7/L1_anchors.log" 2>&1
echo "L1 anchors rc=$?"
timeout 1200 pfa-detect --pipeline_dir="$C7/L1" \
  --coordinates_filename=data/tns_group_gt.txt --smallest_face=0.1 \
  /root/reference/sample_images/TNS-Group.jpg "$C7/L1_tns_out.txt" \
  > "$C7/L1_tns.log" 2>&1
echo "L1 tns rc=$?"
echo CAMPAIGN7_DONE
