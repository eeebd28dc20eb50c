#!/bin/sh
# Campaign 7 L1c contingency (pre-registered in docs/ROUND5_NOTES.md after
# the L1 SELECTION table but BEFORE any guard/TNS number of the winner):
# the L1 winner failed the n=200 guard FP bound -> recalibrate the SAME
# winner with a TIGHTER background budget (1.0 pre-NMS windows/image; all
# other calibration inputs unchanged: scenes 40, seed 1234, native
# anchors, uniform cap) and re-run the FULL ship rule ONCE.
set -x
cd /root/repo
C7=/tmp/c7
rm -rf "$C7/L1c"
cp -r "$C7/L1" "$C7/L1c"

timeout 3600 python tools/calibrate_ladder.py --model "$C7/L1c" \
  --bg_budget 1.0 --write > "$C7/L1c_calib.log" 2>&1
echo "L1c calib rc=$?"
cp "$C7/L1c/manifest.json" docs/campaign4/c7_L1c_manifest.json
timeout 1200 pfa-detect --pipeline_dir="$C7/L1c" \
  --coordinates_filename=data/tns_group_gt.txt --smallest_face=0.1 \
  /root/reference/sample_images/TNS-Group.jpg "$C7/L1c_tns_out.txt" \
  > "$C7/L1c_tns.log" 2>&1
echo "L1c tns rc=$?"
timeout 3600 python tools/eval_synth.py --pipeline_dir="$C7/L1c" \
  --n 200 --seed 999 --json docs/campaign4/c7_L1c_panel999_200.json \
  > "$C7/L1c_panel.log" 2>&1
echo "L1c panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$C7/L1c" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/c7_L1c_anchors.json > "$C7/L1c_anchors.log" 2>&1
echo "L1c anchors rc=$?"
echo CAMPAIGN7_L1C_DONE
