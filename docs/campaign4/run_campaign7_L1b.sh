#!/bin/sh
# Campaign 7 L1b contingency (pre-registered in docs/ROUND5_NOTES.md
# BEFORE L1 ran): runs ONLY if L1's winner fails the TNS gate.
# Recalibrate the SAME winner with the protected-rung budget reclaim
# (bg_budget 2.0, small-anchor replicas 24,30 px, protect serials 5/7/9 —
# the post-iter-1 kill stages), then re-run the FULL ship rule:
# n=200 seed-999 panel + anchors + TNS gate
# (tools/apply_c7_L1_rule.py docs/campaign4/c7_L1b_panel999_200.json
#  docs/campaign4/c7_L1b_anchors.json /tmp/c7/L1b_tns.log).
set -x
cd /root/repo
C7=/tmp/c7
rm -rf "$C7/L1b"
cp -r "$C7/L1" "$C7/L1b"

timeout 3600 python tools/calibrate_ladder.py --model "$C7/L1b" \
  --bg_budget 2.0 --anchor_small_ie 24,30 --bg_protect 5,7,9 --write \
  > "$C7/L1b_calib.log" 2>&1
echo "L1b calib rc=$?"
cp "$C7/L1b/manifest.json" docs/campaign4/c7_L1b_manifest.json
timeout 1200 pfa-detect --pipeline_dir="$C7/L1b" \
  --coordinates_filename=data/tns_group_gt.txt --smallest_face=0.1 \
  /root/reference/sample_images/TNS-Group.jpg "$C7/L1b_tns_out.txt" \
  > "$C7/L1b_tns.log" 2>&1
echo "L1b tns rc=$?"
timeout 3600 python tools/eval_synth.py --pipeline_dir="$C7/L1b" \
  --n 200 --seed 999 --json docs/campaign4/c7_L1b_panel999_200.json \
  > "$C7/L1b_panel.log" 2>&1
echo "L1b panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$C7/L1b" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/c7_L1b_anchors.json > "$C7/L1b_anchors.log" 2>&1
echo "L1b anchors rc=$?"
echo CAMPAIGN7_L1B_DONE
