#!/bin/sh
# Campaign 4 (pre-registered in docs/ROUND4_NOTES.md BEFORE any leg ran):
# mined multi-seed disc retrain at K=6 with an n=200 seed-999 guard.
#
# Config: base copy of SavedNetworksTPU; identical to campaign-3 L4 except
# K=6 fresh seeds (61-66) and the guard panel size (200 scenes).
# GUARD (declared): promote iff guard recall >= 0.705 AND guard FP/img
# <= 0.835 AND anchors 3TP/0FN/FP<22 AND anchors attrs ok >= 5/9.
# Strictly sequential TPU jobs -- ONE TPU process at a time.
set -x
cd /root/repo
C4=/tmp/c4
rm -rf "$C4"
mkdir -p "$C4"
cp -r SavedNetworksTPU "$C4/model"

timeout 14400 pfa-train --out_dir "$C4/model" --reuse pose,eye,age \
  --num_faces 300 --mined_negatives docs/campaign3/mined_r4.txt \
  --mined_frac 0.25 --disc_seeds 61,62,63,64,65,66 \
  --calib_bg_budget 2.0 > "$C4/train.log" 2>&1
echo "train rc=$?"
cp "$C4/model/disc_selection.json" docs/campaign4/selection.json

# Guard legs on the selected winner (seeds 61-66 never saw seed 999).
timeout 3600 python tools/eval_synth.py --pipeline_dir "$C4/model" \
  --n 200 --seed 999 --json docs/campaign4/guard_panel999_200.json \
  > "$C4/panel.log" 2>&1
echo "panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$C4/model" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/guard_anchors.json > "$C4/anchors.log" 2>&1
echo "anchors rc=$?"
echo CAMPAIGN4_DONE
