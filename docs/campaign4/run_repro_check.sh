#!/bin/sh
# Reproducibility check of the SHIPPED recipe (round-5 handoff item 1,
# pre-registered here BEFORE the rerun): a fresh pfa-train with the
# campaign-4 flags and FRESH seeds (81-86) must land within the guard
# band of the shipped numbers. This is the round-3 "selected outlier"
# critique applied to the new artifacts: shipped quality must be the
# expected outcome of the documented recipe, not a curated draw.
#
# PASS iff the rerun winner's n=200 seed-999 panel has recall >= 0.685
# (shipped_guard 0.705 - 0.02) AND FP/img <= 0.975 (shipped_guard 0.825
# + 0.15) AND anchors 3TP/0FN with FP <= 22. No promotion either way —
# this measures the RECIPE's reproducibility, not a new candidate.
set -x
cd /root/repo
CR=/tmp/crepro
rm -rf "$CR"
mkdir -p "$CR"
cp -r SavedNetworksTPU "$CR/model"

timeout 14400 pfa-train --out_dir "$CR/model" --reuse pose,eye,age \
  --num_faces 300 --mined_negatives docs/campaign3/mined_r4.txt \
  --mined_frac 0.25 --disc_seeds 81,82,83,84,85,86 \
  --calib_bg_budget 2.0 > "$CR/train.log" 2>&1
echo "train rc=$?"
cp "$CR/model/disc_selection.json" docs/campaign4/repro_selection.json

timeout 3600 python tools/eval_synth.py --pipeline_dir "$CR/model" \
  --n 200 --seed 999 --json docs/campaign4/repro_panel999_200.json \
  > "$CR/panel.log" 2>&1
echo "panel rc=$?"
timeout 1800 python tools/eval_anchors.py --model "$CR/model" \
  --attrs data/anchor_attrs.txt \
  --json_out docs/campaign4/repro_anchors.json > "$CR/anchors.log" 2>&1
echo "anchors rc=$?"
echo REPRO_DONE
