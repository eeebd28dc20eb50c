#!/bin/sh
# Campaign 5 (pre-registered in docs/ROUND4_NOTES.md BEFORE any leg ran):
# real-anchor age training via the deploy-path Z-frame sampler.
# Legs: LOO x 3 (honest real-photo generalization) + C (ship candidate).
# Strictly sequential TPU jobs. Each leg follows the round-2 graft
# recipe: train the age stack into a scratch dir (--no_calibrate), then
# copy ONLY net_age/clf_Age/clf_Race/clf_Gender npz over a base copy so
# the calibrated manifest -- and with it every detection artifact -- is
# byte-identical to production (protocol requirement (c)).
set -x
cd /root/repo
C5=/tmp/c5
rm -rf "$C5"
mkdir -p "$C5"

run_leg() {  # $1 leg name, $2 extra pfa-train args
  scratch="$C5/$1_scratch"
  leg="$C5/$1"
  cp -r SavedNetworksTPU "$scratch"
  cp -r SavedNetworksTPU "$leg"
  # shellcheck disable=SC2086
  timeout 3600 pfa-train --out_dir "$scratch" --reuse disc,pose,eye \
    --no_calibrate --age_real_frac 0.15 $2 > "$C5/$1_train.log" 2>&1
  echo "$1 train rc=$?"
  for f in net_age clf_Age clf_Race clf_Gender; do
    cp "$scratch/$f.npz" "$leg/$f.npz"
  done
  timeout 2400 python tools/eval_synth.py --pipeline_dir "$leg" --n 48 \
    --seed 777 --json "docs/campaign4/age_$1_panel777.json" \
    > "$C5/$1_panel.log" 2>&1
  echo "$1 panel rc=$?"
  timeout 1800 python tools/eval_anchors.py --model "$leg" \
    --attrs data/anchor_attrs.txt \
    --json_out "docs/campaign4/age_$1_anchors.json" \
    > "$C5/$1_anchors.log" 2>&1
  echo "$1 anchors rc=$?"
}

# Baseline leg (campaign-5 amendment): re-measure panel777 attrs on the
# PROMOTED artifacts (campaign-4 ship changed the disc stack; the A6
# baselines are stale). Detection metrics double as the bit-identity
# reference for rule (c).
timeout 2400 python tools/eval_synth.py --pipeline_dir SavedNetworksTPU \
  --n 48 --seed 777 --json docs/campaign4/age_base_panel777.json \
  > "$C5/base_panel.log" 2>&1
echo "base panel rc=$?"

run_leg loo_emma  "--age_real_exclude EmmaWatson2.png"
run_leg loo_entre "--age_real_exclude Entrepreneur.png"
run_leg loo_grace "--age_real_exclude grace_hopper.jpg"
run_leg C ""
echo CAMPAIGN5_DONE
