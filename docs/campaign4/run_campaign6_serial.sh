#!/bin/sh
# Campaign 6 (pre-registered in docs/ROUND4_NOTES.md BEFORE any leg ran):
# serial disc graph variance screen.
#
# Hypothesis: the clustered 10-class disc graph pins ~9 directions while
# disc layers keep 13-20 outputs; the free remainder rotates per seed.
# A serial graph over the continuous centering fraction (50 groups)
# pins up to ~49 directions per layer.
#
# Config: base copy; no mining (the variance question is orthogonal;
# L1-L3 are the clustered no-mining baseline). K=3 seeds 71/72/73.
# Measurement: the trainer's per-candidate selection table vs the pooled
# clustered 300-face spread (campaign-3 L2/L3, 6 candidates).
# ADOPT serial as default iff serial anchors-FP range AND panel-FP range
# both strictly inside the pooled clustered ranges AND no serial FN>0
# AND serial winner recall >= 0.73 / FP <= 1.0.
# NOTE: reused pose/eye/age nets are byte-identical to the L2/L3 base
# (the campaign-4 promotion changed only the disc stack, retrained from
# scratch here), so the comparison is apples-to-apples.
set -x
cd /root/repo
C6=/tmp/c6
rm -rf "$C6"
mkdir -p "$C6"
cp -r SavedNetworksTPU "$C6/model"

timeout 14400 pfa-train --out_dir "$C6/model" --reuse pose,eye,age \
  --num_faces 300 --disc_graph serial --disc_seeds 71,72,73 \
  --calib_bg_budget 2.0 > "$C6/train.log" 2>&1
echo "train rc=$?"
cp "$C6/model/disc_selection.json" docs/campaign4/serial_selection.json
echo CAMPAIGN6_DONE
