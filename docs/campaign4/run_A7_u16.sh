#!/bin/sh
# A7 (pre-registered in docs/ROUND4_NOTES.md BEFORE these legs ran):
# wire_format=u16 default-flip equality check on the SHIPPED artifacts.
# Two identical 48-scene seed-999 panels (f32 vs u16) + anchors (u16;
# f32 anchors baseline = the campaign-4 guard run). FLIP the
# DetectorConfig default to "u16" iff recall and FP/img are IDENTICAL,
# eye_err_mean within 0.002, age MAE within 0.05y, anchors TP/FP/FN
# identical. Otherwise u16 stays opt-in and the deltas are recorded.
set -x
cd /root/repo
A7=/tmp/a7
mkdir -p "$A7"

timeout 2400 python tools/eval_synth.py --pipeline_dir=SavedNetworksTPU \
  --n 48 --seed 999 --wire_format f32 \
  --json docs/campaign4/a7_panel999_f32.json > "$A7/f32.log" 2>&1
echo "A7 f32 rc=$?"
timeout 2400 python tools/eval_synth.py --pipeline_dir=SavedNetworksTPU \
  --n 48 --seed 999 --wire_format u16 \
  --json docs/campaign4/a7_panel999_u16.json > "$A7/u16.log" 2>&1
echo "A7 u16 rc=$?"
timeout 1800 python tools/eval_anchors.py --model SavedNetworksTPU \
  --attrs data/anchor_attrs.txt --wire_format u16 \
  --json_out docs/campaign4/a7_anchors_u16.json > "$A7/anchors_u16.log" 2>&1
echo "A7 anchors u16 rc=$?"
timeout 1800 python tools/eval_anchors.py --model SavedNetworksTPU \
  --attrs data/anchor_attrs.txt --wire_format f32 \
  --json_out docs/campaign4/a7_anchors_f32.json > "$A7/anchors_f32.log" 2>&1
echo "A7 anchors f32 rc=$?"
echo A7_DONE
