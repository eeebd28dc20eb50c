"""Applies the campaign-7 L0 adoption rule (pre-registered + amendment,
docs/ROUND4_NOTES.md) to the leg outputs and prints the verdict.

Amended rule (same-harness baselines, eval_synth on the promoted model:
panel777 n=48 recall 0.7708 / FP 0.7708, docs/campaign4/age_base_panel777.json):
ADOPT the small-anchor calibration iff
  panel777 recall >= 0.7508  AND  FP/img <= 0.8708
  AND anchors 3TP / 0FN / FP <= 13
  AND TNS gate: TP >= 4 AND FP <= 2 (8-face Haar GT; final-detections block).
"""
import json
import re
import sys

panel = json.load(open("docs/campaign4/c7_L0_panel777.json"))
anch = json.load(open("docs/campaign4/c7_L0_anchors.json"))
tns_log = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/c7/L0_tns.log").read()

m = re.search(r"ground-truth evaluation:\s*\n\s*true positives:\s*(\d+)\s*\n"
              r"\s*false positives:\s*(\d+)\s*\n\s*false negatives:\s*(\d+)",
              tns_log)
if m is None:
    sys.exit("FATAL: TNS log has no ground-truth evaluation block "
             "(malformed or missing log) -- refusing to evaluate the rule")
tns_tp, tns_fp, tns_fn = (int(g) for g in m.groups())

tot = anch["total"]
checks = {
    "panel777 recall >= 0.7508": panel["recall"] >= 0.7508,
    "panel777 FP <= 0.8708": panel["fp_per_image"] <= 0.8708,
    "anchors 3TP": tot["tp"] == 3,
    "anchors 0FN": tot["fn"] == 0,
    "anchors FP <= 13": tot["fp"] <= 13,
    "TNS TP >= 4": tns_tp >= 4,
    "TNS FP <= 2": tns_fp <= 2,
}
print(f"panel777: recall {panel['recall']} fp {panel['fp_per_image']} "
      f"eye {panel.get('eye_err_mean')}")
attrs_ok = sum(r[k] for r in anch.get("attrs", [])
               for k in ("age_ok", "race_ok", "gender_ok"))
print(f"anchors:  {tot}  attrs_ok {attrs_ok}/9")
print(f"TNS:      {tns_tp}TP/{tns_fp}FP/{tns_fn}FN")
for k, v in checks.items():
    print(f"  {'PASS' if v else 'FAIL'}  {k}")
print("VERDICT:", "ADOPT" if all(checks.values()) else "NOT ADOPTED")
