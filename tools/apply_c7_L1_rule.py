"""Applies the campaign-7 L1 SHIP RULE (pre-registered in
docs/ROUND4_NOTES.md; L1b contingency in docs/ROUND5_NOTES.md) to the leg
outputs and prints the verdict.

SHIP RULE: promote the L1 (or L1b-recalibrated) winner to SavedNetworksTPU
iff n=200 seed-999 panel recall >= 0.705 AND FP/img <= 0.835 AND anchors
3TP / 0FN / FP <= 13 AND anchors attrs ok-count >= 5/9 AND TNS gate
(TP >= 4 AND FP <= 2 on the 8-face Haar GT, final-detections block).

Usage: python tools/apply_c7_L1_rule.py PANEL.json ANCHORS.json TNS.log
"""
import json
import re
import sys

panel = json.load(open(sys.argv[1]))
anch = json.load(open(sys.argv[2]))
tns_log = open(sys.argv[3]).read()

m = re.search(r"ground-truth evaluation:\s*\n\s*true positives:\s*(\d+)\s*\n"
              r"\s*false positives:\s*(\d+)\s*\n\s*false negatives:\s*(\d+)",
              tns_log)
if m is None:
    sys.exit("FATAL: TNS log has no ground-truth evaluation block "
             "(malformed or missing log) -- refusing to evaluate the rule")
tns_tp, tns_fp, tns_fn = (int(g) for g in m.groups())

tot = anch["total"]
attrs_ok = sum(r[k] for r in anch.get("attrs", [])
               for k in ("age_ok", "race_ok", "gender_ok"))
checks = {
    "panel999_200 recall >= 0.705": panel["recall"] >= 0.705,
    "panel999_200 FP <= 0.835": panel["fp_per_image"] <= 0.835,
    "anchors 3TP": tot["tp"] == 3,
    "anchors 0FN": tot["fn"] == 0,
    "anchors FP <= 13": tot["fp"] <= 13,
    "anchors attrs >= 5/9": attrs_ok >= 5,
    "TNS TP >= 4": tns_tp >= 4,
    "TNS FP <= 2": tns_fp <= 2,
}
print(f"panel999 n={panel.get('scenes')}: recall {panel['recall']} "
      f"{panel.get('recall_ci95')} fp {panel['fp_per_image']} "
      f"{panel.get('fp_ci95')} eye {panel.get('eye_err_mean')}")
print(f"anchors:  {tot}  attrs_ok {attrs_ok}/9")
print(f"TNS:      {tns_tp}TP/{tns_fp}FP/{tns_fn}FN")
for k, v in checks.items():
    print(f"  {'PASS' if v else 'FAIL'}  {k}")
print("VERDICT:", "PROMOTE" if all(checks.values()) else "NOT SHIPPED")
