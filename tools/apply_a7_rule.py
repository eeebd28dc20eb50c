"""Applies the pre-registered A7 rule (docs/ROUND4_NOTES.md) to the u16
wire-format equality legs and prints the verdict.

FLIP the DetectorConfig default to "u16" iff, on the shipped artifacts:
  48-scene seed-999 panel recall and FP/img IDENTICAL (f32 vs u16)
  AND eye_err_mean within 0.002  AND age MAE within 0.05y
  AND anchors TP/FP/FN identical.
"""
import json

f32 = json.load(open("docs/campaign4/a7_panel999_f32.json"))
u16 = json.load(open("docs/campaign4/a7_panel999_u16.json"))
af = json.load(open("docs/campaign4/a7_anchors_f32.json"))["total"]
au = json.load(open("docs/campaign4/a7_anchors_u16.json"))["total"]

checks = {
    "recall identical": f32["recall"] == u16["recall"],
    "FP/img identical": f32["fp_per_image"] == u16["fp_per_image"],
    "eye_err_mean within 0.002":
        abs(f32["eye_err_mean"] - u16["eye_err_mean"]) <= 0.002,
    "age MAE within 0.05y": abs(f32["age_mae"] - u16["age_mae"]) <= 0.05,
    "anchors TP/FP/FN identical":
        (af["tp"], af["fp"], af["fn"]) == (au["tp"], au["fp"], au["fn"]),
}
print(f"panel f32: recall {f32['recall']} fp {f32['fp_per_image']} "
      f"eye {f32['eye_err_mean']} age {f32['age_mae']}")
print(f"panel u16: recall {u16['recall']} fp {u16['fp_per_image']} "
      f"eye {u16['eye_err_mean']} age {u16['age_mae']}")
print(f"anchors f32 {af} | u16 {au}")
for k, v in checks.items():
    print(f"  {'PASS' if v else 'FAIL'}  {k}")
print("VERDICT:", "FLIP default to u16" if all(checks.values())
      else "u16 stays opt-in")
