"""Apply the session-13 pre-registered multi-seed mined-disc selection rule.

Step 3 (selection, training-side): eliminate candidates with anchors FN > 0
or TP < 3; rank the rest by (highest panel-777 recall, lowest panel FP/img,
lowest anchors FP). Step 4 (guard) is run separately on the winner.
"""
import json, glob, os, sys

cands = []
for pj in sorted(glob.glob("/tmp/mining2/panel777_*.json")):
    tag = os.path.basename(pj)[len("panel777_"):-len(".json")]
    aj = f"/tmp/mining2/anchors_{tag}.json"
    if not os.path.exists(aj):
        print(f"{tag}: anchors json missing, skip"); continue
    p = json.load(open(pj)); a = json.load(open(aj))
    tot = a["total"]
    row = dict(tag=tag, recall=p["recall"], fp=p["fp_per_image"],
               a_tp=tot["tp"], a_fp=tot["fp"], a_fn=tot["fn"])
    row["eliminated"] = tot["fn"] > 0 or tot["tp"] < 3
    cands.append(row)

print(f"{'tag':14} {'recall':>7} {'FP/img':>7} {'anchors':>12} elim")
for r in cands:
    print(f"{r['tag']:14} {r['recall']:7.4f} {r['fp']:7.4f} "
          f"{r['a_tp']}TP/{r['a_fp']}FP/{r['a_fn']}FN   {'X' if r['eliminated'] else ''}")

alive = [r for r in cands if not r["eliminated"]]
if not alive:
    print("\nAll candidates eliminated -> mining stays tooling-only this round.")
    sys.exit(0)
alive.sort(key=lambda r: (-r["recall"], r["fp"], r["a_fp"]))
w = alive[0]
print(f"\nSELECTED: {w['tag']}  (guard next: seed-999 panel recall>=0.73, "
      f"FP<=0.71, anchors >=3TP 0FN FP<22)")
