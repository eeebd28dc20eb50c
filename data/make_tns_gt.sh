#!/bin/sh
# Regenerate data/tns_group_gt.txt: Haar-annotated faces of the canonical
# test photo plus one manual annotation (the tilted face in the red hoodie,
# which haarcascade_frontalface_alt2 misses). Eyes verified visually.
# Rows are the reference 8-float format: eyes, nose, mouth.
set -e
cd "$(dirname "$0")/.."
python tools/annotate_haar.py /root/reference/sample_images/TNS-Group.jpg \
    --out data/tns_group_gt.txt
python - <<'PY'
from tools.annotate_haar import mouth_from_eyes
eyes = ((2828.0, 595.0), (2962.0, 582.0))
mx, my = mouth_from_eyes(eyes)
ex = (eyes[0][0] + eyes[1][0]) / 2.0
ey = (eyes[0][1] + eyes[1][1]) / 2.0
nx, ny = ex * 0.45 + mx * 0.55, ey * 0.45 + my * 0.55
with open("data/tns_group_gt.txt", "a") as f:
    f.write("/root/reference/sample_images/TNS-Group.jpg\n")
    f.write("%.1f %.1f %.1f %.1f %.1f %.1f %.1f %.1f\n"
            % (eyes[0][0], eyes[0][1], eyes[1][0], eyes[1][1],
               nx, ny, mx, my))
PY
echo done
