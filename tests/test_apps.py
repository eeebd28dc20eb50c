"""App-surface tests: tracking mode, pfa-normalize, pfa-frgc, CLI parsing."""

import os

import numpy as np
import pytest

from pyfaceanalysis_tpu.config import DetectorConfig, NetGeometry
from pyfaceanalysis_tpu.engine import grid as gridmod


class TestTrackingGrid:
    def test_tracking_narrows_scales(self):
        geom = NetGeometry()
        full = gridmod.compute_sampling_values(400, 300, geom, 0.2, 1.1,
                                               True, False, False, None)
        tracked = gridmod.compute_sampling_values(
            400, 300, geom, 0.2, 1.1, True, True, True,
            (100.0, 80.0, 180.0, 160.0))
        assert len(tracked) == 1
        assert len(full) > 1
        # Tracked scale ~ face size / subimage width (face_analysis.py:583).
        np.testing.assert_allclose(tracked[0], 80.0 / 64.0, rtol=1e-6)

    def test_tracking_positions_around_last_face(self):
        geom = NetGeometry()
        posX, posY, pw, ph, _, _ = gridmod.compute_posX_posY_values(
            400, 300, geom, 1.25, 1.1, True, True,
            (100.0, 80.0, 180.0, 160.0))
        assert len(posX) == 3 and len(posY) == 3
        np.testing.assert_allclose(posX[0], 100.0)
        np.testing.assert_allclose(posY, [80.0] * 3)


class TestNormalizeCLI:
    def test_end_to_end(self, tmp_path):
        from pyfaceanalysis_tpu.apps.normalize import main
        from pyfaceanalysis_tpu.io import images as im_io

        rng = np.random.RandomState(0)
        img_path = str(tmp_path / "face.png")
        im_io.save_image(img_path, rng.rand(200, 200))
        coords = tmp_path / "coords.txt"
        coords.write_text(f"{img_path}\n70 90 110 90 90 130\n"
                          f"{img_path}\n70 90 72 90 71 95\n")  # 2nd: eyes<5px
        pattern = str(tmp_path / "out%05d.jpg")
        rc = main([str(coords), pattern, "mid_eyes_mouth_horiz",
                   "--out_width", "64", "--out_height", "64"])
        assert rc == 0
        assert os.path.exists(pattern % 0)
        assert not os.path.exists(pattern % 1)   # skipped (eye dist < 5)

    def test_all_modes_run(self, tmp_path):
        from pyfaceanalysis_tpu.apps.normalize import _MODES, main
        from pyfaceanalysis_tpu.io import images as im_io

        img_path = str(tmp_path / "face.png")
        im_io.save_image(img_path, np.random.RandomState(1).rand(200, 200))
        coords = tmp_path / "coords.txt"
        coords.write_text(f"{img_path}\n70 90 110 90 90 130\n")
        for mode in _MODES:
            pattern = str(tmp_path / f"{mode}_%03d.jpg")
            assert main([str(coords), pattern, mode, "--out_width", "48",
                         "--out_height", "48"]) == 0
            assert os.path.exists(pattern % 0)


class TestFRGC:
    def test_xml_parse_and_merge(self, tmp_path):
        from pyfaceanalysis_tpu.apps import frgc

        meta = tmp_path / "meta.xml"
        meta.write_text("""<Metadata>
  <Recording recording_id="r1">
    <LeftEyeCenter x="100" y="120"/>
    <RightEyeCenter x="140" y="120"/>
    <Mouth x="120" y="160"/>
  </Recording>
  <Recording recording_id="r2">
    <LeftEyeCenter x="10" y="20"/>
    <RightEyeCenter x="40" y="20"/>
  </Recording>
</Metadata>""")
        sig = tmp_path / "sig.xml"
        sig.write_text("""<Signatures>
  <Presentation name="r1" file-name="img1.jpg"/>
  <Presentation name="r3" file-name="img3.jpg"/>
</Signatures>""")
        coords = frgc.load_frgc_coordinate_data(str(meta))
        assert coords["r1"]["Mouth"] == (120.0, 160.0)
        files = frgc.load_frgc_biometric_signatures([str(sig)])
        merged = frgc.merge_dictionaries(coords, files)
        assert merged == [("img1.jpg", coords["r1"])]

    def test_facecenter_crop(self):
        from pyfaceanalysis_tpu.apps.frgc import process_image_facecenter

        img = np.random.RandomState(2).rand(300, 300).astype(np.float32)
        pts = {"LeftEyeCenter": (120.0, 140.0),
               "RightEyeCenter": (170.0, 140.0), "Mouth": (145.0, 195.0)}
        out = process_image_facecenter(img, pts, (128, 96))
        assert out.shape == (96, 128)
        # Without eyes -> None
        assert process_image_facecenter(img, {"Mouth": (1.0, 1.0)}) is None


class TestCLIParsing:
    def test_cutoff_ladder_flag(self, capsys):
        from pyfaceanalysis_tpu.apps.detect import main
        rc = main(["--cut_offs_face=1,2,3"])           # wrong count
        assert rc == 2

    def test_usage_on_no_args(self, capsys):
        from pyfaceanalysis_tpu.apps.detect import main
        assert main([]) == 0
        assert "Usage" in capsys.readouterr().out
