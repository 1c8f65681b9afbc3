import numpy as np

from facedet_tpu.eval.submission import read_submission, write_submission


def test_submission_roundtrip(tmp_path):
    preds = {
        "0--Parade": {
            "0_Parade_1": np.array([[10.0, 20.0, 30.0, 40.0, 0.9]]),
            "0_Parade_2": np.zeros((0, 5)),
        },
        "1--Other": {"1_Other_1": np.array([[1, 2, 3, 4, 0.5], [5, 6, 7, 8, 0.25]])},
    }
    n = write_submission(preds, str(tmp_path))
    assert n == 3
    back = read_submission(str(tmp_path))
    assert set(back) == {"0--Parade", "1--Other"}
    np.testing.assert_allclose(
        back["0--Parade"]["0_Parade_1"], [[10, 20, 30, 40, 0.9]], atol=1e-6
    )
    assert back["0--Parade"]["0_Parade_2"].shape == (0, 5)
    assert back["1--Other"]["1_Other_1"].shape == (2, 5)


def test_read_tolerates_missing_count(tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    (d / "img.txt").write_text("img\n1 2 3 4 0.9\n")  # no count line
    back = read_submission(str(tmp_path))
    assert back["ev"]["img"].shape == (1, 5)
