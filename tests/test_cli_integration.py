"""CLI integration: synth -> train (stage 1 + stage-2 bridge) -> eval
(host-paste and device-paste) -> infer -> verify-gt -> convert-tf1 errors,
end to end at tiny scale.  Training runs once in a module fixture."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dis_yolo_tpu.cli import main  # noqa: E402


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Synthetic dataset + a 4-step stage-1 run; returns (root, data, ckpt)."""
    root = tmp_path_factory.mktemp("cli_e2e")
    data = str(root / "data")
    main(["synth", "--dataset", data, "--images", "4", "--size", "128"])

    out1 = str(root / "out_stage1")
    main(["train", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--max-iter", "4", "--save-iter", "2", "--summary-iter", "2",
          "--stage", "1", "--output-dir", out1])
    cks = sorted(d for d in os.listdir(os.path.join(out1, "checkpoint"))
                 if d.startswith("step_"))
    assert cks == ["step_00000002", "step_00000004"]
    ck = os.path.join(out1, "checkpoint", cks[-1])
    assert os.path.isdir(os.path.join(ck, "state"))
    assert os.path.isdir(os.path.join(ck, "weights"))
    assert os.path.isfile(os.path.join(out1, "checkpoint",
                                       "train_metrics.jsonl"))
    return root, data, ck


def _eval_json(capsys, data, ck, *extra):
    main(["eval", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--phase", "test", "--checkpoint", ck, *extra])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line)


def test_stage2_bridge_and_eval(trained, capsys):
    root, data, ck = trained
    out2 = str(root / "out_stage2")
    main(["train", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--max-iter", "2", "--save-iter", "2", "--summary-iter", "2",
          "--stage", "2", "--output-dir", out2, "--weights-from", ck,
          "--no-validation"])
    ck2 = os.path.join(out2, "checkpoint", "step_00000002")
    assert os.path.isdir(ck2)
    capsys.readouterr()

    res = _eval_json(capsys, data, ck2)
    assert set(res) >= {"AP", "mAP", "recall", "precision", "iou", "miou",
                        "s_per_image"}
    assert len(res["AP"]) == 3 and len(res["iou"]) == 4
    assert res["s_per_image"] > 0


def test_eval_device_paste_matches_host(trained, capsys):
    """--device-paste (on-device crop/resize/binarize/paste) must reproduce
    the host postprocess metrics exactly on the same checkpoint."""
    root, data, ck = trained
    host = _eval_json(capsys, data, ck)
    dev = _eval_json(capsys, data, ck, "--device-paste")
    np.testing.assert_allclose(dev["AP"], host["AP"], atol=1e-9)
    np.testing.assert_allclose(dev["iou"], host["iou"], atol=1e-9)
    assert dev["mAP"] == pytest.approx(host["mAP"])
    assert dev["miou"] == pytest.approx(host["miou"])


def test_eval_device_score_matches_host(trained, capsys):
    """--device-score (on-device IoU matrices + confusion totals, zero
    per-pixel fetch) must reproduce the host metrics exactly."""
    root, data, ck = trained
    host = _eval_json(capsys, data, ck)
    dev = _eval_json(capsys, data, ck, "--device-score")
    np.testing.assert_allclose(dev["AP"], host["AP"], atol=1e-9)
    np.testing.assert_allclose(dev["iou"], host["iou"], atol=1e-9)
    assert dev["mAP"] == pytest.approx(host["mAP"])
    assert dev["miou"] == pytest.approx(host["miou"])


def test_infer_writes_overlays(trained):
    root, data, ck = trained
    infer_out = str(root / "infer")
    main(["infer", "--dataset", data, "--image-size", "64",
          "--images", os.path.join(data, "test", "images"),
          "--out", infer_out, "--checkpoint", ck, "--threshold", "0.5"])
    outs = os.listdir(infer_out)
    assert len(outs) == 4
    im = cv2.imread(os.path.join(infer_out, outs[0]))
    assert im is not None and im.shape[2] == 3


def test_infer_quant_writes_overlays(trained, capsys):
    """--quant on infer serves the int8 graph for folder inference,
    calibrating activation scales on the inputs themselves."""
    root, data, ck = trained
    infer_out = str(root / "infer_q")
    main(["infer", "--dataset", data, "--image-size", "64",
          "--images", os.path.join(data, "test", "images"),
          "--out", infer_out, "--checkpoint", ck, "--threshold", "0.5",
          "--quant"])
    assert "layers quantized (pct scales" in capsys.readouterr().out
    outs = os.listdir(infer_out)
    assert len(outs) == 4
    im = cv2.imread(os.path.join(infer_out, outs[0]))
    assert im is not None and im.shape[2] == 3


def test_infer_unreadable_image_errors(trained):
    root, data, ck = trained
    bad = str(root / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    with pytest.raises(SystemExit, match="cannot read image"):
        main(["infer", "--dataset", data, "--image-size", "64",
              "--images", bad, "--out", str(root / "infer_bad")])


def test_verify_gt_renders(trained):
    root, data, ck = trained
    main(["verify-gt", "--dataset", data, "--phase", "train", "--limit", "2"])
    assert len(os.listdir(os.path.join(data, "train", "verify"))) == 2


def test_convert_tf1_missing_ckpt_fails_fast(trained):
    """V2 (TensorBundle) checkpoints are read natively with no TensorFlow
    (train/tensorbundle.py, tests/test_tensorbundle.py).  A missing path
    must fail fast with a clear FileNotFoundError naming the expected
    layout — not fall through to the V1 path and surface TensorFlow's
    opaque TensorSliceReader error (checkpoint.py)."""
    root, data, ck = trained
    with pytest.raises(FileNotFoundError, match="no such checkpoint"):
        main(["convert-tf1", "--ckpt", str(root / "nonexistent.ckpt"),
              "--out", str(root / "w.npy")])


def test_eval_quant_runs(trained, capsys):
    """--quant serves the int8 graph end to end; metrics stay in range and
    close to the float run on this tiny checkpoint."""
    root, data, ck = trained
    host = _eval_json(capsys, data, ck)
    q = _eval_json(capsys, data, ck, "--quant")
    assert 0.0 <= q["mAP"] <= 1.0 and 0.0 <= q["miou"] <= 1.0
    assert abs(q["miou"] - host["miou"]) < 0.2


def test_train_device_corpus_cli(trained):
    """cli train --device-corpus --steps-per-dispatch: the corpus-mode
    K-block loop runs through the CLI surface — checkpoints land on the
    save_iter cadence and metrics log every summary step, exactly like
    the wire loader path."""
    root, data, ck = trained
    out = str(root / "out_corpus")
    main(["train", "--dataset", data, "--image-size", "64",
          "--batch-size", "2", "--max-iter", "4", "--save-iter", "2",
          "--summary-iter", "2", "--stage", "1", "--output-dir", out,
          "--device-corpus", "--steps-per-dispatch", "2",
          "--no-validation"])
    cks = sorted(d for d in os.listdir(os.path.join(out, "checkpoint"))
                 if d.startswith("step_"))
    assert cks == ["step_00000002", "step_00000004"]
    rows = [json.loads(l) for l in
            open(os.path.join(out, "checkpoint", "train_metrics.jsonl"))]
    steps = [r["step"] for r in rows if r.get("kind") == "train"]
    assert steps == [2, 4]
    assert all(np.isfinite(r["total_loss"])
               for r in rows if r.get("kind") == "train")
