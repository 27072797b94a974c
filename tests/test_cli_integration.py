"""CLI integration: synth -> train (stage 1 + stage-2 bridge) -> eval ->
infer, end to end at tiny scale."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dis_yolo_tpu.cli import main  # noqa: E402


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch=None):
    root = tmp_path_factory.mktemp("cli_e2e")
    data = str(root / "data")
    main(["synth", "--dataset", data, "--images", "4", "--size", "128"])
    return root, data


def test_full_cli_workflow(workdir, capsys, monkeypatch):
    root, data = workdir
    out1 = str(root / "out_stage1")
    monkeypatch.chdir(root)

    # stage 1: 4 steps, checkpoint+validation at 2 and 4
    main(["train", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--max-iter", "4", "--save-iter", "2", "--summary-iter", "2",
          "--stage", "1", "--output-dir", out1])
    cks = sorted(d for d in os.listdir(os.path.join(out1, "checkpoint"))
                 if d.startswith("step_"))
    assert cks == ["step_00000002", "step_00000004"]
    ck = os.path.join(out1, "checkpoint", cks[-1])
    assert os.path.isdir(os.path.join(ck, "state"))
    assert os.path.isdir(os.path.join(ck, "weights"))
    # metrics stream exists
    assert os.path.isfile(os.path.join(out1, "checkpoint",
                                       "train_metrics.jsonl"))
    capsys.readouterr()

    # stage 2 from stage-1 weights
    out2 = str(root / "out_stage2")
    main(["train", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--max-iter", "2", "--save-iter", "2", "--summary-iter", "2",
          "--stage", "2", "--output-dir", out2, "--weights-from", ck,
          "--no-validation"])
    ck2 = os.path.join(out2, "checkpoint", "step_00000002")
    assert os.path.isdir(ck2)
    capsys.readouterr()

    # eval prints one JSON line with the full metric set
    main(["eval", "--dataset", data, "--image-size", "64", "--batch-size", "2",
          "--phase", "test", "--checkpoint", ck2])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert set(res) >= {"AP", "mAP", "recall", "precision", "iou", "miou",
                        "s_per_image"}
    assert len(res["AP"]) == 3 and len(res["iou"]) == 4
    assert res["s_per_image"] > 0

    # infer writes an overlay per image
    infer_out = str(root / "infer")
    main(["infer", "--dataset", data, "--image-size", "64",
          "--images", os.path.join(data, "test", "images"),
          "--out", infer_out, "--checkpoint", ck2, "--threshold", "0.5"])
    outs = os.listdir(infer_out)
    assert len(outs) == 4
    im = cv2.imread(os.path.join(infer_out, outs[0]))
    assert im is not None and im.shape[2] == 3

    # verify-gt renders overlays
    main(["verify-gt", "--dataset", data, "--phase", "train", "--limit", "2"])
    assert len(os.listdir(os.path.join(data, "train", "verify"))) == 2
