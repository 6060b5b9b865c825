"""Step-0 audit tool (scripts/verify_reference.py; SURVEY.md "Mandatory
verification protocol"): must detect an empty mount, and against a populated
mount must inventory files, flag missing expected components, and grep the
[M]/[L] claims."""

import sys

from scripts import verify_reference


def _run(argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["verify_reference.py"] + argv)
    return verify_reference.main()


def test_empty_mount_exit_2(tmp_path, monkeypatch):
    ref = tmp_path / "ref"
    ref.mkdir()
    assert _run(["--ref", str(ref), "--out", str(tmp_path / "a.md")],
                monkeypatch) == 2
    assert not (tmp_path / "a.md").exists()


def test_populated_mount_writes_audit(tmp_path, monkeypatch):
    ref = tmp_path / "ref"
    (ref / "dataloaders").mkdir(parents=True)
    (ref / "main.py").write_text(
        "def train():\n    adjust_learning_rate(opt, epoch)\n")
    (ref / "metrics.py").write_text(
        "class Result:\n    pass\nclass AverageMeter:\n"
        "    def update(self, v, n):\n        pass\n")
    (ref / "nuscenes_dataset.py").write_text(
        "nsweeps = 5\nth = torch.abs(radar - coarse) < 2.0\n")
    out = tmp_path / "REFERENCE_AUDIT.md"
    rc = _run(["--ref", str(ref), "--out", str(out)], monkeypatch)
    assert rc == 0
    text = out.read_text()
    assert "`main.py`" in text and "FOUND" in text
    assert "**MISSING**" in text  # criteria.py etc. absent from the fake
    assert "nuscenes_dataset.py" in text  # surfaced as not-in-survey extra
    assert "sweep-count" in text  # [M] claim section with a grep hit
    assert "nuscenes_dataset.py:1" in text
