"""Pin the evidence-aggregation math in scripts/r4_summarize.py.

Every mean ± half-spread quoted in NOTES.md/README.md (the 4-seed crossing
table, the severity error bars) comes out of this script — a silent
regression in its tag parsing, first-dir-wins collision rule, or spread
arithmetic would corrupt the committed narrative without failing any other
test. Fixture eval files mimic scripts/eval_two_stage.py output: a header
line plus a trailing JSON line (last JSON line wins).
"""

import json
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "r4_summarize.py")


def _eval_file(path, c_rmse, r_rmse):
    body = {
        "coarse": {"rmse": c_rmse, "mae": c_rmse / 2, "absrel": 0.1},
        "refined": {"rmse": r_rmse, "mae": r_rmse / 2, "absrel": 0.1},
    }
    with open(path, "w") as f:
        f.write("run=x filter=rel val n=8 split=night\n")
        f.write("not json {\n")  # a non-JSON '{' line must be skipped
        f.write(json.dumps(body) + "\n")


def _run(dirs):
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--dir", *dirs],
        capture_output=True, text=True, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_mean_half_spread_across_seeds(tmp_path):
    d = tmp_path / "r"
    d.mkdir()
    # seed 42: +10% delta; seed 43: -20% delta  -> mean -5%, half-spread 15%
    _eval_file(d / "s1_sd42_eval_night.txt", 4.0, 4.4)
    _eval_file(d / "s1_sd43_eval_night.txt", 4.0, 3.2)
    out = _run([str(d)])
    assert "s1/sd42" in out and "s1/sd43" in out
    assert "-5.00% ± 15.00%  (n=2)" in out


def test_first_dir_wins_on_collisions(tmp_path):
    """Re-run evals in a later dir must NOT override the first dir listed
    (the r4-then-r5 merge rule the 4-seed tables rely on)."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    _eval_file(a / "ns10_sd44_eval_night.txt", 5.0, 4.0)  # -20%
    _eval_file(b / "ns10_sd44_eval_night.txt", 5.0, 6.0)  # +20% (ignored)
    _eval_file(b / "ns10_sd45_eval_night.txt", 5.0, 5.0)  # 0%
    out = _run([str(a), str(b)])
    assert "-10.00% ± 10.00%  (n=2)" in out  # mean(-20, 0), not mean(+20, 0)


def test_arm_suffixes_are_distinct_chains(tmp_path):
    """_ms and _a4 arms must not pool with the base chain's seeds."""
    d = tmp_path / "r"
    d.mkdir()
    _eval_file(d / "s1_sd42_eval_night.txt", 4.0, 4.0)
    _eval_file(d / "s1_sd42_ms_eval_night.txt", 4.0, 4.8)
    _eval_file(d / "s1_sd42_a4_eval_night.txt", 4.0, 3.6)
    out = _run([str(d)])
    assert "s1/sd42" in out
    assert "s1_ms/sd42" in out
    assert "s1_a4/sd42" in out
    # single seed per chain -> no n>=2 aggregate rows at all
    assert "(n=" not in out
