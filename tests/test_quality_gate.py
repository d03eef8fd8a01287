"""The quality gate must FAIL a simulated PSNR collapse (VERDICT r3 weak
#2: the round-3 bar of 15 would have passed a halved-PSNR regression).
Exercises scripts/psnr_gate.py — the exact check quality_check.sh runs —
against a healthy and a halved metric file."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
GATE = REPO / "scripts" / "psnr_gate.py"

# the pinned-scene measured value feeds BAR = measured − 1 dB; use a
# representative measurement for the simulation
MEASURED = 29.4
BAR = MEASURED - 1.0


def _run(tmp_path, vals):
    (tmp_path / "psnr_test.txt").write_text(
        "".join(f"view{i} {v}\n" for i, v in enumerate(vals))
    )
    return subprocess.run(
        [sys.executable, str(GATE), str(tmp_path), str(BAR)],
        capture_output=True, text=True,
    )


def test_healthy_passes(tmp_path):
    r = _run(tmp_path, [MEASURED - 0.3, MEASURED + 0.2, MEASURED])
    assert r.returncode == 0, r.stdout + r.stderr


def test_halved_psnr_fails(tmp_path):
    r = _run(tmp_path, [MEASURED / 2] * 3)
    assert r.returncode != 0, r.stdout + r.stderr
    assert "FAIL" in r.stdout


def test_one_db_regression_fails(tmp_path):
    r = _run(tmp_path, [MEASURED - 1.2] * 3)
    assert r.returncode != 0, r.stdout + r.stderr
