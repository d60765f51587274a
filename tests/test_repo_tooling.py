"""Repo tooling (SURVEY §2.6 "repo tooling" row): the citation checker —
our analogue of the reference's ``utils/check_copies.py`` consistency tool."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_modules_cite_reference():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_citations.py")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_checker_flags_uncited_module(tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_citations", os.path.join(REPO, "scripts", "check_citations.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bad = tmp_path / "uncited.py"
    bad.write_text('"""No citation here."""\nX = 1\n')
    good = tmp_path / "cited.py"
    good.write_text('"""Parity with ``src/foo.py:1-2``."""\nX = 1\n')
    assert not mod.module_cites_reference(str(bad))
    assert mod.module_cites_reference(str(good))
