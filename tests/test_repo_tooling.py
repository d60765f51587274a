"""Repo tooling (SURVEY §2.6 "repo tooling" row): the citation checker, the
``tools/`` suite (check_copies / release / get_modified_files — analogues of
the reference's ``utils/`` trio), and the pip packaging metadata.

Note the reference's own ``utils/check_copies.py`` polices a "# Copied from"
convention that appears ZERO times in its ``src/`` — the tool is live but the
convention is unused there too, so fixture-driven tests are exact parity.
"""
import importlib.util
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_all_modules_cite_reference():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_citations.py")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_checker_flags_uncited_module(tmp_path, monkeypatch):
    mod = _load(os.path.join(REPO, "scripts", "check_citations.py"), "check_citations")
    bad = tmp_path / "uncited.py"
    bad.write_text('"""No citation here."""\nX = 1\n')
    good = tmp_path / "cited.py"
    good.write_text('"""Parity with ``src/foo.py:1-2``."""\nX = 1\n')
    assert not mod.module_cites_reference(str(bad))
    assert mod.module_cites_reference(str(good))


# ---------------------------------------------------------------- check_copies

def _copies_fixture(tmp_path, body_of_copy):
    """A tiny package with a source-of-truth and a marked copy of it."""
    pkg = tmp_path / "pkg"
    pkg.mkdir(exist_ok=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "truth.py").write_text(textwrap.dedent('''\
        def helper(x):
            """Docstring."""
            y = x + 1
            return y * 2
    '''))
    (pkg / "copy.py").write_text(
        "# Copied from pkg.truth.helper\n" + textwrap.dedent(body_of_copy)
    )
    return pkg


def test_check_copies_in_sync_and_stale(tmp_path, monkeypatch):
    cc = _load(os.path.join(REPO, "tools", "check_copies.py"), "check_copies_tool")
    monkeypatch.setattr(cc, "REPO", str(tmp_path))

    _copies_fixture(tmp_path, '''\
        def helper(x):
            """Docstring."""
            y = x + 1
            return y * 2
    ''')
    assert cc.check_copies(roots=["pkg"]) == []

    # drift the copy -> flagged with a diff naming the source of truth
    _copies_fixture(tmp_path, '''\
        def helper(x):
            """Docstring."""
            y = x + 2
            return y * 2
    ''')
    failures = cc.check_copies(roots=["pkg"])
    assert len(failures) == 1 and "pkg.truth.helper" in failures[0]

    # --fix rewrites the block back to the source of truth
    assert cc.check_copies(roots=["pkg"], fix=True) == []
    assert cc.check_copies(roots=["pkg"]) == []
    assert "x + 1" in (tmp_path / "pkg" / "copy.py").read_text()


def test_check_copies_with_replacements(tmp_path, monkeypatch):
    cc = _load(os.path.join(REPO, "tools", "check_copies.py"), "check_copies_tool2")
    monkeypatch.setattr(cc, "REPO", str(tmp_path))
    pkg = _copies_fixture(tmp_path, "def unused(x):\n    return x\n")
    (pkg / "copy.py").write_text(
        "# Copied from pkg.truth.helper with helper->helper2, x + 1->x + 3\n"
        + textwrap.dedent('''\
            def helper2(x):
                """Docstring."""
                y = x + 3
                return y * 2
        ''')
    )
    assert cc.check_copies(roots=["pkg"]) == []


def test_check_copies_live_repo_is_clean():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_copies.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr


# -------------------------------------------------------------------- release

def test_release_version_math(tmp_path, monkeypatch):
    rel = _load(os.path.join(REPO, "tools", "release.py"), "release_tool")
    assert rel.pre_release_version("0.2.0.dev0") == "0.2.0"
    assert rel.pre_release_version("0.2.0", bump_patch=True) == "0.2.1"
    assert rel.post_release_version("0.2.1") == "0.3.0.dev0"

    init = tmp_path / "__init__.py"
    init.write_text('"""pkg."""\n\n__version__ = "0.1.0"\n')
    monkeypatch.setattr(rel, "INIT", str(init))
    assert rel.read_version() == "0.1.0"
    rel.write_version("1.0.0")
    assert rel.read_version() == "1.0.0"
    try:
        rel.write_version("not-a-version")
        raise AssertionError("invalid version accepted")
    except ValueError:
        pass


def test_release_reads_live_version():
    rel = _load(os.path.join(REPO, "tools", "release.py"), "release_tool_live")
    import dyffusion_tpu

    assert rel.read_version() == dyffusion_tpu.__version__


# ---------------------------------------------------------- get_modified_files

def test_get_modified_files_filters(tmp_path):
    gmf = _load(os.path.join(REPO, "tools", "get_modified_files.py"), "gmf_tool")
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t", "GIT_COMMITTER_NAME": "t",
           "GIT_COMMITTER_EMAIL": "t@t", "PATH": os.environ["PATH"], "HOME": str(tmp_path)}

    def git(*args):
        subprocess.run(["git", *args], cwd=tmp_path, check=True, capture_output=True, env=env)

    git("init", "-q", "-b", "main")
    (tmp_path / "pkg").mkdir()
    (tmp_path / "pkg" / "a.py").write_text("A = 1\n")
    (tmp_path / "other.py").write_text("B = 1\n")
    git("add", "-A")
    git("commit", "-q", "-m", "base")
    # modify a tracked file in pkg/, add an untracked one, touch a non-pkg file
    (tmp_path / "pkg" / "a.py").write_text("A = 2\n")
    (tmp_path / "pkg" / "new.py").write_text("C = 1\n")
    (tmp_path / "other.py").write_text("B = 2\n")
    got = gmf.modified_py_files(["pkg"], cwd=str(tmp_path))
    assert got == ["pkg/a.py", "pkg/new.py"]


# ------------------------------------------------------------------ packaging

def test_pyproject_metadata():
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "dyffusion-tpu"
    assert "version" in proj["dynamic"]
    attr = meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "dyffusion_tpu.__version__"
    # the console script target exists and is callable
    mod_name, func = proj["scripts"]["dyffusion-tpu"].split(":")
    import importlib

    fn = getattr(importlib.import_module(mod_name), func)
    assert callable(fn)
    # the runtime native source ships with the wheel
    pkg_data = meta["tool"]["setuptools"]["package-data"]["dyffusion_tpu.data"]
    assert "_native/*.cpp" in pkg_data
