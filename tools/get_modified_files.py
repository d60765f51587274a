"""Print the .py files modified since the fork point from main, restricted to
the given top-level directories — feeds ``make modified-quality`` so lint
runs on the diff only (the reference's ``utils/get_modified_files.py`` flow).

    python tools/get_modified_files.py dyffusion_tpu tests tools scripts

Output is space-joined with no trailing newline (consumed by Makefile
``$(shell ...)``); untracked files are included (they are part of the diff a
lint pass should see — one deliberate improvement over the reference, which
misses brand-new files).
"""
from __future__ import annotations

import re
import subprocess
import sys


def modified_py_files(dirs: list[str], cwd: str | None = None) -> list[str]:
    fork = subprocess.check_output(["git", "merge-base", "main", "HEAD"], cwd=cwd).decode().strip()
    tracked = subprocess.check_output(["git", "diff", "--name-only", fork], cwd=cwd).decode().split()
    untracked = subprocess.check_output(
        ["git", "ls-files", "--others", "--exclude-standard"], cwd=cwd
    ).decode().split()
    pattern = re.compile(rf"^({'|'.join(map(re.escape, dirs))})/.*\.py$")
    seen, out = set(), []
    for path in tracked + untracked:
        if pattern.match(path) and path not in seen:
            seen.add(path)
            out.append(path)
    return out


if __name__ == "__main__":
    print(" ".join(modified_py_files(sys.argv[1:])), end="")
