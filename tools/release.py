"""Release version bumper.

Capability parity with the reference's ``utils/release.py`` (its HF-style
pre/post-release flow over setup.py + src/__init__.py). Here the version is
single-sourced: ``dyffusion_tpu/__init__.py`` holds ``__version__`` and
``pyproject.toml`` reads it dynamically, so exactly one file is rewritten.

    python tools/release.py                 # pre-release: strip .devN
    python tools/release.py --version 1.2.0 # explicit version
    python tools/release.py --patch         # pre-release: bump patch, strip .devN
    python tools/release.py --post          # post-release: bump minor, add .dev0
    python tools/release.py --check         # print current version, change nothing
"""
from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "dyffusion_tpu", "__init__.py")
VERSION_RE = re.compile(r'^__version__\s*=\s*"([^"]+)"\s*$', re.MULTILINE)
SEMVER_RE = re.compile(r"^(\d+)\.(\d+)\.(\d+)(?:\.dev(\d+))?$")


def read_version() -> str:
    with open(INIT, encoding="utf-8") as f:
        m = VERSION_RE.search(f.read())
    if not m:
        raise RuntimeError(f"no __version__ in {INIT}")
    return m.group(1)


def write_version(version: str) -> None:
    if not SEMVER_RE.match(version):
        raise ValueError(f"'{version}' is not MAJOR.MINOR.PATCH[.devN]")
    with open(INIT, encoding="utf-8") as f:
        code = f.read()
    code = VERSION_RE.sub(f'__version__ = "{version}"', code, count=1)
    with open(INIT, "w", encoding="utf-8") as f:
        f.write(code)


def pre_release_version(current: str, bump_patch: bool = False) -> str:
    """Strip any .devN; optionally bump the patch number."""
    m = SEMVER_RE.match(current)
    if not m:
        raise ValueError(f"cannot parse '{current}'")
    major, minor, patch = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if bump_patch:
        patch += 1
    return f"{major}.{minor}.{patch}"


def post_release_version(current: str) -> str:
    """After tagging: bump minor, reset patch, open the next dev cycle."""
    m = SEMVER_RE.match(current)
    if not m:
        raise ValueError(f"cannot parse '{current}'")
    return f"{m.group(1)}.{int(m.group(2)) + 1}.0.dev0"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    g = p.add_mutually_exclusive_group()
    g.add_argument("--version", help="set this exact version")
    g.add_argument("--patch", action="store_true", help="pre-release with a patch bump")
    g.add_argument("--post", action="store_true", help="post-release: next minor .dev0")
    g.add_argument("--check", action="store_true", help="print the current version")
    args = p.parse_args()

    current = read_version()
    if args.check:
        print(current)
        return 0
    if args.version:
        new = args.version
        if not SEMVER_RE.match(new):
            print(f"invalid version '{new}'", file=sys.stderr)
            return 1
    elif args.post:
        new = post_release_version(current)
    else:
        new = pre_release_version(current, bump_patch=args.patch)
    write_version(new)
    print(f"{current} -> {new}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
