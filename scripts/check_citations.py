"""Repo consistency check: every source module must cite its reference
counterpart (the analogue of the reference's ``utils/check_copies.py``,
which polices its "# Copied from" comment convention; ours polices the
``ref file:line`` citation convention the parity story depends on).

Usage: ``python scripts/check_citations.py`` — exit 1 with a listing if any
non-package module under ``dyffusion_tpu/`` lacks a reference citation
(``src/<file>`` path or the word "reference") in its module docstring.
Wired into ``make quality``.
"""
from __future__ import annotations

import ast
import os
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dyffusion_tpu")


def module_cites_reference(path: str) -> bool:
    with open(path) as f:
        tree = ast.parse(f.read())
    doc = ast.get_docstring(tree) or ""
    return "src/" in doc or "reference" in doc.lower()


def main() -> int:
    missing = []
    for root, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py") or f == "__init__.py":
                continue
            path = os.path.join(root, f)
            if not module_cites_reference(path):
                missing.append(os.path.relpath(path, os.path.dirname(PKG)))
    if missing:
        print("modules missing a reference citation in their docstring:")
        for m in missing:
            print(f"  {m}")
        return 1
    print("check_citations: all modules cite their reference counterpart")
    return 0


if __name__ == "__main__":
    sys.exit(main())
