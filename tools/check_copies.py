"""Intra-repo "Copied from" consistency checker.

Capability parity with the reference's ``utils/check_copies.py`` (a
huggingface-style tool that keeps intentionally duplicated code in sync with
its source of truth). The reference walks indentation with regexes and
re-formats through black; this implementation resolves objects with ``ast``
and compares exact source segments, so it needs no formatter and handles
nested defs/decorators for free.

Convention (same spirit as the reference's):

    # Copied from dyffusion_tpu.module.path.Object [with old->new[, old2->new2]]
    def Object(...):
        ...

The marker sits on the line directly above a ``def``/``class`` (decorators
may sit between). The marked block must equal the source object's code after
applying the ``old->new`` textual replacements (and renaming the object
itself when the replacement says so).

Usage:
    python tools/check_copies.py          # exit 1 + diff listing on mismatch
    python tools/check_copies.py --fix    # rewrite stale blocks in place

Wired into ``make quality`` / ``make fix-copies``.
"""
from __future__ import annotations

import argparse
import ast
import difflib
import os
import re
import sys
import textwrap
from typing import List, Optional, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_ROOT = "dyffusion_tpu"
MARKER = re.compile(r"^(\s*)#\s*Copied from\s+(\S+)(?:\s+with\s+(.*))?\s*$")


def _resolve_module(dotted: str) -> Tuple[str, List[str]]:
    """Split ``pkg.mod.Obj.method`` into (module file path, object parts)."""
    parts = dotted.split(".")
    for i in range(len(parts), 0, -1):
        candidate = os.path.join(REPO, *parts[:i]) + ".py"
        if os.path.isfile(candidate):
            return candidate, parts[i:]
    raise ValueError(f"no module file found for '{dotted}'")


def _find_object(tree: ast.Module, src: str, parts: List[str]) -> str:
    """Return the exact source segment of the (possibly nested) object."""
    node: ast.AST = tree
    for name in parts:
        body = getattr(node, "body", [])
        for child in body:
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)) and child.name == name:
                node = child
                break
        else:
            raise ValueError(f"object part '{name}' not found")
    if node is tree:
        raise ValueError("marker must name a def/class, not a bare module")
    seg = ast.get_source_segment(src, node, padded=True)
    assert seg is not None
    return textwrap.dedent(seg)


def _apply_replacements(code: str, spec: Optional[str]) -> str:
    if not spec:
        return code
    for pair in spec.split(","):
        old, _, new = pair.strip().partition("->")
        code = code.replace(old.strip(), new.strip())
    return code


class Copy:
    def __init__(self, path: str, marker_line: int, indent: str, target: str, repl: Optional[str]):
        self.path, self.marker_line, self.indent = path, marker_line, indent
        self.target, self.repl = target, repl
        self.block_start = -1  # first line of the marked def/class (0-based)
        self.block_end = -1    # one past the last line
        self.actual = ""
        self.expected = ""


def _scan_file(path: str) -> List[Copy]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    copies: List[Copy] = []
    for lineno, line in enumerate(src.splitlines()):
        m = MARKER.match(line)
        if m:
            copies.append(Copy(path, lineno, m.group(1), m.group(2), m.group(3)))
    if not copies:
        return []

    tree = ast.parse(src)
    # index defs/classes (any nesting) by their first decorator-or-def line
    nodes = [n for n in ast.walk(tree) if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))]
    for c in copies:
        after = [
            n for n in nodes
            if (min([d.lineno for d in n.decorator_list] + [n.lineno]) - 1) > c.marker_line
        ]
        if not after:
            raise ValueError(f"{path}:{c.marker_line + 1}: marker not followed by a def/class")
        node = min(after, key=lambda n: min([d.lineno for d in n.decorator_list] + [n.lineno]))
        c.block_start = min([d.lineno for d in node.decorator_list] + [node.lineno]) - 1
        c.block_end = node.end_lineno  # type: ignore[assignment]
        seg = ast.get_source_segment(src, node, padded=True)
        assert seg is not None
        c.actual = textwrap.dedent(seg)

        mod_path, parts = _resolve_module(c.target)
        with open(mod_path, encoding="utf-8") as f:
            tgt_src = f.read()
        c.expected = _apply_replacements(_find_object(ast.parse(tgt_src), tgt_src, parts), c.repl)
    return copies


def check_copies(fix: bool = False, roots: Optional[List[str]] = None) -> List[str]:
    """Return a list of human-readable failures (empty == consistent)."""
    failures: List[str] = []
    for root_name in roots or [PKG_ROOT]:
        for dirpath, _, files in os.walk(os.path.join(REPO, root_name)):
            if "__pycache__" in dirpath:
                continue
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fname)
                stale = [c for c in _scan_file(path) if c.actual != c.expected]
                if not stale:
                    continue
                if fix:
                    _rewrite(path, stale)
                    continue
                for c in stale:
                    rel = os.path.relpath(path, REPO)
                    diff = "\n".join(difflib.unified_diff(
                        c.expected.splitlines(), c.actual.splitlines(),
                        "source-of-truth", rel, lineterm="", n=1,
                    ))
                    failures.append(f"{rel}:{c.marker_line + 1}: out of sync with {c.target}\n{diff}")
    return failures


def _rewrite(path: str, stale: List[Copy]) -> None:
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines(keepends=True)
    # bottom-up so earlier line numbers stay valid
    for c in sorted(stale, key=lambda c: -c.block_start):
        block = textwrap.indent(c.expected, c.indent)
        if not block.endswith("\n"):
            block += "\n"
        lines[c.block_start:c.block_end] = [block]
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(lines))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fix", action="store_true", help="rewrite stale copies in place")
    args = p.parse_args()
    failures = check_copies(fix=args.fix)
    for f in failures:
        print(f, file=sys.stderr)
    if failures:
        print(f"\n{len(failures)} stale cop{'y' if len(failures) == 1 else 'ies'}; "
              f"run `make fix-copies`.", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
