"""Source hygiene: no unused imports in the package.

AST-based (no linter is installed on this box): an imported name is
"used" if it appears as a load anywhere else in the module, including
inside docstring-level strings like ``__all__``. ``__init__.py`` files
are export surfaces and are exempt.
"""

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "tinyllama_tpu"


def _imported_names(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node.lineno, (a.asname or a.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                yield node.lineno, (a.asname or a.name)


def _used_names(tree: ast.AST):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # base Name node is walked separately
    return used


def test_no_unused_imports():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        if path.name == "__init__.py":
            continue
        src = path.read_text()
        tree = ast.parse(src)
        used = _used_names(tree)
        # names referenced only in __all__ strings still count as used
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                used.add(node.value)
        for lineno, name in _imported_names(tree):
            if name == "annotations":  # from __future__
                continue
            if name not in used:
                offenders.append(f"{path.relative_to(PKG.parent)}:{lineno} {name}")
    assert not offenders, "unused imports:\n" + "\n".join(offenders)
