#!/usr/bin/env python
"""Stdlib static-analysis gate (reference parity: `scripts/verify:17-66`
runs ruff + strict mypy; neither is installed here and the environment
forbids installs, so this implements the highest-signal subset on ast +
symtable):

  F821  undefined name (referenced, never bound, not builtin/global)
  F401  unused import (module scope; re-export files can opt out)
  F811  top-level def/class redefinition
  B006  mutable default argument
  E722  bare except
  W605  invalid escape sequence (via compile warnings)

Usage: python scripts/lint.py [paths...]   (default: fastforward_tpu tests
scripts bench.py __graft_entry__.py)
Exit 1 on any finding. `# noqa` on the offending line suppresses it;
`# noqa: F401` in a module docstring line is not needed for __init__.py
re-export files (F401 is skipped for files whose name is __init__.py or
that define __all__).
"""

import ast
import builtins
import sys
import symtable
import warnings
from pathlib import Path

BUILTINS = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__all__",
    "__annotations__", "__dict__", "__class__", "WindowsError",
}


def _noqa_lines(src: str) -> set:
    return {
        i
        for i, line in enumerate(src.splitlines(), 1)
        if "# noqa" in line or "#noqa" in line
    }


def _walk_scopes(table):
    yield table
    for child in table.get_children():
        yield from _walk_scopes(child)


def check_file(path: Path) -> list:
    src = path.read_text()
    findings = []
    noqa = _noqa_lines(src)

    def add(line, code, msg):
        if line not in noqa:
            findings.append((str(path), line, code, msg))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", SyntaxWarning)
        try:
            tree = ast.parse(src, filename=str(path))
            compile(src, str(path), "exec")
        except SyntaxError as e:
            return [(str(path), e.lineno or 0, "E999", f"syntax error: {e.msg}")]
        for w in caught:
            if issubclass(w.category, SyntaxWarning):
                add(w.lineno or 0, "W605", str(w.message))

    # --- symtable pass: undefined names ------------------------------------
    table = symtable.symtable(src, str(path), "exec")
    # names bound anywhere in the file (a conservative whitelist for
    # free-variable resolution through nested scopes)
    bound_anywhere = set()
    for scope in _walk_scopes(table):
        for sym in scope.get_symbols():
            if sym.is_assigned() or sym.is_imported() or sym.is_parameter():
                bound_anywhere.add(sym.get_name())
        bound_anywhere.add(scope.get_name())
    # line numbers for Name loads so findings point somewhere useful
    name_lines = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            name_lines.setdefault(node.id, node.lineno)
    for scope in _walk_scopes(table):
        for sym in scope.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced():
                continue
            if (
                sym.is_assigned() or sym.is_imported() or sym.is_parameter()
                or sym.is_declared_global() or sym.is_nonlocal()
            ):
                continue
            if sym.is_free() or sym.is_global():
                # free/global: defined if bound in an enclosing scope,
                # module scope, or builtins
                if name in BUILTINS or name in bound_anywhere:
                    continue
                add(name_lines.get(name, 0), "F821", f"undefined name '{name}'")

    # --- AST passes --------------------------------------------------------
    # F401 unused imports (module scope only; skip re-export surfaces)
    is_reexport = path.name == "__init__.py" or "__all__" in src
    if not is_reexport:
        module_syms = {s.get_name(): s for s in table.get_symbols()}
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                    continue
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    name = (alias.asname or alias.name).split(".")[0]
                    sym = module_syms.get(name)
                    if sym is not None and not sym.is_referenced():
                        # referenced in a nested scope counts
                        if name in _nested_refs(table):
                            continue
                        add(node.lineno, "F401", f"unused import '{name}'")

    # F811 top-level redefinitions
    seen = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen and not any(
                _is_overload_or_dispatch(d) for d in node.decorator_list
            ):
                add(node.lineno, "F811",
                    f"redefinition of '{node.name}' from line {seen[node.name]}")
            seen[node.name] = node.lineno

    for node in ast.walk(tree):
        # B006 mutable defaults
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                    isinstance(d, ast.Call)
                    and isinstance(d.func, ast.Name)
                    and d.func.id in ("list", "dict", "set")
                ):
                    add(d.lineno, "B006", "mutable default argument")
        # E722 bare except
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            add(node.lineno, "E722", "bare 'except:'")

    return findings


def _nested_refs(table) -> set:
    refs = set()
    for scope in _walk_scopes(table):
        if scope.get_type() == "module":
            continue
        for sym in scope.get_symbols():
            if sym.is_referenced():
                refs.add(sym.get_name())
    return refs


def _is_overload_or_dispatch(dec) -> bool:
    name = ""
    if isinstance(dec, ast.Name):
        name = dec.id
    elif isinstance(dec, ast.Attribute):
        name = dec.attr
    elif isinstance(dec, ast.Call):
        return _is_overload_or_dispatch(dec.func)
    return name in ("overload", "register", "dispatch", "setter", "getter",
                    "property", "wraps")


def _module_exports(path: Path) -> tuple:
    """(top-level bound names, has dynamic __getattr__) for a module."""
    try:
        tree = ast.parse(path.read_text())
    except SyntaxError:
        return set(), True
    names = set()
    dynamic = False
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
            if node.name == "__getattr__":
                dynamic = True
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, ast.Import):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    dynamic = True
                else:
                    names.add(a.asname or a.name)
        elif isinstance(node, (ast.If, ast.Try)):
            # conservatively accept anything bound in conditional blocks
            for sub in ast.walk(node):
                if isinstance(sub, (ast.FunctionDef, ast.ClassDef)):
                    names.add(sub.name)
                elif isinstance(sub, ast.Name) and isinstance(
                    sub.ctx, ast.Store
                ):
                    names.add(sub.id)
                elif isinstance(sub, ast.alias):
                    names.add((sub.asname or sub.name).split(".")[0])
    return names, dynamic


def check_intra_package_imports(files, package="fastforward_tpu") -> list:
    """FF101: `from <package>.X import name` must name a top-level binding
    of X — the achievable slice of the reference's mypy import checking
    (broken intra-package imports surface at lint time, not first use)."""
    roots = {}
    for f in files:
        parts = f.with_suffix("").parts
        if package in parts:
            i = parts.index(package)
            mod = ".".join(parts[i:])
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            roots[mod] = f
    cache = {}

    def exports(mod):
        if mod not in cache:
            cache[mod] = (
                _module_exports(roots[mod]) if mod in roots else (set(), True)
            )
        return cache[mod]

    findings = []
    for f in files:
        try:
            tree = ast.parse(f.read_text())
        except SyntaxError:
            continue
        noqa = _noqa_lines(f.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.ImportFrom) or node.level:
                continue
            mod = node.module or ""
            if not mod.startswith(package) or mod not in roots:
                continue
            names, dynamic = exports(mod)
            if dynamic:
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                # a submodule import (`from pkg import sub`) is also valid
                if a.name in names or f"{mod}.{a.name}" in roots:
                    continue
                if node.lineno not in noqa:
                    findings.append((
                        str(f), node.lineno, "FF101",
                        f"'{a.name}' is not defined at the top level of "
                        f"{mod}",
                    ))
    return findings


def main(argv):
    targets = argv or [
        "fastforward_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"
    ]
    files = []
    for t in targets:
        p = Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    all_findings = []
    for f in files:
        all_findings.extend(check_file(f))
    all_findings.extend(check_intra_package_imports(files))
    for path, line, code, msg in all_findings:
        print(f"{path}:{line}: {code} {msg}")
    print(f"lint: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
