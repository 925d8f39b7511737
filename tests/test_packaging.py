"""Packaging audit: every module-top-level import in surya_tpu must be either
stdlib or a declared dependency in pyproject.toml.

Round-4 verdict found `import cv2` / `from tqdm import tqdm` at module top in
8 files while pyproject declared neither — `pip install surya-tpu` followed by
`import surya_tpu.detection` failed in a clean venv. This test walks the AST
of every package module and fails if an UNGUARDED top-level import resolves to
a package outside the declared dependency set (optional deps must be imported
lazily or inside try/except, as surya_tpu.input.load does for pypdfium2).
"""

import ast
import pathlib
import sys
import tomllib

REPO = pathlib.Path(__file__).resolve().parent.parent

# import name → PyPI distribution name, for deps whose names differ
IMPORT_TO_DIST = {
    "PIL": "pillow",
    "cv2": "opencv-python-headless",
    "orbax": "orbax-checkpoint",
}


def _declared_dependency_imports():
    with open(REPO / "pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]
    dists = set()
    for spec in proj["dependencies"]:
        dists.add(spec.split("[")[0].split(">=")[0].split("==")[0].strip())
    dist_to_import = {v: k for k, v in IMPORT_TO_DIST.items()}
    return {dist_to_import.get(d, d.replace("-", "_")) for d in dists}


def test_top_level_imports_are_declared():
    allowed = _declared_dependency_imports()
    std = sys.stdlib_module_names
    violations = []
    for path in (REPO / "surya_tpu").rglob("*.py"):
        tree = ast.parse(path.read_text())
        # only direct module-body imports: anything inside a function, class,
        # try/except, or `if` guard is lazy/optional by construction
        for node in tree.body:
            if isinstance(node, ast.Import):
                mods = [a.name.split(".")[0] for a in node.names]
            elif isinstance(node, ast.ImportFrom) and node.level == 0 and node.module:
                mods = [node.module.split(".")[0]]
            else:
                continue
            for mod in mods:
                if mod in std or mod == "surya_tpu":
                    continue
                if mod not in allowed:
                    violations.append(f"{path.relative_to(REPO)}:{node.lineno} imports {mod!r}")
    assert not violations, (
        "undeclared top-level imports (declare in pyproject dependencies or "
        "make the import lazy):\n" + "\n".join(violations)
    )


def test_core_predictor_modules_need_only_declared_deps():
    """The five predictor packages' import graphs (module-level, transitive
    within surya_tpu) must not pull in optional extras."""
    optional = {"pypdfium2", "streamlit", "orbax", "safetensors", "torch", "transformers"}
    std = sys.stdlib_module_names
    offenders = []
    for pkg in ("detection", "recognition", "layout", "table_rec", "ocr_error"):
        seen, queue = set(), [REPO / "surya_tpu" / pkg / "__init__.py"]
        while queue:
            path = queue.pop()
            if path in seen or not path.exists():
                continue
            seen.add(path)
            for node in ast.parse(path.read_text()).body:
                if isinstance(node, ast.Import):
                    mods = [a.name for a in node.names]
                elif isinstance(node, ast.ImportFrom) and node.level == 0 and node.module:
                    mods = [node.module]
                else:
                    continue
                for mod in mods:
                    top = mod.split(".")[0]
                    if top == "surya_tpu":
                        rel = mod.split(".")[1:]
                        base = REPO.joinpath("surya_tpu", *rel)
                        queue.append(base.with_suffix(".py"))
                        queue.append(base / "__init__.py")
                    elif top in optional:
                        offenders.append(f"{path.relative_to(REPO)} pulls optional {top!r} into surya_tpu.{pkg}")
                    elif top not in std:
                        pass  # covered by test_top_level_imports_are_declared
    assert not offenders, "\n".join(offenders)
