"""The shipped quickstart notebook must stay valid: JSON/nbformat structure,
every code cell compiles as Python, and every `flocoder_tpu` name it imports
actually exists (reference ships notebooks/SD_Flower_Flow.ipynb; ours is
notebooks/quickstart.ipynb)."""
import ast
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_PATH = os.path.join(REPO, "notebooks", "quickstart.ipynb")


def _load():
    with open(NB_PATH) as f:
        return json.load(f)


def test_notebook_structure():
    nb = _load()
    assert nb["nbformat"] == 4
    kinds = {c["cell_type"] for c in nb["cells"]}
    assert kinds == {"markdown", "code"}
    # the walkthrough covers all three pipeline scripts
    text = "".join("".join(c["source"]) for c in nb["cells"])
    for script in ("preencode_data.py", "train_flow.py",
                   "generate_samples.py"):
        assert script in text, f"notebook no longer runs {script}"


def test_notebook_code_cells_compile():
    nb = _load()
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 6
    for i, cell in enumerate(code_cells):
        src = "".join(cell["source"])
        compile(src, f"quickstart-cell-{i}", "exec")  # raises on syntax error


def test_notebook_imports_resolve():
    """Every name the notebook imports from the package must exist, so the
    walkthrough can't silently rot when the public API moves."""
    import importlib
    nb = _load()
    wanted = []  # (module, name)
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        tree = ast.parse("".join(cell["source"]))
        for node in ast.walk(tree):
            if (isinstance(node, ast.ImportFrom) and node.module
                    and node.module.startswith("flocoder_tpu")):
                wanted += [(node.module, a.name) for a in node.names]
    assert wanted, "notebook imports nothing from flocoder_tpu?"
    for module, name in wanted:
        mod = importlib.import_module(module)
        assert hasattr(mod, name), f"{module}.{name} missing"
