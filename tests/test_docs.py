"""Docs integrity: the executed tutorial notebook ships without errors."""

import json
import os

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_tutorial_notebook_executed_without_errors():
    with open(os.path.join(DOCS, "tutorial.ipynb")) as f:
        nb = json.load(f)
    code = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code) >= 6
    executed = [c for c in code if c.get("execution_count")]
    assert executed, "notebook must ship with outputs (executed)"
    for c in code:
        for o in c.get("outputs", []):
            assert o.get("output_type") != "error", o.get("evalue")
    # at least 3 rendered figures
    n_img = sum(1 for c in code for o in c.get("outputs", [])
                if "image/png" in o.get("data", {}))
    assert n_img >= 3
