"""Execute the API notebooks (reference analog tests/test_notebooks.py:14–30)."""

import os

import nbformat
import pytest
from nbconvert.preprocessors import ExecutePreprocessor

NB_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "notebooks"
)

NOTEBOOKS = [
    "basic_read_plotting.ipynb",
    "signal_mapping_refinement.ipynb",
    "metrics_api.ipynb",
]


@pytest.mark.parametrize("nb_name", NOTEBOOKS)
def test_notebook_executes(nb_name):
    nb_path = os.path.join(NB_DIR, nb_name)
    with open(nb_path) as fh:
        nb = nbformat.read(fh, as_version=4)
    ep = ExecutePreprocessor(timeout=600, kernel_name="python3")
    ep.preprocess(nb, {"metadata": {"path": NB_DIR}})
    # every code cell ran without error output
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        for out in cell.get("outputs", []):
            assert out.get("output_type") != "error", out
