"""Execute the example scripts under pytest (reference tests/test_examples.py)."""
import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')


@pytest.mark.parametrize('script', [
    'a_np_conserved.py', 'b_mps.py', 'd_dmrg.py', 'c_tebd.py', 'e_tdvp.py',
    'model_custom.py', 'purification.py', 'z_exact_diag.py'])
def test_example(script):
    path = os.path.join(EXAMPLES, script)
    runpy.run_path(path, run_name='__main__')
