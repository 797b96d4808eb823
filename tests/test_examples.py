"""Execute the example scripts under pytest (reference tests/test_examples.py)."""
import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')


@pytest.mark.parametrize('script', [
    'a_np_conserved.py', 'b_mps.py', 'd_dmrg.py', 'c_tebd.py', 'e_tdvp.py',
    'model_custom.py', 'purification.py', 'z_exact_diag.py', 'tfi_exact.py',
    'advanced/mpo_exponential_decay.py',
    'userguide/a_npc_arrays_triv.py', 'userguide/b_npc_arrays.py',
    'userguide/c_mps_mpo.py', 'userguide/d_model_1D.py',
    'userguide/e_model_2D.py'])
def test_example(script):
    path = os.path.join(EXAMPLES, script)
    runpy.run_path(path, run_name='__main__')


@pytest.mark.slow
@pytest.mark.parametrize('script', [
    'userguide/f_dmrg_finite.py', 'userguide/g_dmrg_infinite.py',
    'userguide/h_tebd_infinite.py'])
def test_userguide_slow(script):
    path = os.path.join(EXAMPLES, script)
    runpy.run_path(path, run_name='__main__')


@pytest.mark.slow
@pytest.mark.parametrize('script', [
    'advanced/central_charge_ising.py', 'advanced/xxz_corr_length.py',
    'advanced/tfi_phase_transition.py', 'advanced/tfi_segment.py',
    'advanced/vumps_and_plane_wave.py', 'chern_insulators/haldane.py',
    'chern_insulators/chiral_pi_flux.py'])
def test_example_slow(script):
    path = os.path.join(EXAMPLES, script)
    runpy.run_path(path, run_name='__main__')


@pytest.mark.parametrize('yml', ['minimal_DMRG.yml', 'sequential_chi_ramp.yml',
                                 '../userguide/i_dmrg_parameters.yml'])
def test_yaml_example(yml, tmp_path, monkeypatch):
    """Drive the CLI (console_main) on the shipped yaml configs, with cheap
    overrides so the whole thing runs in seconds."""
    import tenpy_tpu
    monkeypatch.chdir(tmp_path)
    path = os.path.join(EXAMPLES, 'yaml', yml)
    overrides = ['-o', 'model_params.L=8',
                 '-o', 'algorithm_params.max_sweeps=2',
                 '-o', 'log_params.to_stdout=None']
    if yml == 'sequential_chi_ramp.yml':
        overrides += ['-o',
                      'algorithm_params.trunc_params.chi_max=[8, 16]']
    if yml.endswith('i_dmrg_parameters.yml'):
        overrides += ['-o', 'directory=.',
                      '-o', "algorithm_params.chi_list={0: 16}"]
    assert tenpy_tpu.console_main([path] + overrides) == 0
    assert any(f.suffix in ('.pkl', '.h5') for f in tmp_path.iterdir())
