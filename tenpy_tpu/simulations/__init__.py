"""Config-driven simulations: drivers, measurements, post-processing (SURVEY §2.5)."""
from . import simulation, measurement, post_processing, time_evolution, \
    ground_state_search
from .simulation import (Simulation, GroundStateSearch, RealTimeEvolution,
                         run_simulation, resume_from_checkpoint, run_seq_simulations)
from .time_evolution import (TimeDependentCorrelation,
                             TimeDependentCorrelationEvolveBraKet,
                             SpectralSimulation, SpectralSimulationEvolveBraKet)
from .ground_state_search import OrthogonalExcitations, PlaneWaveExcitations

__all__ = ['simulation', 'measurement', 'post_processing', 'time_evolution',
           'ground_state_search', 'OrthogonalExcitations', 'PlaneWaveExcitations',
           'Simulation', 'GroundStateSearch', 'RealTimeEvolution',
           'TimeDependentCorrelation', 'TimeDependentCorrelationEvolveBraKet',
           'SpectralSimulation', 'SpectralSimulationEvolveBraKet',
           'run_simulation', 'resume_from_checkpoint', 'run_seq_simulations']
