"""Config-driven simulations: drivers, measurements, post-processing (SURVEY §2.5)."""
from . import simulation, measurement, post_processing
from .simulation import (Simulation, GroundStateSearch, RealTimeEvolution,
                         run_simulation, resume_from_checkpoint, run_seq_simulations)

__all__ = ['simulation', 'measurement', 'post_processing', 'Simulation',
           'GroundStateSearch', 'RealTimeEvolution', 'run_simulation',
           'resume_from_checkpoint', 'run_seq_simulations']
