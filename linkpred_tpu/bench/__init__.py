"""Experiment harness, synthetic graphs, log post-processing, sweeps."""
from .harness import ALL_DEGREES, ExperimentConfig, run_batches, run_experiment
from .synth import rmat_graph

__all__ = ["ALL_DEGREES", "ExperimentConfig", "run_batches", "run_experiment",
           "rmat_graph"]
