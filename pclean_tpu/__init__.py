"""pclean_tpu: a TPU-native probabilistic data-cleaning framework.

A from-scratch JAX/XLA re-design of the PClean probabilistic programming
system for Bayesian data cleaning (reference: probcomp/PClean, Lew et al.,
AISTATS 2021). Relational generative models over a latent database are
expressed in a Python DSL, compiled to dense vectorized enumeration kernels
over interned value vocabularies, and fit with SMC initialization plus
particle-Gibbs/MH rejuvenation — batched, jitted, and shardable over device
meshes instead of the reference's single-threaded per-row interpreter.
"""
from . import dists, io, utils
from .dists import *  # noqa: F401,F403
from .model.builder import ModelBuilder
from .model.query import ObservedDataset, Query

__all__ = ["ModelBuilder", "Query", "ObservedDataset", "dists", "io", "utils"]
__version__ = "0.1.0"
