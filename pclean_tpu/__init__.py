"""pclean_tpu: a TPU-native probabilistic data-cleaning framework.

A from-scratch JAX/XLA re-design of the PClean probabilistic programming
system for Bayesian data cleaning (reference: probcomp/PClean, Lew et al.,
AISTATS 2021). Relational generative models over a latent database are
expressed in a Python DSL, compiled to dense vectorized enumeration kernels
over interned value vocabularies, and fit with SMC initialization plus
particle-Gibbs/MH rejuvenation — batched, jitted, and shardable over device
meshes instead of the reference's single-threaded per-row interpreter.
"""
import os as _os

# Persistent XLA compilation cache: proposal programs are traced per
# (class, block) and reused across runs; must be set before jax initializes.
if _os.environ.get("PCLEAN_JAX_CACHE", "1") != "0":
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                           _os.path.expanduser("~/.cache/pclean_tpu_jax"))
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from . import dists, io, utils
from .dists import *  # noqa: F401,F403
from .model.builder import ModelBuilder
from .model.query import ObservedDataset, Query


def compile_model(model, datasets, **kw):
    from .engine.compile import compile_model as _c

    return _c(model, datasets, **kw)


def init_state(cm, key):
    from .engine.compile import init_state as _i

    return _i(cm, key)


def __getattr__(name):
    # heavy engine symbols resolved lazily so `import pclean_tpu` stays light
    if name == "Engine":
        from .engine.smc import Engine

        return Engine
    if name == "InferenceConfig":
        from .engine.smc import InferenceConfig

        return InferenceConfig
    if name == "evaluate_accuracy":
        from .analysis import evaluate_accuracy

        return evaluate_accuracy
    if name == "save_results":
        from .analysis import save_results

        return save_results
    raise AttributeError(name)


__all__ = ["ModelBuilder", "Query", "ObservedDataset", "compile_model",
           "init_state", "Engine", "InferenceConfig", "evaluate_accuracy",
           "save_results", "dists", "io", "utils"]
__version__ = "0.1.0"
