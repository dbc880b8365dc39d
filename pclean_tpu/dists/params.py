"""Learned-parameter specs and their array-backed conjugate state.

Counterpart of the reference Parameter/BasicParameter/ParameterPrior
interface (distributions.jl:27-61) and the three concrete conjugate families:

  * ProportionsParameter — Dirichlet-categorical
    (choose_proportionally.jl:23-89)
  * ProbParameter — Beta-Bernoulli (maybe_swap.jl:41-95)
  * MeanParameter — Normal-Normal with per-noise-std sufficient statistics
    (add_noise.jl:12-82)

The TPU-native re-design: every parameter's state is a pytree of fixed-shape
arrays. "Indexed" parameters (reference IndexedParameter, distributions.jl:
45-61 — a lazily-growing Dict of parameters sharing one prior) become a
leading index axis of static size |key vocab|: indices are interned at model
compile time, so lazy instantiation is just "rows whose counts are still
zero". incorporate/unincorporate become scatter-adds emitted by the engine;
resample_value! becomes one vectorized conjugate draw per family.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Specs (what the user declares with @learned)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Proportions:
    """Dirichlet prior over an options vector.

    concentration: scalar (reference VariableSizeProportionsParameterPrior)
    or vector (ProportionsParameterPrior), choose_proportionally.jl:23-42.
    """

    concentration: Union[float, tuple] = 1.0


@dataclass(frozen=True)
class Prob:
    """Beta(a, b) prior on a Bernoulli probability (maybe_swap.jl:41-57).

    Matches reference default_prior overloads: Prob() = Beta(1, 3);
    Prob(odds) = Beta(4*odds, 4*(1-odds)); Prob(a, b) = Beta(a, b).
    """

    a: float = 1.0
    b: float = 3.0

    @staticmethod
    def from_odds(odds: float) -> "Prob":
        return Prob(odds * 4.0, (1.0 - odds) * 4.0)


@dataclass(frozen=True)
class Mean:
    """Normal(mean, std) prior on the mean of a Gaussian (add_noise.jl:29-34).

    Mean(m) uses std = 0.5*|m|, like the reference's one-arg default_prior.
    """

    mean: float
    std: Optional[float] = None

    def prior_std(self) -> float:
        return self.std if self.std is not None else 0.5 * abs(self.mean)


ParamSpec = Union[Proportions, Prob, Mean]


# ---------------------------------------------------------------------------
# Array-backed state + conjugate updates (vectorized over the index axis)
# ---------------------------------------------------------------------------

def init_proportions_state(key: jax.Array, spec: Proportions, num_options: int,
                           num_indices: int = 1) -> dict:
    conc = np.asarray(spec.concentration, dtype=np.float32)
    if conc.ndim == 0:
        conc = np.full(num_options, float(conc), dtype=np.float32)
    assert conc.shape == (num_options,), (conc.shape, num_options)
    value = jax.random.dirichlet(key, jnp.asarray(conc), shape=(num_indices,))
    return {
        "counts": jnp.zeros((num_indices, num_options), dtype=jnp.int32),
        "log_value": jnp.log(value.astype(jnp.float32)),
    }


def resample_proportions(key: jax.Array, state: dict, spec: Proportions) -> dict:
    """Collapsed Gibbs draw: Dirichlet(prior + counts)
    (choose_proportionally.jl:70-74)."""
    counts = state["counts"].astype(jnp.float32)
    conc = np.asarray(spec.concentration, dtype=np.float32)
    if conc.ndim == 0:
        conc = jnp.full(counts.shape[-1], float(conc), dtype=jnp.float32)
    else:
        conc = jnp.asarray(conc)
    value = jax.random.dirichlet(key, conc[None, :] + counts)
    return {"counts": state["counts"], "log_value": jnp.log(value.astype(jnp.float32))}


def init_prob_state(key: jax.Array, spec: Prob, num_indices: int = 1) -> dict:
    value = jax.random.beta(key, spec.a, spec.b, shape=(num_indices,))
    return {
        "heads": jnp.zeros((num_indices,), dtype=jnp.int32),
        "tails": jnp.zeros((num_indices,), dtype=jnp.int32),
        "value": value.astype(jnp.float32),
    }


def resample_prob(key: jax.Array, state: dict, spec: Prob) -> dict:
    """Beta(a + heads, b + tails) (maybe_swap.jl:87-89)."""
    value = jax.random.beta(key, spec.a + state["heads"].astype(jnp.float32),
                            spec.b + state["tails"].astype(jnp.float32))
    return {**state, "value": value.astype(jnp.float32)}


def init_mean_state(key: jax.Array, spec: Mean, num_sites: int,
                    num_indices: int = 1) -> dict:
    """`num_sites` = number of AddNoise/TransformedGaussian call sites using
    this parameter; each site has one static noise std, replacing the
    reference's dynamically-grown per-std vectors (add_noise.jl:21-27)."""
    value = spec.mean + spec.prior_std() * jax.random.normal(key, (num_indices,))
    return {
        "counts": jnp.zeros((num_indices, num_sites), dtype=jnp.int32),
        "sums": jnp.zeros((num_indices, num_sites), dtype=jnp.float32),
        "value": value.astype(jnp.float32),
    }


def resample_mean(key: jax.Array, state: dict, spec: Mean,
                  site_stds: Sequence[float]) -> dict:
    """Exact Normal-Normal posterior over all sites (add_noise.jl:74-82).

    posterior precision = 1/var0 + sum_s count_s/std_s^2
    posterior mean = var * (mean0/var0 + sum_s sum_s/std_s^2)
    """
    var0 = spec.prior_std() ** 2
    stds = jnp.asarray(np.asarray(site_stds, dtype=np.float32))  # [S]
    prec = 1.0 / var0 + jnp.sum(state["counts"].astype(jnp.float32) / (stds**2)[None, :], axis=-1)
    num = spec.mean / var0 + jnp.sum(state["sums"] / (stds**2)[None, :], axis=-1)
    var = 1.0 / prec
    mean = var * num
    value = mean + jnp.sqrt(var) * jax.random.normal(key, mean.shape)
    return {**state, "value": value.astype(jnp.float32)}
