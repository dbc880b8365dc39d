"""Numerically stable log-space helpers over JAX arrays.

TPU-native counterpart of the reference's numeric utils
(/root/reference/src/utils.jl:7-49). Unlike the reference, every helper is
vectorized and jit-safe: masked variants take explicit boolean masks instead
of relying on ragged host-side vectors, so they can run inside fused XLA
programs with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-but-finite stand-in for -Inf inside masked reductions.  Using a finite
# value keeps XLA from producing NaNs in `logsumexp` gradients/underflow paths;
# the reference uses -1e5 as its "IMPOSSIBLE" score (add_typos.jl:34).
NEG_INF = -1e30
IMPOSSIBLE = -1e5


def logsumexp(logits: jax.Array, axis=-1, where=None, keepdims: bool = False) -> jax.Array:
    """Stable logsumexp with optional boolean mask (`where`).

    Masked-out entries contribute zero probability. An all-masked reduction
    returns NEG_INF rather than NaN (reference: utils.jl:16-20 returns -Inf
    for empty vectors).
    """
    if where is not None:
        logits = jnp.where(where, logits, NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    m = jnp.maximum(m, NEG_INF)  # avoid -inf - -inf
    out = jnp.log(jnp.sum(jnp.exp(logits - m), axis=axis, keepdims=True)) + m
    out = jnp.where(jnp.isfinite(m) | (m > NEG_INF / 2), out, NEG_INF)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def log_normalize(logits: jax.Array, axis=-1, where=None) -> jax.Array:
    """logits - logsumexp(logits): normalized log-probabilities."""
    return logits - logsumexp(logits, axis=axis, where=where, keepdims=True)


def normalize(weights: jax.Array, axis=-1) -> jax.Array:
    """Proportions -> probabilities (reference utils.jl:7-9)."""
    return weights / jnp.sum(weights, axis=axis, keepdims=True)


def logprobs(weights: jax.Array) -> jax.Array:
    """Elementwise log without normalization (reference utils.jl:33-36)."""
    return jnp.log(weights)


def categorical_from_logits(key: jax.Array, logits: jax.Array, axis=-1, where=None) -> jax.Array:
    """Sample an index from unnormalized log-probabilities with masking."""
    if where is not None:
        logits = jnp.where(where, logits, NEG_INF)
    return jax.random.categorical(key, logits, axis=axis)


def effective_sample_size(log_normalized_weights: jax.Array) -> jax.Array:
    """ESS of normalized log weights (reference row_inference.jl:82-85)."""
    return jnp.exp(-logsumexp(2.0 * log_normalized_weights))


def device_sync(tree) -> None:
    """True execution barrier: fetch a scalar *derived from* the outputs.

    `jax.block_until_ready` on an output buffer is not a reliable barrier on
    tunneled PJRT backends — an output that the runtime aliases to an input
    (or whose ready-event polling is broken) reports ready while the program
    is still running, which silently turns timing code into an async
    enqueue measurement. Data-dependent execution order IS correct on those
    backends, so fetching the value of a cheap reduction over one leaf
    forces completion of the producing program.

    The reduction over all leaves runs as ONE jitted program (cached per
    leaf-shape signature): eagerly it would be 2-3 remote op dispatches per
    leaf, which on a tunneled backend costs ~0.5 s each — minutes of pure
    barrier overhead for a few-hundred-leaf arena pytree.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "astype")]
    if not leaves:
        return
    sig = tuple((x.shape, str(x.dtype)) for x in leaves)
    fn = _sync_cache.get(sig)
    if fn is None:
        fn = jax.jit(_sync_sum)
        _sync_cache[sig] = fn
    jax.device_get(fn(leaves))


_sync_cache: dict = {}


def _sync_sum(leaves):
    acc = jnp.zeros((), jnp.float32)
    for x in leaves:
        acc = acc + jnp.sum(x.astype(jnp.float32))
    return acc
