"""Per-choice-node distribution kernels: dense tables + jnp closures.

Each ChoiceNode gets a DistKernel at model-compile time. The kernel is the
XLA-facing form of one reference distribution instance:

  * enum_logits  — the discrete proposal as a dense (masked) log-weight
                   vector over the node's Domain (reference
                   `discrete_proposal`, e.g. choose_proportionally.jl:15-17,
                   string_prior.jl:16-22);
  * obs_logdensity / missing_logdensity — vectorized `logdensity` incl. the
    explicitly-missing branch (e.g. maybe_swap.jl:13-28);
  * sample_prior — `random` for non-enumerable nodes left to the prior.

Dynamic arguments arrive via a ctx object supplied by the proposal tracer:
ctx.value(vid) (current value of another vertex, already broadcast over any
active enumeration axes) and ctx.pstate(cid, vid) (parameter state pytree).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..dists import params as P
from ..dists.core import (AddNoise, AddTypos, ChooseProportionally,
                          ChooseUniformly, ExpandOnShortVersion, FormatName,
                          MaybeSwap, NumberCodePrior, StringPrior, TimePrior,
                          Transformation, TransformedGaussian, Unmodeled,
                          residual_dummy_logit)
from ..domains import CATEGORICAL, FLOAT
from ..model.ir import (ChoiceNode, ClassID, ComputeNode, ParameterNode,
                        VertexID)
from ..strings import typos_logdensity_matrix, pad_char_codes
from ..utils import NEG_INF
from .. import native

NINF = float(NEG_INF)


def _f32(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))


class DistKernel:
    enumerable = False
    supports_missing = False
    V: Optional[int] = None  # domain size for categorical-valued nodes
    dummy_code: Optional[int] = None
    # interned-constant accessor (see engine/interned.py): build_kernel
    # rebinds this to cm.interned.use so large host attributes (typo
    # matrices, list masks, score tables) become program ARGUMENTS
    # instead of embedded literals; the default is the literal path.
    _use = staticmethod(jnp.asarray)
    # False for kernels whose sample_prior is deterministic (modal) — the
    # tracer then skips the per-node PRNG split, which matters inside
    # sequential scans where key threading is serial latency
    prior_needs_key = True

    def enum_logits(self, ctx):  # -> [*, V]
        raise NotImplementedError

    def obs_logdensity(self, ctx, obs):  # obs: code or float array
        raise NotImplementedError

    def missing_logdensity(self, ctx):
        return 0.0

    def sample_prior(self, ctx, key):
        raise NotImplementedError(f"{type(self).__name__} cannot be sampled")


def _list_code(cm, cid, node, slot, ctx):
    """Value of a dynamic list argument (code into a ListRegistry)."""
    return ctx.value(node.arg_ids[slot])


def build_kernel(cm, cid: ClassID, vid: VertexID, node: ChoiceNode) -> DistKernel:
    d = node.dist
    if isinstance(d, ChooseProportionally):
        return _ChooseProportionallyK(cm, cid, vid, node)
    if isinstance(d, ChooseUniformly):
        return _ChooseUniformlyK(cm, cid, vid, node)
    if isinstance(d, StringPrior):
        return _StringPriorK(cm, cid, vid, node)
    if isinstance(d, TimePrior):
        return _TimePriorK(cm, cid, vid, node)
    if isinstance(d, AddTypos):
        return _AddTyposK(cm, cid, vid, node)
    if isinstance(d, MaybeSwap):
        return _MaybeSwapK(cm, cid, vid, node)
    if isinstance(d, (AddNoise, TransformedGaussian)):
        return _GaussianK(cm, cid, vid, node)
    if isinstance(d, ExpandOnShortVersion):
        return _ExpandK(cm, cid, vid, node)
    if isinstance(d, FormatName):
        return _FormatNameK(cm, cid, vid, node)
    if isinstance(d, NumberCodePrior):
        return _NumberCodeK(cm, cid, vid, node)
    if isinstance(d, Unmodeled):
        return _UnmodeledK(cm, cid, vid, node)
    raise TypeError(type(d))


# ---------------------------------------------------------------------------


class _ChooseProportionallyK(DistKernel):
    """choose_proportionally.jl: weights either a static vector (raw,
    unnormalized logs — the reference's `logprobs` does not normalize) or a
    learned ProportionsParameter (normalized Dirichlet draw)."""

    enumerable = True

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        self.param_key = None
        probs = node.dist.probs
        options = node.dist.options
        assert "options" not in node.arg_ids or "probs" not in node.arg_ids, \
            "dynamic options with learned probs unsupported"
        if "probs" in node.arg_ids:
            pv = node.arg_ids["probs"]
            assert isinstance(cm.node(cid, pv), ParameterNode)
            self.param_key = cm.canon(cid, pv)
            # The Dirichlet axis spans the option codes (a prefix of the
            # domain, which ingest may have extended with observed values).
            self.num_options = len({dom.vocab.encode(o) for o in options}) \
                if options is not None else self.V
        else:
            w = np.full(self.V, -np.inf, dtype=np.float32)
            probs = np.asarray(probs, dtype=np.float64)
            for pos, o in enumerate(options):
                code = dom.vocab.encode(o)
                cur = w[code]
                w[code] = np.logaddexp(cur, math.log(probs[pos])) \
                    if np.isfinite(cur) else math.log(probs[pos])
            self.static_logw = w  # host numpy; wrapped at trace time

    def _logw(self, ctx):
        if self.param_key is None:
            return self._use(self.static_logw)
        logv = ctx.pstate(*self.param_key)["log_value"][0]  # [num_options]
        pad = self.V - logv.shape[0]
        if pad > 0:
            logv = jnp.concatenate([logv, jnp.full((pad,), NINF, logv.dtype)])
        return logv

    def enum_logits(self, ctx):
        return self._logw(ctx)

    def obs_logdensity(self, ctx, obs):
        return self._logw(ctx)[obs]

    def sample_prior(self, ctx, key):
        return jax.random.categorical(key, self._logw(ctx))


class _ChooseUniformlyK(DistKernel):
    """choose_uniformly.jl: logdensity = -log(n) *assuming the observation is
    possible* — a constant, even off-support (reference lines 7-10)."""

    enumerable = True

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        self.dynamic = "options" in node.arg_ids
        if self.dynamic:
            lk = cm.canon(cid, node.arg_ids["options"])
            reg = cm.list_reg[lk]
            self.mask = reg.mask_matrix()  # [L, V]
            self.lens = np.maximum(reg.lengths(), 1)
        else:
            options = node.dist.options
            m = np.zeros(self.V, dtype=bool)
            for o in options:
                m[dom.vocab.encode(o)] = True
            self.mask = m
            self.n = max(len(set(dom.vocab.encode(o) for o in options)), 1)
            self.n_raw = max(len(options), 1)

    def enum_logits(self, ctx):
        if self.dynamic:
            lc = ctx.value(self.node.arg_ids["options"])
            m = self._use(self.mask)[lc]  # [*, V]
            n = self._use(self.lens)[lc].astype(jnp.float32)
            return jnp.where(m, -jnp.log(n)[..., None], NINF)
        return jnp.where(self._use(self.mask), -math.log(self.n_raw), NINF)

    def obs_logdensity(self, ctx, obs):
        if self.dynamic:
            lc = ctx.value(self.node.arg_ids["options"])
            n = self._use(self.lens)[lc].astype(jnp.float32)
            return -jnp.log(n) + 0.0 * obs
        return jnp.full(jnp.shape(obs), -math.log(self.n_raw))

    def sample_prior(self, ctx, key):
        return jax.random.categorical(key, self.enum_logits(ctx))


class _AtomPriorK(DistKernel):
    """Shared machinery for StringPrior / TimePrior: per-atom scores +
    residual-mass dummy (string_prior.jl:16-26, time_prior.jl:8-18)."""

    enumerable = True

    def __init__(self, cm, cid, vid, node, score_vec: np.ndarray):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        self.dummy_code = cm.dummy_code[(cid, vid)]
        self.score_vec = score_vec.astype(np.float32)
        self.dynamic = "atoms" in node.arg_ids
        if self.dynamic:
            lk = cm.canon(cid, node.arg_ids["atoms"])
            reg = cm.list_reg[lk]
            mask = reg.mask_matrix()  # [L, V]
            L = mask.shape[0]
            enum = np.full((L, self.V), -np.inf, dtype=np.float64)
            for l in range(L):
                enum[l, mask[l]] = score_vec[mask[l]]
                enum[l, self.dummy_code] = residual_dummy_logit(enum[l])
            self.enum_mat = enum.astype(np.float32)
        else:
            atoms = self._static_atoms()
            enum = np.full(self.V, -np.inf, dtype=np.float64)
            codes = [dom.vocab.encode(a) for a in atoms]
            enum[codes] = score_vec[codes]
            enum[self.dummy_code] = residual_dummy_logit(enum)
            self.enum_vec = enum.astype(np.float32)

    def _static_atoms(self):
        raise NotImplementedError

    def enum_logits(self, ctx):
        if self.dynamic:
            lc = ctx.value(self.node.arg_ids["atoms"])
            return self._use(self.enum_mat)[lc]
        return self._use(self.enum_vec)

    def obs_logdensity(self, ctx, obs):
        return self._use(self.score_vec)[obs]

    def sample_prior(self, ctx, key):
        return jax.random.categorical(key, self.enum_logits(ctx))


class _StringPriorK(_AtomPriorK):
    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        d = node.dist
        sv = np.array([cm.lm.logdensity(v, d.min_length, d.max_length)
                       if isinstance(v, str) else -np.inf
                       for v in dom.vocab.values])
        self._atoms_arg = d.atoms
        super().__init__(cm, cid, vid, node, sv)

    def _static_atoms(self):
        return self._atoms_arg


class _TimePriorK(_AtomPriorK):
    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        d = node.dist
        sv = np.array([TimePrior.atom_logprob(v) if isinstance(v, str) else -np.inf
                       for v in dom.vocab.values])
        self._atoms_arg = d.atoms
        super().__init__(cm, cid, vid, node, sv)
        # Reference logdensity is -log(1440) for *any* observed string
        # (time_prior.jl:25-27); keep the constant for observed scoring.
        self.score_vec = np.full((self.V,), -math.log(1440.0), dtype=np.float32)

    def _static_atoms(self):
        return self._atoms_arg


class _AddTyposK(DistKernel):
    """Dense [V, V] typo-likelihood matrix over the shared source/observed
    vocabulary (add_typos.jl:50-66 computed eagerly for all pairs)."""

    supports_missing = True

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        strs = [v if isinstance(v, str) else str(v) for v in dom.vocab.values]
        self.M = typos_logdensity_matrix(strs, strs, node.dist.max_typos)

    def obs_logdensity(self, ctx, obs):
        word = ctx.value(self.node.arg_ids["word"])
        return self._use(self.M)[obs, word]

    def missing_logdensity(self, ctx):
        return 0.0  # add_typos.jl:51-53

    prior_needs_key = False

    def sample_prior(self, ctx, key):
        # Modal (zero-typo) outcome; the reference's generative typo process
        # (add_typos.jl:36-45) only matters for unobserved corrupted cells,
        # which are never read back by queries.
        return ctx.value(self.node.arg_ids["word"])


class _MaybeSwapK(DistKernel):
    """maybe_swap.jl:13-28. prob may be static, a learned ProbParameter, or a
    runtime float (e.g. a gated indexed-parameter lookup)."""

    supports_missing = True

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        self.cm = cm
        d = node.dist
        self.dynamic_opts = "options" in node.arg_ids
        if self.dynamic_opts:
            lk = cm.canon(cid, node.arg_ids["options"])
            reg = cm.list_reg[lk]
            assert reg.domain.vocab is dom.vocab, \
                "MaybeSwap options and val must share a domain"
            self.mask = reg.mask_matrix()
            self.lens = np.maximum(reg.lengths(), 1)
        else:
            m = np.zeros(self.V, dtype=bool)
            for o in d.options:
                m[dom.vocab.encode(o)] = True
            self.mask = m
            self.n = max(len(d.options), 1)
        self.param_key = None
        pv = node.arg_ids.get("prob")
        if pv is not None and isinstance(cm.node(cid, pv), ParameterNode):
            self.param_key = cm.canon(cid, pv)
            self.prob_vid = None
        elif pv is not None:
            self.prob_vid = pv
        else:
            self.static_prob = float(d.prob)
            self.prob_vid = None

    def _prob(self, ctx):
        if self.param_key is not None:
            return ctx.pstate(*self.param_key)["value"][0]
        if self.prob_vid is not None:
            return ctx.value(self.prob_vid)
        return self.static_prob

    def _loglen(self, ctx):
        if self.dynamic_opts:
            lc = ctx.value(self.node.arg_ids["options"])
            return jnp.log(self._use(self.lens)[lc].astype(jnp.float32))
        return math.log(self.n)

    def obs_logdensity(self, ctx, obs):
        val = ctx.value(self.node.arg_ids["val"])
        p = self._prob(ctx)
        same = obs == val
        return jnp.where(same, jnp.log1p(-p), jnp.log(p) - self._loglen(ctx))

    def missing_logdensity(self, ctx):
        # maybe_swap.jl:18-23: 0 if val in options else -1000
        val = ctx.value(self.node.arg_ids["val"])
        if self.dynamic_opts:
            lc = ctx.value(self.node.arg_ids["options"])
            member = self._use(self.mask)[lc, val]
        else:
            member = self._use(self.mask)[val]
        return jnp.where(member, 0.0, -1000.0)

    def sample_prior(self, ctx, key):
        val = ctx.value(self.node.arg_ids["val"])
        p = self._prob(ctx)
        k1, k2 = jax.random.split(key)
        if self.dynamic_opts:
            lc = ctx.value(self.node.arg_ids["options"])
            logits = jnp.where(self._use(self.mask)[lc], 0.0, NINF)
        else:
            logits = jnp.where(self._use(self.mask), 0.0, NINF)
        alt = jax.random.categorical(k1, logits)
        swap = jax.random.bernoulli(k2, p)
        return jnp.where(swap, alt, val)


class _GaussianK(DistKernel):
    """AddNoise / TransformedGaussian (add_noise.jl:5-7,
    transformed_gaussian.jl:13-16). Float-valued; never enumerable."""

    def __init__(self, cm, cid, vid, node):
        self.node = node
        d = node.dist
        self.std = d.std
        self.mean_vid = node.arg_ids.get("mean")
        self.mean_param_key = None
        if self.mean_vid is not None and \
                isinstance(cm.node(cid, self.mean_vid), ParameterNode):
            self.mean_param_key = cm.canon(cid, self.mean_vid)
            self.mean_vid = None
        self.static_mean = None if (self.mean_vid is not None or
                                    self.mean_param_key) else float(d.mean)
        self.transforms = None
        self.static_transform = None
        if isinstance(d, TransformedGaussian):
            tv = node.arg_ids.get("transform")
            if tv is None:
                self.static_transform = d.transform
            else:
                self.transform_vid = tv
                tdom = cm.domain(cid, tv)
                assert tdom.kind == CATEGORICAL
                self.transforms = list(tdom.vocab.values)
                assert all(isinstance(t, Transformation) for t in self.transforms)

    def _mean(self, ctx):
        if self.mean_param_key is not None:
            return ctx.pstate(*self.mean_param_key)["value"][0]
        if self.mean_vid is not None:
            return ctx.value(self.mean_vid)
        return self.static_mean

    def backward(self, ctx, y):
        if self.static_transform is not None:
            return self.static_transform.backward(y)
        if self.transforms is not None:
            tc = ctx.value(self.transform_vid)
            stacked = jnp.stack([jnp.broadcast_to(t.backward(y), jnp.shape(y + 0.0 * tc))
                                 for t in self.transforms])
            return jnp.take_along_axis(stacked, tc[None].astype(jnp.int32),
                                       axis=0)[0] if jnp.ndim(tc) else stacked[tc]
        return y

    def _log_abs_deriv(self, ctx, z):
        if self.static_transform is not None:
            return jnp.log(jnp.abs(self.static_transform.deriv(z)))
        if self.transforms is not None:
            tc = ctx.value(self.transform_vid)
            stacked = jnp.stack([jnp.broadcast_to(
                jnp.log(jnp.abs(t.deriv(z) + 0.0 * z)), jnp.shape(z + 0.0 * tc))
                for t in self.transforms])
            return jnp.take_along_axis(stacked, tc[None].astype(jnp.int32),
                                       axis=0)[0] if jnp.ndim(tc) else stacked[tc]
        return 0.0

    def forward(self, ctx, x):
        if self.static_transform is not None:
            return self.static_transform.forward(x)
        if self.transforms is not None:
            tc = ctx.value(self.transform_vid)
            stacked = jnp.stack([jnp.broadcast_to(t.forward(x), jnp.shape(x + 0.0 * tc))
                                 for t in self.transforms])
            return jnp.take_along_axis(stacked, tc[None].astype(jnp.int32),
                                       axis=0)[0] if jnp.ndim(tc) else stacked[tc]
        return x

    def obs_logdensity(self, ctx, obs):
        z = self.backward(ctx, obs)
        mean = self._mean(ctx)
        ll = -0.5 * ((z - mean) / self.std) ** 2 \
            - math.log(self.std) - 0.5 * math.log(2 * math.pi)
        return ll - self._log_abs_deriv(ctx, z)

    def sample_prior(self, ctx, key):
        mean = self._mean(ctx)
        x = mean + self.std * jax.random.normal(key, jnp.shape(jnp.asarray(mean)))
        return self.forward(ctx, x)


class _ExpandK(DistKernel):
    """expand_on_short_version.jl: obs must extend the latent short form."""

    supports_missing = True

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)  # obs/options domain
        val_dom = cm.domain(cid, node.arg_ids["val"])
        self.V = dom.size
        self.node = node
        vs = [v.lower() if isinstance(v, str) else str(v) for v in val_dom.vocab.values]
        os_ = [v.lower() if isinstance(v, str) else str(v) for v in dom.vocab.values]
        L = max(max((len(s) for s in vs + os_), default=1), 1)
        ac, al = pad_char_codes(vs, L)
        bc, bl = pad_char_codes(os_, L)
        self.S = native.subsequence_matrix(ac, al, bc, bl).astype(bool)
        if "options" in node.arg_ids:
            lk = cm.canon(cid, node.arg_ids["options"])
            reg = cm.list_reg[lk]
            assert reg.domain.vocab is dom.vocab
            opt_mask = reg.mask_matrix()  # [Lists, V]
            self.dyn = True
            self.opt_mask = opt_mask
            cnt = (self.S[:, None, :] & opt_mask[None, :, :]).sum(-1)
            self.cnt = np.maximum(cnt, 1)  # [Vval, Lists]
            # value-level membership of val's value in each list
            obs_vocab = dom.vocab
            vim = np.zeros((len(val_dom.vocab), opt_mask.shape[0]), dtype=bool)
            for i, v in enumerate(val_dom.vocab.values):
                c = obs_vocab.get(v)
                if c >= 0:
                    vim[i] = opt_mask[:, c]
            self.val_in_opts = vim  # [Vval, Lists]
        else:
            options = node.dist.options
            m = np.zeros(self.V, dtype=bool)
            for o in options:
                m[dom.vocab.encode(o)] = True
            self.dyn = False
            self.opt_mask = m
            cnt = (self.S & m[None, :]).sum(-1)
            self.cnt = np.maximum(cnt, 1)  # [Vval]
            vin = np.array([v in set(options) for v in val_dom.vocab.values])
            self.val_in_opts = vin

    def obs_logdensity(self, ctx, obs):
        val = ctx.value(self.node.arg_ids["val"])
        ok = self._use(self.S)[val, obs]
        if self.dyn:
            lc = ctx.value(self.node.arg_ids["options"])
            cnt = self._use(self.cnt)[val, lc].astype(jnp.float32)
        else:
            cnt = self._use(self.cnt)[val].astype(jnp.float32)
        return jnp.where(ok, -jnp.log(cnt), -1000.0)

    def missing_logdensity(self, ctx):
        val = ctx.value(self.node.arg_ids["val"])
        if self.dyn:
            lc = ctx.value(self.node.arg_ids["options"])
            return jnp.where(self._use(self.val_in_opts)[val, lc], 0.0, -1000.0)
        return jnp.where(self._use(self.val_in_opts)[val], 0.0, -1000.0)

    def sample_prior(self, ctx, key):
        val = ctx.value(self.node.arg_ids["val"])
        if self.dyn:
            lc = ctx.value(self.node.arg_ids["options"])
            mask = self._use(self.S)[val] & self._use(self.opt_mask)[lc]
        else:
            mask = self._use(self.S)[val] & self._use(self.opt_mask)
        logits = jnp.where(mask, 0.0, NINF)
        any_ok = jnp.any(mask, axis=-1)
        drawn = jax.random.categorical(key, logits)
        return jnp.where(any_ok, drawn, val)


class _FormatNameK(DistKernel):
    """format_name.jl.

    Single-name arity: dense table [V_obs, V_name] (2-D is cheap).

    Three-name arity is *factored*: the reference scores an observed string
    against "first middle last" (3*log 0.9) and "first last" (log 0.1)
    joins (format_name.jl:15-26). Each observed string with k spaces admits
    only C(k,2) three-way and k two-way space-splits, so instead of the
    O(V_obs*V_f*V_m*V_l) dense table we precompute per-observed split code
    triples T3 [V_obs, S3, 3] / pairs T2 [V_obs, S2, 2] (splits whose parts
    all intern into the name vocabularies, lowercase like the reference)
    and match them against the traced name codes with an any-over-splits
    reduction — O(S) per cell, so 10k-name vocabularies are fine.
    """

    supports_missing = True

    def __init__(self, cm, cid, vid, node):
        from ..dists.core import FormatName as FN

        dom = cm.domain(cid, vid)
        self.V = dom.size
        self.node = node
        self.arity = len(node.dist.names)
        if self.arity == 1:
            nd = cm.domain(cid, node.arg_ids["name0"])
            tbl = np.zeros((dom.size, nd.size), dtype=np.float32)
            miss = np.zeros(nd.size, dtype=np.float32)
            for j, nm in enumerate(nd.vocab.values):
                nm_s = nm if isinstance(nm, str) else str(nm)
                miss[j] = FN.logdensity_single(None, nm_s)
                for i, ob in enumerate(dom.vocab.values):
                    ob_s = ob if isinstance(ob, str) else str(ob)
                    tbl[i, j] = FN.logdensity_single(ob_s, nm_s)
            self.tbl = tbl
            self.miss = miss
            return
        doms = [cm.domain(cid, node.arg_ids[f"name{i}"]) for i in range(3)]
        # lowercase -> codes maps per name vocabulary (reference compares
        # lowercase; ties all score, like the dense equality would)
        lc_maps = []
        for d in doms:
            m = {}
            for code, v in enumerate(d.vocab.values):
                m.setdefault(str(v).lower(), []).append(code)
            lc_maps.append(m)
        tri, two = [], []  # per obs code: list of (f,m,l) / (f,l) code tuples
        for ob in dom.vocab.values:
            s = str(ob).lower()
            sp = [i for i, ch in enumerate(s) if ch == " "]
            t3, t2 = [], []
            for ai in range(len(sp)):
                f = s[: sp[ai]]
                l2 = s[sp[ai] + 1:]
                for fc in lc_maps[0].get(f, ()):
                    for lc2 in lc_maps[2].get(l2, ()):
                        t2.append((fc, lc2))
                for bi in range(ai + 1, len(sp)):
                    fm = s[sp[ai] + 1: sp[bi]]
                    l3 = s[sp[bi] + 1:]
                    for fc in lc_maps[0].get(f, ()):
                        for mc in lc_maps[1].get(fm, ()):
                            for lc3 in lc_maps[2].get(l3, ()):
                                t3.append((fc, mc, lc3))
            tri.append(t3)
            two.append(t2)
        S3 = max(max((len(t) for t in tri), default=0), 1)
        S2 = max(max((len(t) for t in two), default=0), 1)
        self.T3 = np.full((dom.size, S3, 3), -1, dtype=np.int32)
        self.T2 = np.full((dom.size, S2, 2), -1, dtype=np.int32)
        for i, t3 in enumerate(tri):
            for s_, trip in enumerate(t3):
                self.T3[i, s_] = trip
        for i, t2 in enumerate(two):
            for s_, pair in enumerate(t2):
                self.T2[i, s_] = pair

    def obs_logdensity(self, ctx, obs):
        if self.arity == 1:
            return self._use(self.tbl)[obs, ctx.value(self.node.arg_ids["name0"])]
        f = ctx.value(self.node.arg_ids["name0"])
        m = ctx.value(self.node.arg_ids["name1"])
        l = ctx.value(self.node.arg_ids["name2"])
        t3 = self._use(self.T3)[obs]  # [..., S3, 3]
        t2 = self._use(self.T2)[obs]  # [..., S2, 2]
        f_, m_, l_ = (jnp.asarray(x)[..., None] for x in (f, m, l))
        hit3 = jnp.any((t3[..., 0] == f_) & (t3[..., 1] == m_)
                       & (t3[..., 2] == l_), axis=-1)
        hit2 = jnp.any((t2[..., 0] == f_) & (t2[..., 1] == l_), axis=-1)
        return jnp.where(hit3, 3.0 * math.log(0.9),
                         jnp.where(hit2, math.log(0.1), -1000.0))

    def missing_logdensity(self, ctx):
        if self.arity == 1:
            return self._use(self.miss)[ctx.value(self.node.arg_ids["name0"])]
        return 0.0  # format_name.jl:16-18

    prior_needs_key = False

    def sample_prior(self, ctx, key):
        """FormatName is an observation-model leaf; the deferred-scoring
        path needs *a* value when it is unobserved. Deterministically pick
        the full-format observed code matching the current name parts (the
        reference's modal draw, random() w.p. 0.9^3) and fall back to 0."""
        if self.arity == 1:
            return ctx.value(self.node.arg_ids["name0"])
        f = ctx.value(self.node.arg_ids["name0"])
        m = ctx.value(self.node.arg_ids["name1"])
        l = ctx.value(self.node.arg_ids["name2"])
        t3 = self._use(self.T3)  # [V, S3, 3]
        f_, m_, l_ = (jnp.asarray(x)[..., None, None] for x in (f, m, l))
        hit = jnp.any((t3[..., 0] == f_) & (t3[..., 1] == m_)
                      & (t3[..., 2] == l_), axis=-1)  # [..., V]
        return jnp.argmax(hit, axis=-1).astype(jnp.int32)


class _NumberCodeK(DistKernel):
    """number_code_prior.jl: -log(val) for observed integer codes."""

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size
        vals = np.array([float(v) if isinstance(v, (int, float)) and v > 0 else np.nan
                         for v in dom.vocab.values])
        with np.errstate(invalid="ignore"):
            sv = -np.log(vals)
        self.score = np.where(np.isnan(sv), NINF, sv).astype(np.float32)

    prior_needs_key = False

    def obs_logdensity(self, ctx, obs):
        return self._use(self.score)[obs]

    def sample_prior(self, ctx, key):
        return jnp.zeros((), dtype=jnp.int32)


class _UnmodeledK(DistKernel):
    """unmodeled.jl: logdensity 0 for anything."""

    supports_missing = True
    prior_needs_key = False

    def __init__(self, cm, cid, vid, node):
        dom = cm.domain(cid, vid)
        self.V = dom.size

    def obs_logdensity(self, ctx, obs):
        return jnp.zeros(jnp.shape(obs), dtype=jnp.float32)

    def missing_logdensity(self, ctx):
        return 0.0

    def sample_prior(self, ctx, key):
        return jnp.zeros((), dtype=jnp.int32)
