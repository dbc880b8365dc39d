"""Block-proposal tracer: dense enumerative proposals as one XLA program.

TPU-native replacement for the reference's JIT proposal compiler + block
interpreter (/root/reference/src/inference/proposal_compiler.jl:5-418,
block_proposal.jl). Where the reference emits specialized Julia nested loops
per (block, missingness-pattern) and crosses a world-age JIT boundary per
pattern (block_proposal.jl:169-175), here the Plan forest is walked once in
Python while JAX traces it, producing a single fused program per
(class, block) covering every missingness pattern through masks:

  * unobserved enumerable choice -> dense option axis with proposal
    log-weights (`discrete_proposal` analogue); observed -> delta at the
    observed code scored with `logdensity`. One logsumexp then yields either
    a marginal or a conditional, subsuming per-pattern specialization;
  * reference slot -> (capacity+1) candidate axis: alive rows scored via
    gathers of their attribute codes (the hash restriction of
    proposal_compiler.jl:142-151 becomes an equality mask over the arena),
    plus one "fresh row" branch traced in generate mode (the blind
    generation of proposal_compiler.jl:249-258);
  * sibling plan subtrees are conditionally independent -> additive logZ
    terms (plan semantics, model.jl:66-81);
  * external likelihood nodes (rejuvenation) -> masked sums over the
    referring class's capacity axis (block_proposal.jl:119-155, vectorized).

The incremental particle weight is the root logZ plus deferred-node terms,
which equals the reference's p - q_disc - q_cont telescoped over an exact
block-Gibbs proposal (block_proposal.jl:160-191): for every enumerated
choice, prior(chosen) - posterior(chosen) + downstream(chosen) = logZ.

Sampling is a second top-down pass over the recorded per-node posterior
arrays. Retained-particle forcing (CSMC, row_inference.jl:143-145) replaces
draws with the retained row's stored codes, falling back to the dummy code /
fresh-row branch like proposal_compiler.jl:98-101,225-232; a retained
reference to a garbage-collected row re-births it in its old slot.

Non-enumerable unobserved choices are sampled from their prior DURING the
score pass (the reference samples the parent before scoring descendants,
block_proposal.jl:56-66): the draw — one per enclosing enumeration branch,
via broadcasting — is recorded and the sample pass reuses it, so observed
descendants' terms enter the enumeration logits at the drawn parent value
and q = prior cancels p exactly. The resulting block weight logZ is then a
random variable through those draws, so particle weights genuinely differ;
compile.exact_gibbs_ok audits whether any such node can influence scored
terms and the engine drops the exact-Gibbs acceptance shortcut when it can.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..domains import FLOAT
from ..model.ir import (ChoiceNode, ClassID, ComputeNode,
                        ExternalLikelihoodNode, ForeignKeyNode, Node,
                        ParameterNode, ParamLookupNode, Plan, Step,
                        SubmodelNode, VertexID, strip_subnodes)
from ..utils import NEG_INF, logsumexp
from .compile import CompiledModel

NINF = float(NEG_INF)


def _static_obs(st) -> bool:
    """True when the obs state is the *static* Python int 1 — the column is
    observed in every dataset row (Engine._obs_row_slices) — so the tracer
    can drop the unobserved/missing branches at trace time."""
    return isinstance(st, int) and st == 1


@dataclass
class Birth:
    fk_vid: VertexID  # vertex (in the proposing class) whose fk birthed
    target_class: ClassID
    is_new: Any  # traced bool
    slot: Any  # traced int: allocated (or re-used retained) slot
    values: dict[VertexID, Any]  # target-class vertex -> traced value
    # static nesting depth: 0 = birthed directly by the proposing row;
    # >0 = birthed inside an enclosing fresh birth's "new" branch (its
    # is_new already implies every enclosing is_new via the sample gate).
    # The batched birth allocator (smc.scan_init_batched) allocates
    # depth-0 births in-batch and defers rows with effective nested
    # births to sequential replay (chained births reference each other's
    # placeholder slots — SURVEY §7 hard-part 1).
    depth: int = 0


@dataclass
class BlockResult:
    env: dict[VertexID, Any]
    weight: Any
    births: list[Birth]


class _Ctx:
    """Argument resolution adapter handed to DistKernels.

    `remap` translates a kernel's canonical-class arg vertex ids into the
    tracing class's (submodel-shifted) id space — a kernel is built once per
    *original* node (sharing its dense tables), but the same node may be
    generated inside any class that inlines it (reference SubmodelNode
    semantics, model.jl:161-165)."""

    def __init__(self, tracer, depth, resolver=None, remap=None):
        self.t = tracer
        self.depth = depth
        self.resolver = resolver
        self.remap = remap

    def value(self, vid: VertexID):
        if self.remap is not None:
            vid = self.remap.get(vid, vid)
        if self.resolver is not None:
            return self.resolver(vid)
        return self.t.aligned(vid, self.depth)

    def pstate(self, cid: ClassID, vid: VertexID):
        return self.t.params[cid][vid]


class _SampleCtx:
    """Ctx over a concrete env (post-sampling scalar values)."""

    def __init__(self, tracer, env2, remap=None):
        self.t = tracer
        self.env2 = env2
        self.remap = remap

    def value(self, vid: VertexID):
        if self.remap is not None:
            vid = self.remap.get(vid, vid)
        return self.env2[vid]

    def pstate(self, cid: ClassID, vid: VertexID):
        return self.t.params[cid][vid]


class BlockTracer:
    def __init__(self, cm: CompiledModel, cid: ClassID, arenas: dict,
                 rel: dict, params: dict, obs_arrays: dict, obs_row: dict,
                 env0: dict, row_slot, force_retained: bool = False,
                 ext_hists: Optional[dict] = None,
                 ref_comp: Optional[dict] = None,
                 matmul_obs: bool = True,
                 cand: Optional[dict] = None):
        self.cm = cm
        self.cid = cid
        self.arenas = arenas
        self.rel = rel
        self.params = params
        self.obs_arrays = obs_arrays  # {cid: {vid: (codes [N], state [N])}}
        self.obs_row = obs_row  # vid -> (value, state) scalars for this row
        self.env: dict[VertexID, tuple[int, Any]] = {
            v: (0, val) for v, val in env0.items()}
        self.env0 = env0
        # ROW-TAINT tracking for the one-hot-matmul scoring path: vids whose
        # env value depends on THIS row (its observations, its slot, its
        # prior draws, earlier blocks' sampled values). Terms built only
        # from untainted values are identical for every row of a batch, so
        # under the batch vmap they hoist out as loop-invariants and the
        # observed-column scoring becomes onehot(obs) @ T — see
        # _matmul_obs_term (PROFILE.md "Next lever").
        self.taint: set[VertexID] = set(env0.keys())
        self.axes: list[int] = []
        self.records: dict[tuple, Any] = {}
        self.row_slot = row_slot
        self.force_retained = force_retained
        # {(path, ext_id): [cap, V]} referrer-observation histograms hoisted
        # out of the sweep scan (see referrer_histograms below)
        self.ext_hists = ext_hists or {}
        # {path: (idx [cap, R], cnt [cap])} compacted referrer index lists
        # (Engine._ref_comp; bounds from compile._referrer_bounds)
        self.ref_comp = ref_comp or {}
        # one-hot-matmul obs scoring only pays when the score-table build
        # amortizes over a batch/particle vmap; the sequential B=1 drivers
        # pass False (a [V_obs, cap] table per column per ROW would be far
        # costlier than the single eager gather)
        self.matmul_obs = matmul_obs
        # {target class: (idx [Kc], inv [cap], nc)} COMPACTED fk-candidate
        # axes (engine.build_cand): idx holds the live slot ids (ascending,
        # padded with `cap`), inv maps slot id -> compact position (Kc for
        # non-candidates), nc = live count. Valid for a whole segment:
        # births are deferred to the between-segment replay, so the live
        # set only SHRINKS mid-segment and shrinkage is masked by the
        # Pitman-Yor liveness term. The reference bar this chases is the
        # proposal hash restriction (proposal_compiler.jl:142-151): rents
        # enumerates 4,097 County slots with ~67 alive, hospital 513 with
        # ~55 — the compact axis removes that 8-60x waste.
        self.cand = cand or {}
        # sibling-fusion frames for deferred one-hot obs terms (_mm_flush)
        self._mm_frames: list[list] = []

    def _unif(self):
        """Next uniform from the per-block pool (sample pass only)."""
        assert self._pool is not None and self._pool_i < self._pool.shape[0], \
            "uniform pool exhausted: _draw_bound undercounted"
        u = self._pool[self._pool_i]
        self._pool_i += 1
        return u

    # ---------------------------------------------------------------- utils

    def aligned(self, vid: VertexID, depth: int):
        d, val = self.env[vid]
        if not hasattr(val, "ndim") or val.ndim == 0 or d >= depth:
            return val
        return val.reshape(val.shape + (1,) * (depth - d))

    def node(self, vid: VertexID) -> Node:
        return self.cm.node(self.cid, vid)

    def kernel(self, cid: ClassID, vid: VertexID):
        return self.cm.kernels[self.cm.canon(cid, vid)]

    def obs_of(self, vid: VertexID):
        return self.obs_row.get(vid, (None, None))

    def row_value(self, cls: ClassID, vid: VertexID, slot):
        return row_value(self.cm, self.arenas, self.params, cls, vid, slot)

    def compute_value(self, vid: VertexID, node, value_of):
        """Value of a Compute/ParamLookup node given arg resolver."""
        if isinstance(node, ParamLookupNode):
            ck, pk = self.cm.canon(self.cid, node.param_id)
            st = self.params[ck][pk]
            val = st["value"][value_of(node.key_id)]
            if node.gate_id is not None:
                gate = value_of(node.gate_id)
                truth = self.cm.truth_table(self.cid, node.gate_id)
                val = jnp.where(truth[gate], node.gate_value, val)
            return val
        assert isinstance(node, ComputeNode)
        if node.kind == "jax":
            return node.fn(*[value_of(a) for a in node.arg_ids])
        tbl = self.cm.interned.use(self.cm.tables[self.cm.canon(self.cid, vid)])
        args = tuple(value_of(a) for a in node.arg_ids)
        return tbl[args] if len(args) != 1 else tbl[args[0]]

    def py_logprobs(self, tc: ClassID):
        """Pitman-Yor prior over candidate slots + fresh row
        (trace.jl:53-61, block_proposal.jl:86-96)."""
        c = self.cm.cls(tc)
        r = self.rel[tc]
        py = self.params.get("__py__", {}).get(tc)
        if py is not None:
            s, d = py["strength"], py["discount"]
        else:
            s, d = c.py_strength, c.py_discount
        total = r["total"].astype(jnp.float32)
        logden = jnp.log(total + s)
        cnt = r["refcount"].astype(jnp.float32)
        live = r["alive"] & (r["refcount"] > 0)
        existing = jnp.where(live, jnp.log(jnp.maximum(cnt - d, 1e-30)) - logden,
                             NINF)
        new = jnp.log(d * r["nrows"].astype(jnp.float32) + s) - logden
        return existing, new

    def _shape(self, depth: int) -> tuple:
        return tuple(self.axes[:depth])

    def _taint_from_args(self, vid: VertexID, node) -> None:
        """Mark `vid` row-tainted iff any deterministic input is."""
        if isinstance(node, ParamLookupNode):
            args = [node.key_id] + ([node.gate_id]
                                    if node.gate_id is not None else [])
        else:
            args = list(node.arg_ids)
        if any(a in self.taint for a in args):
            self.taint.add(vid)

    def _args_untainted(self, vid: VertexID, node: ChoiceNode) -> bool:
        """True when every dynamic distribution argument of the (canonical)
        node resolves to a row-invariant env value — parameters are global
        and never tainted; an arg missing from env is treated as tainted."""
        canon = self.cm.node(*self.cm.canon(self.cid, vid))
        remap = self._arg_remap(vid, node) or {}
        for a in canon.arg_ids.values():
            a2 = remap.get(a, a)
            if isinstance(self.node(a2), ParameterNode):
                continue
            if a2 in self.taint or a2 not in self.env:
                return False
        return True

    # one-hot-matmul scoring: cap on the virtual [V_obs, *axes] score table
    _MM_MAX_CELLS = 4_000_000
    # ablation toggles (PCLEAN_MM=0 disables the matmul path entirely;
    # PCLEAN_MM_FUSE=0 keeps per-column matmuls but disables the
    # sibling-group fusion deferral)
    import os as _os
    _MM_ENABLED = _os.environ.get("PCLEAN_MM", "1") != "0"
    _MM_FUSE = _os.environ.get("PCLEAN_MM_FUSE", "1") != "0"

    def _matmul_obs_term(self, kern, node: ChoiceNode, vid: VertexID,
                         depth: int, ov):
        """Observed-column score as ONE one-hot contraction (PROFILE.md
        "Next lever", VERDICT r3 item 1).

        For a statically-observed categorical column whose distribution
        arguments are all row-invariant (untainted), the per-row term
        t = kern.obs_logdensity(args, ov) factorizes: build the full score
        table T[o, *axes] = obs_logdensity(args, o) for every possible
        observed code o — T involves no per-row value, so under the batch
        vmap it hoists out of the batch and is built ONCE per scan step —
        then contract t = onehot(ov) @ T. The eager path lowers to a
        per-(row, candidate) gather chain (concat indices + gather + selects,
        ~5 ops per column per step, [B, cap]-shaped); this path is one
        [B, V] x [V, prod(axes)] matmul riding the MXU. Returns None when
        inapplicable (float domain, constant-over-axes term, table too big),
        falling back to the eager gather.

        T is clamped to NEG_INF: real -inf entries (e.g. AddTypos beyond
        max_typos) would produce 0 * -inf = NaN in the contraction.
        """
        if not self._MM_ENABLED or not self.matmul_obs:
            return None
        dom = self.cm.domain(self.cid, vid)
        if dom is None or dom.kind == FLOAT or kern.V is None:
            return None
        Vo = kern.V
        shape = self._shape(depth)
        cells = Vo * int(np.prod(shape)) if shape else Vo
        if not shape or cells > self._MM_MAX_CELLS:
            return None
        if not self._args_untainted(vid, node):
            return None
        ctx = _Ctx(self, depth, remap=self._arg_remap(vid, node))
        obs_axis = jnp.arange(Vo).reshape((Vo,) + (1,) * depth)
        T = kern.obs_logdensity(ctx, obs_axis)
        if getattr(T, "ndim", 0) != depth + 1 or T.shape[0] != Vo \
                or all(int(s) == 1 for s in T.shape[1:]):
            return None  # constant over the enumeration axes: gather is cheaper
        T = jnp.maximum(T, NINF)
        onehot = (jnp.arange(Vo) == ov).astype(T.dtype)
        if self._MM_FUSE and self._mm_frames:
            # defer: sibling columns under the same enumeration context
            # contract as ONE concat(onehot) @ concat(T) matmul at the
            # frame's flush point (_mm_flush) — one dispatch for the whole
            # sibling group instead of one per column. The sweeps are
            # kernel-launch bound (PROFILE.md round 4), so fewer, larger
            # ops is the lever; the math is unchanged (0 * finite = 0,
            # NINF is finite, and each one-hot selects one row of its T).
            self._mm_frames[-1].append((onehot, T))
            return jnp.zeros((), dtype=T.dtype)
        return jnp.tensordot(onehot, T, axes=1)

    # -------------------------------------------- sibling-fusion frames
    # A frame spans one enumeration context: every deferred one-hot term
    # created at the same depth (no intervening logsumexp) is additive at
    # the frame's flush level, so fusing them into one contraction is
    # exact. Frames are pushed around each score_plan descent that a
    # logsumexp will reduce (score_choice's V axis, score_fk's E and N
    # branches) and at run()'s root.

    def _mm_push(self):
        self._mm_frames.append([])

    def _mm_flush(self, total):
        """Contract this frame's deferred one-hot terms into `total`."""
        frame = self._mm_frames.pop()
        if not frame:
            return total
        groups: dict[tuple, list] = {}
        for oh, T in frame:
            groups.setdefault(tuple(T.shape[1:]), []).append((oh, T))
        for fs in groups.values():
            if len(fs) == 1:
                oh, T = fs[0]
            else:
                oh = jnp.concatenate([f[0] for f in fs])
                T = jnp.concatenate([f[1] for f in fs], axis=0)
            total = total + jnp.tensordot(oh, T, axes=1)
        return total

    def _bcast(self, val, depth: int):
        return jnp.broadcast_to(jnp.asarray(val, dtype=jnp.float32),
                                self._shape(depth))

    # ------------------------------------------------------------- scoring

    def score_plan(self, plan: Plan, depth: int, mode: dict, ctx_key: tuple):
        total = jnp.zeros(self._shape(depth), dtype=jnp.float32)
        for step in plan.steps:
            total = total + self.score_step(step, depth, mode, ctx_key)
        return total

    def score_step(self, step: Step, depth: int, mode: dict, ctx_key: tuple):
        vid = step.idx
        node = self.node(vid)
        if isinstance(node, ParameterNode):
            return self.score_plan(step.rest, depth, mode, ctx_key)
        if isinstance(node, ExternalLikelihoodNode):
            return self.score_external(step, depth, mode, ctx_key)
        if isinstance(node, (ComputeNode, ParamLookupNode)):
            self.env[vid] = (depth, self.compute_value(
                vid, node, lambda a: self.aligned(a, depth)))
            self._taint_from_args(vid, node)
            return self.score_plan(step.rest, depth, mode, ctx_key)
        if isinstance(node, ForeignKeyNode):
            return self.score_fk(step, vid, node, depth, mode, ctx_key)
        if isinstance(node, SubmodelNode):
            fmode = mode.get(node.fk_id)
            assert fmode in ("E", "N"), "submodel step outside its fk context"
            while fmode == "N" and isinstance(node.subnode, SubmodelNode):
                # fresh-row branch of a deep slot chain: the generated row's
                # own submodel copies re-dispatch on *their* fk's mode
                node = node.subnode
                fmode = mode.get(node.fk_id)
                assert fmode in ("E", "N"), \
                    "nested submodel step outside its fk context"
            if fmode == "N":
                sub = node.subnode
                if isinstance(sub, ForeignKeyNode):
                    return self.score_fk(step, vid, sub, depth, mode, ctx_key)
                if isinstance(sub, (ComputeNode, ParamLookupNode)):
                    self.env[vid] = (depth, self.compute_value(
                        vid, sub, lambda a: self.aligned(a, depth)))
                    self._taint_from_args(vid, sub)
                    return self.score_plan(step.rest, depth, mode, ctx_key)
                assert isinstance(sub, ChoiceNode)
                return self.score_choice(step, vid, sub, depth, mode, ctx_key)
            # copy mode (case 3, proposal_compiler.jl:295-299): gather from
            # the candidate target row(s); observed -> equality constraint
            # (case 2, proposal_compiler.jl:277-293)
            fknode = _fk(self.cm, self.cid, node.fk_id)
            slot = self.aligned(node.fk_id, depth)
            val = self.row_value(fknode.target_class, node.sub_id, slot)
            self.env[vid] = (depth, val)
            if node.fk_id in self.taint:
                self.taint.add(vid)
            term = jnp.zeros(self._shape(depth), dtype=jnp.float32)
            ov, st = self.obs_of(vid)
            if ov is not None:
                dom = self.cm.domain(self.cid, vid)
                if dom is not None and dom.kind == FLOAT:
                    eq = jnp.abs(val - ov) <= 1e-6 * jnp.maximum(1.0, jnp.abs(ov))
                else:
                    eq = val == ov
                term = jnp.where(st == 1, jnp.where(eq, 0.0, NINF), 0.0)
            return term + self.score_plan(step.rest, depth, mode, ctx_key)
        assert isinstance(node, ChoiceNode)
        return self.score_choice(step, vid, node, depth, mode, ctx_key)

    def _arg_remap(self, vid: VertexID, node: ChoiceNode):
        """canonical arg vertex id -> this-class arg vertex id (identity for
        original nodes; the submodel vmap shift for inlined copies)."""
        canon = self.cm.node(*self.cm.canon(self.cid, vid))
        if canon is node:
            return None
        return {canon.arg_ids[s]: node.arg_ids[s] for s in canon.arg_ids}

    def score_choice(self, step: Step, vid: VertexID, node: ChoiceNode,
                     depth: int, mode: dict, ctx_key: tuple):
        kern = self.kernel(self.cid, vid)
        ctx = _Ctx(self, depth, remap=self._arg_remap(vid, node))
        ov, st = self.obs_of(vid)
        if _static_obs(st):
            # Column observed in every dataset row (static fact): the value
            # IS ov — no prior draw, no enumeration axis, no key. Score just
            # the observation term and pin the environment.
            term = self._matmul_obs_term(kern, node, vid, depth, ov)
            if term is None:
                term = self._bcast(kern.obs_logdensity(ctx, ov), depth)
            val = jnp.broadcast_to(jnp.asarray(ov), self._shape(depth))
            self.records[("so", vid, ctx_key)] = val
            self.env[vid] = (depth, val)
            self.taint.add(vid)  # pinned to this row's observation
            return term + self.score_plan(step.rest, depth, mode, ctx_key)
        if not kern.enumerable:
            # Sample the unobserved case from the prior NOW so observed
            # descendants score against a concrete draw (the reference
            # samples the parent before scoring, block_proposal.jl:56-66);
            # q = prior cancels the node's own p term, so only descendant
            # terms enter the weight. The draw (one per enclosing
            # enumeration branch, via broadcasting) is recorded for the
            # sample pass, which must return the same value the descendants
            # were scored against.
            if self.force_retained:
                drawn = self._forced(vid)
            else:
                drawn = kern.sample_prior(
                    ctx, self._score_keys() if kern.prior_needs_key else None)
            if ov is not None:
                term = jnp.where(
                    st == 1,
                    self._bcast(kern.obs_logdensity(ctx, ov), depth),
                    jnp.where(st == 2,
                              self._bcast(kern.missing_logdensity(ctx), depth),
                              0.0))
                val = jnp.where(st == 1, ov, drawn)
            else:
                term = jnp.zeros(self._shape(depth), dtype=jnp.float32)
                val = drawn
            val = jnp.broadcast_to(jnp.asarray(val), self._shape(depth))
            self.records[("ne", vid, ctx_key)] = val
            self.env[vid] = (depth, val)
            self.taint.add(vid)  # prior draw / observed merge: row-specific
            return term + self.score_plan(step.rest, depth, mode, ctx_key)
        V = kern.V
        enum = jnp.broadcast_to(jnp.asarray(kern.enum_logits(ctx),
                                            dtype=jnp.float32),
                                self._shape(depth) + (V,))
        if ov is not None:
            obs_ld = self._bcast(kern.obs_logdensity(ctx, ov), depth)
            delta = jnp.where(jnp.arange(V) == ov, obs_ld[..., None], NINF)
            logits = jnp.where(st == 1, delta, enum)
        else:
            logits = enum
        self.axes.append(V)
        self.env[vid] = (depth + 1, jnp.arange(V))
        self._mm_push()
        children = self._mm_flush(
            self.score_plan(step.rest, depth + 1, mode, ctx_key))
        self.axes.pop()
        total = logits + children
        self.records[(vid, ctx_key)] = total
        return logsumexp(total, axis=-1)

    def score_fk(self, step: Step, vid: VertexID, fknode: ForeignKeyNode,
                 depth: int, mode: dict, ctx_key: tuple):
        tc = fknode.target_class
        cap = self.cm.layouts[tc].capacity
        comp = self.cand.get(tc)
        py_exist_full, py_new = self.py_logprobs(tc)
        if comp is not None:
            idx, _invm, nc = comp
            K = int(idx.shape[0])
            pos = jnp.arange(K)
            # pad positions clamp their gathers to a real slot; the mask
            # makes them unselectable regardless of what they scored
            slot_ids = jnp.minimum(idx, cap - 1)
            py_exist = jnp.where(pos < nc, py_exist_full[slot_ids], NINF)
        else:
            K = cap
            slot_ids = jnp.arange(K)
            py_exist = py_exist_full

        self.axes.append(K)
        self.env[vid] = (depth + 1, slot_ids)
        self._mm_push()
        ch_e = self._mm_flush(
            self.score_plan(step.rest, depth + 1, {**mode, vid: "E"},
                            ctx_key + ((vid, "E"),)))
        self.axes.pop()
        exist = py_exist + ch_e  # [.., K]

        self.env[vid] = (depth, jnp.zeros((), jnp.int32))  # unused in N mode
        # the N branch scores at the CALLER's depth but its terms belong to
        # this fk's "new" logit only — they must not escape to the outer
        # frame (logsumexp over [exist, new] intervenes)
        self._mm_push()
        ch_n = self._mm_flush(
            self.score_plan(step.rest, depth, {**mode, vid: "N"},
                            ctx_key + ((vid, "N"),)))
        new = py_new + ch_n

        logits = jnp.concatenate(
            [jnp.broadcast_to(exist, self._shape(depth) + (K,)),
             self._bcast(new, depth)[..., None]], axis=-1)
        self.records[(vid, ctx_key)] = logits
        del self.env[vid]
        return logsumexp(logits, axis=-1)

    # -------------------------------------------------- external likelihoods

    def score_external(self, step: Step, depth: int, mode: dict,
                       ctx_key: tuple):
        node: ExternalLikelihoodNode = self.node(step.idx)
        path = node.path
        src = path[-1][0]
        comp = self.ref_comp.get(path)
        if comp is not None:
            # compacted referrer axis: this slot's referrer index list
            # (bounded by the hash-key multiplicity, compile._referrer_bounds)
            idx_all, cnt = comp
            slots = idx_all[self.row_slot]                    # [R]
            mask = jnp.arange(slots.shape[0]) < cnt[self.row_slot]
        else:
            Cs = self.cm.layouts[src].capacity
            # Referrer mask: chase the fk columns down the path
            # (collect_referring_rows, row_inference.jl:23-47, vectorized).
            t = None
            for (hop_cid, hop_fk) in reversed(path):
                col = self.arenas[hop_cid]["values"][hop_fk]
                t = col if t is None else col[t]
            mask = self.rel[src]["alive"] & (t == self.row_slot)
            slots = jnp.arange(Cs)

        vmap = self.cm.cls(self.cid).incoming_references[path]
        inv = {sv: tv for tv, sv in vmap.items()}
        cache: dict[VertexID, Any] = {}

        def ext_value(svid: VertexID):
            """Value of a source-class vertex over the referrer axis, with
            this class's in-flight proposal overlaid on vmapped vertices
            (proposal_row_state.jl's overlay)."""
            if svid in cache:
                return cache[svid]
            if svid in inv and inv[svid] in self.env:
                v = self.aligned(inv[svid], depth)
                if hasattr(v, "ndim") and v.ndim > 0:
                    v = v[..., None]  # broadcast over the Cs axis
                cache[svid] = v
                return v
            snode = self.cm.node(src, svid)
            if isinstance(snode, (ComputeNode, ParamLookupNode)):
                if isinstance(snode, ParamLookupNode):
                    ck, pk = self.cm.canon(src, snode.param_id)
                    st = self.params[ck][pk]
                    v = st["value"][ext_value(snode.key_id)]
                    if snode.gate_id is not None:
                        truth = self.cm.truth_table(src, snode.gate_id)
                        v = jnp.where(truth[ext_value(snode.gate_id)],
                                      snode.gate_value, v)
                elif snode.kind == "jax":
                    v = snode.fn(*[ext_value(a) for a in snode.arg_ids])
                else:
                    tbl = self.cm.interned.use(self.cm.tables[self.cm.canon(src, svid)])
                    args = tuple(ext_value(a) for a in snode.arg_ids)
                    v = tbl[args] if len(args) != 1 else tbl[args[0]]
            else:
                v = self.row_value(src, svid, slots)
            cache[svid] = v
            return v

        terms, presummed = self._ext_terms(step, src, ext_value, cache,
                                           depth, mask, inv, slots,
                                           comp is not None)
        masked = jnp.where(mask, terms, 0.0)
        return jnp.sum(masked, axis=-1) + presummed

    def _ext_terms(self, step: Step, src: ClassID, ext_value, cache,
                   depth: int, mask, inv, slots, compacted: bool):
        """Returns (per-referrer terms [.., Cs], pre-summed terms [..]).

        Table-likelihood externals whose only dynamic argument is an overlay
        value (e.g. AddTypos on an enumerated latent string) are computed as
        histogram x matrix products: scatter the referrers' observed codes
        into a [V] histogram, then one matvec against the likelihood matrix.
        This avoids materializing [option-axis x referrer-capacity]
        intermediates (at 50k rows and |V|~3k that is half a GB per node)
        and rides the MXU instead of the VPU.
        """
        node: ExternalLikelihoodNode = self.node(step.idx)
        ext = node.ext_node
        Cs = slots.shape[0]  # compacted [R] or full source capacity
        total = jnp.zeros(self._shape(depth) + (Cs,), dtype=jnp.float32)
        presummed = jnp.zeros(self._shape(depth), dtype=jnp.float32)
        if isinstance(ext, (ComputeNode, ParamLookupNode)):
            # recompute with overlay; deeper externals read it via the cache
            cache[node.ext_id] = None
            cache.pop(node.ext_id)
            v = None
            if isinstance(ext, ParamLookupNode):
                ck, pk = self.cm.canon(src, ext.param_id)
                st = self.params[ck][pk]
                v = st["value"][ext_value(ext.key_id)]
                if ext.gate_id is not None:
                    truth = self.cm.truth_table(src, ext.gate_id)
                    v = jnp.where(truth[ext_value(ext.gate_id)],
                                  ext.gate_value, v)
            elif ext.kind == "jax":
                v = ext.fn(*[ext_value(a) for a in ext.arg_ids])
            else:
                tbl = self.cm.interned.use(self.cm.tables[self.cm.canon(src, node.ext_id)])
                args = tuple(ext_value(a) for a in ext.arg_ids)
                v = tbl[args] if len(args) != 1 else tbl[args[0]]
            cache[node.ext_id] = v
        elif isinstance(ext, ChoiceNode):
            kern = self.cm.kernels[self.cm.canon(src, node.ext_id)]
            hist_term = self._ext_hist_term(kern, ext, src, node.ext_id,
                                            mask, inv, depth, ext_value,
                                            path=node.path, slots=slots,
                                            compacted=compacted)
            if hist_term is None:
                hist_term = self._ext_gauss_term(kern, ext, src, node.ext_id,
                                                 inv, depth, path=node.path)
            if hist_term is not None:
                presummed = presummed + hist_term
            else:
                ctx = _Ctx(self, depth, resolver=ext_value)
                ov, st = self._ext_obs(src, node.ext_id, slots)
                if st is None:
                    term = kern.obs_logdensity(ctx, ov)
                else:
                    obs_t = kern.obs_logdensity(ctx, ov)
                    miss_t = kern.missing_logdensity(ctx) + jnp.zeros_like(obs_t)
                    term = jnp.where(st == 1, obs_t,
                                     jnp.where(st == 2, miss_t, 0.0))
                if getattr(term, "ndim", 0) == 1:
                    # option-independent term (no enumeration axes): sum over
                    # referrers once instead of broadcasting into the
                    # [option-axes x Cs] total — at 3275 options x 50k
                    # referrers that broadcast is 650 MB of pure HBM traffic
                    # per swept slot (the rents County 45 ms/slot cost)
                    presummed = presummed + jnp.sum(
                        jnp.where(mask, term, 0.0), axis=-1)
                else:
                    total = total + term
        elif isinstance(ext, ForeignKeyNode):
            raise NotImplementedError(
                "external foreign-key likelihoods (DPMem-style) unsupported, "
                "as in the reference (proposal_compiler.jl:344-345)")
        for child in step.rest.steps:
            cn = self.node(child.idx)
            assert isinstance(cn, ExternalLikelihoodNode)
            t2, p2 = self._ext_terms(child, src, ext_value, cache, depth,
                                     mask, inv, slots, compacted)
            total = total + t2
            presummed = presummed + p2
        return total, presummed

    # composed-table SA tensors can get big; above this cell count fall back
    # to the dense per-referrer gather
    _SA_MAX_CELLS = 16_000_000

    def _ext_hist_term(self, kern, ext: ChoiceNode, src: ClassID,
                       ext_id: VertexID, mask, inv, depth: int, ext_value,
                       path=None, slots=None, compacted: bool = False):
        """Histogram-matmul path for AddTypos externals: the per-referrer sum
        Σ_r M[obs_r, word_r] collapses to a histogram (scatter) times the
        likelihood matrix (one MXU matvec) whenever `word` is a function of
        the overlaid enumeration axes and at most one per-referrer value.

        Covered cases (None when inapplicable → dense per-referrer gather):
          * word IS the overlaid latent value (e.g. AddTypos on an enumerated
            string attribute): 1-D obs histogram @ M, gather by word axis.
          * word = table[latent, referrer_value] (e.g. hospital's
            stateavg = f(state, measure code), run.jl:54-56): precompute
            SA[a, c, o] = M[o, tbl[a, c]] once at trace time, scatter the
            (referrer_value, obs) pairs into a 2-D histogram, and contract
            SA·H on the MXU — this removes the [option-axes × referrer-
            capacity] gather that dominated the latent-class sweep.
        """
        from .kernels import _AddTyposK

        if not isinstance(kern, _AddTyposK):
            return None
        word_sv = ext.arg_ids.get("word")
        if word_sv is None:
            return None
        val, st = self._ext_obs(src, ext_id, slots)
        w = mask if st is None else (mask & (st != 2))
        V = kern.V
        if word_sv in inv and inv[word_sv] in self.env:
            # The hoisted per-slot histogram is valid regardless of
            # referrer-list compaction: referrer_histograms chases the same
            # fk chain over ALL source rows with the same alive/&state!=2
            # mask, so pre[slot] equals the scatter over the slot's
            # compacted referrer list exactly (integer counts). Preferring
            # it here removed the dominant rents County cost — a vmapped
            # [B, V] scatter-add with ~R updates per swept row (532 ms/step
            # measured at B=256) becomes one [V] gather per row.
            pre = self.ext_hists.get((path, ext_id))
            if pre is not None:
                # hoisted: one [cap, V] scatter per sweep segment instead of
                # one [Cs] scatter per swept slot (referrer_histograms)
                hist = pre[self.row_slot]
            else:
                hist = jnp.zeros((V,), jnp.float32).at[val].add(
                    jnp.where(w, 1.0, 0.0), mode="drop")
            termvec = hist @ self.cm.interned.use(kern.M)  # [V_lat]
            arg = self.aligned(inv[word_sv], depth)
            return termvec[arg]
        # composed case: word is a table ComputeNode over env-aligned +
        # (at most one) per-referrer arguments
        snode = self.cm.node(src, word_sv)
        if not (isinstance(snode, ComputeNode) and snode.kind == "table"):
            return None
        env_args, ref_args = [], []
        for a in snode.arg_ids:
            if a in inv and inv[a] in self.env:
                env_args.append(a)
            else:
                ref_args.append(a)
        if not env_args or len(ref_args) > 1:
            return None
        tbl = self.cm.tables.get(self.cm.canon(src, word_sv))
        if tbl is None or tbl.size * V > self._SA_MAX_CELLS:
            return None
        # reorder table axes to (env..., ref?) to match the contraction
        order = [snode.arg_ids.index(a) for a in env_args + ref_args]
        cache_key = ("sa", self.cm.canon(src, word_sv),
                     self.cm.canon(src, ext_id), tuple(order))
        sa_cache = self.cm.__dict__.setdefault("_ext_sa_cache", {})
        SA = sa_cache.get(cache_key)
        if SA is None:
            # SA[env..., ref?, o] = M[o, tbl[env..., ref?]]
            SA = np.ascontiguousarray(
                np.asarray(kern.M).T[np.transpose(tbl, order)])
            sa_cache[cache_key] = SA
            self.cm.interned.register(SA)
        env_idx = [self.aligned(inv[a], depth) for a in env_args]
        if ref_args:
            rv = ext_value(ref_args[0])
            if getattr(rv, "ndim", None) != 1:
                return None  # overlay-dependent or scalar: dense path
            Vc = tbl.shape[snode.arg_ids.index(ref_args[0])]
            H = jnp.zeros((Vc, V), jnp.float32).at[rv, val].add(
                jnp.where(w, 1.0, 0.0), mode="drop")
            ne = len(env_args)
            termvec = jnp.reshape(self.cm.interned.use(SA), SA.shape[:ne] + (-1,)) \
                @ jnp.ravel(H)  # [Venv...]
        else:
            hist = jnp.zeros((V,), jnp.float32).at[val].add(
                jnp.where(w, 1.0, 0.0), mode="drop")
            termvec = jnp.reshape(self.cm.interned.use(SA), SA.shape[:-1] + (-1,)) \
                .reshape((-1, V)) @ hist
            termvec = jnp.reshape(termvec, SA.shape[:len(env_args)])
        return termvec[tuple(env_idx)]

    def _ext_gauss_term(self, kern, ext: ChoiceNode, src: ClassID,
                        ext_id: VertexID, inv, depth: int, path=None):
        """Closed-form Gaussian external via per-segment sufficient
        statistics (the rents County bottleneck: VERDICT r4 profile).

        A Gaussian external whose mean is an indexed-parameter lookup over
        (overlaid env axes..., at most one per-referrer categorical)
        otherwise materializes a [*option-axes x referrers] tensor per
        swept slot — rents County: [B, 51 states, 1664 referrers] f32 =
        87 MB per scan step, 521 ms/step measured. But
        Sum_r logN(z_r; mu_{c_r}, s) factorizes through per-group
        sufficient statistics: with (n_c, Sz_c, Szz_c) per referrer group
        c (hoisted per segment by gaussian_stats — the referrers are
        frozen during the swept class's own sweep, same argument as
        referrer_histograms) the whole external is
            -(Szz - 2 mu_c Sz + n_c mu_c^2)/(2 s^2) summed over c
        minus the mean-independent normalization + Jacobian terms
        (presummed per slot). The env-axes tensor shrinks to
        [B, axes..., C] with C = group count (rents: 5 room types).

        Returns None (dense fallback) unless the structure matches and the
        hoisted stats are available."""
        from .kernels import _GaussianK

        if not isinstance(kern, _GaussianK) or kern.mean_vid is None:
            return None
        pre = self.ext_hists.get((path, ext_id))
        if not (isinstance(pre, tuple) and len(pre) == 5
                and pre[0] == "gauss"):
            return None
        _tag, n_g, sz_g, szz_g, pre0 = pre
        mnode = self.cm.node(src, kern.mean_vid)
        if not isinstance(mnode, ParamLookupNode) or mnode.gate_id is not None:
            return None
        knode = self.cm.node(src, mnode.key_id)
        if not (isinstance(knode, ComputeNode) and knode.kind == "table"):
            return None
        env_args = [a for a in knode.arg_ids
                    if a in inv and inv[a] in self.env]
        ref_args = [a for a in knode.arg_ids if a not in env_args]
        if len(ref_args) != 1 or set(env_args + ref_args) != set(knode.arg_ids):
            return None
        tbl = self.cm.interned.use(
            self.cm.tables[self.cm.canon(src, mnode.key_id)])
        # reorder key-table axes to (env..., ref)
        order = [knode.arg_ids.index(a) for a in env_args + ref_args]
        tbl = jnp.transpose(tbl, order)
        ck, pk = self.cm.canon(src, mnode.param_id)
        values = self.params[ck][pk]["value"]
        env_idx = tuple(self.aligned(inv[a], depth) for a in env_args)
        mu = values[tbl[env_idx]]  # [axes..., C]
        n = n_g[self.row_slot]     # [C]
        sz = sz_g[self.row_slot]
        szz = szz_g[self.row_slot]
        inv_var = 1.0 / (kern.std * kern.std)
        term = -0.5 * inv_var * (
            jnp.sum(szz) - 2.0 * jnp.sum(mu * sz, axis=-1)
            + jnp.sum(mu * mu * n, axis=-1))
        return term + pre0[self.row_slot]

    def _ext_obs(self, src: ClassID, svid: VertexID, slots=None):
        """Observed (value, state) arrays of a source-class vertex over
        `slots` (default: the full capacity), falling back to stored/derived
        row values (the reference scores active_parent_trace[ext_id],
        block_proposal.jl:139-152)."""
        if slots is None:
            slots = jnp.arange(self.cm.layouts[src].capacity)
        oa = self.obs_arrays.get(src, {}).get(svid)
        if oa is not None:
            codes, state = oa
            codes = self.cm.interned.use(codes)[slots]
            state = self.cm.interned.use(state)[slots]
            stored = self.row_value(src, svid, slots)
            val = jnp.where(state == 1, codes, stored)
            return val, state
        return self.row_value(src, svid, slots), None

    # ------------------------------------------------------------- sampling

    def sample(self, key) -> BlockResult:
        """Top-down pass: draw (or force) concrete values for every vertex in
        the block; returns env updates, extra weight from deferred nodes, and
        birth records for fresh rows."""
        k_pool, k_rest = jax.random.split(key)
        n = _draw_bound(self.cm, self.cid, self._root_plan)
        # one [n] threefry call replaces ~n per-node fold_in+threefry chains
        # (_draw_bound rationale); kernels needing real keys (sample_prior)
        # still use the _KeyStream
        self._pool = jax.random.uniform(k_pool, (n,)) if n else None
        self._pool_i = 0
        self._keys = _KeyStream(k_rest)
        env2 = dict(self.env0)
        births: list[Birth] = []
        extra_w = jnp.zeros((), jnp.float32)
        # working copies for fresh-slot allocation
        alive2 = {c: self.rel[c]["alive"] for c in self.cm.model.class_order}

        state = _SampleState(env2, births, alive2, extra_w)
        for step in self._root_plan.steps:
            self.sample_step(step, state, anc=(), mode={}, ctx_key=())
        return BlockResult(env2, state.extra_w, births)

    # births created inside a fresh-row branch only materialize if every
    # enclosing fk actually chose "new" — st.gate tracks that conjunction

    def run(self, plan: Plan, key) -> tuple[Any, BlockResult]:
        """Score then sample one block; returns (logZ, result). The score
        pass consumes keys too: prior draws for unobserved non-enumerable
        nodes happen during scoring (sample-first order of
        block_proposal.jl:56-66)."""
        self._root_plan = plan
        k_score, k_sample = jax.random.split(key)
        self._score_keys = _KeyStream(k_score)
        self._mm_push()
        logZ = self._mm_flush(self.score_plan(plan, 0, {}, ()))
        assert not self._mm_frames, "unbalanced sibling-fusion frames"
        res = self.sample(k_sample)
        return logZ, res

    def _forced(self, vid: VertexID):
        """Retained value of a vertex: the stored row value, via fk chains
        (works even when a referenced row was garbage-collected — stale slot
        values are still readable, which is how the reference's retained
        re-birth keys behave, proposal_compiler.jl:225-232)."""
        return self.row_value(self.cid, vid, self.row_slot)

    def sample_step(self, step: Step, st: "_SampleState", anc: tuple,
                    mode: dict, ctx_key: tuple):
        vid = step.idx
        node = self.node(vid)
        if isinstance(node, (ParameterNode, ExternalLikelihoodNode)):
            return
        if isinstance(node, (ComputeNode, ParamLookupNode)):
            st.env2[vid] = self.compute_value(vid, node,
                                              lambda a: st.env2[a])
            for ch in step.rest.steps:
                self.sample_step(ch, st, anc, mode, ctx_key)
            return
        if isinstance(node, ForeignKeyNode):
            return self.sample_fk(step, vid, node, st, anc, mode, ctx_key)
        if isinstance(node, SubmodelNode):
            fmode = mode.get(node.fk_id)
            while fmode == "N" and isinstance(node.subnode, SubmodelNode):
                node = node.subnode
                fmode = mode.get(node.fk_id)
            if fmode == "N":
                sub = node.subnode
                if isinstance(sub, ForeignKeyNode):
                    return self.sample_fk(step, vid, sub, st, anc, mode, ctx_key)
                if isinstance(sub, (ComputeNode, ParamLookupNode)):
                    st.env2[vid] = self.compute_value(vid, sub,
                                                      lambda a: st.env2[a])
                    for ch in step.rest.steps:
                        self.sample_step(ch, st, anc, mode, ctx_key)
                    return
                assert isinstance(sub, ChoiceNode)
                return self.sample_choice(step, vid, sub, st, anc, mode, ctx_key)
            # copy mode
            fknode = _fk(self.cm, self.cid, node.fk_id)
            st.env2[vid] = self.row_value(fknode.target_class, node.sub_id,
                                          st.env2[node.fk_id])
            for ch in step.rest.steps:
                self.sample_step(ch, st, anc, mode, ctx_key)
            return
        assert isinstance(node, ChoiceNode)
        return self.sample_choice(step, vid, node, st, anc, mode, ctx_key)

    def sample_choice(self, step: Step, vid: VertexID, node: ChoiceNode,
                      st: "_SampleState", anc: tuple, mode: dict,
                      ctx_key: tuple):
        kern = self.kernel(self.cid, vid)
        ov, state_flag = self.obs_of(vid)
        if _static_obs(state_flag):
            rec = self.records[("so", vid, ctx_key)]
            st.env2[vid] = rec[anc] if anc else rec
            for ch in step.rest.steps:
                self.sample_step(ch, st, anc, mode, ctx_key)
            return
        if not kern.enumerable:
            # Reuse the score pass's recorded prior draw (already merged
            # with the observed value) at the chosen ancestor branch, so the
            # returned row carries exactly the value its weight was scored
            # with (block_proposal.jl:56-66 sample-then-score order).
            rec = self.records[("ne", vid, ctx_key)]
            st.env2[vid] = rec[anc] if anc else rec
            for ch in step.rest.steps:
                self.sample_step(ch, st, anc, mode, ctx_key)
            return
        rec = self.records[(vid, ctx_key)]
        logits = rec[anc] if anc else rec  # [V]
        if self.force_retained:
            rv = jnp.asarray(self._forced(vid), dtype=jnp.int32)
            dummy = self.cm.dummy_code.get(self.cm.canon(self.cid, vid))
            if dummy is None:
                chosen = rv
            else:
                # retained value outside the enumerated support -> dummy
                # branch (proposal_compiler.jl:98-101)
                valid = logits[rv] > NINF / 2
                chosen = jnp.where(valid, rv, jnp.asarray(dummy, jnp.int32))
        else:
            chosen = _inv_cdf_from_u(self._unif(), logits)
        st.env2[vid] = chosen.astype(jnp.int32)
        for ch in step.rest.steps:
            self.sample_step(ch, st, anc + (chosen,), mode, ctx_key)
        return

    def sample_fk(self, step: Step, vid: VertexID, fknode: ForeignKeyNode,
                  st: "_SampleState", anc: tuple, mode: dict, ctx_key: tuple):
        tc = fknode.target_class
        cap = self.cm.layouts[tc].capacity
        comp = self.cand.get(tc)
        rec = self.records[(vid, ctx_key)]
        logits = rec[anc] if anc else rec  # [K+1]
        K = int(logits.shape[-1]) - 1  # compact Kc or full cap
        retained_dead = jnp.asarray(False)
        if self.force_retained:
            rv = jnp.asarray(self._forced(vid), dtype=jnp.int32)
            alive_rv = self.rel[tc]["alive"][rv] & (self.rel[tc]["refcount"][rv] > 0)
            # an alive retained slot is always in the segment-entry
            # candidate list (the live set only shrinks mid-segment), so
            # inv maps it to its compact position
            rpos = comp[1][rv] if comp is not None else rv
            chosen = jnp.where(alive_rv, rpos, jnp.asarray(K, jnp.int32))
            retained_dead = ~alive_rv
        else:
            chosen = _inv_cdf_from_u(self._unif(), logits)
        is_new = chosen == K
        # full-arena guard: with no free slot, fall back to the best-scoring
        # existing candidate instead of overwriting a live row
        has_free = ~jnp.all(st.alive2[tc])
        fallback = jnp.argmax(logits[:K]).astype(jnp.int32)
        chosen = jnp.where(is_new & ~has_free, fallback, chosen)
        is_new = is_new & has_free
        effective_new = is_new & st.gate
        c_exist = jnp.minimum(chosen, K - 1)  # compact POSITION
        c_exist_slot = jnp.minimum(comp[0][c_exist], cap - 1) \
            if comp is not None else c_exist  # real slot id

        # fresh slot: first free (dead) slot of the working alive mask; a
        # retained-dead fk re-births in its old slot
        # (proposal_compiler.jl:225-232)
        free = jnp.argmin(st.alive2[tc].astype(jnp.int32))
        if self.force_retained:
            rv = jnp.asarray(self._forced(vid), dtype=jnp.int32)
            slot = jnp.where(retained_dead, rv, free)
        else:
            slot = free
        st.alive2[tc] = st.alive2[tc].at[slot].set(
            st.alive2[tc][slot] | effective_new)
        final = jnp.where(is_new, slot, c_exist_slot).astype(jnp.int32)
        st.env2[vid] = final

        # Children: run both branches and select. Existing branch: descend
        # in copy mode at the clamped candidate (env carries the REAL slot,
        # the ancestor tuple the recorded-axis position); new branch:
        # descend the recorded 'N' posteriors.
        env_keep = dict(st.env2)
        st.env2[vid] = c_exist_slot
        for ch in step.rest.steps:
            self.sample_step(ch, st, anc + (c_exist,), {**mode, vid: "E"},
                             ctx_key + ((vid, "E"),))
        exist_vals = {w: st.env2[w] for w in self._subtree_vids(step)
                      if w in st.env2}
        # reset and run new branch (nested births gated by this choice)
        for w in self._subtree_vids(step):
            if w in env_keep:
                st.env2[w] = env_keep[w]
            else:
                st.env2.pop(w, None)
        st.env2[vid] = final
        outer_gate = st.gate
        st.gate = st.gate & is_new
        st.fk_depth += 1
        for ch in step.rest.steps:
            self.sample_step(ch, st, anc, {**mode, vid: "N"},
                             ctx_key + ((vid, "N"),))
        st.fk_depth -= 1
        st.gate = outer_gate
        for w in self._subtree_vids(step):
            if w in exist_vals and w in st.env2:
                ev, nv = exist_vals[w], st.env2[w]
                if hasattr(nv, "dtype") or hasattr(ev, "dtype"):
                    st.env2[w] = jnp.where(is_new, nv, ev)
        st.env2[vid] = final

        # Birth record: the fresh row's values for every storable vertex of
        # the target class, read via the (possibly submodel-shifted) vmap.
        raw = self.node(vid)
        vmap = raw.vmap if isinstance(raw, ForeignKeyNode) else \
            strip_subnodes(raw).vmap
        values = {}
        for tv, dt in self.cm.layouts[tc].store.items():
            sv = vmap.get(tv)
            if sv is not None and sv in st.env2:
                values[tv] = st.env2[sv]
        st.births.append(Birth(vid, tc, effective_new, slot, values,
                               depth=st.fk_depth))
        return

    def _subtree_vids(self, step: Step) -> list[VertexID]:
        out = []

        def walk(p: Plan):
            for s in p.steps:
                out.append(s.idx)
                walk(s.rest)

        walk(step.rest)
        return out



def _draw_bound(cm: CompiledModel, cid: ClassID, plan: Plan) -> int:
    """Static upper bound on the number of inverse-CDF draws the sample
    pass can consume for one block: every Choice/ForeignKey step may draw
    once, and a foreign key's subtree is traced through BOTH the existing
    (copy) and fresh branches, each consuming its own draws. Used to size
    the per-block uniform pool (one [n] threefry call) that replaces ~40
    u32 ops of fold_in+threefry PER NODE — the PRNG chains were the single
    largest static-op group in the compiled sweep programs (~4,700 of
    ~15,000 instructions on hospital's Record program, scripts/
    hlo_breakdown.py), pure kernel-launch overhead on an op-count-bound
    TPU program."""
    def walk_plan(p: Plan, mult: int) -> int:
        return sum(walk(s, mult) for s in p.steps)

    def walk(step: Step, mult: int) -> int:
        node = cm.node(cid, step.idx)
        if isinstance(node, (ParameterNode, ExternalLikelihoodNode)):
            return 0
        raw = strip_subnodes(node) if isinstance(node, SubmodelNode) else node
        n = 0 if isinstance(raw, (ComputeNode, ParamLookupNode)) else mult
        sub_mult = mult * 2 if isinstance(raw, ForeignKeyNode) else mult
        return n + walk_plan(step.rest, sub_mult)

    return walk_plan(plan, 1)


def _inv_cdf_from_u(u, logits):
    """Sample from softmax(logits) along the last axis via inverse-CDF from
    a pre-drawn uniform u in [0, 1): a cumsum + one comparison, instead of
    jax.random.categorical's Gumbel trick (which draws threefry randomness
    of the FULL logits shape — ~30 u32 elementwise ops over the [K+1]
    fk-candidate axis per row, the largest tensor volume in the batched
    sweep programs; profile_costs.py). Exactness: P(i) = softmax(logits)_i;
    zero-mass (-inf) entries occupy zero-width intervals. The threshold is
    drawn from (0, total] — NOT [0, total) — because at threshold 0 every
    prefix test c < t is false and index 0 would be selected even when
    logits[0] == -inf (e.g. a dead fk-candidate slot); uniform() returns
    exactly 0.0 with probability ~2^-24, which over the ~10M draws of a
    100k-row multi-sweep run would resurrect a dead row occasionally
    (ADVICE r3). The (0, total] form also keeps trailing zero-mass entries
    unselectable (their cumsum equals total, never < t)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    c = jnp.cumsum(p, axis=-1)
    ub = (1.0 - u) * c[..., -1]
    return jnp.sum(c < ub[..., None], axis=-1).astype(jnp.int32)


class _SampleState:
    def __init__(self, env2, births, alive2, extra_w):
        self.env2 = env2
        self.births = births
        self.alive2 = alive2
        self.extra_w = extra_w
        self.gate = jnp.asarray(True)  # conjunction of enclosing is_new flags
        self.fk_depth = 0  # static: nesting depth inside fresh-birth branches


class _KeyStream:
    """Counter-based key derivation. fold_in(base, i) makes every derived
    key depend only on the base key, so the ~dozens of per-block keys lower
    as independent ops instead of a serial split chain — the chain was pure
    latency on the critical path of the sequential row scan. The counter is
    a Python int consumed at trace time, so it is static."""

    def __init__(self, key):
        self.key = key
        self.i = 0

    def __call__(self):
        sub = jax.random.fold_in(self.key, self.i)
        self.i += 1
        return sub


def build_cand(cm: CompiledModel, rel: dict, kc: dict) -> dict:
    """{target class: (idx [Kc], inv [cap], nc)} compact candidate axes from
    the segment-entry relational snapshot (see BlockTracer.cand). kc maps
    class -> STATIC Kc (engine-chosen per segment from fetched live counts,
    with headroom; the live set only shrinks within a segment, so Kc >=
    live-at-entry can never overflow). Deterministic (stable argsort), so
    sharded and single-device programs build identical lists."""
    out = {}
    for tc, Kc in kc.items():
        cap = cm.layouts[tc].capacity
        r = rel[tc]
        live = r["alive"] & (r["refcount"] > 0)
        order = jnp.argsort(~live)  # stable: live slots first, ascending
        idx = order[:Kc].astype(jnp.int32)
        nc = jnp.minimum(jnp.sum(live.astype(jnp.int32)), Kc)
        idxm = jnp.where(jnp.arange(Kc) < nc, idx, cap)
        inv = jnp.full((cap,), Kc, jnp.int32).at[idxm].set(
            jnp.arange(Kc, dtype=jnp.int32), mode="drop")
        out[tc] = (idxm, inv, nc)
    return out


def precompute_sa_tables(cm: CompiledModel) -> None:
    """Build + intern-register the composed-table AddTypos score tensors at
    COMPILE time (ADVICE r3): _ext_hist_term's lazy trace-time construction
    registered SA *after* Engine._interned_dev was snapshotted, so the
    largest arrays the interning targets (e.g. hospital's SA[state, code, V]
    from M x stateavg-table) still embedded as StableHLO literals. Walking
    the plan forests here mirrors _ext_hist_term's composed case exactly
    (same cache key, same axis order) with the conservative arg split
    'mapped into the referring class => enumeration-env argument' — if a
    trace ever disagrees, it just rebuilds lazily (old behavior, correct)."""
    from .kernels import _AddTyposK

    sa_cache = cm.__dict__.setdefault("_ext_sa_cache", {})
    for cid in cm.model.class_order:
        c = cm.cls(cid)

        def collect(step, cid=cid, c=c):
            node = cm.node(cid, step.idx)
            if isinstance(node, ExternalLikelihoodNode) and \
                    isinstance(node.ext_node, ChoiceNode):
                src = node.path[-1][0]
                kern = cm.kernels[cm.canon(src, node.ext_id)]
                word_sv = node.ext_node.arg_ids.get("word")
                inv = {sv for sv in c.incoming_references[node.path].values()}
                if isinstance(kern, _AddTyposK) and word_sv is not None \
                        and word_sv not in inv:
                    snode = cm.node(src, word_sv)
                    if isinstance(snode, ComputeNode) and snode.kind == "table":
                        env_args = [a for a in snode.arg_ids if a in inv]
                        ref_args = [a for a in snode.arg_ids if a not in inv]
                        tbl = cm.tables.get(cm.canon(src, word_sv))
                        if env_args and len(ref_args) <= 1 and tbl is not None \
                                and tbl.size * kern.V <= BlockTracer._SA_MAX_CELLS:
                            order = [snode.arg_ids.index(a)
                                     for a in env_args + ref_args]
                            ck = ("sa", cm.canon(src, word_sv),
                                  cm.canon(src, node.ext_id), tuple(order))
                            if ck not in sa_cache:
                                SA = np.ascontiguousarray(
                                    np.asarray(kern.M).T[np.transpose(tbl, order)])
                                sa_cache[ck] = SA
                                cm.interned.register(SA)
            for child in step.rest.steps:
                collect(child)

        for plan in c.plans:
            for step in plan.steps:
                collect(step)


def referrer_histograms(cm: CompiledModel, cid: ClassID, arenas: dict,
                        params: dict, rel: dict, obs_arrays: dict) -> dict:
    """{(path, ext_id): [cap, V] float32} — the referrer-observation
    histograms behind every hoistable AddTypos external of class `cid`,
    for ALL swept slots at once.

    During class `cid`'s own sweep its referrers are frozen (apply_row
    writes only `cid` rows and fk-target births in *deeper* classes), so
    the per-slot histogram the tracer would scatter per swept row
    (_ext_hist_term) is loop-invariant across the whole sweep. Hoisting it
    here turns cap × O(referrers) scatters — the dominant cost of
    latent-class rejuvenation at scale (rents County: 4096 slots × 50k
    referrer scatter each) — into ONE 2-D scatter per segment.

    Equivalence with the in-step scatter: t chases the same fk columns,
    dead referrers drop via the alive mask, missing observations (state 2)
    drop, and out-of-range slots drop via mode="drop"; H[slot] is then
    exactly `hist` for row_slot=slot.
    """
    import math

    from .kernels import _AddTyposK, _GaussianK

    out: dict = {}
    cap = cm.layouts[cid].capacity

    def gauss_stats(src, node, kern, inv):
        """[cap, C] per-(slot, referrer-group) Gaussian sufficient stats +
        [cap] mean-independent presum — see BlockTracer._ext_gauss_term."""
        from ..model.ir import ParamLookupNode as PLN

        if kern.mean_vid is None:
            return None
        mnode = cm.node(src, kern.mean_vid)
        if not isinstance(mnode, PLN) or mnode.gate_id is not None:
            return None
        knode = cm.node(src, mnode.key_id)
        if not (isinstance(knode, ComputeNode) and knode.kind == "table"):
            return None
        env_args = [a for a in knode.arg_ids if a in inv]
        ref_args = [a for a in knode.arg_ids if a not in inv]
        if len(ref_args) != 1:
            return None
        ref_a = ref_args[0]
        rdom = cm.domain(src, ref_a)
        if rdom is None or rdom.kind == FLOAT:
            return None
        C = rdom.size
        Cs = cm.layouts[src].capacity
        slots = jnp.arange(Cs)
        oa = obs_arrays.get(src, {}).get(node.ext_id)
        if oa is None:
            return None
        codes, state = oa
        stored = row_value(cm, arenas, params, src, node.ext_id, slots)
        val = jnp.where(jnp.asarray(state) == 1,
                        cm.interned.use(codes), stored)
        w = rel[src]["alive"] & (jnp.asarray(state) == 1)
        t = None
        for (hop_cid, hop_fk) in reversed(node.path):
            col = arenas[hop_cid]["values"][hop_fk]
            t = col if t is None else col[t]

        class _RCtx:  # per-source-row value resolver for backward/deriv
            def value(_self, vid):
                return row_value(cm, arenas, params, src, vid, slots)

            def pstate(_self, c2, v2):
                return params[c2][v2]

        rctx = _RCtx()
        z = kern.backward(rctx, val)
        ld = kern._log_abs_deriv(rctx, z)
        rv = row_value(cm, arenas, params, src, ref_a, slots)
        wf = jnp.where(w, 1.0, 0.0)
        n = jnp.zeros((cap, C), jnp.float32).at[t, rv].add(wf, mode="drop")
        sz = jnp.zeros((cap, C), jnp.float32).at[t, rv].add(wf * z,
                                                            mode="drop")
        szz = jnp.zeros((cap, C), jnp.float32).at[t, rv].add(wf * z * z,
                                                             mode="drop")
        const = -math.log(kern.std) - 0.5 * math.log(2.0 * math.pi)
        pre0 = jnp.zeros((cap,), jnp.float32).at[t].add(
            wf * (const - ld), mode="drop")
        return ("gauss", n, sz, szz, pre0)

    def collect(step):
        node = cm.node(cid, step.idx)
        if isinstance(node, ExternalLikelihoodNode):
            src = node.path[-1][0]
            ext = node.ext_node
            if isinstance(ext, ChoiceNode):
                kern = cm.kernels[cm.canon(src, node.ext_id)]
                word_sv = ext.arg_ids.get("word")
                vmap = cm.cls(cid).incoming_references[node.path]
                inv = {sv: tv for tv, sv in vmap.items()}
                key = (node.path, node.ext_id)
                if isinstance(kern, _GaussianK) and key not in out:
                    st = gauss_stats(src, node, kern, inv)
                    if st is not None:
                        out[key] = st
                # size gate: a [cap, V] hoisted histogram at large-arena
                # scale (e.g. 11k hospitals x 8k-word vocab = 360 MB each)
                # is HBM-hostile; the tracer's per-slot scatter fallback
                # (pre=None) costs O(B x V) instead
                if isinstance(kern, _AddTyposK) and word_sv in inv \
                        and key not in out \
                        and cap * kern.V <= 32_000_000:
                    t = None
                    for (hop_cid, hop_fk) in reversed(node.path):
                        col = arenas[hop_cid]["values"][hop_fk]
                        t = col if t is None else col[t]
                    Cs = cm.layouts[src].capacity
                    slots = jnp.arange(Cs)
                    oa = obs_arrays.get(src, {}).get(node.ext_id)
                    if oa is not None:
                        codes, state = oa
                        stored = row_value(cm, arenas, params, src,
                                           node.ext_id, slots)
                        val = jnp.where(jnp.asarray(state) == 1,
                                        jnp.asarray(codes), stored)
                        w = rel[src]["alive"] & (jnp.asarray(state) != 2)
                    else:
                        val = row_value(cm, arenas, params, src,
                                        node.ext_id, slots)
                        w = rel[src]["alive"]
                    out[key] = jnp.zeros((cap, kern.V), jnp.float32) \
                        .at[t, val].add(jnp.where(w, 1.0, 0.0), mode="drop")
        for child in step.rest.steps:
            collect(child)

    for plan in cm.cls(cid).plans:
        for step in plan.steps:
            collect(step)
    return out


def row_value(cm: CompiledModel, arenas: dict, params: dict, cls: ClassID,
              vid: VertexID, slot):
    """Value of vertex `vid` of class `cls` at row(s) `slot` — gathers
    through submodel fk chains, recomputes deterministic nodes (the
    reference stores copies in RowTraces and pushes updates into referrers,
    dependency_tracking.jl:239-258; we re-derive through the fk indirection
    so referrers are never stale)."""
    node = cm.node(cls, vid)
    if isinstance(node, SubmodelNode):
        fknode = cm.node(cls, node.fk_id)
        assert isinstance(fknode, ForeignKeyNode), \
            "row_value must start from a class whose fks are raw"
        t = arenas[cls]["values"][node.fk_id][slot]
        return row_value(cm, arenas, params, fknode.target_class, node.sub_id, t)
    if isinstance(node, (ChoiceNode, ForeignKeyNode)):
        return arenas[cls]["values"][vid][slot]
    if isinstance(node, ComputeNode):
        if node.kind == "jax":
            return node.fn(*[row_value(cm, arenas, params, cls, a, slot)
                             for a in node.arg_ids])
        tbl = cm.interned.use(cm.tables[cm.canon(cls, vid)])
        args = tuple(row_value(cm, arenas, params, cls, a, slot)
                     for a in node.arg_ids)
        return tbl[args] if len(args) != 1 else tbl[args[0]]
    if isinstance(node, ParamLookupNode):
        ck, pk = cm.canon(cls, node.param_id)
        st = params[ck][pk]
        val = st["value"][row_value(cm, arenas, params, cls, node.key_id, slot)]
        if node.gate_id is not None:
            gate = row_value(cm, arenas, params, cls, node.gate_id, slot)
            truth = cm.truth_table(cls, node.gate_id)
            val = jnp.where(truth[gate], node.gate_value, val)
        return val
    raise TypeError(type(node))


def _fk(cm: CompiledModel, cid: ClassID, vid: VertexID) -> ForeignKeyNode:
    n = strip_subnodes(cm.node(cid, vid))
    assert isinstance(n, ForeignKeyNode)
    return n
