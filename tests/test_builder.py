import numpy as np

from pclean_tpu.dists import (AddTypos, ChooseProportionally, ChooseUniformly,
                              ParamRef, Proportions, Ref, StringPrior)
from pclean_tpu.model.builder import ModelBuilder, resolve_path
from pclean_tpu.model.ir import (ChoiceNode, ExternalLikelihoodNode,
                                 ForeignKeyNode, ParameterNode, SubmodelNode,
                                 strip_subnodes)


def tiny_model():
    b = ModelBuilder()
    with b.cls("County") as c:
        c.learned("state_props", Proportions())
        c.choice("state", ChooseProportionally(["NY", "CA"], ParamRef("state_props")))
        c.choice("name", StringPrior(3, 10, ["kings", "queens"]))
    with b.cls("City") as c:
        c.fk("county", "County")
        c.choice("city", ChooseUniformly(["nyc", "la"]))
    with b.cls("Rec") as c:
        with c.block():
            c.fk("loc", "City")
            c.choice("city_obs", AddTypos(Ref("loc.city")))
            c.choice("state_obs", AddTypos(Ref("loc.county.state")))
    return b.finish()


def test_fk_inlining_structure():
    m = tiny_model()
    city = m.classes["City"]
    # City: fk vertex + 3 submodel copies (param, state, name) + own choice
    fk = city.nodes[city.names["county"]]
    assert isinstance(fk, ForeignKeyNode)
    assert len(fk.vmap) == 3
    for tid, sid in fk.vmap.items():
        sm = city.nodes[sid]
        assert isinstance(sm, SubmodelNode)
        assert sm.sub_id == tid


def test_transitive_resolution():
    m = tiny_model()
    v = resolve_path(m, "Rec", "loc.county.state")
    rec = m.classes["Rec"]
    node = strip_subnodes(rec.nodes[v])
    assert isinstance(node, ChoiceNode)
    assert isinstance(node.dist, ChooseProportionally)


def test_incoming_references_paths():
    m = tiny_model()
    county = m.classes["County"]
    # County is referenced directly by City and transitively by Rec via loc.
    paths = set(county.incoming_references.keys())
    assert any(p[-1][0] == "City" and len(p) == 1 for p in paths)
    assert any(p[-1][0] == "Rec" and len(p) == 2 for p in paths)


def test_external_likelihood_grafting():
    m = tiny_model()
    county = m.classes["County"]
    # Rec observes loc.county.state via AddTypos -> County gains an external
    # likelihood node for Rec's state_obs choice.
    ext = [n for n in county.nodes if isinstance(n, ExternalLikelihoodNode)]
    assert ext, "expected grafted external likelihood nodes on County"
    assert any(isinstance(e.ext_node, ChoiceNode) and
               isinstance(e.ext_node.dist, AddTypos) for e in ext)
    # External vertices appear in County's blocks so rejuvenation sees them.
    in_blocks = {v for blk in county.blocks for v in blk}
    ext_ids = {i for i, n in enumerate(county.nodes)
               if isinstance(n, ExternalLikelihoodNode)}
    assert ext_ids & in_blocks


def test_blocks_merge_on_fk():
    m = tiny_model()
    rec = m.classes["Rec"]
    # Rec has one explicit block holding fk + inlined City/County nodes +
    # both typo observations.
    non_ext_blocks = [[v for v in blk
                       if not isinstance(rec.nodes[v], ExternalLikelihoodNode)]
                      for blk in rec.blocks]
    assert len([b for b in non_ext_blocks if b]) == 1


def test_plan_covers_block():
    m = tiny_model()
    for cid, c in m.classes.items():
        assert len(c.plans) == len(c.blocks)
        for blk, plan in zip(c.blocks, c.plans):
            seen = set()

            def walk(p):
                for s in p.steps:
                    seen.add(s.idx)
                    walk(s.rest)

            walk(plan)
            assert seen == set(blk)
