"""mpath tests. Modeled on reference `tests/mpath/test_{parser,search,selector}.py`."""

import pytest
from flax import nnx

from fastforward_tpu import mpath, nn as ffnn


class Block(nnx.Module):
    def __init__(self, *, rngs):
        self.linear = nnx.Linear(4, 4, rngs=rngs)
        self.norm = nnx.LayerNorm(4, rngs=rngs)


class Model(nnx.Module):
    def __init__(self, *, rngs):
        self.embed = nnx.Embed(10, 4, rngs=rngs)
        self.blocks = nnx.data([Block(rngs=rngs) for _ in range(3)])
        self.head = nnx.Linear(4, 10, rngs=rngs)


@pytest.fixture
def model():
    return Model(rngs=nnx.Rngs(0))


def test_literal_path(model):
    result = mpath.search("head", model)
    assert result.paths == ["head"]
    assert result[0].module is model.head


def test_nested_literal_path(model):
    result = mpath.search("blocks/0/linear", model)
    assert result.paths == ["blocks/0/linear"]


def test_single_wildcard(model):
    result = mpath.search("blocks/*/linear", model)
    assert len(result) == 3


def test_multi_wildcard_finds_all_linears(model):
    result = mpath.search("**/[cls:Linear]", model)
    assert len(result) == 4  # 3 block linears + head


def test_multi_wildcard_zero_segments(model):
    # ``**/head`` must match a depth-1 path
    result = mpath.search("**/head", model)
    assert result.paths == ["head"]


def test_class_fragment_intermediate(model):
    result = mpath.search("**/[cls:Block]/norm", model, context={"Block": Block})
    assert len(result) == 3


def test_regex_fragment(model):
    result = mpath.search("blocks/[re:[01]]/linear", model)
    assert len(result) == 2


def test_negation(model):
    result = mpath.search("blocks/*/~norm", model)
    names = {p.rsplit("/", 1)[-1] for p in result.paths}
    assert "norm" not in names
    assert "linear" in names


def test_selector_algebra_union(model):
    a = mpath.query("head")
    b = mpath.query("embed")
    result = mpath.search(a | b, model)
    assert set(result.paths) == {"head", "embed"}


def test_selector_join(model):
    sel = mpath.query("blocks") / "*" / "linear"
    assert len(mpath.search(sel, model)) == 3


def test_collection_set_ops(model):
    all_linear = mpath.search("**/[cls:Linear]", model)
    block_linear = mpath.search("blocks/**", model)
    only_head = all_linear - block_linear
    assert only_head.paths == ["head"]
    both = all_linear & block_linear
    assert len(both) == 3


def test_context_class_resolution(model):
    class Marker:
        pass

    with pytest.raises(ValueError, match="Cannot resolve"):
        mpath.search("**/[cls:NoSuchClass]", model)
    result = mpath.search("**/[cls:Block]", model, context={"Block": Block})
    assert len(result) == 3


def test_quantizer_tag_fragment(model):
    ffnn.quantize_model(model)
    weight_q = mpath.search("**/[quantizer:parameter/weight]", model)
    # 4 linears + 1 embed + 3 norms (layer norm scale)
    assert len(weight_q) == 8
    for item in weight_q:
        assert item.module.quant_metadata.matches_tag("parameter")


def test_update_module(model):
    item = mpath.search("blocks/1/linear", model)[0]
    new = nnx.Linear(4, 4, rngs=nnx.Rngs(1))
    item.update_module(new)
    assert model.blocks[1].linear is new


def test_mpath_query_extension_registers_custom_fragment():
    # GIVEN a custom [haslinear:] fragment matching modules with a fc attr
    import flax.nnx as nnx
    from fastforward_tpu import mpath
    from fastforward_tpu.mpath.fragments import Fragment

    class HasAttrFragment(Fragment):
        def __init__(self, attr):
            self.attr = attr

        def matches(self, segment, module):
            return hasattr(module, self.attr)

    @mpath.mpath_query_extension("hasattr")
    def _hasattr_fragment(payload, context):
        return HasAttrFragment(payload)

    class Inner(nnx.Module):
        def __init__(self, *, rngs):
            self.fc = nnx.Linear(2, 2, rngs=rngs)

    class Outer(nnx.Module):
        def __init__(self, *, rngs):
            self.a = Inner(rngs=rngs)
            self.b = nnx.Linear(2, 2, rngs=rngs)

    model = Outer(rngs=nnx.Rngs(0))
    # WHEN searching with the extension fragment
    hits = mpath.search("**/[hasattr:fc]", model)
    # THEN only the module carrying the attribute matches
    assert [h.full_name for h in hits] == ["a"]
