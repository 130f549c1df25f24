"""Jaxpr-pass autoquant: quantize ops the source-level interceptor cannot see.

The module-attribute substitution in `fastforward_tpu.autoquant` patches
known entry points (`jnp.dot`, `jax.nn.gelu`, ...) — it cannot see operator
syntax (``x @ w``, ``x + y``) or functions bound before the patch context
(``from jax.nn import gelu`` at model-module import time). The reference
closes this with ~8k LoC of libcst source rewriting
(`/root/reference/src/fastforward/_autoquant/cst/passes.py:703`
QuantizedCounterpartReplacer, `quantizer_analysis/annotator.py`).

On TPU the idiomatic answer is a **jaxpr pass**: after `jax.make_jaxpr`
every call — whatever its surface syntax or binding time — is a primitive
equation, so a small interpreter sees *all* of them. Site identity is the
deterministic traversal order of the jaxpr (stable across record and apply
because both walk the same trace), which also removes the data-dependent
control-flow hazard of call-count-based site IDs: the jaxpr is traced once.

Usage::

    plan = trace_quantization_sites(fn, x, w)      # structural trace
    plan.observe(x_calib, w)                        # calibration (repeat ok)
    qfn = plan.quantized(num_bits=8)                # jittable QDQ'd fn
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Sequence, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
from jax.extend import core as jax_core

from fastforward_tpu.exceptions import QuantizationError

# Primitives whose array inputs/outputs get quantizer slots. dot_general
# covers `@`/matmul/einsum after lowering; add/mul cover operator syntax on
# residual/gating paths; the rest are the elementwise ops the reference's
# operator table exposes (`_quantops/quantized_operators.yaml`).
DEFAULT_QUANTIZED_PRIMS: Tuple[str, ...] = (
    "dot_general",
    "conv_general_dilated",
)

_CALL_PRIMS = ("jit", "pjit", "closed_call", "custom_jvp_call",
               "custom_vjp_call", "remat", "checkpoint")


def _sub_jaxpr(eqn) -> Any:
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        sub = eqn.params.get(key)
        if sub is not None:
            return sub
    return None


@dataclasses.dataclass
class QuantSite:
    """One quantizable equation in traversal order."""

    name: str            # e.g. "dot_general_0"
    prim: str
    in_shapes: Tuple[Tuple[int, ...], ...]
    # slot -> running absmax (inputs 0..n-1, outputs use key ("out", j))
    absmax: Dict[Any, float] = dataclasses.field(default_factory=dict)


def _is_quantizable(val: Any) -> bool:
    return (
        hasattr(val, "dtype")
        and jnp.issubdtype(val.dtype, jnp.floating)
        and getattr(val, "ndim", 0) >= 1
    )


class JaxprQuantizationPlan:
    """Sites + calibration stats for one traced function."""

    def __init__(self, fn: Callable, closed, ops: Tuple[str, ...]):
        self._fn = fn
        self._closed = closed
        self._ops = ops
        self.sites: List[QuantSite] = []
        self._discover()

    # -- traversal ---------------------------------------------------------
    def _discover(self) -> None:
        counters: Dict[str, int] = {}

        def walk(jaxpr) -> None:
            for eqn in jaxpr.eqns:
                pname = eqn.primitive.name
                sub = _sub_jaxpr(eqn) if pname in _CALL_PRIMS else None
                if sub is not None:
                    walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
                    continue
                if pname in self._ops:
                    n = counters.get(pname, 0)
                    counters[pname] = n + 1
                    self.sites.append(QuantSite(
                        name=f"{pname}_{n}",
                        prim=pname,
                        in_shapes=tuple(
                            tuple(getattr(v.aval, "shape", ()))
                            for v in eqn.invars
                        ),
                    ))

        walk(self._closed.jaxpr)

    def _interpret(self, args, handler):
        """Evaluate the jaxpr, calling ``handler(site, invals) -> invals``
        and ``handler.out(site, outvals) -> outvals`` on quantized eqns."""
        flat, in_tree = jax.tree.flatten(args)
        site_iter = iter(self.sites)

        def run(closed_or_jaxpr, consts, in_vals):
            jaxpr = getattr(closed_or_jaxpr, "jaxpr", closed_or_jaxpr)
            env: Dict[Any, Any] = {}

            def read(a):
                return a.val if isinstance(a, jax_core.Literal) else env[a]

            for v, c in zip(jaxpr.constvars, consts):
                env[v] = c
            for v, a in zip(jaxpr.invars, in_vals):
                env[v] = a
            for eqn in jaxpr.eqns:
                pname = eqn.primitive.name
                invals = [read(a) for a in eqn.invars]
                sub = _sub_jaxpr(eqn) if pname in _CALL_PRIMS else None
                if sub is not None:
                    sub_consts = getattr(sub, "consts", ())
                    outs = run(sub, sub_consts, invals)
                elif pname in self._ops:
                    site = next(site_iter)
                    invals = handler(site, invals)
                    outs = eqn.primitive.bind(*invals, **eqn.params)
                    if not eqn.primitive.multiple_results:
                        outs = [outs]
                    outs = handler_out(site, outs)
                else:
                    outs = eqn.primitive.bind(*invals, **eqn.params)
                    if not eqn.primitive.multiple_results:
                        outs = [outs]
                for v, o in zip(eqn.outvars, outs):
                    env[v] = o
            return [read(v) for v in jaxpr.outvars]

        handler_out = getattr(handler, "out", lambda site, outs: outs)
        out_flat = run(self._closed.jaxpr, self._closed.consts, flat)
        return jax.tree.unflatten(self._closed.out_tree, out_flat)

    # -- calibration -------------------------------------------------------
    def observe(self, *args: Any) -> Any:
        """Run once on concrete inputs, folding each site's per-slot absmax
        into the plan (running max across calls). Returns the fn output."""

        class _Observer:
            @staticmethod
            def __call__(site, invals):
                for i, v in enumerate(invals):
                    if _is_quantizable(v):
                        m = float(jnp.max(jnp.abs(v)))
                        site.absmax[i] = max(site.absmax.get(i, 0.0), m)
                return invals

            @staticmethod
            def out(site, outs):
                for j, v in enumerate(outs):
                    if _is_quantizable(v):
                        m = float(jnp.max(jnp.abs(v)))
                        key = ("out", j)
                        site.absmax[key] = max(site.absmax.get(key, 0.0), m)
                return outs

        return self._interpret(args, _Observer())

    # -- application -------------------------------------------------------
    def quantized(self, num_bits: int = 8,
                  quantize_outputs: bool = True) -> Callable:
        """A jittable function with symmetric per-tensor QDQ inserted on
        every calibrated slot (uncalibrated slots pass through)."""
        if not any(s.absmax for s in self.sites):
            raise QuantizationError(
                "JaxprQuantizationPlan has no calibration data: call "
                "plan.observe(*calibration_inputs) before plan.quantized()."
            )
        qmax = float(2 ** (num_bits - 1) - 1)

        def qdq(v, absmax):
            if absmax <= 0.0:
                return v
            scale = absmax / qmax
            q = jnp.clip(jnp.round(v / scale), -qmax - 1, qmax)
            return (q * scale).astype(v.dtype)

        class _Applier:
            @staticmethod
            def __call__(site, invals):
                return [
                    qdq(v, site.absmax[i])
                    if _is_quantizable(v) and i in site.absmax else v
                    for i, v in enumerate(invals)
                ]

            @staticmethod
            def out(site, outs):
                if not quantize_outputs:
                    return outs
                return [
                    qdq(v, site.absmax[("out", j)])
                    if _is_quantizable(v) and ("out", j) in site.absmax else v
                    for j, v in enumerate(outs)
                ]

        def quantized_fn(*args: Any) -> Any:
            return self._interpret(args, _Applier())

        return quantized_fn

    def summary(self) -> str:
        lines = [f"{len(self.sites)} quantization sites:"]
        for s in self.sites:
            cal = ", ".join(
                f"{k}:{v:.4g}" for k, v in sorted(
                    s.absmax.items(), key=lambda kv: str(kv[0])
                )
            ) or "uncalibrated"
            lines.append(f"  {s.name} {s.in_shapes} [{cal}]")
        return "\n".join(lines)


def trace_quantization_sites(
    fn: Callable,
    *example_args: Any,
    ops: Sequence[str] = DEFAULT_QUANTIZED_PRIMS,
) -> JaxprQuantizationPlan:
    """Trace ``fn`` to a jaxpr and enumerate quantizable primitive sites.

    Unlike the namespace interceptor (`autoquant.py:_patched_namespace`)
    this sees ``x @ w`` / ``x + y`` operator syntax and functions bound via
    ``from jax.nn import gelu`` before any patch context existed — every
    call is an equation once traced. Reference parity:
    `_autoquant/autoquant.py:515-806` cross-function propagation is
    subsumed by tracing through helper calls (they inline into the jaxpr).
    """
    closed = jax.make_jaxpr(fn, return_shape=False)(*example_args)
    flat_closed = _with_out_tree(fn, closed, example_args)
    return JaxprQuantizationPlan(fn, flat_closed, tuple(ops))


class _FlatClosed:
    def __init__(self, jaxpr, consts, out_tree):
        self.jaxpr = jaxpr
        self.consts = consts
        self.out_tree = out_tree


def _with_out_tree(fn, closed, example_args):
    # make_jaxpr flattens inputs; recover the output pytree structure from
    # an abstract evaluation so _interpret can unflatten results.
    out_shape = jax.eval_shape(fn, *example_args)
    _, out_tree = jax.tree.flatten(out_shape)
    # closed.jaxpr expects flat inputs in tree-flatten order of the args.
    return _FlatClosed(closed.jaxpr, closed.consts, out_tree)
