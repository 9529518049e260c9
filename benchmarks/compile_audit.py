#!/usr/bin/env python
"""Audit the distinct Mosaic kernel variants traced into a compiled
program (the 16k MAP value+grad by default).

Why: the 16k MAP fit's one-time compile is ~300 s on the remote service
even when the bench NLML program compiles in ~51 s (CHOL_SHRINK=1,
docs/TPU_NOTES.md).  The service compiles each DISTINCT pallas_call
variant (kernel fn x grid x block shapes x dtypes) as its own Mosaic
module; this script counts them without touching the TPU by tracing the
program on CPU with the TPU code paths forced.

Usage:
    python benchmarks/compile_audit.py [nlml|vg|both]  (default vg)
Env: AUDIT_N (16384), AUDIT_BLOCK (1024), plus all ANDVARANAUT_* knobs.
"""

import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Pallas kernels must be constructible while tracing on the CPU backend.
os.environ.setdefault("ANDVARANAUT_PALLAS_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import andvaranaut_tpu._config as _config  # noqa: E402

# Force every TPU-only code path (pair carry, fused kernels, MXU
# routing) at trace time; interpret mode keeps the constructed calls
# abstractly evaluable on CPU.
_config.platform = lambda: "tpu"

from jax.experimental import pallas as pl  # noqa: E402

_REAL_PALLAS_CALL = pl.pallas_call
RECORDS = []


def _kernel_name(kernel):
    fn = kernel
    # unwrap functools.partial chains
    parts = []
    while hasattr(fn, "func"):
        parts.append(tuple(repr(a) for a in getattr(fn, "args", ())))
        fn = fn.func
    name = getattr(fn, "__name__", repr(fn))
    return name, tuple(parts)


def _shapes(tree):
    out = []
    for leaf in jax.tree_util.tree_leaves(tree):
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        if shape is not None:
            out.append((tuple(shape), str(dtype)))
        else:
            out.append(repr(leaf))
    return tuple(out)


def _block_shapes(specs):
    out = []

    def rec(s):
        if s is None:
            out.append(None)
        elif hasattr(s, "block_shape"):
            out.append(tuple(s.block_shape) if s.block_shape else None)
        elif isinstance(s, (list, tuple)):
            for x in s:
                rec(x)
        else:
            out.append(repr(s))

    rec(specs)
    return tuple(out)


def _spy(kernel, *args, **kw):
    site = "?"
    for frame in reversed(traceback.extract_stack()[:-1]):
        if "andvaranaut_tpu" in frame.filename:
            site = "%s:%d" % (os.path.basename(frame.filename),
                              frame.lineno)
            break
    name, closure = _kernel_name(kernel)
    grid = kw.get("grid")
    gridspec = kw.get("grid_spec")
    if grid is None and gridspec is not None:
        grid = getattr(gridspec, "grid", repr(gridspec))
    key = (
        name,
        closure,
        repr(grid),
        _block_shapes(kw.get("in_specs")),
        _block_shapes(kw.get("out_specs")),
        _shapes(kw.get("out_shape")),
        _shapes(kw.get("scratch_shapes")),
    )
    RECORDS.append((site, key))
    return _REAL_PALLAS_CALL(kernel, *args, **kw)


pl.pallas_call = _spy


def report(tag):
    total = len(RECORDS)
    variants = collections.Counter(key for _, key in RECORDS)
    by_site = collections.defaultdict(collections.Counter)
    for site, key in RECORDS:
        by_site[site][key] += 1
    print(f"\n== {tag}: {total} pallas_call constructions, "
          f"{len(variants)} DISTINCT Mosaic variants ==")
    for site in sorted(by_site):
        c = by_site[site]
        calls = sum(c.values())
        print(f"  {site:34s} {len(c):3d} variants / {calls:4d} calls")
        for key, cnt in c.most_common():
            name, closure, grid, inb, outb, outs, scr = key
            print(f"      x{cnt:<4d} {name} grid={grid} out={outs} "
                  f"in_blocks={inb}")
    RECORDS.clear()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "vg"
    n = int(os.environ.get("AUDIT_N", 16384))
    block = int(os.environ.get("AUDIT_BLOCK", 1024))
    rng = np.random.default_rng(0)
    X = jax.numpy.asarray(rng.uniform(size=(n, 2)))
    y = jax.numpy.asarray(rng.normal(size=n))

    from andvaranaut_tpu.gp import bigfit

    rvpack = bigfit._default_rvpack(2, ("RBF",), True, False)
    z = jax.numpy.zeros((rvpack.total,))

    if which in ("vg", "both"):
        def vg(zz):
            return bigfit._nlml_vg.__wrapped__(
                X, y, zz, rvpack, ("RBF",), (), True, 1e-6, block,
                inv_iters=1, shrink=bigfit._fit_shrink())

        jax.eval_shape(vg, z)
        report(f"value+grad n={n} block={block}")

    if which in ("nlml", "both"):
        from andvaranaut_tpu.gp import kernels, precision

        def nlml(zz):
            ll = jax.numpy.exp(zz[1:3])
            kv = jax.numpy.exp(zz[3:4])
            K = kernels.gram(("RBF",), (), X, None, ll, kv, None)
            K = K + jax.numpy.exp(zz[0]) * jax.numpy.eye(n)
            return precision.mixed_nlml(K, y, block=block)

        try:
            jax.eval_shape(nlml, z)
            report(f"nlml n={n} block={block}")
        except Exception as e:  # pragma: no cover - diagnostic harness
            print("nlml trace failed:", e)

    if which in ("mcmc", "all"):
        # the large-n MCMC program set: the chain-batched (lax.map)
        # value+grad — the ONLY program a batched warm-start run
        # compiles (the serial program is never built since the
        # batched curvature probes, round 5)
        C = int(os.environ.get("AUDIT_CHAINS", 4))
        rvpack2, nlp = __import__(
            "andvaranaut_tpu.gp.bigfit", fromlist=["bigfit"]
        ).make_mixed_objective(X, y, kerns=("RBF",), noise=True,
                               jitter=1e-6, block=block)
        vg1 = jax.value_and_grad(nlp)
        jax.eval_shape(lambda Z: jax.lax.map(vg1, Z),
                       jax.numpy.zeros((C, rvpack2.total)))
        report(f"mcmc batched C={C} n={n} block={block}")

    if which in ("cond", "all"):
        # the prediction/BO conditioning program (GPState mixed
        # conditioning above MIXED_N): factorise + refined alpha
        from andvaranaut_tpu.gp import kernels, precision

        def cond(zz):
            ll = jax.numpy.exp(zz[1:3])
            kv = jax.numpy.exp(zz[3:4])
            K = kernels.gram(("RBF",), (), X, None, ll, kv, None)
            row = jax.lax.broadcasted_iota(jax.numpy.int32, (n, 1), 0)
            col = jax.lax.broadcasted_iota(jax.numpy.int32, (1, n), 1)
            K = K + jax.numpy.where(row == col,
                                    jax.numpy.exp(zz[0]) + 1e-6, 0.0)
            L, Dinv = precision.blocked_cholesky(
                K, block=block, return_inv=True,
                shrink=precision.fit_shrink())
            alpha = precision.refined_chol_solve(
                L, K, y, block=block, Dinv=Dinv)
            return alpha

        jax.eval_shape(cond, z)
        report(f"conditioning n={n} block={block}")


if __name__ == "__main__":
    main()
