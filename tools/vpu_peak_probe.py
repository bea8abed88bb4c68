#!/usr/bin/env python
"""VPU peak validation: sustained elementwise throughput across mixes.

The roofline denominator must be a *validated* peak (VERDICT r3 #1): a
single probe is a lower bound on the chip and an upper bound on nothing.
This suite measures sustained rates for independent instruction mixes:

* ``fma_dep``    — one dependent FMA chain per element (round-3 probe);
* ``fma_ilp4``   — four independent FMA chains per element (exposes
  multi-issue / pipelining the dependent chain may serialize away);
* ``fma_ilp8``   — eight independent chains;
* ``mul_dep``    — dependent multiply-only chain (is a*y+b one issue slot
  or two? if mul-only runs ~2x the FMA *flop* rate, FMA is fused: one
  slot retiring 2 flops; if equal, mul+add are separate slots);
* ``addmul_dep`` — alternating y=y+b / y=y*a (unfusable pattern).

Reported units: ``ops/s`` counts one jnp-level elementwise arithmetic op
(an a*b+c FMA = ONE op), ``flops/s`` counts FMA as two. The kernel
roofline (`bench.py::_roofline`) uses the max sustained **ops/s** across
mixes as the issue-slot peak, with hand-counted ops/eval numerators
(`radtxfr_tpu/kernels/pallas_xsect.py::_ops_per_eval`).

Run: ``python tools/vpu_peak_probe.py`` (real chip; ~1 min).
"""

import json
import sys
import time

import numpy as np


def _sync(out):
    import jax
    return float(jax.device_get(out.ravel()[0]))


def make_probe(body, n_chains, unroll, iters, shape=(512, 1024)):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(y_ref, o_ref):
        # constants as python floats inside the kernel (Pallas forbids
        # captured array constants)
        ys = [y_ref[...] * np.float32(1.0 + 1e-6 * k)
              for k in range(n_chains)]

        def loop_body(_, ys):
            for _ in range(unroll):
                ys = [body(y, k) for k, y in enumerate(ys)]
            return ys

        ys = lax.fori_loop(0, iters, loop_body, ys)
        acc = ys[0]
        for y in ys[1:]:
            acc = acc + y
        o_ref[...] = acc

    y = jnp.full(shape, 0.5, dtype=jnp.float32)
    f = jax.jit(lambda y: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(y))
    n_elem = shape[0] * shape[1]
    ops = n_chains * unroll * iters * n_elem
    return f, y, ops


def run_probe(name, body, n_chains, unroll, iters, flops_per_op,
              trials=5):
    # keep n_chains live arrays + temps inside the 16 MB scoped-vmem limit
    rows = max(512 // max(n_chains, 1), 64)
    f, y, ops = make_probe(body, n_chains, unroll, iters,
                           shape=(rows, 1024))
    _sync(f(y))                                 # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = f(y)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    rec = {"probe": name, "ops_per_s": ops / best,
           "flops_per_s": ops * flops_per_op / best,
           "wall_s": best, "n_chains": n_chains,
           "unroll": unroll, "iters": iters}
    print(json.dumps(rec), flush=True)
    return rec


def run_block_probe(name, body, n_chains, depth, iters, flops_per_op,
                    shape=(32, 512), trials=5):
    """Block-resident variant: a (32, 512) working set (16 vregs) stays in
    registers, so deep chains expose the true ALU rate — the (512, 1024)
    probes measure the VMEM-streaming regime instead (~3x slower; see
    docs/ROOFLINE.md §1)."""
    f, y, ops = make_probe(body, n_chains, depth, iters, shape=shape)
    _sync(f(y))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = f(y)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    rec = {"probe": name, "ops_per_s": ops / best,
           "flops_per_s": ops * flops_per_op / best,
           "wall_s": best, "shape": list(shape), "n_chains": n_chains,
           "depth": depth, "iters": iters}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax
    import jax.numpy as jnp

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "backend": jax.default_backend()}), flush=True)
    a = np.float32(0.9999999)
    b = np.float32(1e-9)

    fma = lambda y, k: a * y + b
    mul = lambda y, k: y * a
    add = lambda y, k: y + b
    recs = []
    # dependent-chain FMA (the round-3 probe, for continuity)
    recs.append(run_probe("fma_dep", fma, 1, 64, 4000, 2.0))
    recs.append(run_probe("fma_dep_u128", fma, 1, 128, 2000, 2.0))
    # independent chains: ILP the dependent chain cannot express
    recs.append(run_probe("fma_ilp2", fma, 2, 64, 2000, 2.0))
    recs.append(run_probe("fma_ilp4", fma, 4, 16, 4000, 2.0))
    # multiply-only: disambiguates fused-FMA (1 slot) vs mul+add (2 slots)
    recs.append(run_probe("mul_dep", mul, 1, 64, 4000, 1.0))
    recs.append(run_probe("mul_dep_u128", mul, 1, 128, 2000, 1.0))
    recs.append(run_probe("mul_ilp2", mul, 2, 64, 2000, 1.0))
    recs.append(run_probe("add_dep", add, 1, 64, 4000, 1.0))

    def addmul(y, k):
        return (y + b) * a

    recs.append(run_probe("addmul_ilp4", addmul, 4, 16, 2000, 2.0))

    # compare+select mix (the kernels' window masks): 3 lane ops per step
    def sel(y, k):
        return jnp.where(y > np.float32(0.1), y * a, y + b)

    recs.append(run_probe("cmp_sel_dep", sel, 1, 64, 2000, 3.0))

    # sqrt / divide slot costs (SD-Voigt & HT use them): ops_per_s here is
    # the rate of the WHOLE composite step; slot cost of the special op =
    # peak_mul_rate / step_rate - (cheap ops in the step)
    def sqrt_step(y, k):
        return jnp.sqrt(y) * a + b          # sqrt + mul + add

    def div_step(y, k):
        return np.float32(1.5) / (y + np.float32(1.0))   # add + divide

    def rcp_step(y, k):
        from jax.experimental import pallas as pl
        r = pl.reciprocal(y + np.float32(1.0), approx=True)
        return r * (np.float32(2.0) - (y + np.float32(1.0)) * r)

    recs.append(run_probe("sqrt_mul_add_dep", sqrt_step, 1, 64, 1000, 3.0))
    recs.append(run_probe("add_div_dep", div_step, 1, 64, 1000, 2.0))
    recs.append(run_probe("rcp_newton_dep", rcp_step, 1, 64, 1000, 5.0))

    # block-resident regime (the regime the production kernels run in):
    # (32, 512) blocks, deep chains — the defining peak probes
    recs.append(run_block_probe("fma_block_d512", fma, 1, 512, 40000, 2.0))
    recs.append(run_block_probe("fma_block_2x512", fma, 2, 512, 20000, 2.0))
    recs.append(run_block_probe("mul_block_2x256", mul, 2, 256, 40000, 1.0))

    # peak in lane-ops/s: flops_per_s carries each probe's nominal op
    # count per step (FMA = 2, cmp+select composite = 3, ...)
    peak_ops = max(r["flops_per_s"] for r in recs)
    print(json.dumps({"peak_ops_per_s": peak_ops,
                      "peak_probe": max(recs, key=lambda r: r["flops_per_s"])["probe"]}),
          flush=True)


if __name__ == "__main__":
    main()
