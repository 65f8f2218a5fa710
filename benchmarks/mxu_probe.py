"""Settle the MXU question for the mid-dim Riccati kernel (SURVEY §7.3).

Round-2 VERDICT missing #4: SURVEY §7.3 prescribed "treat B as the matmul
M-dimension in Pallas blocks (`dot` on [BB, n] x [n, n] tiles)"; the shipped
mid kernel is instead a VPU row-op design, and nobody had built or refuted
the MXU formulation. This probe isolates the kernel's core op — the batched
small matmul C[b] = A[b] @ M[b] over B lanes — and times every formulation
the hardware offers:

1. ``row-kernel``      — the shipped design: lanes on the 128-wide vector
   axis, matrix rows on sublanes, broadcast-FMA contraction (VPU).
2. ``xla-batched-dot`` — ``einsum('bij,bjk->bik')`` under jit: XLA's own
   batched-small-GEMM lowering for TPU (free to pick MXU or VPU).
3. ``mxu-shared``      — ``reshape(B*n, n) @ (n, n)``: THE "B as the
   M-dimension" formulation. Note what it computes: it is only expressible
   when the stationary operand is SHARED across the batch — ``C[b] = A[b]
   @ S`` — because an MXU matmul contracts every M-row against the same
   stationary tile. The general Riccati step has per-lane V/f_x/f_u, i.e.
   ``C[b] = A[b] @ M[b]``: each output row (b, i) would need its own
   stationary matrix, which is not a matmul. So 3 is an UPPER BOUND on
   what the MXU could give IF the linearization were lane-shared (e.g. a
   batch of LQR scenarios differing only in x0) — not a drop-in
   replacement for the kernel's contraction.

Measurement design (round-3 VERDICT weak #6 — the round-3 probe's isolated
single ops ran at 0.2-5% VPU, i.e. latency floors whose +-20% deltas were
inside the tunnel-noise band, and its dims-24/32 "investigate" verdicts
were unactionable):

- Each variant runs a CHAIN of ``--iters`` (default 128) dependent
  contractions inside one jitted ``lax.scan`` rep — the output is
  rescaled (rsqrt of its mean square, no overflow) and fed back as the
  next input, exactly the dependency structure of the sequential Riccati
  chain the kernel actually executes. Per-contraction time is then
  throughput-under-dependency, not a dispatch floor.
- Every input rides as an explicit jit operand (NOT a closure): embedded
  constants 413 the remote-compile relay (see ``timing.amortized_ms``).
- The verdict carries a +-10% noise band: "row design holds" unless XLA's
  batched dot is >10% faster at that dim, in which case the verdict is
  "XLA batched dot wins — adopt" (a directive, not an "investigate").

Results recorded in PARITY.md §6.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/mxu_probe.py \
      [--dims 16,24,32,48] [--batch 1024] [--iters 128]
"""

from __future__ import annotations

import argparse
import functools
import json

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing import amortized_ms

VPU_PEAK = 3.9e12
MXU_PEAK_F32 = 49e12      # ~197 TF/s bf16 / 4 passes for fp32(highest)
NOISE_BAND = 1.10         # >10% faster = a real win, below = tunnel noise


@functools.partial(jax.jit, static_argnames=("d",))
def _row_kernel_matmul(A_rows, M_rows, *, d):
    """C[b] = A[b] @ M[b] in the mid kernel's row layout ([d*d, B])."""
    from tfmpc_tpu.ops.riccati_mid_pallas import _matmul_rows

    B = A_rows.shape[-1]
    BB = 128

    def kernel(a_ref, m_ref, c_ref):
        c_ref[:, :] = _matmul_rows(a_ref[:, :], (d, d), m_ref[:, :], d)

    spec = pl.BlockSpec((d * d, BB), lambda bi: (0, bi),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((d * d, B), A_rows.dtype),
        interpret=jax.default_backend() == "cpu",
    )(A_rows, M_rows)


def _chained(step, iters):
    """Fold ``step`` into a dependent chain of ``iters`` contractions.

    The carry is rescaled each step (cheap VPU work, O(size) vs the
    contraction's O(size*d)) so magnitudes stay bounded; the data
    dependency prevents XLA from parallelizing or CSE-ing the chain —
    matching the Riccati backward's sequential structure.
    """

    def run(carry0, other):
        def body(c, _):
            c2 = step(c, other)
            c2 = c2 * jax.lax.rsqrt(jnp.mean(c2 * c2) + 1e-6)
            return c2, ()

        out, _ = jax.lax.scan(body, carry0, None, length=iters)
        return jnp.sum(out)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="16,24,32,48")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=128,
                    help="dependent contractions per timed rep")
    args = ap.parse_args()
    B, iters = args.batch, args.iters

    with jax.default_matmul_precision("highest"):
        for d in (int(x) for x in args.dims.split(",")):
            rng = np.random.default_rng(d)
            A = jnp.asarray(rng.standard_normal((B, d, d)), jnp.float32)
            M = jnp.asarray(rng.standard_normal((B, d, d)), jnp.float32)
            S = jnp.asarray(rng.standard_normal((d, d)), jnp.float32)
            # row layout: [b, i, j] -> [i*d+j, b]
            A_rows = jnp.transpose(A.reshape(B, d * d), (1, 0))
            M_rows = jnp.transpose(M.reshape(B, d * d), (1, 0))
            flops = 2.0 * B * d ** 3 * iters   # per timed rep (the chain)

            row_chain = _chained(
                lambda c, o: _row_kernel_matmul(c, o, d=d), iters
            )
            xla_chain = _chained(
                lambda c, o: jnp.einsum("bij,bjk->bik", c, o), iters
            )
            shared_chain = _chained(
                lambda c, o: (c.reshape(B * d, d) @ o).reshape(B, d, d),
                iters,
            )
            # (carry0, stationary) per variant — all explicit jit operands
            variants = {
                "row-kernel (VPU, shipped design)": (
                    lambda e, a, mm: row_chain(a + e, mm), (A_rows, M_rows)
                ),
                "xla-batched-dot (einsum bij,bjk)": (
                    lambda e, a, mm: xla_chain(a + e, mm), (A, M)
                ),
                "mxu-shared ((B*n,n)@(n,n), UPPER BOUND)": (
                    lambda e, a, mm: shared_chain(a + e, mm), (A, S)
                ),
            }
            times = {}
            for name, (make, ops) in variants.items():
                ms, _ = amortized_ms(make, reps=10, operands=ops)
                times[name] = ms
                gf = flops / (ms / 1e3) / 1e9
                print(json.dumps({
                    "dims": d, "variant": name,
                    "us_per_contraction": round(ms * 1e3 / iters, 3),
                    "GFLOPs": round(gf, 1),
                    "pct_VPU": round(100 * gf * 1e9 / VPU_PEAK, 1),
                    "pct_MXU_f32": round(100 * gf * 1e9 / MXU_PEAK_F32, 1),
                    "batch": B, "chain_iters": iters,
                }), flush=True)
            row = times["row-kernel (VPU, shipped design)"]
            xla = times["xla-batched-dot (einsum bij,bjk)"]
            shared = times["mxu-shared ((B*n,n)@(n,n), UPPER BOUND)"]
            print(json.dumps({
                "dims": d,
                "verdict": (
                    "row design holds" if xla * NOISE_BAND >= row
                    else "XLA batched dot wins — adopt"
                ),
                "row_vs_xla_x": round(xla / row, 2),
                "shared_stationary_headroom_x": round(row / shared, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
