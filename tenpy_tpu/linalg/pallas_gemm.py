r"""Pallas TPU kernel: fused gather -> grouped batched GEMM -> segment-sum.

This is the hand-written kernel for the hot chain of the packed tensordot
(:func:`tenpy_tpu.linalg.packed.tensordot`).  Per GEMM-bucket-pair group the
XLA path materializes three HBM intermediates:

1. the gathered LHS rows   ``A_src[ia]``   -- (B, m, k) write + read,
2. the gathered RHS rows   ``B_src[ib]``   -- (B, k, n) write + read,
3. the batched product                      -- (B, m, n) write + read,

before the segment-sum reduces entries with the same destination block to the
(U, m, n) output (U = number of distinct destination rows; B/U = the
contracted-leg charge-sector fan-in, typically 3-20 in DMRG).  At DMRG block
sizes most buckets are HBM-bandwidth bound, so this kernel fuses the whole
chain into ONE pass: grid over the (segment-sorted) GEMM entries, the lhs/rhs
blocks are DMA'd straight from the *source* buffers via scalar-prefetched
gather indices (``PrefetchScalarGridSpec``), the product accumulates in a VMEM
scratch accumulator, and only the (U, m, n) segment sums ever reach HBM.
Pallas' pipeline keeps the revisited output block resident in VMEM while
consecutive grid steps hit the same segment (entries are pre-sorted by
segment), double-buffering the gathered operand DMAs underneath the MXU work.

Reference analogue: the batched-small-GEMM dispatch of the reference's Cython
core (``tenpy/linalg/_npc_helper.pyx`` tensordot worker loops); here the
batching is over charge blocks of one shape bucket and the kernel replaces
gather/matmul/scatter HLOs instead of BLAS calls.

The kernel computes in float32 on the MXU (``precision`` selectable:
``'highest'`` = 6-pass bf16 -> ~2e-7 relative error, the production Lanczos
mode; ``'default'`` = single bf16 pass for early ramp sweeps).  TPUs have no
native f64 MXU path, so *native* f64 inputs ride the XLA chain instead; f64
arrays under a reduced-precision ``matmul_mode`` do use the kernel (the
engine's ``matvec_mode='f32'`` production setting is exactly the regime it
serves).  Accumulation caveat for that regime: the segment sum accumulates
in **f32 VMEM scratch** and upcasts the reduced result to f64, whereas the
XLA chain upcasts each GEMM result to f64 *before* its gather-sum — very
high fan-in groups (B/U >> 100) lose a few bits of accumulation accuracy on
the fused path.  This is the regime the 3e-9 device-energy-parity numbers
were measured in (with the kernel OFF, the default); keep ``TENPY_TPU_PALLAS``
off for strict-accumulation work.  Used when :data:`tenpy_tpu.linalg.packed._PALLAS_GEMM` is enabled
(env ``TENPY_TPU_PALLAS=1``) and the group fits the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['grouped_gemm_segsum', 'group_fits_vmem']

# VMEM budget for one grid step, in f32 elements: lhs + rhs (double-buffered)
# + out + accumulator scratch must fit in ~16 MB; keep a generous safety
# margin for Mosaic's own scratch.
_VMEM_ELEM_BUDGET = 6 * 1024 * 1024 // 4


def group_fits_vmem(m, k, n):
    """Whether one (m, k) @ (k, n) grid step fits the kernel's VMEM budget."""
    return (2 * (m * k + k * n) + 2 * m * n) <= _VMEM_ELEM_BUDGET


def _kernel(seg_ref, ia_ref, ib_ref, a_ref, b_ref, o_ref, acc_ref, *,
            precision):
    """One grid step: acc (+)= A_src[ia[i]] @ B_src[ib[i]]; flush on seg end.

    ``seg``/``ia``/``ib`` are scalar-prefetched; ``a_ref``/``b_ref`` hold the
    gathered (1, m, k) / (1, k, n) blocks (the gather happens in the
    BlockSpec index maps), ``o_ref`` the (1, m, n) output block of the
    current segment.  The accumulator lives in VMEM scratch, which persists
    across grid steps: Pallas only writes ``o_ref`` back to HBM when the next
    step maps it to a different block, i.e. exactly once per segment.
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    seg_here = seg_ref[i]
    first = jnp.logical_or(i == 0, seg_ref[jnp.maximum(i - 1, 0)] != seg_here)
    last = jnp.logical_or(i == nb - 1,
                          seg_ref[jnp.minimum(i + 1, nb - 1)] != seg_here)
    prod = jax.lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _init():
        acc_ref[...] = prod

    @pl.when(jnp.logical_not(first))
    def _acc():
        acc_ref[...] += prod

    @pl.when(last)
    def _flush():
        o_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=('n_seg', 'precision', 'interpret'))
def _grouped_gemm_segsum(a_src, b_src, seg, ia, ib, *, n_seg, precision,
                         interpret=False):
    B = seg.shape[0]
    m, k = a_src.shape[1], a_src.shape[2]
    n = b_src.shape[2]
    prec = (jax.lax.Precision.HIGHEST if precision == 'highest'
            else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # seg, ia, ib
        grid=(B,),
        in_specs=[
            # i * 0 keeps every block coordinate i32: mixed i32/i64 index
            # tuples fail Mosaic legalization on the AOT (axon) pipeline
            pl.BlockSpec((1, m, k),
                         lambda i, seg, ia, ib: (ia[i], i * 0, i * 0)),
            pl.BlockSpec((1, k, n),
                         lambda i, seg, ia, ib: (ib[i], i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, m, n), lambda i, seg, ia, ib: (seg[i], i * 0, i * 0)),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, precision=prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, m, n), jnp.float32),
        interpret=interpret,
    )
    return fn(seg, ia, ib, a_src, b_src)


def grouped_gemm_segsum(a_src, b_src, seg, ia, ib, n_seg, precision='highest',
                        interpret=False):
    """``out[seg[t]] += a_src[ia[t]] @ b_src[ib[t]]`` as one fused TPU kernel.

    Parameters
    ----------
    a_src : (Na, m, k) float32 — stacked LHS source blocks (NOT pre-gathered)
    b_src : (Nb, k, n) float32 — stacked RHS source blocks
    seg : (B,) int32 — destination row per GEMM entry, **sorted ascending**,
        covering ``0 .. n_seg-1`` without holes (every output row receives at
        least one entry — guaranteed by the packed plan's ``o_uniq``).
    ia, ib : (B,) int32 — gather indices into ``a_src`` / ``b_src``.
    n_seg : int — number of output rows U.
    precision : 'highest' (bf16x6 ~ f32) or 'default' (single bf16 pass).
    interpret : run in interpreter mode (CPU tests).

    Returns (n_seg, m, n) float32.
    """
    return _grouped_gemm_segsum(
        a_src.astype(jnp.float32), b_src.astype(jnp.float32),
        jnp.asarray(seg, jnp.int32), jnp.asarray(ia, jnp.int32),
        jnp.asarray(ib, jnp.int32), n_seg=int(n_seg),
        precision=precision, interpret=bool(interpret))


def reference_segsum(a_src, b_src, seg, ia, ib, n_seg):
    """Pure-numpy differential oracle for the kernel (tests)."""
    a_src = np.asarray(a_src, np.float64)
    b_src = np.asarray(b_src, np.float64)
    out = np.zeros((n_seg, a_src.shape[1], b_src.shape[2]))
    for t in range(len(seg)):
        out[seg[t]] += a_src[ia[t]] @ b_src[ib[t]]
    return out
