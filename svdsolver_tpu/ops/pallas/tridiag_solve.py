"""Pallas kernel: the TGK shifted tridiagonal solve of inverse iteration.

Solves ``(TGK - diag-per-lane(lam)) x = rhs`` for all n shift lanes at once
— the exact computation of :func:`models.vectors.tgk_solve_xla` (tridiagonal
LU with partial pivoting, band-2 upper factor), restructured for the TPU:

* The XLA ``lax.scan`` costs ~2 us per row in loop/dispatch overhead
  (unroll-insensitive), 2N rows x 2 passes x iters — the dominant cost of
  ``tgk_vectors`` at scale.  Here each pass is ONE kernel whose inner loop
  is straight-line VPU code (~50-100 ns/row).
* Lanes are viewed as (8, n/8) so every VPU sublane is busy — a (1, n) row
  layout would use 1/8 of the vector unit (same trick as bisect.py).
* The per-row off-diagonal scalars z[k], z[k+1] are read at static lanes
  from two pre-shifted (1, 128) windows rotated with ``pltpu.roll`` every 8
  rows (dynamic scalar lane indexing is not tile-aligned; bisect.py:17).
* The generic elimination's third upper-diagonal carry ``dd`` is
  identically zero for a tridiagonal, so it is dropped: only
  ``p2 = swap ? z[k+1] : 0`` survives (cf. tgk_solve_xla, which keeps it).

Factor rows (U0, U1, U2, R) stream to HBM between the forward and backward
kernels; the backward kernel's grid runs the blocks in reverse via its
index_map.  Rows are padded to the 128-row grid block with zero z / zero
rhs rows: a zero-``ai`` row never swaps and its zero rhs keeps every pad
carry zero, so pad rows write zeros that the wrapper slices away, and the
one in-range pad-row quirk (the spurious row N-1 stores the carry ``cc``
where the XLA append stores 0 in U1) is patched in-kernel for exact parity.

Differential-tested against tgk_solve_xla in tests/test_pallas.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _fwd_kernel(
    N,
    za_ref,
    zc_ref,
    lam_ref,
    r0_ref,
    rhs_ref,
    piv_ref,
    u0_ref,
    u1_ref,
    u2_ref,
    rr_ref,
    b_ref,
    cc_ref,
    y_ref,
):
    # grid (C, G): lane chunks outer (independent problems), row blocks
    # inner (the recurrence) — carries persist in scratch across g
    g = pl.program_id(1)
    dtype = rhs_ref.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    pivmin = piv_ref[0, 0]
    lam = lam_ref[:]

    @pl.when(g == 0)
    def _init():
        b_ref[:] = -lam
        cc_ref[:] = jnp.full(lam.shape, za_ref[0, 0], dtype)
        y_ref[:] = r0_ref[:]

    off = pl.multiple_of(g * 128, 128)
    zwa0 = za_ref[0:1, pl.ds(off, 128)]
    zwc0 = zc_ref[0:1, pl.ds(off, 128)]

    def sub(m8, carry):
        b, cc, y, zwa, zwc = carry
        for m in range(8):  # static unroll: scalar lane reads are static
            r = m8 * 8 + m
            ai = zwa[0, m]
            ci = zwc[0, m]
            yi = rhs_ref[pl.ds(r, 1), :, :][0]
            bi = -lam
            swap = jnp.abs(ai) > jnp.abs(b)
            p0 = jnp.where(swap, ai, b)
            p1 = jnp.where(swap, bi, cc)
            p2 = jnp.where(swap, ci, zero)
            py = jnp.where(swap, yi, y)
            q0 = jnp.where(swap, b, ai)
            q1 = jnp.where(swap, cc, bi)
            q2 = jnp.where(swap, zero, ci)
            qy = jnp.where(swap, y, yi)
            psign = jnp.where(p0 < 0, -one, one)
            safe = jnp.where(jnp.abs(p0) < pivmin, psign * pivmin, p0)
            mlt = q0 / safe
            b = q1 - mlt * p1
            cc = q2 - mlt * p2
            y = qy - mlt * py
            u0_ref[pl.ds(r, 1), :, :] = safe[None]
            u1_ref[pl.ds(r, 1), :, :] = p1[None]
            u2_ref[pl.ds(r, 1), :, :] = p2[None]
            rr_ref[pl.ds(r, 1), :, :] = py[None]
        return b, cc, y, pltpu.roll(zwa, 120, 1), pltpu.roll(zwc, 120, 1)

    b, cc, y, _, _ = lax.fori_loop(
        0, 16, sub, (b_ref[:], cc_ref[:], y_ref[:], zwa0, zwc0)
    )
    b_ref[:] = b
    cc_ref[:] = cc
    y_ref[:] = y

    # Exact append semantics of the XLA solve: its final row stores
    # (clamped b, 0, 0, y); the in-loop spurious row N-1 stored the carry
    # ``cc`` in U1 (harmless to the backward pass, whose s1 is still 0
    # there, but patched for bitwise parity with tgk_solve_xla).
    @pl.when(g == (N - 1) // 128)
    def _patch():
        r_last = (N - 1) % 128 + 0 * g  # traced zero: keep index kind uniform
        u1_ref[pl.ds(r_last, 1), :, :] = jnp.zeros(
            (1,) + lam_ref.shape, dtype
        )


def _bwd_kernel(u0_ref, u1_ref, u2_ref, rr_ref, big_ref, sol_ref, s1_ref, s2_ref):
    gg = pl.program_id(1)
    dtype = sol_ref.dtype
    big = big_ref[0, 0]

    @pl.when(gg == 0)
    def _init():
        s1_ref[:] = jnp.zeros(s1_ref.shape, dtype)
        s2_ref[:] = jnp.zeros(s2_ref.shape, dtype)

    def sub(m8, carry):
        s1, s2 = carry
        for m in range(8):
            r = 127 - (m8 * 8 + m)
            u0 = u0_ref[pl.ds(r, 1), :, :][0]
            u1 = u1_ref[pl.ds(r, 1), :, :][0]
            u2 = u2_ref[pl.ds(r, 1), :, :][0]
            rr = rr_ref[pl.ds(r, 1), :, :][0]
            v = (rr - u1 * s1 - u2 * s2) / u0
            v = jnp.clip(v, -big, big)
            sol_ref[pl.ds(r, 1), :, :] = v[None]
            s2 = s1
            s1 = v
        return s1, s2

    s1, s2 = lax.fori_loop(0, 16, sub, (s1_ref[:], s2_ref[:]))
    s1_ref[:] = s1
    s2_ref[:] = s2


def tgk_solve_pallas(z, lam, rhs, pivmin, big):
    """Pallas twin of :func:`models.vectors.tgk_solve_xla`; fp32 TPU path."""
    with jax.enable_x64(False):
        return _tgk_solve_pallas(z, lam, rhs, pivmin, big)


LC = 128  # lane-chunk width (vreg lanes): bounds the pipelined block
# footprint at (128, 8, LC)*4B = 0.5 MB x (5 tensors) x (2 buffers) —
# without chunking, n >= ~3900 blows the 16 MB scoped-VMEM budget


def _tgk_solve_pallas(z, lam, rhs, pivmin, big):
    N, n = rhs.shape
    dtype = rhs.dtype
    # lanes as (8, L): pad n so L = npad // 8 is a whole number of vregs;
    # the per-lane recurrences are independent, so lanes split into C
    # grid chunks of LC (the outer, slowest-varying grid dim)
    npad = -(-n // 1024) * 1024
    L = npad // 8
    C = L // LC
    Npad = -(-N // 128) * 128
    G = Npad // 128

    lam_p = jnp.pad(lam, (0, npad - n), constant_values=1.0)
    lam8 = lam_p.reshape(8, L)
    # rhs shifted by one row (scan step k consumes rhs[k+1]); zero row pads
    # keep every out-of-range carry identically zero (see module docstring)
    rhs_s = jnp.pad(rhs[1:], ((0, Npad - (N - 1)), (0, npad - n)))
    rhs3 = rhs_s.reshape(Npad, 8, L)
    r0 = jnp.pad(rhs[0], (0, npad - n)).reshape(8, L)
    za = jnp.zeros((1, Npad), dtype).at[0, : N - 1].set(z)
    zc = jnp.zeros((1, Npad), dtype).at[0, : N - 2].set(z[1:])
    piv = jnp.reshape(pivmin.astype(dtype), (1, 1))
    big2 = jnp.reshape(big.astype(dtype), (1, 1))

    rowdata = lambda: pl.BlockSpec(
        (1, Npad), lambda c, g: (0, 0), memory_space=pltpu.VMEM
    )
    lanes = lambda: pl.BlockSpec(
        (8, LC), lambda c, g: (0, c), memory_space=pltpu.VMEM
    )
    rows = pl.BlockSpec(
        (128, 8, LC), lambda c, g: (g, 0, c), memory_space=pltpu.VMEM
    )
    out_sh = jax.ShapeDtypeStruct((Npad, 8, L), dtype)

    U0, U1, U2, R = pl.pallas_call(
        functools.partial(_fwd_kernel, N),
        grid=(C, G),
        in_specs=[
            rowdata(),
            rowdata(),
            lanes(),
            lanes(),
            rows,
            pl.BlockSpec((1, 1), lambda c, g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[rows, rows, rows, rows],
        out_shape=[out_sh] * 4,
        scratch_shapes=[pltpu.VMEM((8, LC), dtype)] * 3,
    )(za, zc, lam8, r0, rhs3, piv)

    rrows = pl.BlockSpec(
        (128, 8, LC), lambda c, gg: (G - 1 - gg, 0, c), memory_space=pltpu.VMEM
    )
    sol = pl.pallas_call(
        _bwd_kernel,
        grid=(C, G),
        in_specs=[
            rrows,
            rrows,
            rrows,
            rrows,
            pl.BlockSpec((1, 1), lambda c, gg: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=rrows,
        out_shape=out_sh,
        scratch_shapes=[pltpu.VMEM((8, LC), dtype)] * 2,
    )(U0, U1, U2, R, big2)

    return sol.reshape(Npad, npad)[:N, :n]
