"""The chase slot schedule — ONE home for the sweep hop-count formula.

Every Stage-II consumer agrees on this schedule (reference sweep
structure: brd_p2, svd_parallel.h:639-695): sweep ``i`` of an (n, n)
band-``b`` chase runs a head pair (slot 0) plus ``nc_of(i, n, b)`` chase
pairs (slots 1..nc), with window corners advancing ``b`` rows per slot.

The recorders (band_chase.py, band_chase_wave.py, band_chase_stream.py,
two_stage.band_to_bidiagonal_accum) emit exactly ``nc_of(i) + 1`` live
record slots per sweep, and the back-transform (models/vectors.py) trims
its walk to the same count — if the two ever disagreed, the trim would
silently skip live reflectors.  Keeping the formula here makes that a
single point of truth (ADVICE r4 #2).
"""

import jax.numpy as jnp


def nc_of(i, n, b):
    """Chase-hop count of sweep ``i`` (traced: scalar or vector int32).

    ``nc = max(0, ceil((n - (i + 2b + 1)) / b)) + 1``: the bulge opened
    at column ``i + 1 + b`` needs one pair per ``b`` rows until it falls
    off row ``n``, and every sweep has at least one chase pair (the
    reference's ``b_size += 1`` window, svd_parallel.h:649)."""
    w2 = 2 * (b + 1) - 1  # i + w2 = first row past the head pair's window
    return (
        jnp.maximum(jnp.int32(0), -(-(jnp.int32(n) - (i + w2)) // b)) + 1
    )


def nc_of_static(i, n, b):
    """:func:`nc_of` on Python ints (for static slicing/loop bounds)."""
    w2 = 2 * (b + 1) - 1
    return max(0, -(-(n - (i + w2)) // b)) + 1


def s_max_of(n, b):
    """Record slots per sweep: head slot + the longest sweep's chase
    slots — ``nc_of(0, n, b) + 1`` (Python int)."""
    return nc_of_static(0, n, b) + 1
