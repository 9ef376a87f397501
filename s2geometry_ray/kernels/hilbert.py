"""Hilbert-curve lookup tables shared by the oracle and the vectorized kernels.

The S2 cell id is a 64-bit Hilbert-curve index: 3 face bits, then 2 bits
per level (positions along the face-local Hilbert curve), then a single
trailing ``1`` marker bit.  Encoding/decoding processes i/j 4 bits at a
time through two 1024-entry lookup tables built from the canonical S2
quadrant tables (identical across every public S2 port — SURVEY.md §3.1
S7).  One table-builder is shared by BOTH the scalar oracle and the
vectorized kernels so a transposed entry cannot silently diverge
(SURVEY.md §7.3.6).
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

# POS_TO_IJ[orientation][position] = ij  (ij = 2*i + j within the quadrant)
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0), (0,1), (1,1), (1,0)
    (0, 2, 3, 1),  # axes swapped:    (0,0), (1,0), (1,1), (0,1)
    (3, 2, 0, 1),  # bits inverted:   (1,1), (1,0), (0,0), (0,1)
    (3, 1, 0, 2),  # swapped & inverted
)
# orientation adjustment applied when descending into each position
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

# IJ_TO_POS[orientation][ij] = position
IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in POS_TO_IJ
)

_LOOKUP_POS = [0] * (1 << (2 * LOOKUP_BITS + 2))
_LOOKUP_IJ = [0] * (1 << (2 * LOOKUP_BITS + 2))


def _init_lookup_cell(level: int, i: int, j: int, orig_orientation: int,
                      pos: int, orientation: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup_cell(
            level,
            i + (r[index] >> 1),
            j + (r[index] & 1),
            orig_orientation,
            pos + index,
            orientation ^ POS_TO_ORIENTATION[index],
        )


for _o in range(4):
    _init_lookup_cell(0, 0, 0, _o, 0, _o)

# Python-int views (oracle) and int64 ndarray views (vectorized kernels).
LOOKUP_POS: tuple[int, ...] = tuple(_LOOKUP_POS)
LOOKUP_IJ: tuple[int, ...] = tuple(_LOOKUP_IJ)
LOOKUP_POS_NP = np.asarray(_LOOKUP_POS, dtype=np.int64)
LOOKUP_IJ_NP = np.asarray(_LOOKUP_IJ, dtype=np.int64)
# narrow views for the hot encode/decode loops: every table value fits
# 10 bits, so uint16 gathers halve the lookup stream's bytes/row
# (round-5 verdict #6 — the 8→32 plateau is memory-bandwidth-bound)
LOOKUP_POS_U16 = np.asarray(_LOOKUP_POS, dtype=np.uint16)
LOOKUP_IJ_U16 = np.asarray(_LOOKUP_IJ, dtype=np.uint16)
