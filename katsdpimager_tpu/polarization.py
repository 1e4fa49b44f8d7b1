"""Polarization basis transformations (Mueller matrices).

Capability parity with the reference's ``polarization.py``: CASA Stokes
enumeration, least-squares Mueller matrices between arbitrary polarization
bases, and the circular-frame split used for parallactic-angle rotation
(reference ``polarization.py:34-133``).
"""

from __future__ import annotations

import numpy as np

STOKES_I = 1
STOKES_Q = 2
STOKES_U = 3
STOKES_V = 4
STOKES_RR = 5
STOKES_RL = 6
STOKES_LR = 7
STOKES_LL = 8
STOKES_XX = 9
STOKES_XY = 10
STOKES_YX = 11
STOKES_YY = 12

STOKES_IQUV = [STOKES_I, STOKES_Q, STOKES_U, STOKES_V]

#: Names for polarizations used in display and command line
STOKES_NAMES = [None, "I", "Q", "U", "V", "RR", "RL", "LR", "LL", "XX", "XY", "YX", "YY"]

#: Coefficients of each correlation product in terms of (I, Q, U, V).
#: Row p gives the linear combination of Stokes parameters measured by
#: product p (CASA enumeration; reference polarization.py:53-67).
STOKES_COEFF = np.array(
    [
        [0, 0, 0, 0],
        [1, 0, 0, 0],     # I
        [0, 1, 0, 0],     # Q
        [0, 0, 1, 0],     # U
        [0, 0, 0, 1],     # V
        [1, 0, 0, 1],     # RR = I + V
        [0, 1, 1j, 0],    # RL = Q + iU
        [0, 1, -1j, 0],   # LR = Q - iU
        [1, 0, 0, -1],    # LL = I - V
        [1, 1, 0, 0],     # XX = I + Q
        [0, 0, 1, 1j],    # XY = U + iV
        [0, 0, 1, -1j],   # YX = U - iV
        [1, -1, 0, 0],    # YY = I - Q
    ],
    np.complex64,
)


def polarization_matrix(outputs, inputs) -> np.ndarray:
    """Mueller matrix mapping correlation products `inputs` to `outputs`.

    With ``s`` the Stokes vector, inputs measure ``A s`` and outputs ``B s``
    (rows of :data:`STOKES_COEFF`); solve ``X A s = B s`` by least squares.
    Raises ValueError when the inputs do not span the outputs.
    """
    A = STOKES_COEFF[list(inputs), :].T
    B = STOKES_COEFF[list(outputs), :].T
    X, _resid, _rank, _s = np.linalg.lstsq(A, B, rcond=1e-5)
    if np.linalg.norm(A @ X - B, "fro") > 1e-5:
        raise ValueError("no solution: inputs cannot produce requested outputs")
    # Typical entries are multiples of 0.25; snap near-multiples to kill
    # lstsq rounding noise (exact zeros matter for weight propagation).
    Xr = np.round(np.float32(4) * X) * np.float32(0.25)
    np.putmask(X, np.isclose(X, Xr), Xr)
    return np.ascontiguousarray(X.T.astype(np.complex64))


def polarization_matrices(outputs, inputs):
    """Mueller matrix pair for conversion via the circular (R/L) frame.

    Returns ``(from_circular, to_circular)``: parallactic/feed-angle rotation
    is diagonal in the circular frame, so per-visibility rotation is applied
    between these two constant matrices (see :mod:`katsdpimager_tpu.preprocess`).
    """
    circular = [STOKES_RR, STOKES_RL, STOKES_LR, STOKES_LL]
    return polarization_matrix(outputs, circular), polarization_matrix(circular, inputs)


def parse_stokes(str_value):
    """Parse a string like ``IQUV`` into a sorted list of enum values."""
    for p in str_value:
        if p not in "IQUV":
            raise ValueError(f"Invalid Stokes parameter {p}")
    if not str_value:
        raise ValueError("Empty Stokes parameter list")
    ans = []
    for p in "IQUV":
        cnt = str_value.count(p)
        if cnt > 1:
            raise ValueError(f"Stokes parameter {p} listed multiple times")
        elif cnt:
            ans.append(STOKES_NAMES.index(p))
    return sorted(ans)


def unparse_stokes(params):
    return "".join(STOKES_NAMES[idx] for idx in params)
