"""Structured warning categories (VERDICT r4 item 9).

The engines previously warned with bare ``UserWarning``, forcing internal
callers (``solvers.filtered._edge_estimate``, the adaptive filtered driver)
and user code to filter by message REGEX — rewording a message in one place
would silently re-expose every auto-bounds solve to a misleading warning.
Every lanczos_tpu warning now carries one of these categories, so
``warnings.filterwarnings("ignore", category=...)`` selects by CLASS and is
robust to message edits.

No reference counterpart: the reference C++ library has no warning system
(its nearest analogue is the ``unconverged_count`` return value,
/root/reference/include/lambda_lanczos/lambda_lanczos_tridiagonal_impl.hpp:316-331).
"""

from __future__ import annotations

__all__ = [
    "LanczosWarning",
    "BudgetExhaustedWarning",
    "BandCoverageWarning",
    "MissedCopyWarning",
    "AccuracyWarning",
    "OverflowGuardWarning",
]


class LanczosWarning(UserWarning):
    """Base class for every warning raised by lanczos_tpu."""


class BudgetExhaustedWarning(LanczosWarning):
    """A deflation round used its whole max_restarts/max_iteration budget
    with the Ritz values still moving — results may be budget-limited."""


class BandCoverageWarning(LanczosWarning):
    """Filtered solve: some wanted eigenvalues likely lie OUTSIDE the
    amplified mu-band (bulk-level B-space Ritz values)."""


class MissedCopyWarning(LanczosWarning):
    """Filtered solve: the deflated band-weight probe detects a band state
    missing from the returned set (a possibly absent degenerate copy)."""


class AccuracyWarning(LanczosWarning):
    """Results may be less accurate than requested: tridiagonal QL
    iteration cap, A-space residuals above the mu-scale bound, inverse-map
    disagreement, or shift-invert MINRES floors."""


class OverflowGuardWarning(LanczosWarning):
    """A parameter was clipped to keep f32 arithmetic finite (e.g. the
    filter degree at the cosh amplification cap)."""
