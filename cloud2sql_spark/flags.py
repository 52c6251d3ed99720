"""Opt-in scale-switch flags.

Every 100 TB scale switch in the repo is the same shape: an env var set
to "1" swaps an exact default plan for the plan that survives three more
orders of magnitude (approx quantile boundaries for global ntile, HLL++
for multi-column count-distinct, degree orientation for triangle
adjacency). One helper keeps the read-at-call-time semantics identical
everywhere — flags must be consulted when the query builds, never at
module import, so a test's monkeypatch.setenv takes effect.
"""

from __future__ import annotations

import os


def flag_enabled(name: str) -> bool:
    """True when env var ``name`` is exactly "1" (unset/other = off)."""
    return os.environ.get(name, "") == "1"
