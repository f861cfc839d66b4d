"""Contact impulse solver (placeholder — filled in by the collision milestone).

The reference engine has no collision/contact code at all (SURVEY.md §0);
this subsystem is a new capability required by BASELINE.json's configs.
"""

from __future__ import annotations

from physics_tpu.config import SimConfig
from physics_tpu.state import SimState


def resolve_contacts(state: SimState, cfg: SimConfig):
    """Velocity-level contact resolution. No-op until the collision pipeline
    lands; returns (state, metrics)."""
    return state, {}
