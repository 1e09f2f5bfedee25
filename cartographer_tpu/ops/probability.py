"""Probability <-> log-odds encoding for occupancy grids.

Reference: cartographer/mapping/probability_values.h — probabilities clamped
to [0.1, 0.9], stored as uint16 with precomputed odds-update LUTs. That
encoding is a CPU memory/speed optimization; on TPU cells are float32
log-odds, where the reference's `odds(p_cell) * odds(p_update)` becomes a
plain addition and the LUTs disappear. Clamping the stored log-odds to
[logit(0.1), logit(0.9)] reproduces the reference's bounded value space.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# mapping/probability_values.h: kMinProbability = 0.1, kMaxProbability = 0.9.
MIN_PROBABILITY = 0.1
MAX_PROBABILITY = 1.0 - MIN_PROBABILITY

# Unknown cells score as kMinProbability when matching
# (ProbabilityGrid::GetProbability on an unknown cell).
UNKNOWN_PROBABILITY = MIN_PROBABILITY


def logit(p: float) -> float:
    return math.log(p / (1.0 - p))


MIN_LOG_ODDS = logit(MIN_PROBABILITY)
MAX_LOG_ODDS = logit(MAX_PROBABILITY)


def probability_to_log_odds(p):
    return jnp.log(p) - jnp.log1p(-p)


def log_odds_to_probability(lo):
    return 1.0 / (1.0 + jnp.exp(-lo))


def clamp_log_odds(lo):
    return jnp.clip(lo, MIN_LOG_ODDS, MAX_LOG_ODDS)
