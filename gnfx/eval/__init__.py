"""Evaluation: GraphRNN-protocol MMD statistics and orbit counting."""

from gnfx.eval.mmd import (  # noqa: F401
    compute_mmd,
    degree_stats,
    clustering_stats,
    orbit_stats,
    evaluate_generated,
)
