"""Evaluation layer: latent analysis, RD sweeps, Bjontegaard, throughput."""
