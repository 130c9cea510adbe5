"""Datasets, synthetic scenes, trajectory IO, metrics, profiling."""
