"""Offline visualization: point clouds, trajectories."""
