"""Training: states, steps, trainer, checkpoints, metrics."""
