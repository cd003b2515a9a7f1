"""Training: optimizers and task training loops."""
