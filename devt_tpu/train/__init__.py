"""Training harness: state, optimizers, steps, loops, metrics, checkpoints."""
