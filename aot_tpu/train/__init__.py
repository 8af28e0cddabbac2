"""Training: optimizer groups, LR schedule, EMA, train step, Trainer."""
