"""End-to-end job plans (flagship extraction job, metrics job)."""
