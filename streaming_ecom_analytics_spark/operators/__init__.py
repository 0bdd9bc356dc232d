"""Engine operators: cleaning, sampling, analytic aggregates, relational ops."""
