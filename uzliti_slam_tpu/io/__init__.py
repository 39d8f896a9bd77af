"""Dataset loaders, synthetic sequence generation, persistence."""
