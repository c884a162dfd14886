"""Backend optimization: bundle adjustment, relinearization, pose graphs."""
