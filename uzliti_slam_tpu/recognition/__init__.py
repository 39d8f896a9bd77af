"""Place recognition: batched Hamming retrieval over descriptor banks."""
