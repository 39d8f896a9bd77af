"""Native (C++) host runtime: fast decode, graph index, delta log."""
