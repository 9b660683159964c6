"""Ray Data map_batches callables (stateless fns + actor classes)."""
