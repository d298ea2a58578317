"""Host utilities: audio I/O, hashing, logging, tracing, native bindings."""
