"""Host utilities: serialization, timers, logging."""
