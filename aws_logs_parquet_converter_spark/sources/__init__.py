"""Sources: raw log-line readers and synthetic fixtures."""
