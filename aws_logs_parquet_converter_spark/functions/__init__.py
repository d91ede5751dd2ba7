"""Expression builders: pure functions Column -> Column / DataFrame -> DataFrame."""
