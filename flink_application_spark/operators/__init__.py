"""DataFrame -> DataFrame operators (the SURVEY §2 inventory)."""
