"""Named end-to-end queries with DuckDB oracle twins.

Each query module registers ``QuerySpec`` objects into
``plans.registry.REGISTRY``; ``__spark_entry__.py`` exposes them to the
driver's correctness gate.
"""
