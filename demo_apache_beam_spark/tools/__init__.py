"""Developer tooling (doc generation, registry introspection)."""
