"""Command-line entry points (reference: repo-root scripts + training/)."""
