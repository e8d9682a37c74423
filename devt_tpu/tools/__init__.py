"""Post-hoc analysis tools (L5): retrieval demo + manifest admin."""
