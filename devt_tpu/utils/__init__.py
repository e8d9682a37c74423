"""Shared utilities (pytree helpers, torch weight porting)."""
