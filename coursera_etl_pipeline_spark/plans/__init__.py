"""Reference-parity pipeline plans (nested JSON -> 15-column table)."""
