"""CLI entry points: demo / benchmark / export (reference parity:
posebyte_demo, benchmark, export_engine binaries)."""
