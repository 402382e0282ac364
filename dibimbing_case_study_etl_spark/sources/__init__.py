"""Sources: HTTP API (driver-side, the reference's extract stage) and
schema-enforced file readers."""
