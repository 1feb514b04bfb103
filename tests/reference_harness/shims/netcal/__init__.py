"""netcal shim (import-compatibility for lib/metrics/utils.py:16)."""
